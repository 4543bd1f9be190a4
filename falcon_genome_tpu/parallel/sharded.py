"""Sharded device steps: the multi-chip compute path.

The full "germline device step" — PairHMM likelihoods for a sharded batch
of read×haplotype pairs plus the BQSR covariate-histogram reduction — jitted
over a (data, region) mesh.  Sharding layout:

* pair batch (lane dim B) sharded over ``data`` × ``region`` — every chip
  works an independent slice of read×hap pairs (the reference's P1×P2/P5
  axes fused);
* the covariate histogram is psum-reduced to a replicated table (the
  reference's BQSRGatherWorker table merge as an ICI collective);
* per-pair log-likelihoods stay sharded (they are consumed shard-locally
  by genotyping).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bqsr import MAX_CYCLE, MAX_QUAL, N_CONTEXT
from ..ops.pairhmm import _pairhmm_jax


def _pairhmm_math(read_codes, base_q, ins_q, del_q, gcp, rlen, hlen,
                  hap_codes, R: int, H: int):
    """Backend-portable pairhmm on time-major int arrays (phred quals)."""
    return _pairhmm_jax(read_codes, base_q, ins_q, del_q, gcp,
                        rlen, hlen, hap_codes, R=R, H=H)


def sharded_pairhmm_step(mesh: Mesh, R: int, H: int):
    """Compile a pairhmm step over the mesh; batch sharded on both axes."""
    batch_spec = P(None, ("data", "region"))  # (rows, B) — shard lanes

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, batch_spec),) * 7
        + (NamedSharding(mesh, batch_spec),),
        out_shardings=NamedSharding(mesh, P(("data", "region"))),
    )
    def step(read_codes, base_q, ins_q, del_q, gcp, rlen, hlen, hap_codes):
        return _pairhmm_math(read_codes, base_q, ins_q, del_q, gcp,
                             rlen, hlen, hap_codes, R, H)

    return step


def sharded_bqsr_histogram(mesh: Mesh, nrg: int = 1):
    """Compile the BQSR covariate histogram with a cross-chip reduction.

    Inputs are flat covariate arrays sharded on the fused (data, region)
    axis; the output table is replicated (an AllReduce over ICI — the
    TPU-native BQSRGatherWorker).
    """
    flat_spec = P(("data", "region"))

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, flat_spec),) * 5,
        out_shardings=NamedSharding(mesh, P()),  # replicated → AllReduce
    )
    def step(rg, qual, cycle, context, is_error):
        flat = (rg * MAX_QUAL + qual) * MAX_CYCLE + cycle
        obs = jnp.zeros(nrg * MAX_QUAL * MAX_CYCLE).at[flat].add(1.0)
        err = jnp.zeros(nrg * MAX_QUAL * MAX_CYCLE).at[flat].add(is_error)
        ctx_flat = (rg * MAX_QUAL + qual) * N_CONTEXT + context
        ctx_obs = jnp.zeros(nrg * MAX_QUAL * N_CONTEXT).at[ctx_flat].add(1.0)
        return (obs.reshape(nrg, MAX_QUAL, MAX_CYCLE),
                err.reshape(nrg, MAX_QUAL, MAX_CYCLE),
                ctx_obs.reshape(nrg, MAX_QUAL, N_CONTEXT))

    return step


def germline_train_step(mesh: Mesh, R: int, H: int, nrg: int = 1):
    """The full multi-chip device step of the germline pipeline:

    sharded PairHMM likelihoods + genotype-likelihood reduction per region
    + replicated BQSR histogram — one jitted function over the mesh,
    exercising both the sharded compute path and the ICI collectives.
    """
    batch_spec = P(None, ("data", "region"))
    flat_spec = P(("data", "region"))

    @functools.partial(
        jax.jit,
        in_shardings=(
            (NamedSharding(mesh, batch_spec),) * 8
            + (NamedSharding(mesh, flat_spec),) * 5
        ),
        out_shardings=(
            NamedSharding(mesh, P(("data", "region"))),  # per-pair logp
            NamedSharding(mesh, P()),                    # global hist
        ),
    )
    def step(read_codes, base_q, ins_q, del_q, gcp, rlen, hlen, hap_codes,
             rg, qual, cycle, context, is_error):
        logp = _pairhmm_math(read_codes, base_q, ins_q, del_q, gcp,
                             rlen, hlen, hap_codes, R, H)
        flat = (rg * MAX_QUAL + qual) * MAX_CYCLE + cycle
        obs = jnp.zeros(nrg * MAX_QUAL * MAX_CYCLE).at[flat].add(1.0)
        return logp, obs.reshape(nrg, MAX_QUAL, MAX_CYCLE)

    return step


def make_example_batch(B: int, R: int, H: int, n_cov: int, seed: int = 0):
    """Tiny example inputs for the sharded step (time-major layout)."""
    rng = np.random.default_rng(seed)
    read = rng.integers(0, 4, (R, B)).astype(np.int32)
    hap = rng.integers(0, 4, (H, B)).astype(np.int32)
    q = np.full((R, B), 30, np.int32)
    gcp = np.full((R, B), 10, np.int32)
    rlen = np.full((1, B), R, np.int32)
    hlen = np.full((1, B), H, np.int32)
    cov_rg = np.zeros(n_cov, np.int32)
    cov_q = rng.integers(0, MAX_QUAL, n_cov).astype(np.int32)
    cov_cyc = rng.integers(0, MAX_CYCLE, n_cov).astype(np.int32)
    cov_ctx = rng.integers(0, N_CONTEXT, n_cov).astype(np.int32)
    cov_err = rng.random(n_cov).astype(np.float32) < 0.01
    return (read, q, q, q, gcp, rlen, hlen, hap,
            cov_rg, cov_q, cov_cyc, cov_ctx,
            cov_err.astype(np.float32))

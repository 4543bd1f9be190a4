#!/usr/bin/env python
"""Headline benchmark: PairHMM forward throughput (GCUPS) on one chip.

PairHMM is the metric the reference's whole acceleration story is built
around (the Blaze NAM FPGA serves it to GATK — SURVEY.md §2 row 25), and
BASELINE.md names PairHMM GCUPS as a north-star metric.  Baseline constant:
20 GCUPS ≈ the FPGA-accelerated PairHMM service class the reference deploys
(and ~2-4× a well-tuned AVX512 CPU implementation).

Methodology: the kernel runs N times inside one jitted on-device loop with
a data dependency between iterations (no hoisting), and the measurement
syncs by transferring the result to host — on the remote-tunnel TPU
transport, ``block_until_ready`` acknowledges enqueue rather than
completion, and per-call dispatch latency would otherwise dominate.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_GCUPS = 20.0

# GATK-realistic shapes: 151bp reads vs ~350bp assembled haplotypes
B, R_REAL, H_REAL = 2048, 152, 384
BUCKET_R, BUCKET_H = 160, 384
N_INNER = 20


def main() -> None:
    import jax
    import jax.numpy as jnp
    from falcon_genome_tpu.ops.pairhmm import (
        PairHMMParams, _pairhmm_device, _pairhmm_jax)

    # consecutive short-lived processes contend on the remote-TPU tunnel
    # lease; first contact can fail transiently — retry before giving up
    backend = None
    for attempt in range(4):
        try:
            backend = jax.default_backend()
            break
        except RuntimeError:
            if attempt == 3:
                raise
            time.sleep(20 * (attempt + 1))
    params = PairHMMParams(max_read_len=BUCKET_R, max_hap_len=BUCKET_H,
                           backend="pallas" if backend == "tpu" else "jax")

    rng = np.random.default_rng(0)
    read = np.full((BUCKET_R, B), 4, np.int32)
    hap = np.full((BUCKET_H, B), 4, np.int32)
    hap[:H_REAL] = rng.integers(0, 4, (H_REAL, B))
    for b in range(B):
        s = rng.integers(0, H_REAL - R_REAL + 1)
        read[:R_REAL, b] = hap[s:s + R_REAL, b]
    mut = rng.random((R_REAL, B)) < 0.01
    read[:R_REAL] = np.where(mut, (read[:R_REAL] + 1) % 4, read[:R_REAL])
    q = np.full((BUCKET_R, B), 30, np.int32)
    rlen = np.full((1, B), R_REAL, np.int32)
    hlen = np.full((1, B), H_REAL, np.int32)

    read_d = jnp.asarray(read)
    hap_d = jnp.asarray(hap)
    q_d = jnp.asarray(q)
    rlen_d = jnp.asarray(rlen)
    hlen_d = jnp.asarray(hlen)

    @jax.jit
    def loop(read, q, rlen, hap, hlen):
        def body(_, acc):
            # unhoistable: input depends on the running accumulator
            r2 = jnp.where(acc[0] > 1e30, read + 1, read)
            if params.backend == "pallas":
                logp, _ = _pairhmm_device(r2, q, q, q, q, rlen, hap, hlen,
                                          params=params)
            else:
                logp = _pairhmm_jax(r2, q, q, q, q, rlen, hlen, hap,
                                    R=BUCKET_R, H=BUCKET_H)
            return acc + logp
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((B,), jnp.float32))

    np.asarray(loop(read_d, q_d, rlen_d, hap_d, hlen_d))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(read_d, q_d, rlen_d, hap_d, hlen_d))
        best = min(best, time.perf_counter() - t0)
    per_call = best / N_INNER

    cells = float(B) * R_REAL * H_REAL
    gcups = cells / per_call / 1e9
    print(json.dumps({
        "metric": "pairhmm_forward_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: PairHMM forward throughput (GCUPS) on one chip,
plus the wider driver-captured envelope in ``extras``.

PairHMM is the metric the reference's whole acceleration story is built
around (the Blaze NAM FPGA serves it to GATK — SURVEY.md §2 row 25), and
BASELINE.md names PairHMM GCUPS as a north-star metric.  Baseline constant:
20 GCUPS ≈ the FPGA-accelerated PairHMM service class the reference deploys
(and ~2-4× a well-tuned AVX512 CPU implementation).

``extras`` (BASELINE.md north-star table rows 1-2):
  sw_score_gcups      — Smith-Waterman score-only kernel (the aligner's
                        candidate-ranking pass, ops/smith_waterman.py)
  pairhmm_mesh_gcups  — the SAME PairHMM dispatched through the production
                        shard_map mesh path (ops/pairhmm.py::_pairhmm_sharded)
                        over all attached chips; proves mesh routing holds
                        kernel-rate performance
  align_reads_per_s   — aligner engine end-to-end (5k × 150 bp reads vs a
                        1 Mb genome, 1% error, mixed strand), reads/s

Methodology: each kernel runs N times inside one jitted on-device loop with
a data dependency between iterations (no hoisting), and the measurement
syncs by transferring the result to host — on the remote-tunnel TPU
transport, ``block_until_ready`` acknowledges enqueue rather than
completion, and per-call dispatch latency would otherwise dominate.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""
import json
import sys
import time

import numpy as np

BASELINE_GCUPS = 20.0

# GATK-realistic shapes: 151bp reads vs ~350bp assembled haplotypes
B, R_REAL, H_REAL = 2048, 152, 384
BUCKET_R, BUCKET_H = 160, 384
N_INNER = 20


def _timed_loop(loop, args, n_inner, n_outer=3):
    """Best per-call seconds of a jitted fori_loop, synced via host copy."""
    np.asarray(loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n_inner


def _pairhmm_inputs(rng):
    import jax.numpy as jnp
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
    return tuple(jnp.asarray(a) for a in (read, q, rlen, hap, hlen))


def bench_pairhmm(jax, jnp, params, args):
    """Production HTC configuration: per-base qual tile + scalar
    ins/del/gcp phreds (45/45/10) — the scalar-transition kernel, exactly
    what ``pairhmm_logp_pairs`` dispatches for HaplotypeCaller/Mutect2.

    Returns (gcups, per_call_seconds)."""
    from falcon_genome_tpu.ops.pairhmm import (_pairhmm_device_sc,
                                               _pairhmm_jax)

    @jax.jit
    def loop(read, q, rlen, hap, hlen):
        def body(_, acc):
            # unhoistable: input depends on the running accumulator
            r2 = jnp.where(acc[0] > 1e30, read + 1, read)
            if params.backend == "pallas":
                logp, _ = _pairhmm_device_sc(r2, q, rlen, hap, hlen,
                                             params=params,
                                             scalar_trans=(45, 45, 10))
            else:
                logp = _pairhmm_jax(r2, q, q, q, q, rlen, hlen, hap,
                                    R=BUCKET_R, H=BUCKET_H)
            return acc + logp
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((B,), jnp.float32))

    per_call = _timed_loop(loop, args, N_INNER)
    return float(B) * R_REAL * H_REAL / per_call / 1e9, per_call


def bench_pairhmm_mesh(jax, jnp, params, args):
    """PairHMM through the production shard_map dispatch (the path every
    caller stage uses when tpu.mesh.* is configured) over all chips."""
    from falcon_genome_tpu.ops.pairhmm import _pairhmm_sharded
    from falcon_genome_tpu.parallel.mesh import MeshSpec, make_mesh

    devices = jax.devices()
    mesh = make_mesh(MeshSpec(data=len(devices), region=1), devices)
    read, q, rlen, hap, hlen = args
    sharded = _pairhmm_sharded(mesh, params, BUCKET_R, BUCKET_H,
                               scalar_trans=(45, 45, 10))

    @jax.jit
    def loop(read, q, rlen, hap, hlen):
        def body(_, acc):
            r2 = jnp.where(acc[0] > 1e30, read + 1, read)
            return acc + sharded(r2, q, q, q, q, rlen, hlen, hap)
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((B,), jnp.float32))

    per_call = _timed_loop(loop, args, N_INNER)
    return (float(B) * R_REAL * H_REAL / per_call / 1e9, len(devices))


def bench_sw_score(jax, jnp, backend, rng):
    """Score-only SW kernel: the aligner's candidate-ranking pass."""
    from falcon_genome_tpu.ops.smith_waterman import (
        _sw_pallas_score, _sw_scan_core)
    from falcon_genome_tpu.ops.sw_ref import SWParams

    R, W, Bsw = 160, 416, 2048
    rl, wl = 150, 400
    win = np.full((W, Bsw), 4, np.int32)
    win[:wl] = rng.integers(0, 4, (wl, Bsw))
    read = np.full((R, Bsw), 4, np.int32)
    for b in range(Bsw):
        s = rng.integers(0, wl - rl + 1)
        read[:rl, b] = win[s:s + rl, b]
    mut = rng.random((rl, Bsw)) < 0.01
    read[:rl] = np.where(mut, (read[:rl] + 1) % 4, read[:rl])
    rlen = np.full((1, Bsw), rl, np.int32)
    wlen = np.full((1, Bsw), wl, np.int32)
    params = SWParams()

    @jax.jit
    def loop(read, rlen, win, wlen):
        def body(_, acc):
            r2 = jnp.where(acc[0] > 10 ** 8, read + 1, read)
            if backend == "tpu":
                score, _ = _sw_pallas_score(r2, rlen, win, wlen, params)
            else:
                _, score, _ = _sw_scan_core(r2, rlen, win, wlen,
                                            params=params, R=R, W=W)
            return acc + score[0]
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((Bsw,), jnp.int32))

    args = tuple(jnp.asarray(a) for a in (read, rlen, win, wlen))
    per_call = _timed_loop(loop, args, N_INNER)
    return float(Bsw) * rl * wl / per_call / 1e9, per_call


def bench_pallas_fma_ceiling(jax, jnp):
    """Dependence-free Pallas FMA ceiling (GFLOP/s): the MFU denominator.

    Round-3 shipped an impossible pairhmm_mfu of 1.78 because the old
    roofline timed a SERIAL dependent FMA chain at the XLA level — a
    latency-bound number, not an issue-rate ceiling, which a kernel with
    instruction-level parallelism legitimately exceeds.  The corrected
    ceiling is measured the only way that upper-bounds the kernel by
    construction: a Pallas kernel with the SAME tile shape ((BUCKET_R,
    128) f32 in VMEM scratch), the SAME fori_loop structure and trip
    count, issuing 64 independent x = x*a + b chains per iteration —
    i.e. the PairHMM wavefront with every recurrence dependency removed
    and nothing but pure FMA streaming (load, FMA, store per element).
    Removing dependencies and non-flop work can only speed a kernel up,
    so kernel_flops/s ÷ this ceiling is ≤ 1 up to measurement noise.

    Probed on this chip class: 1 chain 227 G FMA/s (latency-bound),
    16 chains 1.3 TFLOP/s, 64 chains ~2.1 TFLOP/s (≈ saturation; the
    hard ALU peak of 4 VPU ALUs × 8×128 lanes × ~0.94 GHz ≈ 7.7 TFLOP/s
    f32-FMA is unreachable once every operand streams through the
    load/store ports — the twin measures the *streaming* ceiling, which
    is the right bound for a state-machine kernel whose working set
    cannot live in vector registers)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, LANES, CHAINS = BUCKET_R, 128, 64
    T = (BUCKET_R + BUCKET_H) // 2          # same trip count as the kernel
    nblocks = B // LANES

    def kernel(x_ref, acc_ref, *scratch):
        f32 = jnp.float32
        a = f32(1.0000001)
        b = f32(1e-9)
        for s in scratch:
            s[:] = x_ref[:]

        def step(k, carry):
            for s in scratch:
                s[:] = s[:] * a + b
            return carry

        jax.lax.fori_loop(0, T, step, 0)
        tot = scratch[0][:]
        for s in scratch[1:]:
            tot = tot + s[:]
        acc_ref[:] = jnp.sum(tot, axis=0, keepdims=True)

    col = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)

    def call(x):
        return pl.pallas_call(
            kernel, grid=(nblocks,),
            in_specs=[col(R)], out_specs=col(1),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, LANES), jnp.float32)] * CHAINS,
        )(x)

    @jax.jit
    def loop(x):
        def body(_, acc):
            x2 = jnp.where(acc[0] > 1e30, x + 1, x)
            return acc + call(x2)[0]
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((B,), jnp.float32))

    x = jnp.ones((R, B), jnp.float32)
    per_call = _timed_loop(loop, (x,), N_INNER)
    flops = 2.0 * CHAINS * T * nblocks * R * LANES
    return flops / per_call / 1e9, per_call


# Arithmetic flops per executed cell per diagonal in the Pallas kernel
# (ops/pairhmm.py::_pairhmm_kernel_sc substep), FMA counted as 2:
#   m_new = prior * v                                  1
#   d_new = m1*p_del + d1*p_cont                       3
#   amask = rowmask * (d <= rh_sum)                    1
#   acc2d += (m_new + i_new) * amask                   3
#   v     = shift(m_new*a_mm + (i_new+d_new)*a_im)     4
#   w     = shift(m_new*p_ins + i_new*p_cont)          3
# (int compares/selects of the emission prior and the cross-sublane
# shifts occupy issue slots but are not flops — they are why mfu < 1.)
KERNEL_FLOPS_PER_CELL = 15


# Vector-issue slots per executed substep, per (BUCKET_R, 128) tile-op,
# counted from the emitted _pairhmm_kernel_sc substep with loads and
# stores counted as slots — the SAME accounting the twin uses (each twin
# element update x = x*a + b is load + FMA + store = 3 slots).  The
# kernel is issue-bound, not flop-bound (docs/ANALYSIS_pairhmm.md §2), so
# slot utilization vs the twin's measured slot rate is the gated metric
# for BASELINE.md's "≥80% of roofline" row.
#
#   hapd shift-in (load, shift, store)                  3
#   emission (read ld, eq, ge, is_n ld, or, or)         6
#   prior (match ld, mismatch ld, select)               3
#   I read-out (w ld)                                   1
#   M update (v ld, mul)                                2
#   D update (m1 ld, mul, d1 ld, FMA)                   4
#   row-accumulate (mask cmp+mul, add, mul,
#                   acc ld, add, acc st)                7
#   V state (mul, add, FMA, shift, store)               5
#   W state (mul, FMA, shift, store)                    4
#   M1/D1 carry stores                                  2
#   ---------------------------------------------------------
#   total                                              37
# (the per-128-diagonal rescale block amortizes to <0.3 slots/substep
# and is not counted; (1,B) row ops are 1/20th of a tile-op and are
# folded into the row-accumulate line)
KERNEL_SLOTS_PER_SUBSTEP = 37


# Vector-issue slots per diagonal of the score-only Smith-Waterman
# wavefront (_sw_score_kernel.step), same accounting as
# KERNEL_SLOTS_PER_SUBSTEP (loads/ALU/stores each = 1 slot per (R, 128)
# tile-op; itemization in docs/ANALYSIS_sw.md):
#
#   window shift-in (ld, shift, st)                     3
#   E update (h1 ld, sub, e1 ld, sub, max)              5
#   F update (shift h1, sub, f1 ld, shift, sub, max)    6
#   substitution (read ld, eq, select)                  3
#   diagonal (h2 ld, shift, add)                        3
#   H update (max, max, max)                            3
#   valid mask (iota-sub, ge, le, and, and, rowvalid)   6
#   masked H (select)                                   1
#   E/F masked stores (select+st ×2)                    4
#   best tracking (max-reduce 2, cmp+sel+min-reduce 4)  6
#   H1/H2 carry stores                                  2
#   ---------------------------------------------------------
#   total                                              42
SW_SLOTS_PER_DIAG = 42


def sw_issue_util(sw_per_call: float, twin_per_call: float) -> float:
    """Issue-slot utilization of the score-only SW kernel vs the
    dependence-free Pallas twin (docs/ANALYSIS_sw.md; same methodology
    as pairhmm_issue_util — the DP is issue-bound, int compares/selects/
    shifts and masking occupy slots that count zero flops)."""
    LANES = 128
    R, W, Bsw = 160, 416, 2048           # bench_sw_score shapes
    nblocks = Bsw // LANES
    kernel_slots = nblocks * (R + W) * SW_SLOTS_PER_DIAG * R * LANES
    T = (BUCKET_R + BUCKET_H) // 2
    twin_slots = (B // LANES) * T * 64 * 3 * BUCKET_R * LANES
    return ((kernel_slots / sw_per_call)
            / (twin_slots / twin_per_call))


def pairhmm_issue_util(pairhmm_per_call: float,
                       twin_per_call: float) -> float:
    """Vector-issue slot utilization: kernel slots/s ÷ twin slots/s.

    Both rates count element-wise slots (load/ALU/store each = 1 slot
    per element lane).  The twin executes CHAINS × 3 slots per element
    per trip over the same (BUCKET_R, 128) tiles and trip count, so the
    per-element basis divides out; the twin's measured rate is the
    chip's streaming issue ceiling for this tile shape
    (docs/ANALYSIS_pairhmm.md §2: the kernel sustains ~1.4 ALU
    vreg-ops/cycle and dual-issues its memory traffic — this metric
    scores the *total* slot stream against the twin's)."""
    LANES = 128
    nblocks = B // LANES
    # dynamic diagonal bound: the kernel runs nsteps = (dmax-2)//2 + 1
    # unrolled-by-2 steps, dmax = max(rlen + hlen) = R_REAL + H_REAL here
    dmax = R_REAL + H_REAL
    substeps = 2 * min(max((dmax - 2) // 2 + 1, 1),
                       (BUCKET_R + BUCKET_H) // 2)
    kernel_slots = (nblocks * substeps * KERNEL_SLOTS_PER_SUBSTEP
                    * BUCKET_R * LANES)
    # twin (bench_pallas_fma_ceiling): CHAINS chains × T trips × 3 slots
    T = (BUCKET_R + BUCKET_H) // 2
    twin_slots = nblocks * T * 64 * 3 * BUCKET_R * LANES
    return ((kernel_slots / pairhmm_per_call)
            / (twin_slots / twin_per_call))


def pairhmm_mfu(gcups: float, ceiling_gflops: float) -> float:
    """Fraction of the dependence-free Pallas FMA ceiling the PairHMM
    kernel sustains in arithmetic flops.

    GCUPS counts *useful* cells (R_REAL × H_REAL per pair); the kernel
    executes BUCKET_R rows × dmax diagonals, where the dynamic diagonal
    bound stops at dmax = max(rlen + hlen) = R_REAL + H_REAL for the
    bench's equal-length lanes — the executed-work ratio scales the
    counted rate up before dividing by the ceiling."""
    executed_ratio = (BUCKET_R * (R_REAL + H_REAL)) / (R_REAL * H_REAL)
    return gcups * executed_ratio * KERNEL_FLOPS_PER_CELL / ceiling_gflops


def bench_align(rng):
    """Aligner engine throughput: 5k × 150 bp reads vs a 1 Mb genome."""
    from falcon_genome_tpu.aligner import (
        AlignerEngine, AlignerParams, IndexParams, MinimizerIndex)
    from falcon_genome_tpu.io.dna import revcomp_codes

    genome_len, n, L = 1_000_000, 5000, 150
    chrom = rng.integers(0, 4, genome_len).astype(np.uint8)
    idx = MinimizerIndex([("chr1", chrom)], IndexParams(k=17, w=7))
    reads = np.zeros((n, L), np.uint8)
    for i in range(n):
        p = rng.integers(0, genome_len - L)
        r = chrom[p:p + L].copy()
        mut = rng.random(L) < 0.01
        r = np.where(mut, (r + rng.integers(1, 4, L)) % 4, r).astype(np.uint8)
        reads[i] = revcomp_codes(r) if rng.random() < 0.5 else r
    lens = np.full(n, L, np.int32)
    eng = AlignerEngine(idx, AlignerParams())
    eng.align_batch(reads[:64], lens[:64])   # compile SW buckets
    eng.align_batch(reads, lens)             # warm steady-state shapes
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = eng.align_batch(reads, lens)
        best = min(best, time.perf_counter() - t0)
    mapped = sum(a.mapped for a in res) / n
    return n / best, mapped


def bench_align_pair(rng):
    """Production pair path: 4096 FR pairs vs a 4 Mb genome through the
    fused dispatch/collect engine (seeding+chaining in threaded C++, one
    device round-trip per batch)."""
    from falcon_genome_tpu.aligner import (
        AlignerEngine, AlignerParams, IndexParams, MinimizerIndex)
    from falcon_genome_tpu.io.dna import revcomp_codes

    G, B1, L, frag = 4_000_000, 4096, 150, 350
    chrom = rng.integers(0, 4, G).astype(np.uint8)
    idx = MinimizerIndex([("chr1", chrom)], IndexParams(k=17, w=7))
    c1 = np.zeros((B1, L), np.uint8)
    c2 = np.zeros((B1, L), np.uint8)
    for i in range(B1):
        p = int(rng.integers(0, G - frag))
        r1 = chrom[p:p + L].copy()
        r2 = revcomp_codes(chrom[p + frag - L:p + frag].copy())
        for r in (r1, r2):
            mut = rng.random(L) < 0.005
            r[mut] = (r[mut] + 1) % 4
        c1[i], c2[i] = r1, r2
    lens = np.full(B1, L, np.int32)
    eng = AlignerEngine(idx, AlignerParams())
    r1, r2 = eng.align_pair_batch(c1, lens, c2, lens)   # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = eng.align_pair_dispatch(c1, lens, c2, lens)
        r1, r2 = eng.align_pair_collect(h)
        best = min(best, time.perf_counter() - t0)
    mapped = (int(r1.mapped.sum()) + int(r2.mapped.sum())) / (2 * B1)
    return 2 * B1 / best, mapped


def bench_longread(rng):
    """Steady-state long-read alignment throughput (Mbp/s): 128 × 10 kb
    reads at 5% ONT-class error against a 1 Mb reference (the in-repo
    replacement for the reference's minimap-flow engine,
    Minimap2Worker.cpp:51-106).  128 reads = 4 stages of the engine's
    host∥device pipeline (the production stage batches 512,
    ``tpu.batch.long_reads``)."""
    from falcon_genome_tpu.aligner import IndexParams, MinimizerIndex
    from falcon_genome_tpu.longread import LongReadAligner, LongReadParams

    G, n_reads, read_len = 1_000_000, 128, 10_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    lp = LongReadParams(index=IndexParams(k=19, w=10, max_hits=256))
    eng = LongReadAligner(MinimizerIndex([("chr1", genome)], lp.index), lp)
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, G - read_len))
        r = genome[p:p + read_len].copy()
        err = rng.random(read_len) < 0.05
        sub = rng.random(read_len) < 0.6
        r[err & sub] = (r[err & sub] + 1) % 4
        reads.append(r[~(err & ~sub)])
    eng.align_batch(reads)                 # compile all shapes
    bp = sum(len(r) for r in reads)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = eng.align_batch(reads)
        best = min(best, time.perf_counter() - t0)
    if sum(a.mapped for a in res) < n_reads * 0.9:
        raise RuntimeError("longread mapped fraction below 0.9")
    return bp / best / 1e6


def bench_germline_e2e(rng):
    """Full align→markdup→bqsr→htc chain (the product, not a kernel): a
    240 kb / ~43k-read paired-end sim through the same fused ``germline``
    driver the CLI runs.  Returns (reads/s end-to-end, SNP sensitivity,
    extra calls).

    Round-5 note: the chain gained the recalibration stages (the
    reference's fused germline includes them, worker-germline.cpp) and
    bucket-tree markdup, so this number is NOT comparable to rounds ≤4
    (which measured align→markdup→htc only); per-stage fixed costs
    dominate at micro scale — the meaningful throughput row is the 60 Mb
    rehearsal (benchmarks/wgs_rehearsal.json: 7.5k reads/s e2e)."""
    import os
    import tempfile

    from falcon_genome_tpu import stages
    from falcon_genome_tpu.config import Config, Machine
    from falcon_genome_tpu.io.dna import decode_seq, revcomp_codes
    from falcon_genome_tpu.io.fasta import write_fasta
    from falcon_genome_tpu.io.fastq import write_fastq
    from falcon_genome_tpu.io.vcf import read_vcf

    G, L, frag = 240_000, 150, 350
    chrom = rng.integers(0, 4, G).astype(np.uint8)
    tmp = tempfile.mkdtemp(prefix="bench-germline-")
    ref = os.path.join(tmp, "ref.fa")
    write_fasta(ref, {"chr20": decode_seq(chrom)})
    alt = chrom.copy()
    truth = np.arange(1200, G - 1200, 2000)
    alt[truth] = (alt[truth] + 1) % 4
    names, s1, q1, s2, q2 = [], [], [], [], []
    i = 0
    for start in range(0, G - frag, 11):
        hap = alt if i % 2 else chrom
        names.append(f"f{start}")
        s1.append(decode_seq(hap[start:start + L]))
        q1.append("I" * L)
        s2.append(decode_seq(revcomp_codes(hap[start + frag - L:
                                               start + frag])))
        q2.append("I" * L)
        i += 1
    fq1 = os.path.join(tmp, "r_1.fastq")
    fq2 = os.path.join(tmp, "r_2.fastq")
    write_fastq(fq1, names, s1, q1)
    write_fastq(fq2, names, s2, q2)
    conf = Config(machine=Machine(2, 16), environ={}, load_files=False)
    conf.set("temp_dir", tmp)
    conf.set("log_dir", os.path.join(tmp, "log"))
    # scale the scatter to the 60 kb input (the production defaults —
    # 1024 output buckets, 32 interval shards — are WGS-sized fixed
    # costs that would swamp a micro-benchmark; the reference is
    # likewise configured per input scale via fcs-genome.conf)
    conf.set("bwa.num_buckets", 4)
    conf.set("gatk.ncontigs", 4)
    out = os.path.join(tmp, "out.vcf.gz")
    n_reads = 2 * len(names)
    t0 = time.perf_counter()
    stages.run_germline(conf, ref, out, fastq1=fq1, fastq2=fq2,
                        sample_id="s", produce_vcf=True, force=True)
    dt = time.perf_counter() - t0
    _, recs = read_vcf(out)
    called = {r.pos - 1 for r in recs if not r.is_gvcf_block}
    ts = set(truth.tolist())
    return n_reads / dt, len(ts & called) / len(ts), len(called - ts)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from falcon_genome_tpu.ops.pairhmm import PairHMMParams

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
    args = _pairhmm_inputs(rng)

    gcups, pairhmm_per_call = bench_pairhmm(jax, jnp, params, args)

    extras = {}
    try:
        mesh_gcups, nchips = bench_pairhmm_mesh(jax, jnp, params, args)
        extras["pairhmm_mesh_gcups"] = round(mesh_gcups, 3)
        extras["mesh_chips"] = nchips
    except Exception as e:  # never let an extra kill the headline number
        print(f"# mesh extra failed: {e!r}", file=sys.stderr)
    sw_per_call = None
    try:
        sw_gcups, sw_per_call = bench_sw_score(jax, jnp, backend, rng)
        extras["sw_score_gcups"] = round(sw_gcups, 3)
    except Exception as e:
        print(f"# sw extra failed: {e!r}", file=sys.stderr)
    try:
        rps, mapped = bench_align(rng)
        extras["align_reads_per_s"] = round(rps, 1)
        extras["align_mapped_frac"] = round(mapped, 4)
    except Exception as e:
        print(f"# align extra failed: {e!r}", file=sys.stderr)
    try:
        rps, mapped = bench_align_pair(rng)
        extras["align_pair_reads_per_s"] = round(rps, 1)
        extras["align_pair_mapped_frac"] = round(mapped, 4)
    except Exception as e:
        print(f"# align pair extra failed: {e!r}", file=sys.stderr)
    try:
        if backend == "tpu":
            ceil, twin_per_call = bench_pallas_fma_ceiling(jax, jnp)
            extras["pallas_fma_ceiling_gflops"] = round(ceil, 1)
            extras["pairhmm_mfu"] = round(pairhmm_mfu(gcups, ceil), 3)
            util = pairhmm_issue_util(pairhmm_per_call, twin_per_call)
            extras["pairhmm_issue_util"] = round(util, 3)
            if util < 0.8:
                print(f"# GATE: pairhmm_issue_util {util:.3f} < 0.8 "
                      "(BASELINE.md north-star row 2)", file=sys.stderr)
            if sw_per_call is not None:
                swu = sw_issue_util(sw_per_call, twin_per_call)
                extras["sw_issue_util"] = round(swu, 3)
                if swu < 0.8:
                    print(f"# GATE: sw_issue_util {swu:.3f} < 0.8 "
                          "(BASELINE.md north-star row 1)",
                          file=sys.stderr)
    except Exception as e:
        print(f"# roofline extra failed: {e!r}", file=sys.stderr)
    try:
        extras["longread_mbp_per_s"] = round(bench_longread(rng), 3)
    except Exception as e:
        print(f"# longread extra failed: {e!r}", file=sys.stderr)
    try:
        rps, sens, extra_calls = bench_germline_e2e(
            np.random.default_rng(11))
        extras["germline_e2e_reads_per_s"] = round(rps, 1)
        extras["germline_e2e_sensitivity"] = round(sens, 4)
        extras["germline_e2e_extra_calls"] = extra_calls
    except Exception as e:
        print(f"# germline extra failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "pairhmm_forward_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()

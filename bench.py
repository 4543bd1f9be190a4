#!/usr/bin/env python
"""Headline benchmark: PairHMM forward throughput (GCUPS) on one chip.

PairHMM is the metric the reference's whole acceleration story is built
around (the Blaze NAM FPGA serves it to GATK — SURVEY.md §2 row 25), and
BASELINE.md names PairHMM GCUPS as a north-star metric.  Baseline constant:
20 GCUPS ≈ the FPGA-accelerated PairHMM service class the reference deploys
(and ~2-4× a well-tuned AVX512 CPU implementation).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_GCUPS = 20.0

# GATK-realistic shapes: 151bp reads vs ~350bp assembled haplotypes
B, R_REAL, H_REAL = 4096, 151, 350
BUCKET_R, BUCKET_H = 160, 384


def main() -> None:
    import jax
    from falcon_genome_tpu.ops.pairhmm import PairHMMParams, pairhmm_logp

    backend = jax.default_backend()
    params = PairHMMParams(
        max_read_len=BUCKET_R, max_hap_len=BUCKET_H,
        backend="pallas" if backend == "tpu" else "jax")

    rng = np.random.default_rng(0)
    haps = rng.integers(0, 4, size=(B, H_REAL), dtype=np.uint8)
    reads = np.zeros((B, R_REAL), dtype=np.uint8)
    for b in range(B):
        s = rng.integers(0, H_REAL - R_REAL + 1)
        reads[b] = haps[b, s:s + R_REAL]
    mut = rng.random((B, R_REAL)) < 0.01
    reads = np.where(mut, (reads + 1) % 4, reads).astype(np.uint8)
    q = np.full((B, R_REAL), 30, np.uint8)
    gcp = np.full((B, R_REAL), 10, np.uint8)
    rl = np.full(B, R_REAL, np.int32)
    hl = np.full(B, H_REAL, np.int32)

    # warmup (compile)
    out = pairhmm_logp(reads, q, q, q, gcp, rl, haps, hl, params=params)
    np.asarray(out)

    iters = 5 if backend == "tpu" else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pairhmm_logp(reads, q, q, q, gcp, rl, haps, hl, params=params)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters

    cells = float(B) * R_REAL * H_REAL
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "pairhmm_forward_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()

"""Long-read aligner throughput (Mbp/s) + host-loop profile.

Usage: [LR_CPU=1] python benchmarks/bench_longread.py [n_reads] [read_len]
"""
import cProfile
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax

if os.environ.get("LR_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from falcon_genome_tpu.aligner import IndexParams, MinimizerIndex
from falcon_genome_tpu.longread import LongReadAligner, LongReadParams

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 64
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

rng = np.random.default_rng(3)
G = 1_000_000
genome = rng.integers(0, 4, G).astype(np.uint8)
lp = LongReadParams(index=IndexParams(k=19, w=10, max_hits=256))
idx = MinimizerIndex([("chr1", genome)], lp.index)
eng = LongReadAligner(idx, lp)

reads = []
for _ in range(n_reads):
    p = int(rng.integers(0, G - read_len))
    r = genome[p:p + read_len].copy()
    err = rng.random(read_len) < 0.05         # 5% ONT-class error
    sub = rng.random(read_len) < 0.6
    r[err & sub] = (r[err & sub] + 1) % 4
    keep = ~(err & ~sub)                      # rest are deletions
    reads.append(r[keep])

eng.align_batch(reads)                        # compile all shapes
bp = sum(len(r) for r in reads)
best = float("inf")
prof = cProfile.Profile()
for it in range(3):                           # steady state
    t0 = time.perf_counter()
    if it == 2:
        prof.enable()
    res = eng.align_batch(reads)
    if it == 2:
        prof.disable()
    best = min(best, time.perf_counter() - t0)
mapped = sum(a.mapped for a in res)
print(f"{n_reads} reads x ~{read_len}bp: {best:.2f}s steady "
      f"({bp / best / 1e6:.2f} Mbp/s)  mapped {mapped}/{n_reads}")
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(18)

import cProfile, pstats, io, sys, time
import numpy as np
sys.path.insert(0, ".")
rng = np.random.default_rng(0)
from falcon_genome_tpu.aligner import IndexParams, MinimizerIndex
from falcon_genome_tpu.longread import LongReadAligner, LongReadParams
G, n_reads, read_len = 1_000_000, 32, 10_000
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
print("compiling...", flush=True)
eng.align_batch(reads)
print("compiled", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    eng.align_batch(reads)
    best = min(best, time.perf_counter() - t0)
bp = sum(len(r) for r in reads)
print(f"steady: {bp/best/1e6:.2f} Mbp/s ({best*1e3:.0f} ms/batch)", flush=True)
pr = cProfile.Profile()
pr.enable()
eng.align_batch(reads)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())

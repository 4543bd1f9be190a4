import sys, time
import numpy as np
sys.path.insert(0, ".")
from falcon_genome_tpu.aligner import IndexParams, MinimizerIndex
from falcon_genome_tpu.longread import LongReadAligner, LongReadParams
from falcon_genome_tpu.ops.smith_waterman import SWBucket

rng = np.random.default_rng(0)
G, read_len = 1_000_000, 10_000
genome = rng.integers(0, 4, G).astype(np.uint8)
idxp = IndexParams(k=19, w=10, max_hits=256)
index = MinimizerIndex([("chr1", genome)], idxp)

def mkreads(n):
    reads = []
    for _ in range(n):
        p = int(rng.integers(0, G - read_len))
        r = genome[p:p + read_len].copy()
        err = rng.random(read_len) < 0.05
        sub = rng.random(read_len) < 0.6
        r[err & sub] = (r[err & sub] + 1) % 4
        reads.append(r[~(err & ~sub)])
    return reads

def bench(tag, n_reads, br, bw, cq, cw, ep):
    lp = LongReadParams(index=idxp)
    lp.chunk_read, lp.chunk_win, lp.end_pad = cq, cw, ep
    bucket = SWBucket(max_read_len=br, max_win_len=bw, backend="pallas")
    eng = LongReadAligner(index, lp, bucket=bucket)
    reads = mkreads(n_reads)
    res = eng.align_batch(reads)   # compile
    assert sum(a.mapped for a in res) >= 0.9 * n_reads, tag
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        res = eng.align_batch(reads)
        best = min(best, time.perf_counter() - t0)
    bp = sum(len(r) for r in reads)
    mapped = sum(a.mapped for a in res)
    print(f"{tag:34s} {bp/best/1e6:6.2f} Mbp/s  mapped {mapped}/{n_reads}",
          flush=True)

bench("A 160/256 144/240 n=32 (base)", 32, 160, 256, 144, 240, 48)
bench("B 160/256 144/240 n=64", 64, 160, 256, 144, 240, 48)
bench("C 256/384 232/360 n=32", 32, 256, 384, 232, 360, 64)
bench("D 256/384 232/360 n=64", 64, 256, 384, 232, 360, 64)
bench("E 320/512 290/480 n=64", 64, 320, 512, 290, 480, 80)
bench("F 256/384 232/360 n=128", 128, 256, 384, 232, 360, 64)

"""Component timing for the batched-SW path (long-read chunk shapes).

Breaks sw_extend_batch into its parts — host pack, h2d transfer, DP
kernel, device traceback, d2h transfer, host RLE — and times each on
the attached backend, so long-read throughput work targets the real
bottleneck instead of guesses.

Usage: [SWP_CPU=1] python benchmarks/bench_sw_parts.py [lanes]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax

if os.environ.get("SWP_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from falcon_genome_tpu.ops import smith_waterman as sw
from falcon_genome_tpu.ops.sw_ref import SWParams

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2240
R, W = 160, 256
rng = np.random.default_rng(0)

# chunk-shaped inputs: ~144bp read vs ~240bp window with 5% divergence
wins = rng.integers(0, 4, (B, W)).astype(np.uint8)
reads = np.empty((B, R), np.uint8)
for b in range(B):
    r = wins[b, 8:8 + 144].copy()
    err = rng.random(144) < 0.05
    r[err] = (r[err] + 1) % 4
    reads[b, :144] = r
    reads[b, 144:] = 4
rl = np.full(B, 144, np.int32)
wl = np.full(B, W, np.int32)
params = SWParams()
backend = jax.default_backend()
bucket = sw.SWBucket(max_read_len=R, max_win_len=W,
                     backend="pallas" if backend == "tpu" else "jax")
print(f"backend={backend} B={B} bucket={R}x{W}")


def sync(x):
    return np.asarray(x)


def t(name, fn, n=3):
    fn()                       # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best * 1e3:9.1f} ms")
    return best


# ---- end-to-end -----------------------------------------------------------
t("sw_extend_batch e2e", lambda: sw.sw_extend_batch(
    reads, rl, wins, wl, params, bucket), n=3)

# ---- parts ----------------------------------------------------------------
Bp = sw.LANES
while Bp < B:
    Bp *= 2


def pack():
    def pad_t(x, rows, fill):
        out = np.full((Bp, rows), fill, dtype=np.int8)
        out[:B, :x.shape[1]] = x
        return np.ascontiguousarray(out.T)
    read_t = pad_t(reads, R, 4)
    win_t = pad_t(wins, W, 5)
    rlen_t = np.zeros((1, Bp), np.int32)
    rlen_t[0, :B] = rl
    wlen_t = np.zeros((1, Bp), np.int32)
    wlen_t[0, :B] = wl
    return read_t, rlen_t, win_t, wlen_t


read_t, rlen_t, win_t, wlen_t = pack()
t("host pack", pack)
t("h2d transfer", lambda: [sync(jnp.asarray(x)[0, 0]) for x in
                           (read_t, win_t, rlen_t, wlen_t)])

read_d = jnp.asarray(read_t)
win_d = jnp.asarray(win_t)
rlen_d = jnp.asarray(rlen_t)
wlen_d = jnp.asarray(wlen_t)

state = {}


def run_dp():
    if bucket.backend == "jax":
        ptrs, best, bestpos = sw._sw_jax(read_d, rlen_d, win_d, wlen_d,
                                         params=params, R=R, W=W)
    else:
        ptrs, best, bestpos = sw._sw_device(read_d, rlen_d, win_d, wlen_d,
                                            params=params, bucket=bucket)
    state["ptrs"], state["best"], state["bestpos"] = ptrs, best, bestpos
    sync(best[0, 0])


t("DP kernel (ptrs in HBM)", run_dp)
ptrs, best, bestpos = state["ptrs"], state["best"], state["bestpos"]


def run_tb():
    state["fused"] = sw._traceback_device(ptrs, best[0], bestpos[0],
                                          max_steps=R + W)
    sync(state["fused"][0, 0])


t("device traceback", run_tb)
fused = state["fused"]

t("d2h fused buffer", lambda: sync(fused))
fused_h = np.asarray(fused)
S4r = ((R + W + 3) // 4 * 4) // 4
packed_h = fused_h[:S4r, :B]
cb = fused_h[S4r:S4r + 8, :B].astype(np.int32)
coords_h = cb[:4] | (cb[4:] << 8)
bb = fused_h[S4r + 8:S4r + 12, :B].astype(np.int32)
best_h = bb[0] | (bb[1] << 8) | (bb[2] << 16) | (bb[3] << 24)
t("host RLE (_results_from_packed)",
  lambda: sw._results_from_packed(packed_h, R + W, coords_h, best_h, rl))

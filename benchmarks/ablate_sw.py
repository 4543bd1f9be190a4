"""Smith-Waterman score-kernel ablations (docs/ANALYSIS_sw.md §2).

Times kernel variants with specific slot groups removed to verify the
static issue-slot accounting in bench.py::SW_SLOTS_PER_DIAG: if the
kernel is issue-bound, removing a group of K slots should speed the
sweep by ≈ K/42.  Output-correctness of the ablated variants is not the
point (they compute wrong scores); only the issue stream matters.

Usage: python benchmarks/ablate_sw.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

R, W, B = 160, 416, 2048
LANES = 128
N_INNER = 20


def make_kernel(jnp, jax, pl, *, no_best=False, no_mask=False,
                no_window=False, match=1, mismatch=4, go=7, ge=1):
    NEG = -(1 << 28)

    def kernel(read_ref, rlen_ref, win_ref, wlen_ref, score_ref, pos_ref,
               h1_ref, h2_ref, e1_ref, f1_ref, wind_ref):
        i32 = jnp.int32
        h1_ref[:] = jnp.zeros((R, LANES), i32)
        h2_ref[:] = jnp.zeros((R, LANES), i32)
        e1_ref[:] = jnp.full((R, LANES), NEG, i32)
        f1_ref[:] = jnp.full((R, LANES), NEG, i32)
        wind_ref[:] = jnp.zeros((R, LANES), i32)
        score_ref[:] = jnp.zeros((1, LANES), i32)
        pos_ref[:] = jnp.zeros((1, LANES), i32)
        rvec = jax.lax.broadcasted_iota(i32, (R, 1), 0)
        read = read_ref[:]
        rlen = rlen_ref[:]
        wlen = wlen_ref[:]
        zero_row = jnp.zeros((1, LANES), i32)
        neg_row = jnp.full((1, LANES), NEG, i32)
        rowvalid = rvec < rlen

        def shift(x, fill):
            return jnp.concatenate([fill, x[:-1, :]], axis=0)

        def step(d, carry):
            jvec = d - rvec
            if no_window:
                wind = wind_ref[:]
            else:
                new_row = win_ref[pl.ds(jnp.clip(d - 1, 0, W - 1), 1), :]
                wind = shift(wind_ref[:], new_row)
                wind_ref[:] = wind
            h1 = h1_ref[:]
            e_new = jnp.maximum(h1 - go, e1_ref[:] - ge)
            h1s = shift(h1, zero_row)
            f_new = jnp.maximum(h1s - go, shift(f1_ref[:], neg_row) - ge)
            sub = jnp.where(read == wind, i32(match), i32(-mismatch))
            diag = shift(h2_ref[:], zero_row) + sub
            h_new = jnp.maximum(jnp.maximum(0, diag),
                                jnp.maximum(e_new, f_new))
            if no_mask:
                e1_ref[:] = e_new
                f1_ref[:] = f_new
            else:
                valid = jnp.logical_and(
                    jnp.logical_and(jvec >= 1, jvec <= wlen), rowvalid)
                h_new = jnp.where(valid, h_new, 0)
                e1_ref[:] = jnp.where(valid, e_new, NEG)
                f1_ref[:] = jnp.where(valid, f_new, NEG)
            if not no_best:
                m = jnp.max(h_new, axis=0, keepdims=True)
                rowarg = jnp.min(
                    jnp.where(h_new == m, rvec,
                              jnp.full_like(rvec, 1 << 30)),
                    axis=0, keepdims=True)
                upd = m > score_ref[:]
                score_ref[:] = jnp.where(upd, m, score_ref[:])
                pos_ref[:] = jnp.where(upd, d * 4096 + rowarg,
                                       pos_ref[:])
            h2_ref[:] = h1
            h1_ref[:] = h_new
            return carry

        jax.lax.fori_loop(1, R + W + 1, step, 0)
        if no_best:
            score_ref[:] = jnp.max(h1_ref[:], axis=0, keepdims=True)

    return kernel


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    rl, wl = 150, 400
    win = np.full((W, B), 4, np.int32)
    win[:wl] = rng.integers(0, 4, (wl, B))
    read = np.full((R, B), 4, np.int32)
    for b in range(B):
        s = rng.integers(0, wl - rl + 1)
        read[:rl, b] = win[s:s + rl, b]
    rlen = np.full((1, B), rl, np.int32)
    wlen = np.full((1, B), wl, np.int32)
    args = tuple(jnp.asarray(a) for a in (read, rlen, win, wlen))

    def run(name, **kw):
        kernel = make_kernel(jnp, jax, pl, **kw)
        col = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(B // LANES,),
            in_specs=[col(R), col(1), col(W), col(1)],
            out_specs=(col(1), col(1)),
            out_shape=(jax.ShapeDtypeStruct((1, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((R, LANES), jnp.int32)] * 5)

        @jax.jit
        def loop(read, rlen, win, wlen):
            def body(_, acc):
                r2 = jnp.where(acc[0] > 10 ** 8, read + 1, read)
                s, _ = call(r2, rlen, win, wlen)
                return acc + s[0]
            return jax.lax.fori_loop(0, N_INNER, body,
                                     jnp.zeros((B,), jnp.int32))

        np.asarray(loop(*args))
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(loop(*args))
            best = min(best, time.perf_counter() - t)
        per = best / N_INNER
        gcups = B * rl * wl / per / 1e9
        print(f"{name:<22} {per * 1e3:7.3f} ms/call  {gcups:7.2f} GCUPS")
        return per

    base = run("base")
    for name, kw, slots in (
            ("no_best_tracking", {"no_best": True}, 6),
            ("no_valid_mask", {"no_mask": True}, 11),
            ("no_window_shift", {"no_window": True}, 3)):
        per = run(name, **kw)
        print(f"    predicted {slots}/42 = {slots / 42:.1%}, "
              f"measured {(base - per) / base:.1%}")


if __name__ == "__main__":
    main()

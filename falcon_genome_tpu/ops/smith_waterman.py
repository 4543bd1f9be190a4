"""Batched local affine Smith-Waterman as a Pallas TPU kernel.

Replaces the banded seed-extension engine of bwa-flow (the FPGA xclbin the
reference loads at src/workers/BWAWorker.cpp:161-166) with an in-process
kernel: each lane aligns one read against one reference window.

Design mirrors the PairHMM wavefront (ops/pairhmm.py) in max-plus algebra:

* anti-diagonal wavefront over (R, B) tiles — read position on sublanes,
  pair on lanes; all per-step work is dense VPU elementwise math;
* the *time* axis is a Pallas grid dimension: each diagonal's traceback
  pointer bits stream straight to HBM as an int8 (1, R, B) block, so VMEM
  holds only the wavefront state while full-traceback information leaves
  the chip — scratch persists across grid steps;
* traceback itself is branchy and O(R+W) serial — it runs on the host over
  the diagonal-major pointer array (``traceback``), exactly the split the
  reference uses between FPGA extension and host CIGAR assembly.

Pointer byte per cell: bits 0-1 hdir (0 stop, 1 diag, 2 from E/deletion,
3 from F/insertion), bit 2 E-extend, bit 3 F-extend.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.sam import CIGAR_D, CIGAR_I, CIGAR_M, CIGAR_S, Cigar
from .sw_ref import NEG, SWParams, SWResult

LANES = 128
POS_STRIDE = 4096  # bestpos = diag_program_id * POS_STRIDE + row;
                   # supports read buckets to 4096 rows and ~500k diagonals
                   # within int32


@dataclasses.dataclass(frozen=True)
class SWBucket:
    """Static shapes for one compiled variant."""
    max_read_len: int = 160    # multiple of 32 (int8 output tiling)
    max_win_len: int = 416
    backend: str = "pallas"    # "pallas" | "jax" | "interpret"


def _shift_down(x, fill_row):
    return jnp.concatenate([fill_row, x[:-1, :]], axis=0)


def _sw_kernel(read_ref, rlen_ref, win_ref, wlen_ref,
               ptr_ref, score_ref, pos_ref,
               h1_ref, h2_ref, e1_ref, f1_ref, wind_ref,
               *, match: int, mismatch: int, go: int, ge: int):
    R = read_ref.shape[0]
    W = win_ref.shape[0]
    B = read_ref.shape[1]
    i32 = jnp.int32
    d = pl.program_id(1)          # diagonal index; actual diag = d + 1

    @pl.when(d == 0)
    def _():
        h1_ref[:] = jnp.zeros((R, B), i32)
        h2_ref[:] = jnp.zeros((R, B), i32)
        e1_ref[:] = jnp.full((R, B), NEG, i32)
        f1_ref[:] = jnp.full((R, B), NEG, i32)
        wind_ref[:] = jnp.zeros((R, B), i32)
        score_ref[:] = jnp.zeros((1, B), i32)
        pos_ref[:] = jnp.zeros((1, B), i32)

    rvec = jax.lax.broadcasted_iota(i32, (R, 1), 0)
    jvec = d - rvec              # hap/window position j at row r (1-based)

    new_row = win_ref[pl.ds(jnp.clip(d - 1, 0, W - 1), 1), :]
    wind = _shift_down(wind_ref[:], new_row)
    wind_ref[:] = wind

    zero_row = jnp.zeros((1, B), i32)
    neg_row = jnp.full((1, B), NEG, i32)

    h1 = h1_ref[:]
    e_open = h1 - go
    e_ext = e1_ref[:] - ge
    e_new = jnp.maximum(e_open, e_ext)
    eext = (e_ext > e_open).astype(i32)

    h1s = _shift_down(h1, zero_row)
    f_open = h1s - go
    f_ext = _shift_down(f1_ref[:], neg_row) - ge
    f_new = jnp.maximum(f_open, f_ext)
    fext = (f_ext > f_open).astype(i32)

    sub = jnp.where(read_ref[:] == wind, i32(match), i32(-mismatch))
    diag = _shift_down(h2_ref[:], zero_row) + sub

    h_new = jnp.maximum(jnp.maximum(0, diag), jnp.maximum(e_new, f_new))

    valid = jnp.logical_and(
        jnp.logical_and(jvec >= 1, jvec <= wlen_ref[:]),
        rvec < rlen_ref[:])
    h_new = jnp.where(valid, h_new, 0)
    e_new = jnp.where(valid, e_new, NEG)
    f_new = jnp.where(valid, f_new, NEG)

    hdir = jnp.where(
        h_new == 0, 0,
        jnp.where(h_new == diag, 1, jnp.where(h_new == e_new, 2, 3)))
    ptr_ref[:] = (hdir | (eext << 2) | (fext << 3)).astype(
        jnp.int8).reshape(1, R, B)

    # best-score tracking: strict improvement, min row on ties within a diag
    m = jnp.max(h_new, axis=0, keepdims=True)
    rowarg = jnp.min(jnp.where(h_new == m, rvec, jnp.full_like(rvec, 1 << 30)),
                     axis=0, keepdims=True)
    upd = m > score_ref[:]
    score_ref[:] = jnp.where(upd, m, score_ref[:])
    pos_ref[:] = jnp.where(upd, d * POS_STRIDE + rowarg, pos_ref[:])

    h2_ref[:] = h1
    h1_ref[:] = h_new
    e1_ref[:] = e_new
    f1_ref[:] = f_new


@functools.partial(jax.jit, static_argnames=("params", "bucket"))
def _sw_device(read, rlen, win, wlen, *, params: SWParams, bucket: SWBucket):
    R, B = read.shape
    W = win.shape[0]
    D = R + W
    nb = B // LANES

    col = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, LANES), lambda b, d: (0, b), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _sw_kernel, match=params.match, mismatch=params.mismatch,
            go=params.gap_open + params.gap_ext, ge=params.gap_ext),
        grid=(nb, D),
        in_specs=[col(R), col(1), col(W), col(1)],
        out_specs=(
            pl.BlockSpec((1, R, LANES), lambda b, d: (d, 0, b),
                         memory_space=pltpu.VMEM),
            col(1), col(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, R, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),  # H (d-1)
            pltpu.VMEM((R, LANES), jnp.int32),  # H (d-2)
            pltpu.VMEM((R, LANES), jnp.int32),  # E (d-1)
            pltpu.VMEM((R, LANES), jnp.int32),  # F (d-1)
            pltpu.VMEM((R, LANES), jnp.int32),  # window diagonal
        ],
        interpret=bucket.backend == "interpret",
    )(read, rlen, win, wlen)


@functools.partial(jax.jit, static_argnames=("params", "R", "W"))
def _sw_jax(read, rlen, win, wlen, *, params: SWParams, R: int, W: int):
    """Portable lax.scan version with identical semantics."""
    i32 = jnp.int32
    B = read.shape[1]
    go, ge = params.gap_open + params.gap_ext, params.gap_ext
    rvec = jnp.arange(R, dtype=i32).reshape(R, 1)
    zero_row = jnp.zeros((1, B), i32)
    neg_row = jnp.full((1, B), NEG, i32)

    def shift(x, fill):
        return jnp.concatenate([fill, x[:-1]], axis=0)

    def step(carry, d):
        h1, h2, e1, f1, wind, best, bestpos = carry
        new_row = jax.lax.dynamic_slice(win, (jnp.clip(d - 1, 0, W - 1), 0),
                                        (1, B))
        wind = shift(wind, new_row)
        jv = d - rvec
        e_open = h1 - go
        e_ext = e1 - ge
        e_new = jnp.maximum(e_open, e_ext)
        eext = (e_ext > e_open).astype(i32)
        h1s = shift(h1, zero_row)
        f_open = h1s - go
        f_ext = shift(f1, neg_row) - ge
        f_new = jnp.maximum(f_open, f_ext)
        fext = (f_ext > f_open).astype(i32)
        sub = jnp.where(read == wind, i32(params.match),
                        i32(-params.mismatch))
        diag = shift(h2, zero_row) + sub
        h_new = jnp.maximum(jnp.maximum(0, diag), jnp.maximum(e_new, f_new))
        valid = (jv >= 1) & (jv <= wlen) & (rvec < rlen)
        h_new = jnp.where(valid, h_new, 0)
        e_new = jnp.where(valid, e_new, NEG)
        f_new = jnp.where(valid, f_new, NEG)
        hdir = jnp.where(
            h_new == 0, 0,
            jnp.where(h_new == diag, 1, jnp.where(h_new == e_new, 2, 3)))
        ptr = (hdir | (eext << 2) | (fext << 3)).astype(jnp.int8)
        m = jnp.max(h_new, axis=0, keepdims=True)
        rowarg = jnp.min(
            jnp.where(h_new == m, rvec, jnp.full_like(rvec, 1 << 30)),
            axis=0, keepdims=True)
        upd = m > best
        best = jnp.where(upd, m, best)
        bestpos = jnp.where(upd, d * POS_STRIDE + rowarg, bestpos)
        return (h_new, h1, e_new, f_new, wind, best, bestpos), ptr

    init = (jnp.zeros((R, B), i32), jnp.zeros((R, B), i32),
            jnp.full((R, B), NEG, i32), jnp.full((R, B), NEG, i32),
            jnp.zeros((R, B), i32), jnp.zeros((1, B), i32),
            jnp.zeros((1, B), i32))
    (h1, h2, e1, f1, wind, best, bestpos), ptrs = jax.lax.scan(
        step, init, jnp.arange(R + W))
    return ptrs, best, bestpos


def traceback(ptr: np.ndarray, score: int, pos: int, read_len: int,
              lane: int) -> SWResult:
    """Host traceback over the diagonal-major pointer array.

    ptr: (D, R, B) int8; cell (i, j) 1-based lives at ptr[i+j-1, i-1, lane].
    """
    if score <= 0:
        return SWResult(0, 0, 0, 0, 0,
                        [(CIGAR_S, read_len)] if read_len else [])
    d_prog, r = divmod(int(pos), POS_STRIDE)
    bi = r + 1
    bj = d_prog - r
    ops: list[int] = []
    i, j = bi, bj
    while i > 0 and j > 0:
        byte = int(ptr[i + j - 1, i - 1, lane])
        hdir = byte & 3
        if hdir == 0:
            break
        if hdir == 1:
            ops.append(CIGAR_M)
            i -= 1
            j -= 1
        elif hdir == 2:
            while True:
                ops.append(CIGAR_D)
                ext = (int(ptr[i + j - 1, i - 1, lane]) >> 2) & 1
                j -= 1
                if not ext or j <= 0:
                    break
        else:
            while True:
                ops.append(CIGAR_I)
                ext = (int(ptr[i + j - 1, i - 1, lane]) >> 3) & 1
                i -= 1
                if not ext or i <= 0:
                    break
    ops.reverse()
    cigar: Cigar = []
    if i > 0:
        cigar.append((CIGAR_S, i))
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    if read_len - bi > 0:
        cigar.append((CIGAR_S, read_len - bi))
    return SWResult(int(score), i, bi, j, bj, cigar)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _traceback_device(ptrs, best, bestpos, *, max_steps: int):
    """Vectorized traceback on device — the pointer array never leaves HBM.

    Walks all lanes in lockstep (one cell per step, ≤ R+W steps), emitting
    per-step op codes (-1 = none, else SAM op M/I/D).  The host only
    receives the (max_steps, B) op stream + final coordinates — a few
    hundred KB instead of the multi-GB pointer array.
    """
    D, R, B = ptrs.shape
    flat = ptrs.reshape(D * R, B)
    d_prog = bestpos // POS_STRIDE
    r = bestpos % POS_STRIDE
    bi = r + 1
    bj = d_prog - r
    phase0 = jnp.zeros(B, jnp.int32)           # 0=H, 1=E(D-run), 2=F(I-run)
    active0 = best > 0

    def step(carry, _):
        i, j, phase, active = carry
        idx = jnp.clip((i + j - 1) * R + (i - 1), 0, D * R - 1)
        byte = jnp.take_along_axis(
            flat, idx[None, :].astype(jnp.int32), axis=0)[0].astype(
            jnp.int32)
        hdir = byte & 3
        eext = (byte >> 2) & 1
        fext = (byte >> 3) & 1
        act = active & (i > 0) & (j > 0)
        is_h = phase == 0
        stop = act & is_h & (hdir == 0)
        do_m = act & is_h & (hdir == 1)
        in_e = act & ((phase == 1) | (is_h & (hdir == 2)))
        in_f = act & ((phase == 2) | (is_h & (hdir == 3))) & ~in_e
        moving = act & ~stop
        op = jnp.where(do_m, 0, jnp.where(in_e, 2, jnp.where(in_f, 1, -1)))
        op = jnp.where(moving, op, -1)
        di = jnp.where(moving & (do_m | in_f), 1, 0)
        dj = jnp.where(moving & (do_m | in_e), 1, 0)
        phase = jnp.where(in_e & (eext == 1), 1,
                          jnp.where(in_f & (fext == 1), 2, 0))
        return (i - di, j - dj, phase, moving), op

    (i_f, j_f, _, _), ops = jax.lax.scan(
        step, (bi, bj, phase0, active0), None, length=max_steps)
    return ops.astype(jnp.int8), i_f, j_f, bi, bj


def _results_from_device_traceback(ops: np.ndarray, i_f, j_f, bi, bj,
                                   best, read_lens) -> list[SWResult]:
    """Host side: reverse + run-length-encode the per-lane op streams."""
    B = ops.shape[1]
    results: list[SWResult] = []
    for b in range(B):
        score = int(best[b])
        rl = int(read_lens[b])
        if score <= 0:
            results.append(SWResult(
                0, 0, 0, 0, 0, [(CIGAR_S, rl)] if rl else []))
            continue
        seq = ops[:, b]
        seq = seq[seq >= 0][::-1]
        cigar: Cigar = []
        if i_f[b] > 0:
            cigar.append((CIGAR_S, int(i_f[b])))
        if len(seq):
            breaks = np.nonzero(np.diff(seq))[0]
            starts = np.concatenate([[0], breaks + 1])
            ends = np.concatenate([breaks + 1, [len(seq)]])
            for s, e in zip(starts, ends):
                cigar.append((int(seq[s]), int(e - s)))
        if rl - int(bi[b]) > 0:
            cigar.append((CIGAR_S, rl - int(bi[b])))
        results.append(SWResult(score, int(i_f[b]), int(bi[b]),
                                int(j_f[b]), int(bj[b]), cigar))
    return results


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


MAX_LANES_PER_CALL = 4096  # bounds the on-device pointer array (~0.4 GB)


def sw_extend_batch(reads: np.ndarray, read_lens: np.ndarray,
                    windows: np.ndarray, win_lens: np.ndarray,
                    params: SWParams = SWParams(),
                    bucket: SWBucket | None = None) -> list[SWResult]:
    """Align each read against its reference window; returns per-pair
    score/spans/CIGAR (soft clips included)."""
    if bucket is None:
        bucket = SWBucket(
            backend="pallas" if jax.default_backend() == "tpu" else "jax")
    if reads.shape[0] > MAX_LANES_PER_CALL:
        out: list[SWResult] = []
        for s in range(0, reads.shape[0], MAX_LANES_PER_CALL):
            e = s + MAX_LANES_PER_CALL
            out.extend(sw_extend_batch(reads[s:e], read_lens[s:e],
                                       windows[s:e], win_lens[s:e],
                                       params, bucket))
        return out
    B, Rin = reads.shape
    Win = windows.shape[1]
    if Rin > bucket.max_read_len or Win > bucket.max_win_len:
        raise ValueError("input exceeds SW bucket shape")
    R, W = bucket.max_read_len, bucket.max_win_len
    # power-of-two lane bucket: bounds compile variants to ~log2 shapes
    Bp = LANES
    while Bp < B:
        Bp *= 2

    def pad_t(x, rows, fill):
        out = np.full((Bp, rows), fill, dtype=np.int32)
        out[:B, :x.shape[1]] = x
        return out.T

    read_t = jnp.asarray(pad_t(reads, R, 4))
    win_t = jnp.asarray(pad_t(windows, W, 5))  # 5 ≠ any base code: no match
    rlen_t = np.zeros((1, Bp), np.int32)
    rlen_t[0, :B] = read_lens
    wlen_t = np.zeros((1, Bp), np.int32)
    wlen_t[0, :B] = win_lens

    if bucket.backend == "jax":
        ptrs, best, bestpos = _sw_jax(
            read_t, jnp.asarray(rlen_t), win_t, jnp.asarray(wlen_t),
            params=params, R=R, W=W)
    else:
        ptrs, best, bestpos = _sw_device(
            read_t, jnp.asarray(rlen_t), win_t, jnp.asarray(wlen_t),
            params=params, bucket=bucket)

    if bucket.backend != "interpret":
        # device traceback: the (D, R, B) pointer array stays in HBM
        ops, i_f, j_f, bi, bj = _traceback_device(
            ptrs, best[0], bestpos[0], max_steps=R + W)
        return _results_from_device_traceback(
            np.asarray(ops)[:, :B], np.asarray(i_f), np.asarray(j_f),
            np.asarray(bi), np.asarray(bj), np.asarray(best)[0],
            np.asarray(read_lens))

    # interpret mode: host traceback paths (native C++ or python), which
    # are also the correctness references for the device walker
    ptrs = np.asarray(ptrs)
    best = np.asarray(best)[0]
    bestpos = np.asarray(bestpos)[0]
    from ..io import native_ext
    nat = native_ext.sw_traceback_batch(
        np.ascontiguousarray(ptrs[:, :, :B]),
        best[:B], bestpos[:B], np.asarray(read_lens, np.int32),
        POS_STRIDE)
    if nat is not None:
        out_ops, out_lens, meta = nat
        results = []
        for b in range(B):
            nc = meta[b, 0]
            cigar = [(int(out_ops[b, i]), int(out_lens[b, i]))
                     for i in range(nc)]
            results.append(SWResult(
                int(best[b]) if best[b] > 0 else 0,
                int(meta[b, 1]), int(meta[b, 2]),
                int(meta[b, 3]), int(meta[b, 4]), cigar))
        return results
    return [traceback(ptrs, best[b], bestpos[b], int(read_lens[b]), b)
            for b in range(B)]

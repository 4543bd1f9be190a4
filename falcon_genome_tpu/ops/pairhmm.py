"""Batched PairHMM forward likelihood as a Pallas TPU kernel.

This replaces the reference's FPGA PairHMM service (Blaze NAM behind GATK
HaplotypeCaller/Mutect2 — SURVEY.md §2 row 25, src/workers/BlazeWorker.cpp):
instead of a background accelerator daemon fed over sockets, the likelihood
batch is an in-process kernel over device arrays.

Design (TPU-first, not a translation):

* **Anti-diagonal wavefront.** The M/I/D recurrences carry dependencies on
  (i-1,j-1), (i-1,j) and (i,j-1); cells along an anti-diagonal d = i+j are
  independent.  The kernel holds the wavefront as (R, B) tiles — read
  position on sublanes, batch pair on lanes — and steps d = 1..R+H, shifting
  the haplotype through the diagonal.  All per-step work is dense VPU
  elementwise math on (R, 128) tiles; there is no gather/scatter.
* **Length bucketing.** Reads pad to R, haplotypes to H (static shapes for
  XLA); per-pair read_len/hap_len masks handle raggedness. Invalid cells are
  computed but masked out of the result; they cannot flow back into valid
  cells because j only advances.
* **f32 with periodic per-pair rescaling.**  GATK runs f32 with initial
  condition 2^120 and falls back to f64 on underflow; TPUs have no fast
  f64, so instead every RESCALE_EVERY diagonals the kernel rescales any
  pair whose live state has shrunk below 2^-60 by 2^100 (exact — the
  recurrence is linear), accumulating the shift in a per-pair exponent.
  Limits of the scheme: the boundary-fed row stays ~2^111, so a pair whose
  *whole column* range exceeds f32 (a read that genuinely doesn't align to
  the hap) cannot be rescued by one per-pair factor and floors to the
  -inf guard — the same pairs GATK would route to its f64 fallback, and
  which every caller here floors to a minimum likelihood anyway.

Result: log10 P(read|hap) per pair, matching the float64 golden model
(`pairhmm_ref.py`) to f32 tolerance.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG10_2 = math.log10(2.0)
LOG10_INITIAL = 120 * LOG10_2   # initial condition 2^120 (f32 headroom)
RESCALE_EVERY = 64
RESCALE_THRESH = 2.0 ** -60
RESCALE_FACTOR = 2.0 ** 100
RESCALE_SHIFT_LOG10 = 100 * LOG10_2

LANES = 128  # batch pairs per kernel program


@dataclasses.dataclass(frozen=True)
class PairHMMParams:
    """Static bucket shape for one compiled kernel variant.

    backend: "pallas" (TPU kernel), "jax" (portable lax.scan wavefront —
    the CPU fallback), or "interpret" (pallas interpreter, for kernel
    debugging).
    """
    max_read_len: int = 160   # must be a multiple of 8 (f32 sublanes)
    max_hap_len: int = 512
    backend: str = "pallas"
    lanes: int = LANES        # pairs per kernel program (multiple of 128)

    @property
    def interpret(self) -> bool:
        return self.backend == "interpret"


def _shift_down(x: jnp.ndarray, fill_row: jnp.ndarray) -> jnp.ndarray:
    """Row shift: out[r] = x[r-1], out[0] = fill_row ((1, B))."""
    return jnp.concatenate([fill_row, x[:-1, :]], axis=0)


def _pairhmm_kernel(read_ref, perr_ref, pins_ref, pdel_ref, pcont_ref,
                    rlen_ref, hap_ref, hlen_ref,
                    acc_ref, shift_ref,
                    m1_ref, d1_ref, w_ref,
                    va_ref, vb_ref,
                    hapd_ref, bound_ref, acc2d_ref):
    """Unroll-by-2 wavefront with constant-folded pre-shifted state.

    The per-row transition constants are folded into the state *before*
    the cross-sublane shift, so one shifted array serves a whole
    recurrence:

      V_{d+2} = shift_down(M_d·a_mm↑ + (I_d+D_d)·a_im↑, bound·a_im[0])
      W_{d+1} = shift_down(M_d·p_ins↑ + I_d·p_cont↑, 0)

    where c↑[r] = c[r+1] are the row constants pre-shifted once at kernel
    start.  Then generation d is simply

      M_d = prior_d ⊙ V_d          I_d = W_d          (both precomputed)
      D_d = M_{d-1}·p_del + D_{d-1}·p_cont            (same-row, no shift)

    — 3 cross-sublane shifts per diagonal (hap, V, W) instead of 4
    (hap, M, I, I+D), and the I recurrence at the point of use is free.
    V_d is read only at generation d and V_{d+2} is produced at
    generation d, so the two V slots ping-pong with in-place overwrite
    (no rotation copies); W needs a single slot (read-then-overwrite).

    There is NO live/"cell started" mask: starting at d = 2, cells at
    j <= 0 stay exactly zero by induction (the only nonzero fill is the
    V boundary row, and row 0 of generation d is cell (1, d-1) with
    d-1 >= 1 — a real cell whose M/I/D recurrences reference only the
    DP boundary row, which the fills encode exactly).
    """
    R = read_ref.shape[0]
    H = hap_ref.shape[0]
    B = read_ref.shape[1]
    f32 = jnp.float32

    # ---- per-row constants (computed once) ---------------------------------
    p_ins = pins_ref[:]
    p_del = pdel_ref[:]
    p_cont = pcont_ref[:]
    a_mm = 1.0 - jnp.minimum(1.0, p_ins + p_del)
    a_im = 1.0 - p_cont
    p_err = perr_ref[:]
    prior_match = 1.0 - p_err
    prior_mismatch = p_err * (1.0 / 3.0)
    zrow = jnp.zeros((1, B), f32)
    # row constants shifted up one row: c_up[r] = c[r+1] (last row value is
    # discarded by the subsequent shift_down, 0 keeps pads inert)
    shift_up = lambda c: jnp.concatenate([c[1:, :], zrow], axis=0)  # noqa: E731
    a_mm_up = shift_up(a_mm)
    a_im_up = shift_up(a_im)
    p_ins_up = shift_up(p_ins)
    p_cont_up = shift_up(p_cont)
    a_im0 = a_im[0:1, :]                           # (1, B) boundary weight

    read_codes = read_ref[:]                       # (R, B) int32
    read_is_n = read_codes >= 4
    rlen = rlen_ref[:]                             # (1, B) int32
    hlen = hlen_ref[:]                             # (1, B) int32
    hlen_f = hlen.astype(f32)

    rvec = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)  # row index r
    # final-row mask is static per pair: row r contributes iff r+1 == rlen
    rowmask = (rvec + 1 == rlen).astype(f32)
    # at the final row, hap position j = d - rlen is in range iff
    # d <= rlen + hlen — a per-pair scalar threshold (no per-diagonal iota)
    rh_sum = rlen + hlen                           # (1, B) int32
    # diagonals beyond every lane's rlen+hlen are fully masked — stop
    # there instead of at the static bucket bound R+H (exact: amask is 0
    # for every lane past its rh_sum, so acc/shift never change again)
    dmax = jnp.max(rh_sum)

    # ---- initial state -----------------------------------------------------
    zero = jnp.zeros((R, B), f32)
    m1_ref[:] = zero
    d1_ref[:] = zero
    w_ref[:] = zero
    hapd_ref[:] = jnp.zeros((R, B), jnp.int32)
    acc2d_ref[:] = zero
    shift_ref[:] = zrow

    ic = f32(2.0) ** 120
    bound0 = ic / jnp.maximum(hlen_f, 1.0)         # D[0][j] = IC / hap_len
    bound_ref[:] = bound0
    # V of generations 2 and 3: generations 0/1 state is zero, so only the
    # boundary fill survives — row 0 carries D[0][j-1]·a_im[0] feeding
    # cell (1, j)
    v0 = jnp.concatenate([bound0 * a_im0, zero[:-1, :]], axis=0)
    va_ref[:] = v0
    vb_ref[:] = v0

    def substep(d, v_ref):
        """Advance diagonal d (d ≥ 2).  v_ref holds V_d (dead after this
        sub-step, overwritten with V_{d+2}); w holds W_d = I_d; m1/d1 hold
        generation d-1."""
        new_hap_row = hap_ref[pl.ds(jnp.clip(d - 2, 0, H - 1), 1), :]
        hapd = _shift_down(hapd_ref[:], new_hap_row)
        hapd_ref[:] = hapd

        # emission prior at (r, j)
        match = jnp.logical_or(
            read_codes == hapd, jnp.logical_or(read_is_n, hapd >= 4))
        prior = jnp.where(match, prior_match, prior_mismatch)

        i_new = w_ref[:]                            # I_d, precomputed
        m_new = prior * v_ref[:]                    # M_d
        d_new = m1_ref[:] * p_del + d1_ref[:] * p_cont

        # accumulate final-row mass into a 2D accumulator (single
        # cross-sublane reduction at the end, not one per step)
        amask = rowmask * (d <= rh_sum).astype(f32)
        acc2d_ref[:] = acc2d_ref[:] + (m_new + i_new) * amask

        v_ref[:] = _shift_down(
            m_new * a_mm_up + (i_new + d_new) * a_im_up,
            bound_ref[:] * a_im0)
        w_ref[:] = _shift_down(m_new * p_ins_up + i_new * p_cont_up, zrow)
        m1_ref[:] = m_new
        d1_ref[:] = d_new

    def step(k, carry):
        d = 2 * k + 2
        substep(d, va_ref)
        substep(d + 1, vb_ref)

        # periodic exact rescale of pairs whose state is vanishing
        @pl.when((d + 2) % RESCALE_EVERY == 0)
        def _():
            m = jnp.maximum(
                jnp.max(jnp.abs(m1_ref[:]) + jnp.abs(w_ref[:])
                        + jnp.abs(d1_ref[:]), axis=0, keepdims=True),
                jnp.max(jnp.abs(va_ref[:]) + jnp.abs(vb_ref[:]),
                        axis=0, keepdims=True))
            need = jnp.logical_and(m > 0.0, m < RESCALE_THRESH)
            scale = jnp.where(need, f32(RESCALE_FACTOR), f32(1.0))
            m1_ref[:] = m1_ref[:] * scale
            d1_ref[:] = d1_ref[:] * scale
            w_ref[:] = w_ref[:] * scale
            va_ref[:] = va_ref[:] * scale
            vb_ref[:] = vb_ref[:] * scale
            acc2d_ref[:] = acc2d_ref[:] * scale
            shift_ref[:] = shift_ref[:] + jnp.where(
                need, f32(RESCALE_SHIFT_LOG10), f32(0.0))
            # the boundary feeds row 0 on every diagonal (via each V's fill
            # row); keep it on the same scale as the state
            bound_ref[:] = bound_ref[:] * scale

        return carry

    # R and H are multiples of 8, so R + H diagonals == (R + H) / 2 pairs;
    # the dynamic bound trims the all-masked tail (real hap/read lengths
    # are usually well inside the static bucket)
    nsteps = jnp.clip((dmax - 2) // 2 + 1, 1, (R + H) // 2)
    jax.lax.fori_loop(0, nsteps, step, 0)
    acc_ref[:] = jnp.sum(acc2d_ref[:], axis=0, keepdims=True)


def _pairhmm_kernel_sc(p_ins_c: float, p_del_c: float, p_cont_c: float,
                       read_ref, perr_ref, rlen_ref, hap_ref, hlen_ref,
                       acc_ref, shift_ref,
                       m1_ref, d1_ref, w_ref,
                       va_ref, vb_ref,
                       hapd_ref, bound_ref, acc2d_ref):
    """Scalar-transition variant of ``_pairhmm_kernel``.

    GATK's HTC/Mutect2 callers run PairHMM with *constant* indel and
    gap-continuation penalties (ins_q/del_q/gcp scalars — only base_q is
    per-base data).  The general kernel materialises p_ins/p_del/p_cont/
    a_mm/a_im as (R, B) VMEM tiles and re-reads them every diagonal; this
    variant bakes them in as compile-time immediates, dropping the
    per-substep VMEM tile traffic from ~22 tiles to ~15 — the kernel is
    VMEM-bandwidth bound, so this is a direct throughput win.

    The row-shifted constants collapse exactly: a scalar is row-invariant,
    and the one row where shift-up semantics differ (the last row gets 0)
    feeds only the product row that ``_shift_down`` discards.
    """
    R = read_ref.shape[0]
    H = hap_ref.shape[0]
    B = read_ref.shape[1]
    f32 = jnp.float32

    a_mm_c = f32(1.0 - min(1.0, p_ins_c + p_del_c))
    a_im_c = f32(1.0 - p_cont_c)
    p_ins_f = f32(p_ins_c)
    p_del_f = f32(p_del_c)
    p_cont_f = f32(p_cont_c)
    third = f32(1.0 / 3.0)
    one = f32(1.0)

    read_codes = read_ref[:]
    read_is_n = read_codes >= 4
    p_err = perr_ref[:]
    prior_match = one - p_err
    prior_mismatch = p_err * third
    rlen = rlen_ref[:]
    hlen = hlen_ref[:]
    hlen_f = hlen.astype(f32)
    zrow = jnp.zeros((1, B), f32)

    rvec = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    rowmask = (rvec + 1 == rlen).astype(f32)
    rh_sum = rlen + hlen
    dmax = jnp.max(rh_sum)   # dynamic diagonal bound (see general kernel)

    zero = jnp.zeros((R, B), f32)
    m1_ref[:] = zero
    d1_ref[:] = zero
    w_ref[:] = zero
    hapd_ref[:] = jnp.zeros((R, B), jnp.int32)
    acc2d_ref[:] = zero
    shift_ref[:] = zrow

    ic = f32(2.0) ** 120
    bound0 = ic / jnp.maximum(hlen_f, 1.0)
    bound_ref[:] = bound0
    v0 = jnp.concatenate([bound0 * a_im_c, zero[:-1, :]], axis=0)
    va_ref[:] = v0
    vb_ref[:] = v0

    def substep(d, v_ref):
        new_hap_row = hap_ref[pl.ds(jnp.clip(d - 2, 0, H - 1), 1), :]
        hapd = _shift_down(hapd_ref[:], new_hap_row)
        hapd_ref[:] = hapd

        match = jnp.logical_or(
            read_codes == hapd, jnp.logical_or(read_is_n, hapd >= 4))
        prior = jnp.where(match, prior_match, prior_mismatch)

        i_new = w_ref[:]
        m_new = prior * v_ref[:]
        d_new = m1_ref[:] * p_del_f + d1_ref[:] * p_cont_f

        amask = rowmask * (d <= rh_sum).astype(f32)
        acc2d_ref[:] = acc2d_ref[:] + (m_new + i_new) * amask

        v_ref[:] = _shift_down(
            m_new * a_mm_c + (i_new + d_new) * a_im_c,
            bound_ref[:] * a_im_c)
        w_ref[:] = _shift_down(m_new * p_ins_f + i_new * p_cont_f, zrow)
        m1_ref[:] = m_new
        d1_ref[:] = d_new

    def step(k, carry):
        d = 2 * k + 2
        substep(d, va_ref)
        substep(d + 1, vb_ref)

        @pl.when((d + 2) % RESCALE_EVERY == 0)
        def _():
            m = jnp.maximum(
                jnp.max(jnp.abs(m1_ref[:]) + jnp.abs(w_ref[:])
                        + jnp.abs(d1_ref[:]), axis=0, keepdims=True),
                jnp.max(jnp.abs(va_ref[:]) + jnp.abs(vb_ref[:]),
                        axis=0, keepdims=True))
            need = jnp.logical_and(m > 0.0, m < RESCALE_THRESH)
            scale = jnp.where(need, f32(RESCALE_FACTOR), f32(1.0))
            m1_ref[:] = m1_ref[:] * scale
            d1_ref[:] = d1_ref[:] * scale
            w_ref[:] = w_ref[:] * scale
            va_ref[:] = va_ref[:] * scale
            vb_ref[:] = vb_ref[:] * scale
            acc2d_ref[:] = acc2d_ref[:] * scale
            shift_ref[:] = shift_ref[:] + jnp.where(
                need, f32(RESCALE_SHIFT_LOG10), f32(0.0))
            bound_ref[:] = bound_ref[:] * scale

        return carry

    nsteps = jnp.clip((dmax - 2) // 2 + 1, 1, (R + H) // 2)
    jax.lax.fori_loop(0, nsteps, step, 0)
    acc_ref[:] = jnp.sum(acc2d_ref[:], axis=0, keepdims=True)


def _pairhmm_device_sc(read_codes, base_q, read_lens, hap_codes, hap_lens,
                       *, params: PairHMMParams,
                       scalar_trans: tuple[int, int, int]):
    """Device entry for the scalar-transition kernel (ins/del/gcp phreds
    are compile-time ints; only base_q ships as data)."""
    return _pairhmm_device_sc_jit(read_codes, base_q, read_lens,
                                  hap_codes, hap_lens, params=params,
                                  scalar_trans=scalar_trans)


@functools.partial(jax.jit, static_argnames=("params", "scalar_trans"))
def _pairhmm_device_sc_jit(read_codes, base_q, read_lens, hap_codes,
                           hap_lens, *, params: PairHMMParams,
                           scalar_trans: tuple[int, int, int]):
    read_codes = read_codes.astype(jnp.int32)
    hap_codes = hap_codes.astype(jnp.int32)
    R, B = read_codes.shape
    H = hap_codes.shape[0]
    p_err = jnp.broadcast_to(_phred_to_prob(base_q), (R, B))
    read_lens = read_lens.astype(jnp.int32)
    hap_lens = hap_lens.astype(jnp.int32)
    L = params.lanes
    nblocks = B // L
    ins_q, del_q, gcp = scalar_trans
    kernel = functools.partial(
        _pairhmm_kernel_sc,
        float(10.0 ** (-ins_q / 10.0)), float(10.0 ** (-del_q / 10.0)),
        float(10.0 ** (-gcp / 10.0)))

    col_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, L), lambda b: (0, b), memory_space=pltpu.VMEM)

    acc, shift = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[col_spec(R), col_spec(R), col_spec(1), col_spec(H),
                  col_spec(1)],
        out_specs=(col_spec(1), col_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, L), jnp.float32),  # m1
            pltpu.VMEM((R, L), jnp.float32),  # d1
            pltpu.VMEM((R, L), jnp.float32),  # w
            pltpu.VMEM((R, L), jnp.float32),  # va
            pltpu.VMEM((R, L), jnp.float32),  # vb
            pltpu.VMEM((R, L), jnp.int32),    # hap diagonal
            pltpu.VMEM((1, L), jnp.float32),  # D row-0 boundary
            pltpu.VMEM((R, L), jnp.float32),  # 2D accumulator
        ],
        cost_estimate=_bucket_cost(params),
        interpret=params.interpret,
    )(read_codes, p_err, read_lens, hap_codes, hap_lens)

    logp = jnp.where(
        acc > 0.0,
        jnp.log10(jnp.maximum(acc, jnp.finfo(jnp.float32).tiny))
        - shift - LOG10_INITIAL,
        -jnp.inf)
    return logp[0], shift[0]


def _bucket_cost(p: PairHMMParams) -> pl.CostEstimate:
    steps = p.max_read_len + p.max_hap_len
    elems = p.max_read_len * p.lanes * steps
    return pl.CostEstimate(
        flops=22 * elems,
        bytes_accessed=(5 * 4 * p.max_read_len + p.max_hap_len) * p.lanes,
        transcendentals=0,
    )


@functools.partial(jax.jit, static_argnames=("params",))
def _pairhmm_device(read_codes, base_q, ins_q, del_q, gcp, read_lens,
                    hap_codes, hap_lens, *, params: PairHMMParams):
    """Device entry: time-major (R, B)/(H, B) inputs, B multiple of LANES.

    Quality inputs are integer phred arrays; the phred→probability
    conversion happens inside this jit so a call is ONE dispatch (the
    remote-tunnel dispatch latency of un-jitted ops dwarfs the kernel).
    """
    # inputs may arrive as uint8 (codes/phreds) and the qual planes as
    # (1, 1) scalars: the host→device wire is the scarce resource on a
    # remote-tunnel TPU (~20-50 MB/s), so callers ship the minimal bytes
    # and the expansion to int32/f32 (R, B) planes happens on device
    read_codes = read_codes.astype(jnp.int32)
    hap_codes = hap_codes.astype(jnp.int32)
    R, B = read_codes.shape
    H = hap_codes.shape[0]
    p_err = jnp.broadcast_to(_phred_to_prob(base_q), (R, B))
    p_ins = jnp.broadcast_to(_phred_to_prob(ins_q), (R, B))
    p_del = jnp.broadcast_to(_phred_to_prob(del_q), (R, B))
    p_cont = jnp.broadcast_to(_phred_to_prob(gcp), (R, B))
    read_lens = read_lens.astype(jnp.int32)
    hap_lens = hap_lens.astype(jnp.int32)
    L = params.lanes
    nblocks = B // L

    col_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, L), lambda b: (0, b), memory_space=pltpu.VMEM)

    acc, shift = pl.pallas_call(
        _pairhmm_kernel,
        grid=(nblocks,),
        in_specs=[
            col_spec(R), col_spec(R), col_spec(R), col_spec(R), col_spec(R),
            col_spec(1), col_spec(H), col_spec(1),
        ],
        out_specs=(col_spec(1), col_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, L), jnp.float32),  # m1  (M, newest gen)
            pltpu.VMEM((R, L), jnp.float32),  # d1  (D, newest gen)
            pltpu.VMEM((R, L), jnp.float32),  # w   (W_{d+1} = I_{d+1})
            pltpu.VMEM((R, L), jnp.float32),  # va  (V slot a, even diags)
            pltpu.VMEM((R, L), jnp.float32),  # vb  (V slot b, odd diags)
            pltpu.VMEM((R, L), jnp.int32),    # hap diagonal
            pltpu.VMEM((1, L), jnp.float32),  # D row-0 boundary
            pltpu.VMEM((R, L), jnp.float32),  # 2D final-row accumulator
        ],
        cost_estimate=_bucket_cost(params),
        interpret=params.interpret,
    )(read_codes, p_err, p_ins, p_del, p_cont, read_lens, hap_codes,
      hap_lens)

    logp = jnp.where(
        acc > 0.0,
        jnp.log10(jnp.maximum(acc, jnp.finfo(jnp.float32).tiny))
        - shift - LOG10_INITIAL,
        -jnp.inf)
    return logp[0], shift[0]


@functools.partial(jax.jit, static_argnames=("R", "H"))
def _pairhmm_jax(read_codes, base_q, ins_q, del_q, gcp, rlen, hlen,
                 hap_codes, *, R: int, H: int):
    """Portable wavefront (lax.scan over diagonals) — same math as the
    Pallas kernel, used on CPU and as a cross-check.

    Quality inputs are phred int arrays OR pre-converted f32 probability
    arrays (float inputs pass through unchanged).
    """
    f32 = jnp.float32
    read_codes = read_codes.astype(jnp.int32)
    hap_codes = hap_codes.astype(jnp.int32)
    B = read_codes.shape[1]
    p_err = jnp.broadcast_to(_phred_to_prob(base_q), (R, B))
    p_ins = jnp.broadcast_to(_phred_to_prob(ins_q), (R, B))
    p_del = jnp.broadcast_to(_phred_to_prob(del_q), (R, B))
    p_cont = jnp.broadcast_to(_phred_to_prob(gcp), (R, B))
    rlen = rlen.astype(jnp.int32)
    hlen = hlen.astype(jnp.int32)
    a_mm = 1.0 - jnp.minimum(1.0, p_ins + p_del)
    a_im = 1.0 - p_cont
    rvec = jnp.arange(R, dtype=jnp.int32).reshape(R, 1)
    hlen_f = hlen.astype(f32)
    boundary0 = (f32(2.0) ** 120) / jnp.maximum(hlen_f, 1.0)
    zero_row = jnp.zeros((1, B), f32)
    zeros = jnp.zeros((R, B), f32)

    def shift(x, fill):
        return jnp.concatenate([fill, x[:-1]], axis=0)

    def step(carry, d):
        m1, i1, d1, m2, i2, d2, hapd, acc, sh, bound = carry
        new_hap = jax.lax.dynamic_slice(
            hap_codes, (jnp.clip(d - 2, 0, H - 1), 0), (1, B))
        hapd = shift(hapd, new_hap)
        jvec = d - rvec - 1
        live = (jvec >= 1).astype(f32)
        match = (read_codes == hapd) | (read_codes >= 4) | (hapd >= 4)
        prior = jnp.where(match, 1.0 - p_err, p_err / 3.0)
        m_new = prior * (shift(m2, zero_row) * a_mm
                         + (shift(i2, zero_row) + shift(d2, bound)) * a_im) * live
        i_new = (shift(m1, zero_row) * p_ins + shift(i1, zero_row) * p_cont) * live
        d_new = (m1 * p_del + d1 * p_cont) * live
        amask = ((rvec + 1 == rlen) & (jvec >= 1) & (jvec <= hlen)).astype(f32)
        acc = acc + jnp.sum((m_new + i_new) * amask, axis=0, keepdims=True)

        def rescale(args):
            m1, i1, d1, m2, i2, d2, acc, sh, bound = args
            m = jnp.maximum(
                jnp.max(jnp.abs(m1) + jnp.abs(i1) + jnp.abs(d1), 0, keepdims=True),
                jnp.max(jnp.abs(m2) + jnp.abs(i2) + jnp.abs(d2), 0, keepdims=True))
            need = (m > 0.0) & (m < RESCALE_THRESH)
            scale = jnp.where(need, f32(RESCALE_FACTOR), f32(1.0))
            sh = sh + jnp.where(need, f32(RESCALE_SHIFT_LOG10), f32(0.0))
            return (m1 * scale, i1 * scale, d1 * scale, m2 * scale,
                    i2 * scale, d2 * scale, acc * scale, sh, bound * scale)

        args = (m_new, i_new, d_new, m1, i1, d1, acc, sh, bound)
        m1, i1, d1, m2, i2, d2, acc, sh, bound = jax.lax.cond(
            d % RESCALE_EVERY == 0, rescale, lambda a: a, args)
        return (m1, i1, d1, m2, i2, d2, hapd, acc, sh, bound), None

    init = (zeros, zeros, zeros, zeros, zeros, zeros,
            jnp.zeros((R, B), jnp.int32), jnp.zeros((1, B), f32),
            jnp.zeros((1, B), f32), boundary0)
    (m1, i1, d1, m2, i2, d2, hapd, acc, sh, bound), _ = jax.lax.scan(
        step, init, jnp.arange(1, R + H + 1))
    logp = jnp.where(
        acc > 0.0,
        jnp.log10(jnp.maximum(acc, jnp.finfo(f32).tiny)) - sh - LOG10_INITIAL,
        -jnp.inf)
    return logp[0]


def _phred_to_prob(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, -q.astype(jnp.float32) / 10.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# mesh-sharded dispatch: the SAME kernel (Pallas on TPU, portable scan on
# CPU) under shard_map over the pipeline's (data, region) mesh — multi-chip
# as a property of every caller stage, not a sidecar (the reference runs
# its whole pipeline under mpirun/ssh scale-out, BWAWorker.cpp:97-130)
# ---------------------------------------------------------------------------

_SHARDED_CACHE: dict = {}


def _local_pairhmm(read_t, baseq_t, insq_t, delq_t, gcp_t, rlen_t, hlen_t,
                   hap_t, *, R: int, H: int, params: PairHMMParams,
                   scalar_trans: tuple[int, int, int] | None = None):
    """Per-device kernel body (time-major (rows, B_local) arrays).

    ``scalar_trans`` = (ins_q, del_q, gcp) compile-time phreds routes the
    Pallas path to the lower-VMEM-traffic scalar-transition kernel."""
    if params.backend == "jax":
        return _pairhmm_jax(read_t, baseq_t, insq_t, delq_t, gcp_t,
                            rlen_t, hlen_t, hap_t, R=R, H=H)
    if scalar_trans is not None:
        logp, _ = _pairhmm_device_sc(read_t, baseq_t, rlen_t, hap_t,
                                     hlen_t, params=params,
                                     scalar_trans=scalar_trans)
        return logp
    logp, _ = _pairhmm_device(read_t, baseq_t, insq_t, delq_t, gcp_t,
                              rlen_t, hap_t, hlen_t, params=params)
    return logp


def _pairhmm_unpack(blob, R: int, H: int, flags: tuple[bool, ...],
                    scalars: tuple[int, ...]):
    """Split the fused uint8 input blob into the 8 kernel args.

    Layout (rows): R read codes, H hap codes, one R-row phred plane per
    flags[i]=True member of (base_q, ins_q, del_q, gcp) — scalars ride
    as compile-time constants instead — then 4 rows of LE length bytes.
    """
    off = 0
    read = blob[off:off + R]
    off += R
    hap = blob[off:off + H]
    off += H
    qs = []
    for f, s in zip(flags, scalars):
        if f:
            qs.append(blob[off:off + R])
            off += R
        else:
            qs.append(jnp.full((1, 1), s, jnp.uint8))
    lens = blob[off:off + 4].astype(jnp.int32)
    rlen = (lens[0] | (lens[1] << 8))[None, :]
    hlen = (lens[2] | (lens[3] << 8))[None, :]
    return read, qs[0], qs[1], qs[2], qs[3], rlen, hlen, hap


@functools.partial(jax.jit, static_argnames=("params", "R", "H", "flags",
                                             "scalars"))
def _pairhmm_fused(blob, *, params: PairHMMParams, R: int, H: int,
                   flags: tuple[bool, ...], scalars: tuple[int, ...]):
    """Single-transfer device entry: each host→device buffer pays ~30 ms
    of fixed tunnel latency, so the whole batch ships as ONE uint8 blob."""
    read, baseq, insq, delq, gcpq, rlen, hlen, hap = _pairhmm_unpack(
        blob, R, H, flags, scalars)
    st = None if any(flags[1:]) else tuple(scalars[1:])
    return _local_pairhmm(read, baseq, insq, delq, gcpq, rlen, hlen, hap,
                          R=R, H=H, params=params, scalar_trans=st)


def _pairhmm_sharded_fused(mesh, params: PairHMMParams, R: int, H: int,
                           flags: tuple[bool, ...],
                           scalars: tuple[int, ...]):
    """Fused-blob variant of the shard_map dispatch: the blob shards over
    lanes (axis 1) on every mesh axis; scalar quals are compile-time."""
    key = ("fused", mesh, params, R, H, flags, scalars)
    fn = _SHARDED_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)

    def local(blob):
        read, baseq, insq, delq, gcpq, rlen, hlen, hap = _pairhmm_unpack(
            blob, R, H, flags, scalars)
        st = None if any(flags[1:]) else tuple(scalars[1:])
        return _local_pairhmm(read, baseq, insq, delq, gcpq, rlen, hlen,
                              hap, R=R, H=H, params=params,
                              scalar_trans=st)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(None, axes),), out_specs=P(axes),
        check_vma=False))
    _SHARDED_CACHE[key] = fn
    return fn


def _pairhmm_sharded(mesh, params: PairHMMParams, R: int, H: int,
                     replicated: tuple[bool, ...] = (False,) * 8,
                     scalar_trans: tuple[int, int, int] | None = None):
    """Jit the local kernel under shard_map; batch lanes shard over the
    full fused mesh (every chip scores an independent pair slice).
    ``replicated[i]`` marks args (e.g. (1, 1) scalar qual planes) that
    broadcast to every device instead of sharding over lanes."""
    key = (mesh, params, R, H, replicated, scalar_trans)
    fn = _SHARDED_CACHE.get(key)
    if fn is not None:
        return fn
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)
    spec = P(None, axes)
    in_specs = tuple(P(None, None) if r else spec for r in replicated)

    def local(read_t, baseq_t, insq_t, delq_t, gcp_t, rlen_t, hlen_t,
              hap_t):
        return _local_pairhmm(read_t, baseq_t, insq_t, delq_t, gcp_t,
                              rlen_t, hlen_t, hap_t, R=R, H=H,
                              params=params, scalar_trans=scalar_trans)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(axes),
        check_vma=False))
    _SHARDED_CACHE[key] = fn
    return fn


def pairhmm_logp(read_codes, base_q, ins_q, del_q, gcp, read_lens,
                 hap_codes, hap_lens,
                 params: PairHMMParams | None = None) -> jnp.ndarray:
    """log10 P(read|hap) for a batch of pairs.

    Args are batch-major numpy/JAX arrays: reads (B, R') uint8 codes and
    phred arrays, haps (B, H') codes, plus per-pair lengths. They are padded
    to the static bucket (params.max_read_len/max_hap_len), transposed to
    time-major, and batched to a multiple of 128 lanes.
    """
    if params is None:
        params = PairHMMParams(
            backend="pallas" if jax.default_backend() == "tpu" else "jax")
    MAX_LANES_PER_CALL = 8192
    if read_codes.shape[0] > MAX_LANES_PER_CALL:
        parts = []
        for s in range(0, read_codes.shape[0], MAX_LANES_PER_CALL):
            e = s + MAX_LANES_PER_CALL

            def cut(x):     # scalar qual planes pass through unsliced
                return x[s:e] if getattr(x, "ndim", 0) >= 1 else x

            parts.append(pairhmm_logp(
                read_codes[s:e], cut(base_q), cut(ins_q), cut(del_q),
                cut(gcp), read_lens[s:e], hap_codes[s:e], hap_lens[s:e],
                params))
        return jnp.concatenate(parts)
    B, Rin = read_codes.shape
    Hin = hap_codes.shape[1]
    R = _round_up(max(Rin, 8), 8)
    H = max(Hin, 8)
    if R > params.max_read_len:
        raise ValueError(f"read bucket {R} exceeds {params.max_read_len}")
    if Hin > params.max_hap_len:
        raise ValueError(f"hap bucket {Hin} exceeds {params.max_hap_len}")
    R = params.max_read_len
    H = params.max_hap_len
    from ..parallel.mesh import get_active_mesh
    mesh = get_active_mesh()
    nmesh = mesh.size if mesh is not None else 1
    # power-of-two lane bucket: bounds compile variants to ~log2 shapes;
    # under a mesh the unit is lanes × devices (each shard a full block)
    Bp = (params.lanes if params.backend != "jax" else LANES) * nmesh
    while Bp < B:
        Bp *= 2

    # fused single-transfer input blob (see _pairhmm_unpack for layout):
    # codes and phreds ship as uint8 (1/4 the bytes of int32), scalar
    # indel/gcp quals ride as compile-time constants, and everything
    # crosses the wire in ONE contiguous buffer (each buffer pays ~30 ms
    # of fixed tunnel latency; strided arrays move ~3.5x slower)
    def is_scalar(x):
        return np.isscalar(x) or (isinstance(x, np.ndarray) and x.ndim == 0)

    quals = (base_q, ins_q, del_q, gcp)
    flags = tuple(not is_scalar(x) for x in quals)
    scalars = tuple(0 if f else int(x) for f, x in zip(flags, quals))
    rows = R + H + 4 + sum(flags) * R
    blob = np.empty((rows, Bp), np.uint8)

    def fill(off, x, nrows, fill_val):
        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = x.astype(np.uint8)
        blob[off:off + nrows] = fill_val
        blob[off:off + x.shape[1], :B] = x.T
        return off + nrows

    off = fill(0, read_codes, R, 4)
    off = fill(off, hap_codes, H, 4)
    for f, x in zip(flags, quals):
        if f:
            off = fill(off, x, R, 0)
    blob[off:] = 0
    rl32 = np.asarray(read_lens, np.int32)
    hl32 = np.asarray(hap_lens, np.int32)
    # lengths ride as 16-bit LE bytes; wider values would wrap silently
    if (rl32.size and int(rl32.max()) >= 65536) or \
            (hl32.size and int(hl32.max()) >= 65536):
        raise ValueError("pairhmm_logp: read/hap lengths exceed 16-bit")
    blob[off, :B] = rl32 & 0xFF
    blob[off + 1, :B] = rl32 >> 8
    blob[off + 2, :B] = hl32 & 0xFF
    blob[off + 3, :B] = hl32 >> 8
    # padded lanes: length 1 keeps the kernel's masks well-defined
    blob[off, B:] = 1
    blob[off + 2, B:] = 1

    blob_d = jnp.asarray(blob)
    if mesh is not None:
        logp = _pairhmm_sharded_fused(mesh, params, R, H, flags,
                                      scalars)(blob_d)
    else:
        logp = _pairhmm_fused(blob_d, params=params, R=R, H=H,
                              flags=flags, scalars=scalars)
    return logp[:B]


# ---------------------------------------------------------------------------
# pair-indexed dispatch: unique reads/haps ship once, pairs expand on device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "params", "R", "H", "NRp", "NHp", "Bp", "scalars"))
def _pairhmm_pairs_fused(blob, *, params: PairHMMParams, R: int, H: int,
                         NRp: int, NHp: int, Bp: int,
                         scalars: tuple[int, int, int]):
    """Unpack the pair-indexed blob (see pairhmm_logp_pairs), gather the
    (R, Bp)/(H, Bp) pair tiles on device, and run the kernel."""
    flat = blob.reshape(-1)
    o = 0
    read_tab = flat[o:o + NRp * R].reshape(NRp, R)
    o += NRp * R
    qual_tab = flat[o:o + NRp * R].reshape(NRp, R)
    o += NRp * R
    hap_tab = flat[o:o + NHp * H].reshape(NHp, H)
    o += NHp * H
    rlen_tab = (flat[o:o + NRp].astype(jnp.int32)
                | (flat[o + NRp:o + 2 * NRp].astype(jnp.int32) << 8))
    o += 2 * NRp
    hlen_tab = (flat[o:o + NHp].astype(jnp.int32)
                | (flat[o + NHp:o + 2 * NHp].astype(jnp.int32) << 8))
    o += 2 * NHp
    pr = (flat[o:o + Bp].astype(jnp.int32)
          | (flat[o + Bp:o + 2 * Bp].astype(jnp.int32) << 8))
    o += 2 * Bp
    ph = (flat[o:o + Bp].astype(jnp.int32)
          | (flat[o + Bp:o + 2 * Bp].astype(jnp.int32) << 8))

    read_t = jnp.take(read_tab, pr, axis=0).T      # (R, Bp)
    qual_t = jnp.take(qual_tab, pr, axis=0).T
    hap_t = jnp.take(hap_tab, ph, axis=0).T        # (H, Bp)
    rlen = jnp.take(rlen_tab, pr)[None, :]
    hlen = jnp.take(hlen_tab, ph)[None, :]
    insq = jnp.full((1, 1), scalars[0], jnp.uint8)
    delq = jnp.full((1, 1), scalars[1], jnp.uint8)
    gcpq = jnp.full((1, 1), scalars[2], jnp.uint8)
    return _local_pairhmm(read_t, qual_t, insq, delq, gcpq, rlen, hlen,
                          hap_t, R=R, H=H, params=params,
                          scalar_trans=tuple(int(s) for s in scalars))


def pairhmm_logp_pairs(reads, quals, read_lens, haps, hap_lens,
                       pair_read, pair_hap,
                       ins_q: int, del_q: int, gcp: int,
                       params: PairHMMParams | None = None) -> np.ndarray:
    """log10 P(read|hap) for pairs given as (read index, hap index).

    HaplotypeCaller batches are cross products (every read × every hap
    per region): shipping per-pair read/hap copies re-sends each read
    n_hap× and each hap n_read× over the host→device wire.  Here the
    UNIQUE reads/quals/haps ship once in a single fused buffer with the
    per-pair (read, hap) index arrays, and the (R, B)/(H, B) pair tiles
    are gathered on device — ~5× less wire for typical HTC shapes.

    reads (NR, R') u8 codes, quals (NR, R') u8 phreds, haps (NH, H') u8,
    read_lens (NR,), hap_lens (NH,), pair_read/pair_hap (B,) int;
    ins_q/del_q/gcp are scalars (compile-time).  B must be ≤ 8192 —
    callers chunk by region groups so each chunk's tables stay local.
    Under a multi-chip mesh this falls back to the sharded per-pair
    path (the index tables cannot shard over lanes).
    """
    if params is None:
        params = PairHMMParams(
            backend="pallas" if jax.default_backend() == "tpu" else "jax")
    B = len(pair_read)
    if B == 0:
        return np.zeros(0, np.float32)
    from ..parallel.mesh import get_active_mesh
    if get_active_mesh() is not None:
        pr = np.asarray(pair_read)
        ph = np.asarray(pair_hap)
        return np.asarray(pairhmm_logp(
            reads[pr], quals[pr], ins_q, del_q, gcp,
            np.asarray(read_lens)[pr], haps[ph],
            np.asarray(hap_lens)[ph], params))

    NR, Rin = reads.shape
    NH, Hin = haps.shape
    R = params.max_read_len
    H = params.max_hap_len
    if _round_up(max(Rin, 8), 8) > R or Hin > H:
        raise ValueError("input exceeds PairHMM bucket shape")
    lanes = params.lanes if params.backend != "jax" else LANES

    def pow2(n, lo):
        p = lo
        while p < n:
            p *= 2
        return p

    NRp = pow2(NR, 8)
    NHp = pow2(NH, 8)
    Bp = pow2(B, lanes)
    if B > 8192:
        raise ValueError("pairhmm_logp_pairs: chunk pairs to <= 8192")
    # indices and lengths ride the wire as 16-bit LE bytes — anything
    # wider would silently wrap to a wrong table row / length
    if NRp >= 65536 or NHp >= 65536:
        raise ValueError("pairhmm_logp_pairs: read/hap tables exceed "
                         "16-bit index range")

    def pad_tab(x, np_, cols, fill):
        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = x.astype(np.uint8)
        out = np.full((np_, cols), fill, np.uint8)
        out[:x.shape[0], :x.shape[1]] = x
        return out.reshape(-1)

    def pad_lens16(x, np_):
        v = np.ones(np_, np.int32)
        v[:len(x)] = np.asarray(x, np.int32)
        return np.concatenate([(v & 0xFF).astype(np.uint8),
                               (v >> 8).astype(np.uint8)])

    def pad_idx16(x):
        v = np.zeros(Bp, np.int32)
        v[:B] = np.asarray(x, np.int32)
        return np.concatenate([(v & 0xFF).astype(np.uint8),
                               (v >> 8).astype(np.uint8)])

    flat = np.concatenate([
        pad_tab(reads, NRp, R, 4), pad_tab(quals, NRp, R, 0),
        pad_tab(haps, NHp, H, 4),
        pad_lens16(read_lens, NRp), pad_lens16(hap_lens, NHp),
        pad_idx16(pair_read), pad_idx16(pair_hap)])
    rows = (len(flat) + Bp - 1) // Bp
    blob = np.zeros(rows * Bp, np.uint8)
    blob[:len(flat)] = flat
    logp = _pairhmm_pairs_fused(
        jnp.asarray(blob.reshape(rows, Bp)), params=params, R=R, H=H,
        NRp=NRp, NHp=NHp, Bp=Bp,
        scalars=(int(ins_q), int(del_q), int(gcp)))
    return np.asarray(logp[:B])

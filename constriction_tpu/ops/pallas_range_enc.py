"""Pallas TPU encoder for ILANS2-R (shared-stream interleaved range coding).

Range encoding's deferred-carry machinery (queue.rs:126-142, 647-702 — the
`Inverted` run bookkeeping) is sequential within a lane, which is why the
encoder previously ran on the host (codec.cpp).  The TPU formulation uses
the classical equivalence: the Inverted-run scheme IS big-number arithmetic
— each emitted word is a base-2^W digit of an infinite-precision `lower`,
and a wrap during an interval update adds +1 to the already-emitted digit
prefix (rippling backward through 0xFFFF digits).  That makes a two-phase
pipeline possible:

Phase A (forward kernel over steps): per lane, run the interval updates and
record, per step, the provisional renorm word, the renorm mask, and the
carry (wrap) flag — pure vector math, one packed u32 record per (step,
lane).  Outputs the final (lower, range) per lane for sealing.

Phase B (reverse kernel over steps): resolve carries with a pending-+1
scan processed backward in time (at an emission: word += pending, pending =
overflow; then pending += this step's carry flag), and place words into the
shared stream.  The ILANS2-R container maps the r-th renorm of a lane to
the lane's word-list entry r + 2 (the first two words form the decoder's
initial `point` header, queue.rs:847-868), which in reverse order is a
2-deep delay line: place the word resolved two emissions later, seeded from
the lane's seal words.  Stream slots are step-major / lane-ascending — the
standard right-to-left emission machinery (pallas_coder._emit_words).

Sealing (queue.rs:458-523) is closed-form per lane from the final
(lower, range): point = lower + (2^(S-W) - 1) (its wrap is one more carry
event), the emitted word is point >> (S-W), plus a literal zero word when
the upper bound shares that top word — and a zero word equals the zero
padding used for absent entries, which is why the delay line can seed its
second slot with 0 unconditionally.

Bit-exactness: output (points header + stream) equals codec.cpp's
ctpu_ilans2_range_encode verbatim (tested).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interleaved import LaneConfig
from .pallas_coder import (
    LANES,
    _cum_prob_from_sym,
    _emit_words,
    _lane_iota,
    _row_iota,
)


def _range_record_kernel(pltpu, pl, *, cdf, cfg: LaneConfig, T: int,
                         tail: int, R: int):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    lower_bound = np.uint32(1 << (S - W))

    def kernel(syms_in, rec_out, low_out, rng_out, lows_s, rngs_s):
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            lows_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            rngs_s[:] = jnp.full((R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32)

        lows, rngs = lows_s[:], rngs_s[:]
        sym = syms_in[0]
        cum, prob = _cum_prob_from_sym(sym, cdf, P)

        scale = rngs >> P
        new_rngs = scale * prob
        add = scale * cum
        new_lows = lows + add
        carry = jnp.where(new_lows < add, np.uint32(1), np.uint32(0))

        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            new_lows = jnp.where(active, new_lows, lows)
            new_rngs = jnp.where(active, new_rngs, rngs)
            carry = jnp.where(active, carry, np.uint32(0))

        m = new_rngs < lower_bound
        w = jnp.where(m, new_lows >> (S - W), np.uint32(0))
        rec_out[0] = w | (jnp.where(m, np.uint32(1), np.uint32(0)) << 16) | (carry << 17)

        lows_s[:] = jnp.where(m, new_lows << W, new_lows)
        rngs_s[:] = jnp.where(m, new_rngs << W, new_rngs)

        @pl.when(t == T - 1)
        def _final():
            low_out[:] = lows_s[:]
            rng_out[:] = rngs_s[:]

    return kernel


def _range_resolve_kernel(pltpu, pl, *, T: int, R: int, cap_rows: int):
    def kernel(rec_in, d1_init, p_init, stream_out, hdr_out, end_out,
               p_s, d1_s, d2_s, img, arow_s, sem):
        t = pl.program_id(0)  # processes encode step T-1-t (reversed blocks)

        @pl.when(t == 0)
        def _init():
            p_s[:] = p_init[:]
            d1_s[:] = d1_init[:]
            d2_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        rec = rec_in[0]
        w = rec & np.uint32(0xFFFF)
        m = ((rec >> 16) & 1) != 0
        c = (rec >> 17) & 1

        p, d1, d2 = p_s[:], d1_s[:], d2_s[:]
        vfull = w + p
        placed = d2  # the word resolved two emissions later fills this slot
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=m, vals=jnp.where(m, placed, np.uint32(0)),
            t=t, T=T, R=R,
        )
        p_s[:] = jnp.where(m, vfull >> 16, p) + c
        d2_s[:] = jnp.where(m, d1, d2)
        d1_s[:] = jnp.where(m, vfull & np.uint32(0xFFFF), d1)

        @pl.when(t == T - 1)
        def _final():
            # header = first two resolved words of each lane's sequence
            hdr_out[:] = (d1_s[:] << 16) | d2_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


@functools.lru_cache(maxsize=16)
def _build_range_recorder(cdf_tuple, cfg: LaneConfig, T, tail, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _range_record_kernel(pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_range_resolver(T, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _range_resolve_kernel(pltpu, pl, T=T, R=R, cap_rows=cap_rows)
    RPAD = -(-(R + 1) // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def seal32(xp, low_f, rng_f, S: int, W: int):
    """(s0, seal_carry) from the 32-bit recorder's final (lower, range)
    planes: point = lower + (2^(S-W) - 1) with u32 wrap; a wrap is the
    seal's big-number +1 event.  Untouched lanes (range still all-ones,
    i.e. no symbol encoded) seal to zero.  ``xp`` is numpy or jax.numpy —
    the ONLY implementation of this rule (host and device paths share it)."""
    touched = rng_f != xp.uint32(0xFFFFFFFF)
    point = low_f + xp.uint32((1 << (S - W)) - 1)
    seal_carry = xp.where(
        touched & (point < low_f), xp.uint32(1), xp.uint32(0)
    )
    s0 = xp.where(touched, point >> (S - W), xp.uint32(0))
    return s0, seal_carry


def seal64_limbs(xp, lhi, llo, rhi, rlo):
    """(s0, seal_carry) for the 64-bit encoder from u32 (lower, range) limb
    planes (S=64, W=32): point = lower + (2^32 - 1), the low-limb wrap
    carries into the high limb, and a high-limb wrap is the seal's
    big-number +1 event.  ``xp`` is numpy or jax.numpy — the ONLY
    implementation of this rule (host, container, and bench paths share
    it)."""
    touched = (rlo != xp.uint32(0xFFFFFFFF)) | (rhi != xp.uint32(0xFFFFFFFF))
    plus = llo + xp.uint32(0xFFFFFFFF)
    p_hi = lhi + xp.where(plus < llo, xp.uint32(1), xp.uint32(0))
    s0 = xp.where(touched, p_hi, xp.uint32(0))
    seal_carry = xp.where(
        touched & (p_hi < lhi), xp.uint32(1), xp.uint32(0)
    )
    return s0, seal_carry


def encode_iid_range_pallas(
    symbols,
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode i.i.d. categorical symbols into the ILANS2-R format on TPU.

    Returns ``(points u32[L], stream u32[num_words])``, bit-exact with the
    host C++ encoder (native.ctpu_ilans2_range_encode).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    # P <= 16: the encode-side packed accumulator carries (cum << P) | prob
    # in 2P <= 32 bits, both fields genuine sub-2^P interval values at every
    # partial sum.
    assert L % LANES == 0 and (S, W) == (32, 16) and P <= 16
    symbols = np.asarray(symbols, dtype=np.int64)
    n = len(symbols)
    T = -(-n // L) if n else 0
    if T == 0:
        return np.zeros(L, np.uint32), np.zeros(0, np.uint32)
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = T * R + 1

    syms3d = jnp.concatenate(
        [jnp.asarray(symbols, jnp.int32), jnp.zeros(T * L - n, jnp.int32)]
    ).reshape(T, R, LANES)
    rec_fn = _build_range_recorder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )
    records, low_f, rng_f = rec_fn(syms3d)

    # --- seal per lane (closed-form, host vector math) ----------------------
    s0, seal_carry = seal32(
        np,
        np.asarray(low_f).reshape(-1).astype(np.uint32),
        np.asarray(rng_f).reshape(-1).astype(np.uint32),
        S, W,
    )
    # (the optional disambiguation word after s0 is a literal zero, which is
    # identical to the zero-fill for absent entries: no explicit handling)

    res_fn = _build_range_resolver(T, L, interpret)
    stream_buf, hdr, end = res_fn(
        records,
        jnp.asarray(s0, jnp.uint32).reshape(R, LANES),
        jnp.asarray(seal_carry, jnp.uint32).reshape(R, LANES),
    )
    e = int(end[0])
    stream = np.asarray(stream_buf).reshape(-1)[e : cap_rows * LANES]
    points = np.asarray(hdr).reshape(-1)
    return points, stream


# ---------------------------------------------------------------------------
# ILANS2-R64: the DEFAULT preset (W=32 / S=64 / P <= 24) encoder on device.
# Same two-phase big-number formulation as above at doubled widths: lane
# (lower, range) are u32 pairs (pallas_coder64's pair/limb algebra), the
# provisional renorm word is the full high u32 of the updated lower, and the
# carry record is the pair-add wrap.  Phase B is word-width-generic: the
# pending-+1 ripple works on u32 digits with wrap detection instead of a
# >> 16 overflow field, and the two-word point header comes out as separate
# (hi, lo) planes (the container stores S/W = 2 words per lane either way).
# Bit-exact with the width-generic host C++ encoder
# (codec.cpp ctpu_ilans2_range_encode; per-lane algebra queue.rs:637-702).
# ---------------------------------------------------------------------------


def _range_record_kernel64(pltpu, pl, *, cdf, cfg: LaneConfig, T: int,
                           tail: int, R: int):
    from .pallas_coder64 import _mul40x25

    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert (S, W) == (64, 32) and P <= 24
    L = R * LANES

    def kernel(syms_in, rec_out, flg_out, lhi_out, llo_out, rhi_out, rlo_out,
               lhi_s, llo_s, rhi_s, rlo_s):
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            lhi_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            llo_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            rhi_s[:] = jnp.full((R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32)
            rlo_s[:] = jnp.full((R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32)

        lhi, llo = lhi_s[:], llo_s[:]
        rhi, rlo = rhi_s[:], rlo_s[:]
        sym = syms_in[0]
        cum, prob = _cum_prob_from_sym(sym, cdf, P)

        # scale = range >> P (< 2^(64-P) <= 2^40); products via 16-bit limbs
        s_lo = (rhi << (32 - P)) | (rlo >> P)
        s_hi = rhi >> P
        nr_hi, nr_lo = _mul40x25(s_hi, s_lo, prob.astype(jnp.uint32))
        a_hi, a_lo = _mul40x25(s_hi, s_lo, cum.astype(jnp.uint32))
        # lower += scale*cum with carry-out (the big-number +1 event)
        nl_lo = llo + a_lo
        c1 = jnp.where(nl_lo < a_lo, np.uint32(1), np.uint32(0))
        hi_sum = lhi + a_hi
        c2a = hi_sum < lhi
        nl_hi = hi_sum + c1
        c2b = jnp.logical_and(nl_hi < hi_sum, c1 != 0)
        carry = jnp.where(jnp.logical_or(c2a, c2b), np.uint32(1), np.uint32(0))

        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            nl_hi = jnp.where(active, nl_hi, lhi)
            nl_lo = jnp.where(active, nl_lo, llo)
            nr_hi = jnp.where(active, nr_hi, rhi)
            nr_lo = jnp.where(active, nr_lo, rlo)
            carry = jnp.where(active, carry, np.uint32(0))

        # renorm: range < 2^(S-W) = 2^32 <=> hi limb == 0
        m = nr_hi == 0
        rec_out[0] = jnp.where(m, nl_hi, np.uint32(0))
        flg_out[0] = jnp.where(m, np.uint32(1), np.uint32(0)) | (carry << 1)

        lhi_s[:] = jnp.where(m, nl_lo, nl_hi)
        llo_s[:] = jnp.where(m, np.uint32(0), nl_lo)
        rhi_s[:] = jnp.where(m, nr_lo, nr_hi)
        rlo_s[:] = jnp.where(m, np.uint32(0), nr_lo)

        @pl.when(t == T - 1)
        def _final():
            lhi_out[:] = lhi_s[:]
            llo_out[:] = llo_s[:]
            rhi_out[:] = rhi_s[:]
            rlo_out[:] = rlo_s[:]

    return kernel


def _range_resolve_kernel64(pltpu, pl, *, T: int, R: int, cap_rows: int):
    def kernel(rec_in, flg_in, d1_init, p_init, stream_out, hdr_hi_out,
               hdr_lo_out, end_out, p_s, d1_s, d2_s, img, arow_s, sem):
        t = pl.program_id(0)  # processes encode step T-1-t (reversed blocks)

        @pl.when(t == 0)
        def _init():
            p_s[:] = p_init[:]
            d1_s[:] = d1_init[:]
            d2_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        w = rec_in[0]
        flg = flg_in[0]
        m = (flg & 1) != 0
        c = flg >> 1

        p, d1, d2 = p_s[:], d1_s[:], d2_s[:]
        vfull = w + p
        ovf = jnp.where(vfull < w, np.uint32(1), np.uint32(0))  # u32 wrap
        placed = d2  # the word resolved two emissions later fills this slot
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=m, vals=jnp.where(m, placed, np.uint32(0)),
            t=t, T=T, R=R,
        )
        p_s[:] = jnp.where(m, ovf, p) + c
        d2_s[:] = jnp.where(m, d1, d2)
        d1_s[:] = jnp.where(m, vfull, d1)

        @pl.when(t == T - 1)
        def _final():
            # point header = first two resolved words of each lane
            hdr_hi_out[:] = d1_s[:]
            hdr_lo_out[:] = d2_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


@functools.lru_cache(maxsize=16)
def _build_range_recorder64(cdf_tuple, cfg: LaneConfig, T, tail, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _range_record_kernel64(
        pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R
    )
    plane = pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            plane, plane, plane, plane,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_range_resolver64(T, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _range_resolve_kernel64(pltpu, pl, T=T, R=R, cap_rows=cap_rows)
    RPAD = -(-(R + 1) // 8) * 8
    plane = pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            plane, plane,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            plane, plane,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def encode_iid_range64_pallas(
    symbols,
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode i.i.d. categorical symbols into ILANS2-R64 (DEFAULT preset
    range coding, W=32/S=64/P<=24) on TPU.

    Returns ``(points u64[L], stream u32[num_words])``, bit-exact with the
    host C++ encoder (native.ctpu_ilans2_range_encode at the wide sizes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert L % LANES == 0 and (S, W) == (64, 32) and P <= 24
    symbols = np.asarray(symbols, dtype=np.int64)
    n = len(symbols)
    T = -(-n // L) if n else 0
    if T == 0:
        return np.zeros(L, np.uint64), np.zeros(0, np.uint32)
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = T * R + 1

    syms3d = jnp.concatenate(
        [jnp.asarray(symbols, jnp.int32), jnp.zeros(T * L - n, jnp.int32)]
    ).reshape(T, R, LANES)
    rec_fn = _build_range_recorder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )
    records, flags, lhi_f, llo_f, rhi_f, rlo_f = rec_fn(syms3d)

    # --- seal per lane (closed-form, host vector math) ----------------------
    s0, seal_carry = seal64_limbs(
        np,
        np.asarray(lhi_f).reshape(-1).astype(np.uint32),
        np.asarray(llo_f).reshape(-1).astype(np.uint32),
        np.asarray(rhi_f).reshape(-1).astype(np.uint32),
        np.asarray(rlo_f).reshape(-1).astype(np.uint32),
    )

    res_fn = _build_range_resolver64(T, L, interpret)
    stream_buf, hdr_hi, hdr_lo, end = res_fn(
        records, flags,
        jnp.asarray(s0, jnp.uint32).reshape(R, LANES),
        jnp.asarray(seal_carry, jnp.uint32).reshape(R, LANES),
    )
    e = int(end[0])
    stream = np.asarray(stream_buf).reshape(-1)[e : cap_rows * LANES]
    points = np.asarray(hdr_lo).reshape(-1).astype(np.uint64) | (
        np.asarray(hdr_hi).reshape(-1).astype(np.uint64) << np.uint64(32)
    )
    return points, stream

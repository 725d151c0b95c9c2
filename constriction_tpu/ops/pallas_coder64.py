"""ILANS2-64: the reference DEFAULT preset (W=32, S=64, P<=24) on device.

The flagship Pallas kernels (ops/pallas_coder.py) run the ILANS2 format at
W=16/S=32 with u32 lane states -- the natural register width of the TPU
VPU, covering precisions P <= 16 (the reference's "small"-preset family,
/root/reference/src/stream/mod.rs:184-276).  This module extends the device
path to the reference's DEFAULT preset sizes -- 32-bit stream words, 64-bit
lane states, precision up to 24 (stack.rs:139: ``DefaultAnsCoder`` =
AnsCoder<u32, u64>) -- so default-preset model tables (P=24 fixed-point
CDFs, the quantization constriction's Python API pins) code on-device with
the exact same integer algebra as the reference (stack.rs:1035-1096).

The TPU has no 64-bit integer registers, so a lane state lives in two u32
tiles ``(hi, lo)``; state = hi * 2^32 + lo:

- decode ``state = (state >> P) * prob + (q - cum)``: the 40-bit shifted
  state times the <= 25-bit probability is a 16-bit-limb schoolbook product
  (4 partial products + carry assembly, exact in u32);
- decode renormalization is trivial: ``state < 2^(S-W) = 2^32`` is just
  ``hi == 0``, and the refill ``state = state << 32 | word`` is two vector
  selects (hi <- lo, lo <- word) -- no shifts at all;
- encode ``state // prob`` (quotient < 2^(S-P) = 2^40) is a 4-digit
  base-2^16 long division: each digit is estimated with one f32
  multiply-by-reciprocal and corrected exactly in wrapping u32 arithmetic.
  Exactness: with partial remainder r < prob, the step value
  C = r * 2^16 + limb is < prob * 2^16, so the f32 image of C (r exact in
  f32 since r < 2^24; r*2^16 an exact exponent shift; one rounding on the
  +limb) carries absolute error < prob * 2^-8, giving a digit estimate
  within 2^-8 + 2^-6 < 1/2 of the true digit regardless of prob; a single
  +-1 correction on the wrapped integer remainder (|r| < 2^25 fits int32)
  recovers the exact floor.

Everything else -- the shared-stream window DMA, the monotone butterfly
distribution of refill words, the right-to-left emission image merging, and
the model inversion forms (which are u32-native since q < 2^P <= 2^24) --
is reused from ops/pallas_coder.py unchanged.

Oracle: ops/interleaved2.{encode_shared, decode_shared_cdf} at
``LaneConfig(word_bits=32, state_bits=64, precision=24)`` (the numpy paths
are width-generic); both directions here are bit-exact against it.
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
    _compare_sum_auto,
    _cum_prob_from_sym,
    _emit_words,
    _init_stream_window,
    _lane_iota,
    _pad_stream2d,
    _refill_words,
    _row_iota,
    _u32_to_f32,
    inversion_keyed_cache,
)


def _mul40x25(sh_hi: jax.Array, sh_lo: jax.Array, b: jax.Array):
    """(hi, lo) = (sh_hi * 2^32 + sh_lo) * b for b <= 2^25, product < 2^64.

    16-bit-limb schoolbook product of the low word plus the high word's
    single in-range partial; all partials and carries fit u32 exactly.
    """
    a0 = sh_lo & np.uint32(0xFFFF)
    a1 = sh_lo >> 16
    b0 = b & np.uint32(0xFFFF)
    b1 = b >> 16  # <= 2^9
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & np.uint32(0xFFFF)) + (p10 & np.uint32(0xFFFF))
    lo = (p00 & np.uint32(0xFFFF)) | (mid << 16)
    hi = (mid >> 16) + (p01 >> 16) + (p10 >> 16) + p11 + sh_hi * b
    return hi, lo


def _div64(hi: jax.Array, lo: jax.Array, prob: jax.Array):
    """Exact (q_hi, q_lo, rem) of (hi * 2^32 + lo) / prob, prob in
    [1, 2^24].  4-digit base-2^16 long division; see module docstring for
    the exactness argument."""
    prob_f = prob.astype(jnp.int32).astype(jnp.float32)
    recip = np.float32(1.0) / prob_f
    prob_i = prob.astype(jnp.int32)

    r = jnp.zeros(hi.shape, jnp.uint32)
    r_f = jnp.zeros(hi.shape, jnp.float32)
    q_hi = jnp.zeros(hi.shape, jnp.uint32)
    q_lo = jnp.zeros(hi.shape, jnp.uint32)
    limbs = (hi >> 16, hi & np.uint32(0xFFFF), lo >> 16, lo & np.uint32(0xFFFF))
    for limb in limbs:
        limb_f = limb.astype(jnp.int32).astype(jnp.float32)
        c_f = r_f * np.float32(65536.0) + limb_f
        d = (c_f * recip).astype(jnp.int32)
        # exact wrapped remainder: true value in (-2^25, 2^25)
        rw = (((r << 16) | limb) - d.astype(jnp.uint32) * prob).astype(jnp.int32)
        neg = rw < 0
        d = d - jnp.where(neg, 1, 0)
        rw = rw + jnp.where(neg, prob_i, 0)
        ovr = rw >= prob_i
        d = d + jnp.where(ovr, 1, 0)
        rw = rw - jnp.where(ovr, prob_i, 0)
        r = rw.astype(jnp.uint32)
        r_f = rw.astype(jnp.float32)
        q_hi = (q_hi << 16) | (q_lo >> 16)
        q_lo = (q_lo << 16) | d.astype(jnp.uint32)
    return q_hi, q_lo, r


def _decode_kernel_body64(pltpu, pl, *, cdf, cfg: LaneConfig, T: int,
                          tail: int, R: int):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert S == 64 and W == 32 and P <= 24
    L = R * LANES
    qmask = np.uint32((1 << P) - 1)

    def kernel(hi_in, lo_in, stream_hbm, syms_out, hi_out, lo_out,
               hi_s, lo_s, win, base_s, sem):
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            hi_s[:] = hi_in[:]
            lo_s[:] = lo_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        hi = hi_s[:]
        lo = lo_s[:]

        # reference rANS decode algebra (stack.rs:1086-1096) on (hi, lo)
        q = lo & qmask
        sym, cum, prob = _compare_sum_auto(q, cdf, P)
        sh_lo = (hi << (32 - P)) | (lo >> P)
        sh_hi = hi >> P
        nhi, nlo = _mul40x25(sh_hi, sh_lo, prob.astype(jnp.uint32))
        qc = (q - cum.astype(jnp.uint32))
        nlo = nlo + qc
        nhi = nhi + jnp.where(nlo < qc, np.uint32(1), np.uint32(0))
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            nhi = jnp.where(active, nhi, hi)
            nlo = jnp.where(active, nlo, lo)

        # renorm: state < 2^32  <=>  hi == 0; state = state << 32 | word
        m = nhi == 0
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        hi_s[:] = jnp.where(m, nlo, nhi)
        lo_s[:] = jnp.where(m, ex, nlo)
        base_s[0] = nxt
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            hi_out[:] = hi_s[:]
            lo_out[:] = lo_s[:]

    return kernel


@inversion_keyed_cache(maxsize=32)
def _build_decoder64(cdf_tuple, cfg: LaneConfig, T: int, tail: int, L: int,
                     interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _decode_kernel_body64(
        pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R
    )

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stream stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),         # state hi
            pltpu.VMEM((R, LANES), jnp.uint32),         # state lo
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),  # stream windows
            pltpu.SMEM((1,), jnp.int32),                # base word offset
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def decode_shared64_pallas(
    init_states,
    stream,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_symbols: int,
    interpret: bool | None = None,
    return_final_states: bool = False,
) -> jax.Array:
    """Decode a default-preset ILANS2-64 container on TPU; bit-exact with
    ops/interleaved2.decode_shared_cdf.  ``init_states`` is u64[L].

    ``return_final_states=True`` returns ``(symbols, final_states u64[L])``
    (after a full decode these equal the encoder's seeds; the v2 framing's
    payload recovery, ops/framing.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0, "num_lanes must be a multiple of 128"
    assert cfg.state_bits == 64 and cfg.word_bits == 32 and cfg.precision <= 24
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        empty = jnp.zeros((0,), jnp.int32)
        if return_final_states:
            return empty, np.asarray(init_states, np.uint64).reshape(-1)
        return empty
    tail = num_symbols - (T - 1) * L
    R = L // LANES

    st = np.asarray(init_states, dtype=np.uint64)
    hi = (st >> np.uint64(32)).astype(np.uint32).reshape(R, LANES)
    lo = (st & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(R, LANES)
    stream2d = _pad_stream2d(stream, R)

    fn = _build_decoder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret,
    )
    syms, fhi, flo = fn(jnp.asarray(hi), jnp.asarray(lo), stream2d)
    if return_final_states:
        fin = (
            np.asarray(fhi, np.uint64).reshape(-1) << np.uint64(32)
        ) | np.asarray(flo, np.uint64).reshape(-1)
        return syms.reshape(-1)[:num_symbols], fin
    return syms.reshape(-1)[:num_symbols]


def _encode_kernel_body64(pltpu, pl, *, table_src, n_inputs: int,
                          cfg: LaneConfig, T: int, tail: int, R: int,
                          cap_rows: int, seeded: bool = False):
    """S=64 ILANS2 encode kernel body.  ``table_src(input_refs)`` supplies
    the per-lane u32 ``(cum, prob)`` for this step -- from a symbol tile +
    host CDF here, or from precomputed exact-family planes
    (ops/exact_family.py); the coding algebra is written ONCE.

    ``seeded=True`` appends two [R, 128] u32 inputs (seed hi, seed lo)
    after the table inputs: per-lane encoder START states in
    [2^(S-W), 2^S) instead of the 2^32 floor (the v2 framing's payload
    carrier, ops/framing.py)."""
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert S == 64 and W == 32 and P <= 24
    L = R * LANES
    n_all = n_inputs + (2 if seeded else 0)

    def kernel(*refs):
        ins = refs[:n_inputs]
        (stream_out, hi_out, lo_out, end_out,
         hi_s, lo_s, img, arow_s, sem) = refs[n_all:]
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            if seeded:
                hi_s[:] = refs[n_inputs][:]
                lo_s[:] = refs[n_inputs + 1][:]
            else:
                hi_s[:] = jnp.ones((R, LANES), jnp.uint32)   # seed 2^32
                lo_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        hi = hi_s[:]
        lo = lo_s[:]
        cum, probu = table_src(ins)

        if tail < L:
            active = jnp.logical_or(t > 0, lane_flat < tail)
        else:
            active = None

        # renorm check (stack.rs:1035-1040): state >> (S-P) >= prob.
        # S - P >= 32 so the shift reads hi only.
        renorm = (hi >> (S - P - 32)) >= probu
        if active is not None:
            renorm = jnp.logical_and(renorm, active)
        vals = jnp.where(renorm, lo, np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=renorm, vals=vals, t=t, T=T, R=R,
        )

        # state >>= 32 on renorm lanes
        shi = jnp.where(renorm, np.uint32(0), hi)
        slo = jnp.where(renorm, hi, lo)

        # state = (state / prob) << P | (cum + state % prob)
        q_hi, q_lo, rem = _div64(shi, slo, probu)
        low = cum + rem.astype(jnp.uint32)
        nlo = (q_lo << P) | low
        nhi = (q_hi << P) | (q_lo >> (32 - P))
        if active is not None:
            nhi = jnp.where(active, nhi, shi)
            nlo = jnp.where(active, nlo, slo)
        hi_s[:] = nhi
        lo_s[:] = nlo

        @pl.when(t == T - 1)
        def _final():
            hi_out[:] = hi_s[:]
            lo_out[:] = lo_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


@functools.lru_cache(maxsize=32)
def _build_encoder64(cdf_tuple, cfg: LaneConfig, T: int, tail: int, L: int,
                     cap_rows: int, interpret: bool, seeded: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    def _cdf_src(ins):
        cum, prob = _cum_prob_from_sym(ins[0][0], cdf, cfg.precision)
        return cum.astype(jnp.uint32), prob.astype(jnp.uint32)

    kernel = _encode_kernel_body64(
        pltpu, pl, table_src=_cdf_src, n_inputs=1, cfg=cfg, T=T, tail=tail,
        R=R, cap_rows=cap_rows, seeded=seeded,
    )

    in_specs = [
        pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if seeded:
        in_specs += [
            pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stream buffer in HBM
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),        # state hi
            pltpu.VMEM((R, LANES), jnp.uint32),        # state lo
            pltpu.VMEM((2, -(-(R + 1) // 8) * 8, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),               # e, a_prev
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def encode_iid64_pallas(
    symbols,
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: bool | None = None,
    seeds: np.ndarray | None = None,
) -> Tuple[np.ndarray, jax.Array]:
    """Encode i.i.d. categorical symbols into the default-preset ILANS2-64
    format on TPU.  Bit-exact with ops/interleaved2.encode_shared:
    returns ``(init_states u64[L], stream u32[num_words])``.

    ``seeds`` (u64[L], each in [2^32, 2^64)) sets per-lane encoder start
    states -- the v2 framing's recoverable payload carrier (ops/framing.py);
    default is the 2^32 floor."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    assert cfg.state_bits == 64 and cfg.word_bits == 32 and cfg.precision <= 24
    symbols = jnp.asarray(symbols, dtype=jnp.int32)
    n = int(symbols.shape[0])
    T = -(-n // L) if n else 0
    if T == 0:
        if seeds is not None:
            return np.asarray(seeds, np.uint64).copy(), jnp.zeros(
                (0,), jnp.uint32
            )
        seed = np.full(L, 1 << 32, dtype=np.uint64)
        return seed, jnp.zeros((0,), jnp.uint32)
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = -(-(T * L) // LANES) + 1  # worst case one word/lane/step

    syms3d = jnp.concatenate(
        [symbols, jnp.zeros(T * L - n, jnp.int32)]
    ).reshape(T, R, LANES)
    fn = _build_encoder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, cap_rows,
        interpret, seeded=seeds is not None,
    )
    if seeds is not None:
        sd = np.asarray(seeds, dtype=np.uint64).reshape(-1)
        shi = jnp.asarray(
            (sd >> np.uint64(32)).astype(np.uint32).reshape(R, LANES)
        )
        slo = jnp.asarray(
            (sd & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(R, LANES)
        )
        stream_buf, hi, lo, end = fn(syms3d, shi, slo)
    else:
        stream_buf, hi, lo, end = fn(syms3d)
    e = int(end[0])
    states = (
        np.asarray(hi, dtype=np.uint64).reshape(-1) << np.uint64(32)
    ) | np.asarray(lo, dtype=np.uint64).reshape(-1)
    return states, stream_buf.reshape(-1)[e : cap_rows * LANES]


# ---------------------------------------------------------------------------
# ILANS2-R64: default-preset range coding (queue semantics) on device.
# Reference per-lane algebra: queue.rs:968-1035 with W=32/S=64/P<=24
# (DefaultRangeDecoder sizes, queue.rs:747).  State is three u32 pairs
# (lower, range, point); the quantile division (point - lower) / scale has a
# 40-bit divisor and is computed by the same 4-digit base-2^16 long division
# as _div64, with the divisor held as a pair and the digit products going
# through _mul40x25.  The digit estimate stays exact-with-+-1-correction for
# ANY scale because every f32 error involved is RELATIVE (see _div64); the
# remainder is corrected in wrapping pair arithmetic (|true value| < 2^40).
# ---------------------------------------------------------------------------


def _pair_sub(ahi, alo, bhi, blo):
    """(a - b) mod 2^64 on u32 pairs."""
    lo = alo - blo
    borrow = jnp.where(alo < blo, np.uint32(1), np.uint32(0))
    hi = ahi - bhi - borrow
    return hi, lo


def _pair_add(ahi, alo, bhi, blo):
    """(a + b) mod 2^64 on u32 pairs."""
    lo = alo + blo
    carry = jnp.where(lo < blo, np.uint32(1), np.uint32(0))
    hi = ahi + bhi + carry
    return hi, lo


def _div64_by_scale(d_hi, d_lo, s_hi, s_lo):
    """floor((d_hi*2^32 + d_lo) / s) for a pair divisor s < 2^40, s >= 1,
    specialized to quotients < 2^32 (the range decoder's quantile: valid
    data has q < 2^P <= 2^24).

    Returns ``(q_lo u32, q_ovr bool)``: the quotient and whether the true
    quotient has bits above 2^32 (possible only on garbage input; the
    invalid-data flag consumes it, and ``q_lo`` is then unspecified).

    The quotient digits at weights 2^48 and 2^32 are zero whenever the
    quotient fits 32 bits, so the top two base-2^16 digit steps collapse to
    remainder checks: r after them is just the top 32 dividend bits, with
    ``q_ovr`` raised if that value is not already reduced mod s.  Two full
    digit steps then produce the 32-bit quotient; each estimates the digit
    with one f32 multiply-by-reciprocal (every f32 error involved is
    RELATIVE, so the estimate is within 1/4 of the true digit for ANY
    scale) and corrects the wrapping pair remainder by +-1."""
    s_f = (
        s_hi.astype(jnp.int32).astype(jnp.float32) * np.float32(4294967296.0)
        + _u32_to_f32(s_lo)
    )
    recip = np.float32(1.0) / s_f

    # top two digit steps: their quotient digits are zero iff the top 32
    # dividend bits are already reduced mod s (exactly q < 2^32)
    q_ovr = jnp.logical_and(s_hi == 0, d_hi >= s_lo)
    r_hi = jnp.zeros(d_hi.shape, jnp.uint32)
    r_lo = d_hi
    r_f = _u32_to_f32(d_hi)
    q_lo = jnp.zeros(d_hi.shape, jnp.uint32)
    for limb in (d_lo >> 16, d_lo & np.uint32(0xFFFF)):
        c_hi = (r_hi << 16) | (r_lo >> 16)
        c_lo = (r_lo << 16) | limb
        c_f = r_f * np.float32(65536.0) + limb.astype(jnp.int32).astype(
            jnp.float32
        )
        d = (c_f * recip).astype(jnp.int32)
        du = d.astype(jnp.uint32)
        p_hi, p_lo = _mul40x25(s_hi, s_lo, du)  # d < 2^17, s < 2^40
        rw_hi, rw_lo = _pair_sub(c_hi, c_lo, p_hi, p_lo)
        neg = rw_hi.astype(jnp.int32) < 0
        du = du - jnp.where(neg, np.uint32(1), np.uint32(0))
        ah, al = _pair_add(rw_hi, rw_lo, s_hi, s_lo)
        rw_hi = jnp.where(neg, ah, rw_hi)
        rw_lo = jnp.where(neg, al, rw_lo)
        ovr = jnp.logical_or(
            rw_hi > s_hi, jnp.logical_and(rw_hi == s_hi, rw_lo >= s_lo)
        )
        du = du + jnp.where(ovr, np.uint32(1), np.uint32(0))
        sh, sl = _pair_sub(rw_hi, rw_lo, s_hi, s_lo)
        rw_hi = jnp.where(ovr, sh, rw_hi)
        rw_lo = jnp.where(ovr, sl, rw_lo)
        r_hi, r_lo = rw_hi, rw_lo
        r_f = (
            r_hi.astype(jnp.int32).astype(jnp.float32)
            * np.float32(4294967296.0)
            + _u32_to_f32(r_lo)
        )
        q_lo = (q_lo << 16) | du
    return q_lo, q_ovr


def _range_decode_kernel_body64(pltpu, pl, *, cdf, cfg: LaneConfig, T: int,
                                tail: int, R: int, seeded: bool = False):
    """``seeded=True`` adds four [R, 128] u32 inputs (lower hi/lo, range
    hi/lo pairs) after the point pair: a full mid-stream decoder state, for
    resuming from a within-block checkpoint
    (interleaved2.decode_range_from_checkpoint)."""
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert S == 64 and W == 32 and P <= 24
    L = R * LANES
    qmask = np.uint32((1 << P) - 1)

    def kernel(*refs):
        if seeded:
            (pts_hi_in, pts_lo_in, lhi_in, llo_in, rhi_in, rlo_in,
             stream_hbm, syms_out, pts_hi_out, pts_lo_out, bad_out,
             lhi_s, llo_s, rhi_s, rlo_s, phi_s, plo_s, win, base_s,
             sem) = refs
        else:
            (pts_hi_in, pts_lo_in, stream_hbm, syms_out, pts_hi_out,
             pts_lo_out, bad_out,
             lhi_s, llo_s, rhi_s, rlo_s, phi_s, plo_s, win, base_s,
             sem) = refs
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            if seeded:
                lhi_s[:] = lhi_in[:]
                llo_s[:] = llo_in[:]
                rhi_s[:] = rhi_in[:]
                rlo_s[:] = rlo_in[:]
            else:
                lhi_s[:] = jnp.zeros((R, LANES), jnp.uint32)
                llo_s[:] = jnp.zeros((R, LANES), jnp.uint32)
                rhi_s[:] = jnp.full(
                    (R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32
                )
                rlo_s[:] = jnp.full(
                    (R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32
                )
            phi_s[:] = pts_hi_in[:]
            plo_s[:] = pts_lo_in[:]
            base_s[0] = 0
            base_s[1] = 0  # invalid-data flag
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        lhi, llo = lhi_s[:], llo_s[:]
        rhi, rlo = rhi_s[:], rlo_s[:]
        phi, plo = phi_s[:], plo_s[:]

        # scale = range >> P; q = (point - lower) / scale
        s_lo = (rhi << (32 - P)) | (rlo >> P)
        s_hi = rhi >> P
        d_hi, d_lo = _pair_sub(phi, plo, lhi, llo)
        q_raw, q_ovr = _div64_by_scale(d_hi, d_lo, s_hi, s_lo)

        # invalid-data detection (queue.rs:991-993): quantile >= 2^P
        badv = jnp.where(
            jnp.logical_or(q_ovr, q_raw > qmask), np.int32(1), np.int32(0)
        )
        if tail < L:
            act_q = jnp.logical_or(t < T - 1, lane_flat < tail)
            badm = jnp.max(jnp.where(act_q, badv, 0))
        else:
            badm = jnp.max(badv)
        base_s[1] = base_s[1] | badm

        # model inversion on the masked quantile (garbage wraps to a valid
        # table entry with prob >= 1; the flag does the rejecting)
        q = q_raw & qmask
        sym, cum, prob = _compare_sum_auto(q, cdf, P)

        m_hi, m_lo = _mul40x25(s_hi, s_lo, cum.astype(jnp.uint32))
        nl_hi, nl_lo = _pair_add(lhi, llo, m_hi, m_lo)
        nr_hi, nr_lo = _mul40x25(s_hi, s_lo, prob.astype(jnp.uint32))
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            nl_hi = jnp.where(active, nl_hi, lhi)
            nl_lo = jnp.where(active, nl_lo, llo)
            nr_hi = jnp.where(active, nr_hi, rhi)
            nr_lo = jnp.where(active, nr_lo, rlo)

        # renorm: range < 2^32 <=> hi == 0; shift all three left by W=32
        m = nr_hi == 0
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        lhi_s[:] = jnp.where(m, nl_lo, nl_hi)
        llo_s[:] = jnp.where(m, np.uint32(0), nl_lo)
        rhi_s[:] = jnp.where(m, nr_lo, nr_hi)
        rlo_s[:] = jnp.where(m, np.uint32(0), nr_lo)
        phi_s[:] = jnp.where(m, plo, phi)
        plo_s[:] = jnp.where(m, ex, plo)
        base_s[0] = nxt
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            pts_hi_out[:] = phi_s[:]
            pts_lo_out[:] = plo_s[:]
            bad_out[0] = base_s[1]
            bad_out[1] = 0

    return kernel


@inversion_keyed_cache(maxsize=32)
def _build_range_decoder64(cdf_tuple, cfg: LaneConfig, T: int, tail: int,
                           L: int, interpret: bool, seeded: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _range_decode_kernel_body64(
        pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R, seeded=seeded
    )

    plane = pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [plane, plane]
    if seeded:
        in_specs += [plane, plane, plane, plane]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),   # lower hi
            pltpu.VMEM((R, LANES), jnp.uint32),   # lower lo
            pltpu.VMEM((R, LANES), jnp.uint32),   # range hi
            pltpu.VMEM((R, LANES), jnp.uint32),   # range lo
            pltpu.VMEM((R, LANES), jnp.uint32),   # point hi
            pltpu.VMEM((R, LANES), jnp.uint32),   # point lo
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def decode_shared_range64_pallas(
    points,
    stream,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_symbols: int,
    interpret: bool | None = None,
):
    """Decode a default-preset ILANS2-R64 container on TPU; matches
    ops/interleaved2.decode_shared_range_cdf.  ``points`` is u64[L].
    Raises ValueError on data inconsistent with the entropy model
    (queue.rs:991-993), like the S=32 decoder."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    assert cfg.state_bits == 64 and cfg.word_bits == 32 and cfg.precision <= 24
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        return jnp.zeros((0,), jnp.int32)
    tail = num_symbols - (T - 1) * L
    R = L // LANES

    pts = np.asarray(points, dtype=np.uint64)
    hi = (pts >> np.uint64(32)).astype(np.uint32).reshape(R, LANES)
    lo = (pts & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(R, LANES)
    stream2d = _pad_stream2d(stream, R)

    fn = _build_range_decoder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret,
    )
    syms, _phi, _plo, bad = fn(jnp.asarray(hi), jnp.asarray(lo), stream2d)
    if int(np.asarray(bad)[0]):
        raise ValueError(
            "Tried to decode data that is inconsistent with the entropy model."
        )
    return syms.reshape(-1)[:num_symbols]

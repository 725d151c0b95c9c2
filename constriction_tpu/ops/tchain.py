"""TChain-16: the TPU-native bits-back (chain) coding format.

The reference chain coder (chain.rs; host twin ops/chain.py) pulls exactly
PRECISION bits per symbol from the data being "decoded" and pushes the
leftover information onto a remainders stream; re-encoding the symbols pops
the remainders and reconstructs the data exactly (bits-back coding).  The
symbol for position i depends only on model i (symbol locality), which makes
chain decoding embarrassingly parallel — EXCEPT for the remainders stream,
which is a sequential head update.

TChain-16 is the interleaved-remainders redesign for TPU:

- preset S=32, W=16, **P=16**: quantiles are whole u16 slots, so
  pack/unpack is bitwise-trivial, and the remainder head update needs at
  most ONE flush/refill per symbol (head < 2^16 before a push, and
  head < prob * 2^16 before a divide, so quotients stay < 2^16 — within
  `_exact_div`'s exactness envelope);
- quantile layout: symbols live in the usual [T, R, 128] lane order; the
  u32 word at (t, r, c) holds lane (t, r, c)'s quantile in its LOW half and
  lane (t, r + R/2, c)'s in its HIGH half — planar halves, zero shuffles;
- L interleaved remainder heads (lane = i mod L); flushed words share one
  stream in flush order, written right-to-left like ILANS2, so the reverse
  (encode) pass consumes them left-to-right with the standard refill
  machinery;
- containers carry (remainders_stream, heads[L]) — heads are the analog of
  ILANS2's per-lane state header.

Per-symbol algebra (mirroring chain.rs:1044-1209 at the new preset):

  decode:  q = data[i];  (sym, cum, prob) = invert(q)
           head = head * prob + (q - cum);  flush low W bits if head >= 2^16
  encode:  refill if head < prob;  r = head % prob;  head //= prob
           q = cum + r

Seeding: heads start at 1 (`from_binary` semantics, chain.rs:326); a full
decode -> encode round trip returns every head to 1 and reproduces the data
exactly.  (TChain-24 below seeds heads at 2^(S-W-P) = 2^8 instead -- the
invariant lower bound is nonzero there.)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .interleaved import LaneConfig

TCHAIN_CFG = LaneConfig(num_lanes=32768, word_bits=16, state_bits=32, precision=16)


def pack_quantiles(q: np.ndarray, L: int) -> np.ndarray:
    """[T*L] u16 quantiles (lane order) -> [T, R/2, 128] u32 planar words."""
    R = L // 128
    assert R % 2 == 0, "num_lanes must be a multiple of 256 for planar packing"
    T = len(q) // L
    q3 = q.astype(np.uint32).reshape(T, R, 128)
    return q3[:, : R // 2] | (q3[:, R // 2 :] << 16)


def unpack_quantiles(w: np.ndarray) -> np.ndarray:
    """Inverse of pack_quantiles: [T, R/2, 128] u32 -> [T*L] u16 values."""
    lo = w & np.uint32(0xFFFF)
    hi = w >> 16
    return np.concatenate([lo, hi], axis=1).reshape(-1).astype(np.uint16)


def tchain_decode_host(
    quantiles: np.ndarray,  # [n] u16 (lane order), n padded to a multiple of L
    cdf: np.ndarray,  # [K+1] u64 fixed-point CDF at P=16
    cfg: LaneConfig = TCHAIN_CFG,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Numpy oracle decode: returns (symbols i32[n], remainders u32[*],
    heads u32[L]).  The remainders words are returned in *consumption order
    of the reverse pass* (the encode kernel reads them left to right)."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert (S, W, P) == (32, 16, 16)
    n = len(quantiles)
    assert n % L == 0
    T = n // L
    cdf64 = np.asarray(cdf, dtype=np.uint64)

    heads = np.ones(L, dtype=np.uint64)
    out = np.empty(n, dtype=np.int32)
    chunks = []  # flush words per step; reverse pass consumes them reversed
    lanes = np.arange(L)
    for t in range(T):
        q = quantiles[t * L : (t + 1) * L].astype(np.uint64)
        sym = np.searchsorted(cdf64, q, side="right") - 1
        cum = cdf64[sym]
        prob = cdf64[sym + 1] - cum
        heads = heads * prob + (q - cum)
        m = heads >= np.uint64(1 << (S - W))
        chunks.append((heads[m] & np.uint64(0xFFFF)).astype(np.uint32))
        heads = np.where(m, heads >> np.uint64(W), heads)
        out[t * L + lanes] = sym
    # written right-to-left during decode == read left-to-right in reverse
    # order of production
    stream = (
        np.concatenate(chunks[::-1]) if chunks else np.zeros(0, np.uint32)
    )
    # within a step the flush words keep ascending-lane order; reversing the
    # *step* order only (not within steps) is exactly right-to-left writing
    return out, stream, heads.astype(np.uint32)


def tchain_encode_host(
    symbols: np.ndarray,  # [n] lane order, n % L == 0
    remainders: np.ndarray,  # u32 words as returned by decode
    heads: np.ndarray,  # u32[L] final heads from decode
    cdf: np.ndarray,
    cfg: LaneConfig = TCHAIN_CFG,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle reverse pass: reconstructs (quantiles u16[n], heads
    u32[L]).  After a full round trip the returned heads are all 1."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    n = len(symbols)
    assert n % L == 0
    T = n // L
    cdf64 = np.asarray(cdf, dtype=np.uint64)

    h = heads.astype(np.uint64)
    q_out = np.empty(n, dtype=np.uint16)
    base = 0
    lanes = np.arange(L)
    for tt in range(T - 1, -1, -1):
        sym = np.asarray(symbols[tt * L : (tt + 1) * L], dtype=np.int64)
        cum = cdf64[sym]
        prob = cdf64[sym + 1] - cum
        m = h < prob
        k = int(m.sum())
        if k:
            words = np.zeros(k, dtype=np.uint64)
            avail = remainders[base : base + k]
            words[: len(avail)] = avail
            h[m] = (h[m] << np.uint64(W)) | words
            base += k
        r = h % prob
        h = h // prob
        q_out[tt * L + lanes] = (cum + r).astype(np.uint16)
    return q_out, h.astype(np.uint32)


# ---------------------------------------------------------------------------
# Pallas kernels: full bits-back decode/encode on TPU
# ---------------------------------------------------------------------------

import functools

import jax
import jax.numpy as jnp

from .pallas_coder import (
    LANES,
    _emit_words,
    _exact_div,
    _init_stream_window,
    _pad_stream2d,
    _refill_words,
    inversion_keyed_cache,
)


def _cs16(q, cdf):
    """Compare-sum at P=16: (sym, cum, prob) via the shared dispatcher
    (wide two-accumulator form for small alphabets, segmented two-level
    form past the flat-cost crossover)."""
    from .pallas_coder import _compare_sum_auto

    c = np.asarray(cdf).astype(np.int64)
    return _compare_sum_auto(q, c, 16)


def _cs16_from_sym(sym_i32, cdf):
    """(cum, prob) for known symbols (encode side) via the shared
    dispatcher (flat packed form or segmented two-level form)."""
    from .pallas_coder import _cum_prob_from_sym

    c = np.asarray(cdf).astype(np.int64)
    return _cum_prob_from_sym(sym_i32, c, 16)


def _tchain_decode_kernel(pltpu, pl, *, cdf, T: int, R: int, cap_rows: int):
    def kernel(qw_in, syms_out, stream_out, heads_out, end_out,
               heads_s, img, arow_s, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            heads_s[:] = jnp.ones((R, LANES), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        heads = heads_s[:]
        qw = qw_in[0]
        q = jnp.concatenate([qw & np.uint32(0xFFFF), qw >> 16], axis=0)
        sym, cum, prob = _cs16(q, cdf)
        heads = heads * prob + (q - cum)
        m = heads >= np.uint32(1 << 16)
        vals = jnp.where(m, heads & np.uint32(0xFFFF), np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=m, vals=vals, t=t, T=T, R=R,
        )
        heads_s[:] = jnp.where(m, heads >> 16, heads)
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            heads_out[:] = heads_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


def _tchain_encode_kernel(pltpu, pl, *, cdf, T: int, R: int):
    def kernel(syms_in, heads_in, stream_hbm, qw_out, heads_out,
               heads_s, win, base_s, sem):
        t = pl.program_id(0)  # symbol step is T-1-t (reversed BlockSpec)

        @pl.when(t == 0)
        def _init():
            heads_s[:] = heads_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        heads = heads_s[:]
        sym = syms_in[0]
        cum, prob = _cs16_from_sym(sym, cdf)

        m = heads < prob
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        heads = jnp.where(m, (heads << 16) | (ex & np.uint32(0xFFFF)), heads)
        qd = _exact_div(heads, prob)
        r = heads - qd * prob
        q = cum + r
        heads_s[:] = qd
        base_s[0] = nxt
        qw_out[0] = q[: R // 2] | (q[R // 2 :] << 16)

        @pl.when(t == T - 1)
        def _final():
            heads_out[:] = heads_s[:]

    return kernel


@inversion_keyed_cache(maxsize=16)
def _build_tchain_decoder(cdf_tuple, T: int, L: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    cap_rows = T * R + 1
    kernel = _tchain_decode_kernel(pltpu, pl, cdf=cdf, T=T, R=R, cap_rows=cap_rows)
    RPAD = -(-(R + 1) // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R // 2, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_tchain_encoder(cdf_tuple, T: int, L: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _tchain_encode_kernel(pltpu, pl, cdf=cdf, T=T, R=R)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, R // 2, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R // 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def tchain_decode_pallas(quantiles, cdf, cfg: LaneConfig = TCHAIN_CFG,
                         interpret: bool | None = None):
    """Bits-back decode on TPU: returns (symbols i32[n], remainders u32[*],
    heads u32[L]); matches tchain_decode_host exactly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    q = np.asarray(quantiles, dtype=np.uint16)
    n = len(q)
    assert n % L == 0 and L % 256 == 0
    T = n // L
    if T == 0:
        # match tchain_decode_host on the empty message: no remainders,
        # heads at the seed value 1 (S - W - P = 0)
        return (np.zeros(0, np.int32), np.zeros(0, np.uint32),
                np.ones(L, np.uint32))
    R = L // LANES
    cap_rows = T * R + 1
    qw = jnp.asarray(pack_quantiles(q, L))
    fn = _build_tchain_decoder(tuple(int(x) for x in np.asarray(cdf)), T, L, interpret)
    syms, buf, heads, end = fn(qw)
    e = int(end[0])
    stream = np.asarray(buf).reshape(-1)[e : cap_rows * LANES]
    return (
        np.asarray(syms).reshape(-1),
        stream,
        np.asarray(heads).reshape(-1),
    )


def tchain_encode_pallas(symbols, remainders, heads, cdf,
                         cfg: LaneConfig = TCHAIN_CFG,
                         interpret: bool | None = None):
    """Bits-back reverse pass on TPU: returns (quantiles u16[n], heads
    u32[L]); matches tchain_encode_host exactly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    symbols = np.asarray(symbols, dtype=np.int32)
    n = len(symbols)
    assert n % L == 0
    T = n // L
    if T == 0:
        return (np.zeros(0, np.uint16),
                np.asarray(heads, np.uint32).reshape(-1).copy())
    R = L // LANES
    syms3d = jnp.asarray(symbols).reshape(T, R, LANES)
    heads2d = jnp.asarray(np.asarray(heads, dtype=np.uint32)).reshape(R, LANES)
    stream2d = _pad_stream2d(np.asarray(remainders, dtype=np.uint32), R)
    fn = _build_tchain_encoder(tuple(int(x) for x in np.asarray(cdf)), T, L, interpret)
    qw, h = fn(syms3d, heads2d, stream2d)
    return unpack_quantiles(np.asarray(qw)), np.asarray(h).reshape(-1)


# ---------------------------------------------------------------------------
# TChain-12 with per-symbol continuous families: neural bits-back on TPU.
# P=12 (matching the device families' fixed-point precision); quantiles are
# packed 12-bit fields, row-planar: symbol rows [8k, 8k+8) live in word rows
# [3k, 3k+3) of a [T, 3R/8, 128] u32 array.
# ---------------------------------------------------------------------------

TCHAIN12_CFG = LaneConfig(num_lanes=32768, word_bits=16, state_bits=32, precision=12)

_M12 = 0xFFF


def pack_q12(q: np.ndarray, L: int) -> np.ndarray:
    """[T*L] u16 (12-bit) quantiles -> [T, 3R/8, 128] u32 planar words."""
    R = L // 128
    assert R % 8 == 0, "num_lanes must be a multiple of 1024 for 12-bit packing"
    T = len(q) // L
    q3 = q.astype(np.uint32).reshape(T, R // 8, 8, 128)
    w = np.empty((T, R // 8, 3, 128), dtype=np.uint32)
    w[:, :, 0] = q3[:, :, 0] | (q3[:, :, 1] << 12) | (q3[:, :, 2] << 24)
    w[:, :, 1] = (q3[:, :, 2] >> 8) | (q3[:, :, 3] << 4) | (q3[:, :, 4] << 16) | (q3[:, :, 5] << 28)
    w[:, :, 2] = (q3[:, :, 5] >> 4) | (q3[:, :, 6] << 8) | (q3[:, :, 7] << 20)
    return w.reshape(T, 3 * (R // 8), 128)


def unpack_q12(w: np.ndarray, xp=np):
    """[T, 3R/8, 128] -> [T, R, 128] u32 quantile values (12-bit); the
    per-T broadcast of _unpack_q12_block (single implementation of the
    field extraction)."""
    T, rows, _ = w.shape
    return _unpack_q12_block(xp, w.reshape(T * rows, 128)).reshape(T, -1, 128)


def _unpack_q12_block(xp, wblk):
    """[3R/8, 128] word block -> [R, 128] quantiles (kernel-side)."""
    rows = int(wblk.shape[0])
    g = wblk.reshape(rows // 3, 3, 128)
    w0, w1, w2 = g[:, 0], g[:, 1], g[:, 2]
    m = np.uint32(_M12)
    q = xp.stack(
        [
            w0 & m,
            (w0 >> 12) & m,
            (w0 >> 24) | ((w1 & np.uint32(0xF)) << 8),
            (w1 >> 4) & m,
            (w1 >> 16) & m,
            (w1 >> 28) | ((w2 & np.uint32(0xFF)) << 4),
            (w2 >> 8) & m,
            w2 >> 20,
        ],
        axis=1,
    )  # [R/8, 8, 128]
    return q.reshape(-1, 128)


def _pack_q12_block(xp, q):
    """[R, 128] quantiles -> [3R/8, 128] words (kernel-side)."""
    R = int(q.shape[0])
    g = q.reshape(R // 8, 8, 128)
    q0, q1, q2, q3_, q4, q5, q6, q7 = [g[:, i] for i in range(8)]
    w0 = q0 | (q1 << 12) | (q2 << 24)
    w1 = (q2 >> 8) | (q3_ << 4) | (q4 << 16) | (q5 << 28)
    w2 = (q5 >> 4) | (q6 << 8) | (q7 << 20)
    return xp.stack([w0, w1, w2], axis=1).reshape(-1, 128)


def tchain12_family_decode_host(quantiles, means, scales, family,
                                min_sym, max_sym,
                                cfg: LaneConfig = TCHAIN12_CFG):
    """Numpy oracle: bits-back decode with per-symbol (mean, scale) models
    at P=12 (exact-integer family CDF; bit-identical with the kernel)."""
    from . import pallas_family as pf

    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert (S, W, P) == (32, 16, 12)
    n = len(quantiles)
    assert n % L == 0
    T = n // L
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = pf._left_fn(family, min_sym, P, free)
    means = np.asarray(means, dtype=np.float32)
    scales = np.asarray(scales, dtype=np.float32)

    # chain head invariant (chain.rs:248-258): head in [2^(S-W-P), 2^(S-P));
    # the lower bound is what makes encode-refill exactly mirror decode-flush
    heads = np.full(L, 1 << (S - W - P), dtype=np.uint64)
    out = np.empty(n, dtype=np.int32)
    chunks = []
    lanes = np.arange(L)
    flush_at = np.uint64(1 << (S - P))
    for t in range(T):
        idx = t * L + lanes
        q = np.asarray(quantiles[idx], dtype=np.int32)
        mean = means[idx]
        inv_scale = np.float32(1.0) / scales[idx]
        lo = np.full(L, min_sym, np.int32)
        hi = np.full(L, max_sym + 1, np.int32)
        cum = np.zeros(L, np.int32)
        right = np.full(L, 1 << P, np.int32)
        for _ in range(max(max_sym - min_sym, 1).bit_length()):
            mid = np.maximum((lo + hi) >> 1, min_sym + 1)
            lmid = left(mid, mean, inv_scale, xp=np)
            take = lmid <= q
            lo = np.where(take, mid, lo)
            hi = np.where(take, hi, mid)
            cum = np.where(take, lmid, cum)
            right = np.where(take, right, lmid)
        prob = (right - cum).astype(np.uint64)
        heads = heads * prob + (q.astype(np.uint64) - cum.astype(np.uint64))
        m = heads >= flush_at
        chunks.append((heads[m] & np.uint64(0xFFFF)).astype(np.uint32))
        heads = np.where(m, heads >> np.uint64(W), heads)
        out[idx] = lo
    stream = np.concatenate(chunks[::-1]) if chunks else np.zeros(0, np.uint32)
    return out, stream, heads.astype(np.uint32)


def tchain12_family_encode_host(symbols, remainders, heads, means, scales,
                                family, min_sym, max_sym,
                                cfg: LaneConfig = TCHAIN12_CFG):
    """Numpy oracle reverse pass: reconstructs the 12-bit quantiles."""
    from . import pallas_family as pf

    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    n = len(symbols)
    assert n % L == 0
    T = n // L
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = pf._left_fn(family, min_sym, P, free)
    means = np.asarray(means, dtype=np.float32)
    scales = np.asarray(scales, dtype=np.float32)

    h = np.asarray(heads, dtype=np.uint64)
    q_out = np.empty(n, dtype=np.uint16)
    base = 0
    lanes = np.arange(L)
    refill_shift = np.uint64(S - W - P)  # refill when head < prob << (S-W-P)
    for tt in range(T - 1, -1, -1):
        idx = tt * L + lanes
        sym = np.asarray(symbols[idx], dtype=np.int32)
        mean = means[idx]
        inv_scale = np.float32(1.0) / scales[idx]
        cum = np.where(sym == min_sym, 0, left(sym, mean, inv_scale, xp=np))
        right = np.where(
            sym == max_sym, 1 << P, left(sym + 1, mean, inv_scale, xp=np)
        )
        prob = (right - cum).astype(np.uint64)
        m = h < (prob << refill_shift)
        k = int(m.sum())
        if k:
            words = np.zeros(k, dtype=np.uint64)
            avail = remainders[base : base + k]
            words[: len(avail)] = avail
            h[m] = (h[m] << np.uint64(W)) | words
            base += k
        r = h % prob
        h = h // prob
        q_out[idx] = (cum.astype(np.uint64) + r).astype(np.uint16)
    return q_out, h.astype(np.uint32)


def _tchain12_family_decode_kernel(pltpu, pl, *, family, min_sym, max_sym,
                                   T: int, R: int, cap_rows: int):
    from . import pallas_family as pf

    P = 12
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = pf._left_fn(family, min_sym, P, free)

    def kernel(qw_in, params_hbm, syms_out, stream_out, heads_out, end_out,
               heads_s, img, pbuf, arow_s, psem, sem):
        t = pl.program_id(0)
        slot = t % 2

        @pl.when(t == 0)
        def _init():
            heads_s[:] = jnp.full((R, LANES), np.uint32(1 << 4), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows
            pdma = pltpu.make_async_copy(params_hbm.at[0], pbuf.at[0], psem.at[0])
            pdma.start()
            pdma.wait()

        @pl.when(t + 1 < T)
        def _prefetch_params():
            pltpu.make_async_copy(
                params_hbm.at[t + 1], pbuf.at[1 - slot], psem.at[1 - slot]
            ).start()

        @pl.when(t > 0)
        def _wait_params():
            pltpu.make_async_copy(
                params_hbm.at[t], pbuf.at[slot], psem.at[slot]
            ).wait()

        heads = heads_s[:]
        q = _unpack_q12_block(jnp, qw_in[0]).astype(jnp.int32)
        mean = pbuf[slot, 0]
        inv_scale = np.float32(1.0) / pbuf[slot, 1]
        sym, cum, prob = pf._invert_family(left, q, min_sym, max_sym, P)(
            mean, inv_scale
        )
        heads = heads * prob + (q.astype(jnp.uint32) - cum)
        m = heads >= np.uint32(1 << 20)  # 2^(S-P)
        vals = jnp.where(m, heads & np.uint32(0xFFFF), np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=m, vals=vals, t=t, T=T, R=R,
        )
        heads_s[:] = jnp.where(m, heads >> 16, heads)
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            heads_out[:] = heads_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


def _tchain12_family_encode_kernel(pltpu, pl, *, family, min_sym, max_sym,
                                   T: int, R: int):
    from . import pallas_family as pf

    P = 12
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = pf._left_fn(family, min_sym, P, free)

    def kernel(syms_in, params_hbm, heads_in, stream_hbm, qw_out, heads_out,
               heads_s, win, pbuf, base_s, psem, sem):
        t = pl.program_id(0)  # symbol step is T-1-t
        slot = t % 2

        @pl.when(t == 0)
        def _init():
            heads_s[:] = heads_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)
            pdma = pltpu.make_async_copy(
                params_hbm.at[T - 1], pbuf.at[0], psem.at[0]
            )
            pdma.start()
            pdma.wait()

        @pl.when(t + 1 < T)
        def _prefetch_params():
            pltpu.make_async_copy(
                params_hbm.at[T - 2 - t], pbuf.at[1 - slot], psem.at[1 - slot]
            ).start()

        @pl.when(t > 0)
        def _wait_params():
            pltpu.make_async_copy(
                params_hbm.at[T - 1 - t], pbuf.at[slot], psem.at[slot]
            ).wait()

        heads = heads_s[:]
        sym = syms_in[0]
        mean = pbuf[slot, 0]
        inv_scale = np.float32(1.0) / pbuf[slot, 1]
        cum_i = jnp.where(
            sym == np.int32(min_sym), 0, left(sym, mean, inv_scale)
        )
        right_i = jnp.where(
            sym == np.int32(max_sym),
            np.int32(1 << P),
            left(sym + 1, mean, inv_scale),
        )
        cum = cum_i.astype(jnp.uint32)
        prob = (right_i - cum_i).astype(jnp.uint32)

        m = heads < (prob << 4)  # prob << (S - W - P)
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        heads = jnp.where(m, (heads << 16) | (ex & np.uint32(0xFFFF)), heads)
        qd = _exact_div(heads, prob)
        r = heads - qd * prob
        q = cum + r
        heads_s[:] = qd
        base_s[0] = nxt
        qw_out[0] = _pack_q12_block(jnp, q)

        @pl.when(t == T - 1)
        def _final():
            heads_out[:] = heads_s[:]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_tchain12_family_decoder(family, min_sym, max_sym, T, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _tchain12_family_decode_kernel(
        pltpu, pl, family=family, min_sym=min_sym, max_sym=max_sym,
        T=T, R=R, cap_rows=cap_rows,
    )
    RPAD = -(-(R + 1) // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3 * R // 8, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # params [T, 2, R, 128]
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.VMEM((2, 2, R, LANES), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_tchain12_family_encoder(family, min_sym, max_sym, T, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    kernel = _tchain12_family_encode_kernel(
        pltpu, pl, family=family, min_sym=min_sym, max_sym=max_sym, T=T, R=R
    )
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # params
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # remainders stream
        ],
        out_specs=[
            pl.BlockSpec((1, 3 * R // 8, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 3 * R // 8, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.VMEM((2, 2, R, LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def tchain12_family_decode_pallas(quantiles, means, scales, family,
                                  min_sym, max_sym,
                                  cfg: LaneConfig = TCHAIN12_CFG,
                                  interpret: bool | None = None):
    """Neural bits-back decode on TPU: per-symbol (mean, scale) models,
    12-bit quantiles.  Returns (symbols, remainders, heads); bit-identical
    with tchain12_family_decode_host."""
    from . import pallas_family as pf

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert max_sym > min_sym, (
        "degenerate single-symbol support: _invert_family's min-pin breaks "
        "when min_sym == max_sym (the only symbol needs no bits anyway)"
    )
    q = np.asarray(quantiles, dtype=np.uint16)
    n = len(q)
    assert n % L == 0 and L % 1024 == 0
    if not (q < (1 << 12)).all():
        raise ValueError("quantiles must be 12-bit values")
    T = n // L
    if T == 0:
        # heads at the seed 2^(S-W-P) = 16, matching the host oracle
        return (np.zeros(0, np.int32), np.zeros(0, np.uint32),
                np.full(L, 16, np.uint32))
    R = L // LANES
    cap_rows = T * R + 1
    qw = jnp.asarray(pack_q12(q, L))
    m3 = pf._blocks3d(means, T, R, n, jnp.float32)
    s3 = pf._blocks3d(scales, T, R, n, jnp.float32, 1.0)
    params = jnp.stack([m3, s3], axis=1)
    fn = _build_tchain12_family_decoder(
        family, int(min_sym), int(max_sym), T, L, interpret
    )
    syms, buf, heads, end = fn(qw, params)
    e = int(end[0])
    stream = np.asarray(buf).reshape(-1)[e : cap_rows * LANES]
    return np.asarray(syms).reshape(-1), stream, np.asarray(heads).reshape(-1)


def tchain12_family_encode_pallas(symbols, remainders, heads, means, scales,
                                  family, min_sym, max_sym,
                                  cfg: LaneConfig = TCHAIN12_CFG,
                                  interpret: bool | None = None):
    """Reverse pass of tchain12_family_decode_pallas (exact)."""
    from . import pallas_family as pf

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert max_sym > min_sym, (
        "degenerate single-symbol support: _invert_family's min-pin breaks "
        "when min_sym == max_sym"
    )
    symbols = np.asarray(symbols, dtype=np.int32)
    n = len(symbols)
    assert n % L == 0
    T = n // L
    if T == 0:
        return (np.zeros(0, np.uint16),
                np.asarray(heads, np.uint32).reshape(-1).copy())
    R = L // LANES
    syms3d = jnp.asarray(symbols).reshape(T, R, LANES)
    m3 = pf._blocks3d(means, T, R, n, jnp.float32)
    s3 = pf._blocks3d(scales, T, R, n, jnp.float32, 1.0)
    params = jnp.stack([m3, s3], axis=1)
    heads2d = jnp.asarray(np.asarray(heads, np.uint32)).reshape(R, LANES)
    stream2d = _pad_stream2d(np.asarray(remainders, np.uint32), R)
    fn = _build_tchain12_family_encoder(
        family, int(min_sym), int(max_sym), T, L, interpret
    )
    qw, h = fn(syms3d, params, heads2d, stream2d)
    return (
        unpack_q12(np.asarray(qw)).reshape(-1).astype(np.uint16),
        np.asarray(h).reshape(-1),
    )


# ---------------------------------------------------------------------------
# TChain-24: bits-back at the reference's DEFAULT precision.
# S=64 / W=32 / P=24 (the preset constriction's Python ChainCoder pins,
# chain.rs:286 with the default 24-bit quantile pulls): remainder heads are
# u64 (two u32 tiles in-kernel, riding ops/pallas_coder64.py's limb
# multiplier and digit division), quantiles are packed 24-bit fields (4 per
# 3 u32 words, row-planar), and every invariant mirrors chain.rs at the new
# sizes: head < 2^(S-P) = 2^40 before the decode multiply (so one 32-bit
# flush restores it), refill when head < prob << (S-W-P) = prob << 8 (so
# one refill suffices and encode quotients stay < 2^40).
# ---------------------------------------------------------------------------

TCHAIN24_CFG = LaneConfig(num_lanes=32768, word_bits=32, state_bits=64, precision=24)

_M24 = 0xFFFFFF


def pack_q24(q: np.ndarray, L: int) -> np.ndarray:
    """[T*L] u32 (24-bit) quantiles -> [T, 3R/4, 128] u32 planar words.

    Host-side STORAGE helper only (25% smaller than one-per-word).  The
    TChain-24 kernels deliberately take raw u32 tiles instead: the in-kernel
    unpack's cross-sublane relayouts cost ~3x the rest of the decode step
    (measured 4.1 -> 11+ GB/s dropping it), while the extra input DMA is
    fully hidden by the BlockSpec pipeline."""
    R = L // 128
    assert R % 4 == 0, "num_lanes must be a multiple of 512 for 24-bit packing"
    T = len(q) // L
    g = q.astype(np.uint32).reshape(T, R // 4, 4, 128)
    w = np.empty((T, R // 4, 3, 128), dtype=np.uint32)
    w[:, :, 0] = g[:, :, 0] | (g[:, :, 1] << 24)
    w[:, :, 1] = (g[:, :, 1] >> 8) | (g[:, :, 2] << 16)
    w[:, :, 2] = (g[:, :, 2] >> 16) | (g[:, :, 3] << 8)
    return w.reshape(T, 3 * (R // 4), 128)


def unpack_q24(w: np.ndarray, xp=np):
    """[T, 3R/4, 128] -> [T, R, 128] u32 quantile values (24-bit); the
    per-T broadcast of _unpack_q24_block (single implementation of the
    field extraction)."""
    T, rows, _ = w.shape
    return _unpack_q24_block(xp, w.reshape(T * rows, 128)).reshape(T, -1, 128)


def _unpack_q24_block(xp, wblk):
    """[3R/4, 128] word block -> [R, 128] quantiles (kernel-side)."""
    rows = int(wblk.shape[0])
    g = wblk.reshape(rows // 3, 3, 128)
    w0, w1, w2 = g[:, 0], g[:, 1], g[:, 2]
    m = np.uint32(_M24)
    q = xp.stack(
        [
            w0 & m,
            (w0 >> 24) | ((w1 & np.uint32(0xFFFF)) << 8),
            (w1 >> 16) | ((w2 & np.uint32(0xFF)) << 16),
            w2 >> 8,
        ],
        axis=1,
    )
    return q.reshape(-1, 128)


def _pack_q24_block(xp, q):
    """[R, 128] quantiles -> [3R/4, 128] words (kernel-side)."""
    R = int(q.shape[0])
    g = q.reshape(R // 4, 4, 128)
    q0, q1, q2, q3_ = [g[:, i] for i in range(4)]
    w0 = q0 | (q1 << 24)
    w1 = (q1 >> 8) | (q2 << 16)
    w2 = (q2 >> 16) | (q3_ << 8)
    return xp.stack([w0, w1, w2], axis=1).reshape(-1, 128)


def tchain24_decode_host(
    quantiles: np.ndarray,  # [n] u32 (24-bit values, lane order), n % L == 0
    cdf: np.ndarray,  # [K+1] fixed-point CDF at P=24
    cfg: LaneConfig = TCHAIN24_CFG,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Numpy oracle decode: (symbols i32[n], remainders u32[*],
    heads u64[L])."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert (S, W, P) == (64, 32, 24)
    n = len(quantiles)
    assert n % L == 0
    T = n // L
    cdf64 = np.asarray(cdf, dtype=np.uint64)

    # heads live in [2^(S-W-P), 2^(S-P)) = [2^8, 2^40): the lower bound is
    # what makes the encode-refill test (head < prob << 8) the exact inverse
    # of the decode-flush test (head >= 2^40) -- the same duality as the
    # rANS state invariant.  (TChain-16 seeds 1 because there S-W-P = 0.)
    heads = np.full(L, 1 << (S - W - P), dtype=np.uint64)
    out = np.empty(n, dtype=np.int32)
    chunks = []
    lanes = np.arange(L)
    inv = np.uint64(1) << np.uint64(S - P)       # flush bound 2^40
    for t in range(T):
        q = quantiles[t * L : (t + 1) * L].astype(np.uint64)
        sym = np.searchsorted(cdf64, q, side="right") - 1
        cum = cdf64[sym]
        prob = cdf64[sym + 1] - cum
        heads = heads * prob + (q - cum)
        m = heads >= inv
        chunks.append((heads[m] & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        heads = np.where(m, heads >> np.uint64(W), heads)
        out[t * L + lanes] = sym
    stream = (
        np.concatenate(chunks[::-1]) if chunks else np.zeros(0, np.uint32)
    )
    return out, stream, heads


def tchain24_encode_host(
    symbols: np.ndarray,
    remainders: np.ndarray,
    heads: np.ndarray,  # u64[L] final heads from decode
    cdf: np.ndarray,
    cfg: LaneConfig = TCHAIN24_CFG,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy oracle reverse pass: (quantiles u32[n], heads u64[L])."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    assert (S, W, P) == (64, 32, 24)
    n = len(symbols)
    assert n % L == 0
    T = n // L
    cdf64 = np.asarray(cdf, dtype=np.uint64)

    h = np.asarray(heads, dtype=np.uint64).copy()
    q_out = np.empty(n, dtype=np.uint32)
    base = 0
    lanes = np.arange(L)
    for tt in range(T - 1, -1, -1):
        sym = np.asarray(symbols[tt * L : (tt + 1) * L], dtype=np.int64)
        cum = cdf64[sym]
        prob = cdf64[sym + 1] - cum
        m = h < (prob << np.uint64(S - W - P))
        k = int(m.sum())
        if k:
            words = np.zeros(k, dtype=np.uint64)
            avail = remainders[base : base + k]
            words[: len(avail)] = avail
            h[m] = (h[m] << np.uint64(W)) | words
            base += k
        r = h % prob
        h = h // prob
        q_out[tt * L + lanes] = (cum + r).astype(np.uint32)
    return q_out, h


def _tchain24_decode_kernel(pltpu, pl, *, cdf, T: int, R: int,
                            cap_rows: int):
    from .pallas_coder import _compare_sum_auto
    from .pallas_coder64 import _mul40x25

    c = np.asarray(cdf).astype(np.int64)

    def kernel(qw_in, syms_out, stream_out, hh_out, hl_out, end_out,
               hh_s, hl_s, img, arow_s, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            # seed = 2^(S-W-P) = 2^8, the invariant lower bound (see the
            # host oracle's note on the flush/refill duality)
            hh_s[:] = jnp.zeros((R, LANES), jnp.uint32)
            hl_s[:] = jnp.full((R, LANES), np.uint32(256), jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        hh, hl = hh_s[:], hl_s[:]
        # raw u32 quantile tiles: the 24-bit packed layout saved 25% of the
        # input DMA but its unpack (reshape + cross-sublane stack) cost ~3x
        # the whole rest of the step in Mosaic relayouts -- measured 4.1 ->
        # 11+ GB/s switching to one quantile per word (input DMA is fully
        # hidden by the BlockSpec pipeline either way)
        q = qw_in[0]
        sym, cum, prob = _compare_sum_auto(q, c, 24)
        nhi, nlo = _mul40x25(hh, hl, prob.astype(jnp.uint32))
        qc = q - cum.astype(jnp.uint32)
        nlo = nlo + qc
        nhi = nhi + jnp.where(nlo < qc, np.uint32(1), np.uint32(0))
        # flush when head >= 2^40 (restores head < 2^32 <= 2^40)
        m = (nhi >> 8) != 0
        vals = jnp.where(m, nlo, np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=m, vals=vals, t=t, T=T, R=R,
        )
        hh_s[:] = jnp.where(m, np.uint32(0), nhi)
        hl_s[:] = jnp.where(m, nhi, nlo)
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            hh_out[:] = hh_s[:]
            hl_out[:] = hl_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


def _tchain24_encode_kernel(pltpu, pl, *, cdf, T: int, R: int):
    from .pallas_coder import _cum_prob_from_sym
    from .pallas_coder64 import _div64

    c = np.asarray(cdf).astype(np.int64)

    def kernel(syms_in, hh_in, hl_in, stream_hbm, qw_out, hh_out, hl_out,
               hh_s, hl_s, win, base_s, sem):
        t = pl.program_id(0)  # symbol step is T-1-t (reversed BlockSpec)

        @pl.when(t == 0)
        def _init():
            hh_s[:] = hh_in[:]
            hl_s[:] = hl_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        hh, hl = hh_s[:], hl_s[:]
        sym = syms_in[0]
        cum, prob = _cum_prob_from_sym(sym, c, 24)
        probu = prob.astype(jnp.uint32)

        # refill when head < prob << 8.  Computed as (head >> 8) < prob
        # (exactly equivalent for integers), because prob << 8 wraps u32
        # when prob = 2^24; head < 2^40 by invariant so head >> 8 fits u32.
        m = ((hh << 24) | (hl >> 8)) < probu
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        hh = jnp.where(m, hl, hh)
        hl = jnp.where(m, ex, hl)
        q_hi, q_lo, r = _div64(hh, hl, probu)
        q = cum.astype(jnp.uint32) + r.astype(jnp.uint32)
        hh_s[:] = q_hi
        hl_s[:] = q_lo
        base_s[0] = nxt
        qw_out[0] = q  # raw u32 tiles (see the decode kernel's note)

        @pl.when(t == T - 1)
        def _final():
            hh_out[:] = hh_s[:]
            hl_out[:] = hl_s[:]

    return kernel


@inversion_keyed_cache(maxsize=16)
def _build_tchain24_decoder(cdf_tuple, T: int, L: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    cap_rows = T * R + 1
    kernel = _tchain24_decode_kernel(
        pltpu, pl, cdf=cdf_tuple, T=T, R=R, cap_rows=cap_rows
    )
    RPAD = -(-(R + 1) // 8) * 8
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_tchain24_encoder(cdf_tuple, T: int, L: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    kernel = _tchain24_encode_kernel(pltpu, pl, cdf=cdf_tuple, T=T, R=R)
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def tchain24_decode_pallas(quantiles, cdf, cfg: LaneConfig = TCHAIN24_CFG,
                           interpret: bool | None = None):
    """Default-preset bits-back decode on TPU: (symbols i32[n], remainders
    u32[*], heads u64[L]); matches tchain24_decode_host exactly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert (cfg.state_bits, cfg.word_bits, cfg.precision) == (64, 32, 24)
    L = cfg.num_lanes
    q = np.asarray(quantiles, dtype=np.uint32)
    n = len(q)
    assert n % L == 0 and L % LANES == 0
    if not (q < (1 << 24)).all():
        raise ValueError("quantiles must be 24-bit values")
    T = n // L
    if T == 0:
        return (np.zeros(0, np.int32), np.zeros(0, np.uint32),
                np.full(L, 256, np.uint64))
    R = L // LANES
    cap_rows = T * R + 1
    qw = jnp.asarray(q).reshape(T, R, LANES)
    fn = _build_tchain24_decoder(
        tuple(int(x) for x in np.asarray(cdf)), T, L, interpret
    )
    syms, buf, hh, hl, end = fn(qw)
    e = int(end[0])
    stream = np.asarray(buf).reshape(-1)[e : cap_rows * LANES]
    heads = (
        np.asarray(hh, np.uint64).reshape(-1) << np.uint64(32)
    ) | np.asarray(hl, np.uint64).reshape(-1)
    return np.asarray(syms).reshape(-1), stream, heads


def tchain24_encode_pallas(symbols, remainders, heads, cdf,
                           cfg: LaneConfig = TCHAIN24_CFG,
                           interpret: bool | None = None):
    """Default-preset bits-back reverse pass on TPU: (quantiles u32[n],
    heads u64[L]); matches tchain24_encode_host exactly."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert (cfg.state_bits, cfg.word_bits, cfg.precision) == (64, 32, 24)
    L = cfg.num_lanes
    symbols = np.asarray(symbols, dtype=np.int32)
    n = len(symbols)
    assert n % L == 0 and L % LANES == 0
    T = n // L
    if T == 0:
        return np.zeros(0, np.uint32), np.asarray(heads, np.uint64).copy()
    R = L // LANES
    syms3d = jnp.asarray(symbols).reshape(T, R, LANES)
    h = np.asarray(heads, dtype=np.uint64)
    hh2d = jnp.asarray((h >> np.uint64(32)).astype(np.uint32)).reshape(R, LANES)
    hl2d = jnp.asarray((h & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(
        R, LANES
    )
    stream2d = _pad_stream2d(np.asarray(remainders, dtype=np.uint32), R)
    fn = _build_tchain24_encoder(
        tuple(int(x) for x in np.asarray(cdf)), T, L, interpret
    )
    qw, hh, hl = fn(syms3d, hh2d, hl2d, stream2d)
    heads_out = (
        np.asarray(hh, np.uint64).reshape(-1) << np.uint64(32)
    ) | np.asarray(hl, np.uint64).reshape(-1)
    return np.asarray(qw).reshape(-1), heads_out

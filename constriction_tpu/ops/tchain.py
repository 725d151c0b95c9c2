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
exactly.
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
)


def _cs16(q, cdf):
    """Compare-sum at P=16: (sym, cum, prob); two u32 accumulators (the
    packed single-accumulator trick needs 2P + log2 K <= 32, which P=16
    exceeds)."""
    c = [int(v) for v in np.asarray(cdf)]
    K = len(c) - 1
    qi = q.astype(jnp.int32)
    acc = jnp.zeros(q.shape, jnp.uint32)  # sym << 16 | cum
    prob = jnp.full(q.shape, np.int32(c[1] - c[0]), jnp.int32)
    zero_u = jnp.zeros(q.shape, jnp.uint32)
    zero_i = jnp.zeros(q.shape, jnp.int32)
    for j in range(1, K):
        e = qi >= np.int32(c[j])
        d1 = c[j] - c[j - 1]
        w = (c[j + 1] - c[j]) - d1
        acc = acc + jnp.where(e, np.uint32((1 << 16) | d1), zero_u)
        prob = prob + jnp.where(e, np.int32(w), zero_i)
    sym = (acc >> 16).astype(jnp.int32)
    cum = acc & np.uint32(0xFFFF)
    return sym, cum, prob.astype(jnp.uint32)


def _cs16_from_sym(sym_i32, cdf):
    """(cum, prob) for known symbols (encode side): compares against symbol
    indices instead of CDF boundaries."""
    c = [int(v) for v in np.asarray(cdf)]
    K = len(c) - 1
    acc = jnp.zeros(sym_i32.shape, jnp.uint32)
    prob = jnp.full(sym_i32.shape, np.int32(c[1] - c[0]), jnp.int32)
    zero_u = jnp.zeros(sym_i32.shape, jnp.uint32)
    zero_i = jnp.zeros(sym_i32.shape, jnp.int32)
    for j in range(1, K):
        e = sym_i32 >= np.int32(j)
        d1 = c[j] - c[j - 1]
        w = (c[j + 1] - c[j]) - d1
        acc = acc + jnp.where(e, np.uint32(d1), zero_u)
        prob = prob + jnp.where(e, np.int32(w), zero_i)
    return acc, prob.astype(jnp.uint32)


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
            renorm=m, vals=vals, t=t, T=T, R=R, cap_rows=cap_rows,
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


@functools.lru_cache(maxsize=16)
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
            pl.BlockSpec(memory_space=pltpu.ANY),
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
            pl.BlockSpec(memory_space=pltpu.ANY),
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
    R = L // LANES
    syms3d = jnp.asarray(symbols).reshape(T, R, LANES)
    heads2d = jnp.asarray(np.asarray(heads, dtype=np.uint32)).reshape(R, LANES)
    stream2d = _pad_stream2d(np.asarray(remainders, dtype=np.uint32), R)
    fn = _build_tchain_encoder(tuple(int(x) for x in np.asarray(cdf)), T, L, interpret)
    qw, h = fn(syms3d, heads2d, stream2d)
    return unpack_quantiles(np.asarray(qw)), np.asarray(h).reshape(-1)

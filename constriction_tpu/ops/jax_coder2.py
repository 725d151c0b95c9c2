"""JAX gather-free decoder/encoder for ILANS v2 (shared-stream interleaved rANS).

Everything in the hot loop is dense vector arithmetic:

- model inversion by compare-sum over the CDF (no table gather);
- refill words come from ONE contiguous `lax.dynamic_slice` per step at a
  scalar offset, distributed to lanes by a monotone butterfly expansion
  (log2(L) static rolls + selects);
- the encoder is the exact mirror: butterfly compaction + one contiguous
  `lax.dynamic_update_slice` per step.

See ops/interleaved2.py for the format definition and the numpy oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interleaved import LaneConfig


def _log2(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    return n


def _compare_sum_qf(q: jax.Array, cdf: np.ndarray):
    """Branch-free quantile inversion: returns (sym, cum, prob) u32 vectors.

    ``cdf`` must be a host numpy array (its values are baked into the program
    as scalar constants, which XLA hoists into registers).
    """
    K = len(cdf) - 1
    sym = jnp.zeros_like(q)
    cum = jnp.zeros_like(q)
    right = jnp.zeros_like(q)
    ge_prev = jnp.ones_like(q)  # [cdf[0] <= q] is always true
    for j in range(1, K + 1):
        delta = np.uint32(cdf[j] - cdf[j - 1])
        right = right + delta * ge_prev
        if j < K:
            ge = (q >= np.uint32(cdf[j])).astype(jnp.uint32)
            cum = cum + delta * ge
            sym = sym + ge
            ge_prev = ge
    return sym, cum, right - cum


def _expand_monotone(chunk: jax.Array, d: jax.Array, log_l: int) -> jax.Array:
    """Monotone butterfly expansion: out[l] = chunk[l - d[l]] for the lanes
    that matter (d = lane - rank, non-decreasing); MSB -> LSB, conflict-free
    for monotone routes.

    Runs in uint16 when the payload allows it: halving the element width
    halves the roll bandwidth and engages the packed 16-bit VPU path
    (measured ~4x faster end-to-end on TPU v5e)."""
    ex = chunk
    for b in range(log_l - 1, -1, -1):
        ex = jnp.where((d >> b) & 1, jnp.roll(ex, 1 << b), ex)
    return ex


def _compact_monotone(vals: jax.Array, d: jax.Array, log_l: int) -> jax.Array:
    """Monotone butterfly compaction (inverse of expansion): moves vals[l]
    down by d[l] positions; LSB -> MSB, carrying displacements along."""
    ex = vals
    dd = d
    for b in range(log_l):
        shift = 1 << b
        ex2 = jnp.roll(ex, -shift)
        dd2 = jnp.roll(dd, -shift)
        take = ((dd2 >> b) & 1).astype(bool)
        ex = jnp.where(take, ex2, ex)
        dd = jnp.where(take, dd2, dd)
    return ex


def decode_shared_compare_sum(
    init_states: jax.Array,
    stream: jax.Array,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_steps: int,
    num_symbols: int,
    out_dtype=jnp.int32,
) -> jax.Array:
    """Gather-free i.i.d. decode; returns [num_steps * L] symbols."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = _log2(L)
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)
    lanes = jnp.arange(L, dtype=jnp.uint32)

    # The stream and butterfly run in u16 when the word size allows it: half
    # the roll bandwidth + packed 16-bit VPU ops (measured ~4x end-to-end).
    narrow = W <= 16 and L <= (1 << 16)
    st_dtype = jnp.uint16 if narrow else jnp.uint32
    lanes_n = jnp.arange(L, dtype=st_dtype)

    # Pad so the per-step L-wide slice never reads out of bounds.
    stream_padded = jnp.concatenate(
        [jnp.asarray(stream).astype(st_dtype), jnp.zeros(L, dtype=st_dtype)]
    )
    static_n = isinstance(num_symbols, int)
    tail_start = num_symbols - (num_steps - 1) * L if (static_n and num_steps) else 0

    def step(carry, t):
        states, base = carry
        q = states & qmask
        sym, cum, prob = _compare_sum_qf(q, cdf)
        new_states = (states >> P) * prob + (q - cum)
        if not static_n:
            active = jnp.clip(
                jnp.asarray(num_symbols, jnp.int32) - t * L, 0, L
            ).astype(jnp.uint32)
            new_states = jnp.where(lanes < active, new_states, states)
        elif tail_start < L:
            active = jnp.where(t < num_steps - 1, jnp.uint32(L), jnp.uint32(tail_start))
            new_states = jnp.where(lanes < active, new_states, states)
        states = new_states
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(stream_padded, (base,), (L,))
        d = lanes_n - ranks.astype(st_dtype)
        ex = _expand_monotone(chunk, d, log_l)
        states = jnp.where(m, (states << W) | ex.astype(jnp.uint32), states)
        return (states, base + k.astype(jnp.int32)), sym.astype(out_dtype)

    (states, base), syms = jax.lax.scan(
        step,
        (jnp.asarray(init_states, dtype=jnp.uint32), jnp.int32(0)),
        jnp.arange(num_steps, dtype=jnp.int32),
    )
    return syms.reshape(-1)


def decode_shared_rows(
    init_states: jax.Array,
    stream: jax.Array,
    rows: jax.Array,  # [T, L, K+1] u32: a per-symbol CDF row for every slot
    cfg: LaneConfig,
    num_steps: int,
    num_symbols: int,
    out_dtype=jnp.int32,
) -> jax.Array:
    """Gather-free decode with a *different* categorical model per symbol
    (rank-2 parameterization).  The per-step CDF rows stream in as scan xs;
    inversion is a compare-sum over the row columns (no gathers).

    Inactive tail slots must carry a row that decodes quantile ranges safely
    (e.g. full mass on symbol 0)."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = _log2(L)
    K = rows.shape[-1] - 1
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)
    lanes = jnp.arange(L, dtype=jnp.uint32)
    tail_start = num_symbols - (num_steps - 1) * L if num_steps else 0

    narrow = W <= 16 and L <= (1 << 16)
    st_dtype = jnp.uint16 if narrow else jnp.uint32
    lanes_n = jnp.arange(L, dtype=st_dtype)
    stream_padded = jnp.concatenate(
        [jnp.asarray(stream).astype(st_dtype), jnp.zeros(L, dtype=st_dtype)]
    )

    def step(carry, xs):
        states, base = carry
        t, row = xs  # row: [L, K+1]
        q = states & qmask
        sym = jnp.zeros_like(q)
        cum = jnp.zeros_like(q)
        right = jnp.zeros_like(q)
        ge_prev = jnp.ones_like(q)
        for j in range(1, K + 1):
            delta = row[:, j] - row[:, j - 1]
            right = right + delta * ge_prev
            if j < K:
                ge = (q >= row[:, j]).astype(jnp.uint32)
                cum = cum + delta * ge
                sym = sym + ge
                ge_prev = ge
        prob = right - cum
        new_states = (states >> P) * prob + (q - cum)
        if tail_start < L:
            active = jnp.where(t < num_steps - 1, jnp.uint32(L), jnp.uint32(tail_start))
            new_states = jnp.where(lanes < active, new_states, states)
        states = new_states
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(stream_padded, (base,), (L,))
        ex = _expand_monotone(chunk, lanes_n - ranks.astype(st_dtype), log_l)
        states = jnp.where(m, (states << W) | ex.astype(jnp.uint32), states)
        return (states, base + k.astype(jnp.int32)), sym.astype(out_dtype)

    ts = jnp.arange(num_steps, dtype=jnp.int32)
    (_, _), syms = jax.lax.scan(
        step,
        (jnp.asarray(init_states, dtype=jnp.uint32), jnp.int32(0)),
        (ts, rows),
    )
    return syms.reshape(-1)


def decode_shared_range(
    points: jax.Array,  # u32[L] initial decoder points
    stream: jax.Array,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_steps: int,
    num_symbols: int,
    out_dtype=jnp.int32,
) -> jax.Array:
    """Gather-free i.i.d. decode for the shared-stream RANGE format
    (ILANS2-R; see ops/interleaved2.py and codec.cpp).  Same machinery as the
    rANS decoder -- contiguous slice + monotone butterfly -- with the range
    coder's interval arithmetic (one u32 division per symbol)."""
    assert cfg.state_bits == 32, "JAX range decoder runs at S=32 (native u32)"
    assert points.shape[0] == cfg.num_lanes, (
        f"points has {points.shape[0]} lanes but cfg.num_lanes is "
        f"{cfg.num_lanes}"
    )
    L = points.shape[0]
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = _log2(L)
    lower_bound = np.uint32(1 << (S - W))
    lanes = jnp.arange(L, dtype=jnp.uint32)

    narrow = W <= 16 and L <= (1 << 16)
    st_dtype = jnp.uint16 if narrow else jnp.uint32
    lanes_n = jnp.arange(L, dtype=st_dtype)
    stream_padded = jnp.concatenate(
        [jnp.asarray(stream).astype(st_dtype), jnp.zeros(L, dtype=st_dtype)]
    )
    tail_start = num_symbols - (num_steps - 1) * L if num_steps else 0

    def step(carry, t):
        lows, rngs, pts, base = carry
        scale = rngs >> P
        q = (pts - lows) // scale
        sym, cum, prob = _compare_sum_qf(q, cdf)
        new_lows = lows + scale * cum
        new_rngs = scale * prob
        if tail_start < L:
            active = jnp.where(t < num_steps - 1, jnp.uint32(L), jnp.uint32(tail_start))
            amask = lanes < active
            new_lows = jnp.where(amask, new_lows, lows)
            new_rngs = jnp.where(amask, new_rngs, rngs)
        lows, rngs = new_lows, new_rngs
        m = rngs < lower_bound
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(stream_padded, (base,), (L,))
        ex = _expand_monotone(chunk, lanes_n - ranks.astype(st_dtype), log_l)
        lows = jnp.where(m, lows << W, lows)
        rngs = jnp.where(m, rngs << W, rngs)
        pts = jnp.where(m, (pts << W) | ex.astype(jnp.uint32), pts)
        return (lows, rngs, pts, base + k.astype(jnp.int32)), sym.astype(out_dtype)

    init = (
        jnp.zeros(L, dtype=jnp.uint32),
        jnp.full(L, 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.asarray(points, dtype=jnp.uint32),
        jnp.int32(0),
    )
    (_, _, _, _), syms = jax.lax.scan(step, init, jnp.arange(num_steps, dtype=jnp.int32))
    return syms.reshape(-1)


def decode_shared_batched(
    init_states: jax.Array,  # [B, L] u32
    streams: jax.Array,  # [B, cap] (left-aligned per block)
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_steps: int,
    block_len: int,
    out_dtype=jnp.int32,
) -> jax.Array:
    """Gather-free decode of B independent ILANS2 blocks in one scan.

    The per-step work of a single block underutilizes the VPU (the scan is
    latency-bound); batching B blocks multiplies the independent work per
    step.  All blocks must have `block_len` symbols (pad the message).
    Returns [B, num_steps * L].
    """
    B, L = init_states.shape
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = _log2(L)
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)
    lanes = jnp.arange(L, dtype=jnp.uint32)[None, :]

    narrow = W <= 16 and L <= (1 << 16)
    st_dtype = jnp.uint16 if narrow else jnp.uint32
    lanes_n = jnp.arange(L, dtype=st_dtype)[None, :]

    streams_padded = jnp.concatenate(
        [jnp.asarray(streams).astype(st_dtype), jnp.zeros((B, L), dtype=st_dtype)],
        axis=1,
    )
    tail_start = block_len - (num_steps - 1) * L if num_steps else 0

    def step(carry, t):
        states, bases = carry  # [B, L], i32[B]
        q = states & qmask
        sym, cum, prob = _compare_sum_qf(q, cdf)
        new_states = (states >> P) * prob + (q - cum)
        if tail_start < L:
            active = jnp.where(t < num_steps - 1, jnp.uint32(L), jnp.uint32(tail_start))
            new_states = jnp.where(lanes < active, new_states, states)
        states = new_states
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32, axis=1) - m32
        k = ranks[:, -1] + m32[:, -1]
        chunk = jnp.stack(
            [
                jax.lax.dynamic_slice(streams_padded[b], (bases[b],), (L,))
                for b in range(B)
            ]
        )
        d = lanes_n - ranks.astype(st_dtype)
        ex = chunk
        for b in range(log_l - 1, -1, -1):
            ex = jnp.where((d >> b) & 1, jnp.roll(ex, 1 << b, axis=1), ex)
        states = jnp.where(m, (states << W) | ex.astype(jnp.uint32), states)
        return (states, bases + k.astype(jnp.int32)), sym.astype(out_dtype)

    (_, _), syms = jax.lax.scan(
        step,
        (
            jnp.asarray(init_states, dtype=jnp.uint32),
            jnp.zeros(B, dtype=jnp.int32),
        ),
        jnp.arange(num_steps, dtype=jnp.int32),
    )
    # syms: [T, B, L] -> [B, T * L]
    return jnp.swapaxes(syms, 0, 1).reshape(B, -1)


def encode_shared_tables(
    cums: jax.Array,  # [T, L] u32
    probs: jax.Array,  # [T, L] u32
    cfg: LaneConfig,
    num_steps: int,
    num_symbols: int,
    max_stream: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather-free encoder from per-symbol tables.

    Returns ``(init_states u32[L], stream u32[max_stream], stream_len i32)``;
    the stream is right-aligned in the buffer: valid words occupy
    ``stream[max_stream - stream_len:]``.

    ``max_stream`` must be at least ``num_steps * L + L`` (worst case one
    word per lane per step, plus one L-window of slack for the aligned
    stores).
    """
    L = cums.shape[1]
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = _log2(L)
    seed = np.uint32(1 << (S - W))
    wmask = np.uint32(cfg.word_mask)
    lanes = jnp.arange(L, dtype=jnp.uint32)
    static_n = isinstance(num_symbols, int)
    tail_start = num_symbols - (num_steps - 1) * L if (static_n and num_steps) else 0

    def step(carry, xs):
        states, end, stream = carry
        t, cp, pp = xs
        if not static_n:
            active_cnt = jnp.clip(
                jnp.asarray(num_symbols, jnp.int32) - t * L, 0, L
            ).astype(jnp.uint32)
            active = lanes < active_cnt
        elif tail_start < L:
            active_cnt = jnp.where(t < num_steps - 1, jnp.uint32(L), jnp.uint32(tail_start))
            active = lanes < active_cnt
        else:
            active = jnp.ones(L, dtype=bool)
        renorm = active & ((states >> (S - P)) >= pp)
        r32 = renorm.astype(jnp.uint32)
        ranks = jnp.cumsum(r32) - r32
        k = (ranks[-1] + r32[-1]).astype(jnp.int32)
        vals = jnp.where(renorm, states & wmask, jnp.uint32(0))
        d = lanes - ranks  # full monotone displacement (carried by the network)
        compacted = _compact_monotone(vals, d, log_l)
        # Write compacted[0..k) to stream[end-k, end): load the L-window
        # [end-L, end), right-align the chunk inside it, store it back.
        win_lo = end - L
        window = jax.lax.dynamic_slice(stream, (win_lo,), (L,))
        shifted = jnp.roll(compacted, L - k)
        keep_new = jnp.arange(L, dtype=jnp.int32) >= (L - k)
        window = jnp.where(keep_new, shifted, window)
        stream = jax.lax.dynamic_update_slice(stream, window, (win_lo,))
        states = jnp.where(renorm, states >> W, states)
        new_states = ((states // pp) << P) | (cp + states % pp)
        states = jnp.where(active, new_states, states)
        return (states, end - k, stream), None

    ts = jnp.arange(num_steps, dtype=jnp.int32)
    init = (
        jnp.full(L, seed, dtype=jnp.uint32),
        jnp.int32(max_stream),
        jnp.zeros(max_stream, dtype=jnp.uint32),
    )
    (states, end, stream), _ = jax.lax.scan(step, init, (ts, cums, probs), reverse=True)
    stream_len = jnp.int32(max_stream) - end
    return states, stream, stream_len


@partial(jax.jit, static_argnames=("cfg", "num_steps", "num_symbols", "cdf_tuple"))
def _decode_jit(init_states, stream, cdf_tuple, cfg, num_steps, num_symbols):
    cdf = np.asarray(cdf_tuple, dtype=np.uint64)
    return decode_shared_compare_sum(
        init_states, stream, cdf, cfg, num_steps, num_symbols
    )


def jax_decode_iid2(init_states, stream, cdf, cfg: LaneConfig, num_symbols: int):
    """Convenience jitted entry (bakes the CDF into the program)."""
    T = -(-num_symbols // cfg.num_lanes) if num_symbols else 0
    cdf_tuple = tuple(int(x) for x in np.asarray(cdf))
    return _decode_jit(
        jnp.asarray(init_states, dtype=jnp.uint32),
        jnp.asarray(stream, dtype=jnp.uint32),
        cdf_tuple,
        cfg,
        T,
        num_symbols,
    )

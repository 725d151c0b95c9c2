"""Pallas TPU kernels for the ILANS2 shared-stream interleaved coders:
rANS decode AND encode, plus the ILANS2-R range decoder (the range encoder
lives in ops/pallas_range_enc.py; per-symbol continuous families in
ops/pallas_family.py; bits-back in ops/tchain.py — all built on this
module's shared machinery: `_refill_words`, `_emit_words`, the monotone
butterflies, and `_exact_div`).

Why Pallas here: the XLA lowering of the per-step refill distribution (a
monotone butterfly over [L] lanes whose masks depend on a cumsum of the
refill mask) hits a fusion/layout pathology on TPU (~8 us/step measured for
work that is ~0.5 us of VPU time).  In Pallas we control layout ([R, 128]
u32 tiles in VMEM), use `pltpu.roll` for the butterfly rotations, keep lane
states resident in VMEM scratch across the whole message, and double-buffer
the stream window DMA from HBM.

Per-lane coding algebra is the reference's rANS state machine
(/root/reference/src/stream/stack.rs:1014-1100); the shared-stream format is
defined in ops/interleaved2.py (numpy oracle `decode_shared_cdf`).

NOTE for kernel authors: the CPU test suite runs these kernels through the
Pallas interpreter, which does NOT enforce Mosaic lowering restrictions
(no unsigned reductions, no 16-bit compares/mults/rotates, 8-aligned
sublane shapes for dynamic rotates...).  After touching a kernel, run
benchmarks/tpu_smoke.py on the real chip.

Layout conventions
------------------
- L lanes = [R, 128] u32, R = L // 128 (lane l = (l // 128, l % 128)).
- The word stream is u32 elements each holding one W-bit word, reshaped on
  the host to [rows, 128]; the kernel DMAs a (R+1)-row window per step and
  extracts the L-word chunk at word-granular offset via a dynamic lane
  rotate + row-boundary select.
- Butterfly rolls in *flattened row-major order* decompose into sublane
  rolls (shift >= 128) and lane rolls with a row-carry select (shift < 128).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interleaved import LaneConfig

LANES = 128  # TPU vector lane width; minor dim of every tile


def inversion_keyed_cache(maxsize: int):
    """lru_cache for decoder builders whose kernel form depends on the
    CTPU_FORCE_INVERSION knob (read at trace time by _compare_sum_auto):
    the key includes the knob's current value, so flipping it mid-process
    rebuilds the kernel instead of silently reusing the cached form."""

    def deco(fn):
        @functools.lru_cache(maxsize=maxsize)
        def keyed(_forced_env, *args, **kw):
            return fn(*args, **kw)

        @functools.wraps(fn)
        def wrapper(*args, **kw):
            return keyed(
                os.environ.get("CTPU_FORCE_INVERSION", ""), *args, **kw
            )

        wrapper.cache_clear = keyed.cache_clear
        return wrapper

    return deco


def _log2(x: int) -> int:
    n = 0
    while (1 << n) < x:
        n += 1
    return n


def _lane_iota(R: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)


def _row_iota(R: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)


def _flat_roll(pltpu, x: jax.Array, s: int, lane: jax.Array) -> jax.Array:
    """Roll [R,128] by static s in flattened row-major order."""
    R = x.shape[0]
    sr, sc = s // LANES, s % LANES
    if sc == 0:
        return pltpu.roll(x, sr % R, 0) if sr % R else x
    a = pltpu.roll(x, sc, 1)
    b = pltpu.roll(a, sr % R, 0) if sr % R else a
    c = pltpu.roll(a, (sr + 1) % R, 0)
    return jnp.where(lane >= sc, b, c)


def _expand_monotone_2d(pltpu, chunk: jax.Array, d: jax.Array) -> jax.Array:
    """out[l] = chunk[l - d[l]] (flat order) for monotone displacements d.

    MSB->LSB butterfly: log2(L) rounds of static flat roll + select
    (Nassimi & Sahni; conflict-free for monotone routes).
    """
    R = chunk.shape[0]
    log_l = _log2(R * LANES)
    lane = _lane_iota(R)
    ex = chunk
    for b in range(log_l - 1, -1, -1):
        rolled = _flat_roll(pltpu, ex, 1 << b, lane)
        ex = jnp.where((d >> b) & 1, rolled, ex)
    return ex


def _ranks_flat(pltpu, m32: jax.Array) -> jax.Array:
    """Exclusive prefix sum of m32 ([R,128] i32, values 0/1) in flat order.

    Prefix sums ARE matmuls: the within-row inclusive scan is m @ U (U the
    inclusive upper-triangular 0/1 matrix) and the row offsets are
    L_strict @ broadcast(row totals) — both EXACT with bf16 inputs (0/1
    matrices; totals <= 128) and f32 accumulation (sums < 2^24), and nearly
    free on the MXU.  Measured: 4-5x faster than the log-rounds roll scan
    (which is VMEM-bandwidth-bound).  The [R, R] offsets matmul grows
    quadratically but amortizes over R*128 symbols, so it stays ~linear
    per symbol; the roll fallback only covers pathologically large R.
    """
    R = m32.shape[0]
    if R <= 1024:
        i128 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        j128 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        upper = (i128 <= j128).astype(jnp.bfloat16)
        p1 = jnp.dot(
            m32.astype(jnp.bfloat16), upper, preferred_element_type=jnp.float32
        )
        tot = p1[:, LANES - 1 : LANES]
        ir = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        lstrict = (jr < ir).astype(jnp.bfloat16)
        totb = jnp.broadcast_to(tot, (R, LANES)).astype(jnp.bfloat16)
        offs = jnp.dot(lstrict, totb, preferred_element_type=jnp.float32)
        return (p1 + offs).astype(jnp.int32) - m32

    lane = _lane_iota(R)
    row = _row_iota(R)
    # inclusive scan within rows (along lanes)
    x = m32
    for b in range(7):
        sh = 1 << b
        rolled = pltpu.roll(x, sh, 1)
        x = x + jnp.where(lane >= sh, rolled, 0)
    # row totals, inclusive scan over rows
    t = jnp.broadcast_to(x[:, LANES - 1 : LANES], (R, LANES))
    for b in range(_log2(R)):
        sh = 1 << b
        rolled = pltpu.roll(t, sh, 0)
        t = t + jnp.where(row >= sh, rolled, 0)
    # exclusive row offsets = inclusive shifted down one row
    excl = jnp.where(row >= 1, pltpu.roll(t, 1, 0), 0)
    return excl + x - m32


def _compare_sum_packed(q: jax.Array, cdf: np.ndarray, precision: int):
    """(sym, cum, prob) via a compare-sum with ONE packed u32 accumulator.

    Field layout: acc = sym << 2P | cum << P | prob.  Adding, per boundary j,
    the constant P_j = (1 << 2P) + (d1_j << P) + w_j (w_j the signed second
    difference of the CDF) whenever q >= cdf[j] keeps every field exact:
    the prob partial sum is always the width of a genuine symbol interval
    (in [1, 2^P - K + 1]), the cum partial sum a genuine left-cumulative
    (< 2^P), and sym < K.  Requires 2*precision + ceil(log2(K)) <= 32,
    i.e. the "small" preset (P=12, K<=255).  3 vector ops per boundary.
    """
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    assert 2 * P + max(K - 1, 1).bit_length() <= 32
    qi = q.astype(jnp.int32)
    acc = jnp.full(q.shape, np.uint32(c[1] - c[0]), dtype=jnp.uint32)
    zero = jnp.zeros_like(acc)
    for j in range(1, K):
        e = qi >= np.int32(c[j])
        d1 = c[j] - c[j - 1]
        w = (c[j + 1] - c[j]) - d1
        packed = np.uint32(((1 << (2 * P)) + (d1 << P) + w) & 0xFFFFFFFF)
        acc = acc + jnp.where(e, packed, zero)
    mask = np.uint32((1 << P) - 1)
    prob = acc & mask
    cum = (acc >> P) & mask
    sym = (acc >> (2 * P)).astype(jnp.int32)
    return sym, cum, prob


def _compare_sum_wide(q: jax.Array, cdf: np.ndarray, precision: int):
    """(sym, cum, prob) for alphabets beyond the packed-field budget
    (2P + ceil(log2 K) > 32): two accumulators, 5 vector ops per boundary.
    acc1 packs sym << P | cum, so the sym field has 32 - P bits and the
    form requires K <= 2^(32-P); prob uses a separate signed accumulator of
    CDF second differences."""
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    assert K <= (1 << (32 - P)), (
        f"wide form packs sym << {P}: needs K <= 2^{32 - P}, got K={K}"
    )
    qi = q.astype(jnp.int32)
    acc = jnp.zeros(q.shape, jnp.uint32)  # sym << P | cum
    prob = jnp.full(q.shape, np.int32(c[1] - c[0]), jnp.int32)
    zero_u = jnp.zeros(q.shape, jnp.uint32)
    zero_i = jnp.zeros(q.shape, jnp.int32)
    for j in range(1, K):
        e = qi >= np.int32(c[j])
        d1 = c[j] - c[j - 1]
        w = (c[j + 1] - c[j]) - d1
        acc = acc + jnp.where(e, np.uint32((1 << P) | d1), zero_u)
        prob = prob + jnp.where(e, np.int32(w), zero_i)
    mask = np.uint32((1 << P) - 1)
    sym = (acc >> P).astype(jnp.int32)
    cum = acc & mask
    return sym, cum, prob.astype(jnp.uint32)


def _level2_accumulate(e_fn, vals, B2, shape, off_shift=None):
    """Level-2 boundary accumulation shared by the segmented/segtree
    inversions and the encode-side segmented lookup: one pass over the
    materialized segment boundaries, accumulating the selected left
    boundary (packed with the in-segment offset at bit ``off_shift`` when
    given -- the acc2 = off << SH | cum form) and the next boundary
    (for prob).  ``e_fn(i)`` is the ge-mask for boundary i.  Returns
    ``(acc, cumnext)``."""
    d1 = [vals[i + 1] - vals[i] for i in range(B2)]
    zero_u = jnp.zeros(shape, jnp.uint32)
    step = np.uint32(1 << off_shift) if off_shift is not None else np.uint32(0)
    acc = vals[0].astype(jnp.uint32)
    cn = vals[1].astype(jnp.uint32)
    for i in range(1, B2):
        e = e_fn(i)
        acc = acc + jnp.where(e, d1[i - 1].astype(jnp.uint32) + step, zero_u)
        cn = cn + jnp.where(e, d1[i].astype(jnp.uint32), zero_u)
    return acc, cn


def _seg_cost(K: int, B2: int, precision: int = 15) -> int:
    """Static vector-op estimate for _compare_sum_segmented at segment
    size B2 (used to pick B2; mirrors the op structure below).  Boundary
    materialization pairs two boundaries per u32 accumulator only when
    precision <= 15 (16-bit fields), like _segtree_cost's `per`."""
    Kp = -(-K // B2) * B2
    B1 = Kp // B2
    per = 2 if precision <= 15 else 1
    n_accs = (B2 + per) // per
    return (
        3 * (B1 - 1)            # coarse compares + cb accumulation
        + 2 * n_accs * (B1 - 1)  # boundary materialization (paired)
        + 2 * (B2 + 1)           # unpack
        + B2                     # d1
        + 5 * (B2 - 1)           # level-2 compare + cum/off + cumnext
    )


def _compare_sum_segmented(q: jax.Array, cdf: np.ndarray, precision: int,
                           B2: int | None = None):
    """(sym, cum, prob) via a two-level segmented compare-sum for large
    alphabets: the flat compare-sum costs O(K) ops per symbol with a
    constant of 3 (packed) or 5 (wide); segmenting drops the constant to
    ~1 for K beyond the packed budget.

    Level 1 compares q against the B1-1 coarse boundaries cdf[s*B2]
    (ge-masks e_s double as the segment selector).  The B2+1 fine
    boundaries of the selected segment are then *materialized per lane*
    without any gather: b_i = cdf[i] + sum_s e_s * (cdf[s*B2+i] -
    cdf[(s-1)*B2+i]) -- every increment is a nonnegative host constant, and
    every partial sum is a genuine CDF value <= 2^P, so for P <= 15 two
    boundaries ride one u32 accumulator (16-bit fields, no cross-field
    carry), halving the dominant cost.  Level 2 is a flat compare-sum
    against the materialized per-lane boundaries, accumulating the offset
    and cum in one packed register (cum < 2^16) plus cumnext for prob.
    Bitstream-identical to the flat forms: same (sym, cum, prob).
    """
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    top = 1 << P
    if B2 is None:
        B2 = min((b for b in (8, 16, 32, 64, 128) if b < K),
                 key=lambda b: _seg_cost(K, b, precision))
    B1 = -(-K // B2)
    cpad = c + [top] * (B1 * B2 + 1 - len(c))

    qi = q.astype(jnp.int32)
    es = [qi >= np.int32(cpad[s * B2]) for s in range(1, B1)]
    vals = _materialize_boundaries(es, cpad, B1, B2, P, q.shape)

    # level 2: acc2 = off << SH | cum; SH = 16 suffices while cum < 2^16,
    # and for default-preset precisions (P <= 24) off < B2 <= 2^(32 - P)
    # still fits above the cum field; cumnext for prob
    SH = 16 if P <= 16 else P
    assert B2 <= (1 << (32 - SH))
    acc2, cn = _level2_accumulate(
        lambda i: qi >= vals[i], vals, B2, q.shape, SH
    )

    cb = jnp.zeros(q.shape, jnp.int32)
    one_i = jnp.ones(q.shape, jnp.int32)
    zero_i = jnp.zeros(q.shape, jnp.int32)
    for e in es:
        cb = cb + jnp.where(e, one_i, zero_i)

    cum = acc2 & np.uint32((1 << SH) - 1)
    off = (acc2 >> SH).astype(jnp.int32)
    prob = cn - cum
    sym = cb * np.int32(B2) + off
    return sym, cum, prob


def _materialize_boundaries(es, cpad, B1, B2, precision, shape):
    """Per-lane absolute fine boundaries b_0..b_B2 of the segment selected
    by the coarse ge-masks ``es``, gather-free: b_i = cpad[i] +
    sum_s es[s-1] * (cpad[s*B2+i] - cpad[(s-1)*B2+i]).  Every increment is
    a non-negative host constant and every partial sum a genuine CDF value
    <= 2^precision, so for precision <= 15 two boundaries share one u32
    accumulator (16-bit fields, no cross-field carry)."""
    zero_u = jnp.zeros(shape, jnp.uint32)
    vals = []
    if precision <= 15:
        for t in range(0, B2 + 1, 2):
            u = min(t + 1, B2)
            acc = jnp.full(
                shape, np.uint32((cpad[t] << 16) | cpad[u]), jnp.uint32
            )
            for s in range(1, B1):
                dhi = cpad[s * B2 + t] - cpad[(s - 1) * B2 + t]
                dlo = cpad[s * B2 + u] - cpad[(s - 1) * B2 + u]
                dd = (dhi << 16) | dlo
                if dd:
                    acc = acc + jnp.where(es[s - 1], np.uint32(dd), zero_u)
            vals.append((acc >> 16).astype(jnp.int32))
            if u == t + 1:
                vals.append((acc & np.uint32(0xFFFF)).astype(jnp.int32))
    else:  # precision 16: boundary values reach 2^16, one per accumulator
        for t in range(B2 + 1):
            acc = jnp.full(shape, np.uint32(cpad[t]), jnp.uint32)
            for s in range(1, B1):
                dd = cpad[s * B2 + t] - cpad[(s - 1) * B2 + t]
                if dd:
                    acc = acc + jnp.where(es[s - 1], np.uint32(dd), zero_u)
            vals.append(acc.astype(jnp.int32))
    return vals


# ---------------------------------------------------------------------------
# Bitmap-rank model inversion: K-INDEPENDENT large-alphabet decode
# ---------------------------------------------------------------------------


def _popc_bytes(x: jax.Array) -> jax.Array:
    """SWAR popcount, stopped at the per-byte-counts stage so several words'
    counts can be summed before one shared multiply-fold (byte fields stay
    < 256 for <= 28 words)."""
    m1 = np.uint32(0x55555555)
    m2 = np.uint32(0x33333333)
    m4 = np.uint32(0x0F0F0F0F)
    x = x - ((x >> 1) & m1)
    x = (x & m2) + ((x >> 2) & m2)
    return (x + (x >> 4)) & m4


def _popc_fold(byte_counts: jax.Array) -> jax.Array:
    return ((byte_counts * np.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _popcount32(x: jax.Array) -> jax.Array:
    return _popc_fold(_popc_bytes(x))


def _select_tree(bits, leaves):
    """Gather-free table select: value = leaves[u] where u's bits are the
    boolean arrays ``bits`` (LSB first) and ``leaves`` are host constants.
    Log-depth tree of constant selects -- len(leaves)-1 `where` ops worst
    case, pruned wherever both subtrees are equal constants (common for
    sparse CDFs: empty tail buckets collapse to one constant)."""
    n = len(leaves)
    if n == 1:
        return np.uint32(leaves[0])
    half = n // 2
    lo = _select_tree(bits[:-1], leaves[:half])
    hi = _select_tree(bits[:-1], leaves[half:])
    if isinstance(lo, np.uint32) and isinstance(hi, np.uint32) and lo == hi:
        return lo
    return jnp.where(bits[-1], hi, lo)


def _bitmap_cost(precision: int, b: int) -> int:
    """Static vector-op estimate for _compare_sum_bitmap at bucket width
    2^b (used to pick b)."""
    nb = 1 << (precision - b)
    wpb = 1 << (b - 5)
    naccs = wpb + 2
    return naccs * (nb - 1) + 40 * wpb + 60


def _compare_sum_bitmap(q: jax.Array, cdf: np.ndarray, precision: int,
                        bucket_bits: int | None = None):
    """(sym, cum, prob) with cost INDEPENDENT of the alphabet size K.

    The decode map q -> (sym, cum, prob) is fully determined by the set of
    CDF boundary positions, i.e. a 2^P-bit bitmap over quantile space
    (boundaries are distinct: the models are leaky, every prob >= 1).
    Split quantile space into 2^(P-b) buckets of 2^b quantiles.  Per lane:

    1. select the bucket's constants -- 2^(b-5) bitmap words, the bucket's
       base boundary count, and the prev/next boundary positions outside the
       bucket -- via :func:`_select_tree` over the bucket-index bits of
       ``q >> b`` (pure constant selects, no gathers);
    2. mask the bitmap at ``q``:  sym  = basecount + popcount(bits <= q) - 1,
       cum = position of the highest boundary bit <= q (bit-smear +
       popcount), next = position of the lowest boundary bit > q (isolate
       LSB + popcount), prob = next - cum; empty in-bucket cases fall back
       to the selected prev/next constants.

    ~(2^(b-5)+2) * 2^(P-b) selects + ~100 bit ops total: ~350 ops at P=12
    vs the segmented compare-sum's THETA(K) (~1400 ops at K=1000, ~4900 at
    K=4096).  For q >= 2^P (possible for the range coder on invalid data)
    the result equals the table at q mod 2^P -- a valid entry with
    prob >= 1, so downstream arithmetic stays defined and the invalid-data
    flag does the rejecting.  Bitstream-identical to the other forms.
    Requires cdf[0] == 0 and P <= 15 (prev/next pack into one u32).
    Replaces the reference's O(1) RAM lookup (lookup_contiguous.rs:564-595)
    with an O(log K)-depth in-register scheme -- the TPU has no per-lane
    gather, but constant selects are one VPU op each.
    """
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    assert c[0] == 0 and P <= 15
    if bucket_bits is None:
        bucket_bits = min(range(5, min(P, 10)),
                          key=lambda bb: _bitmap_cost(P, bb))
    # the SWAR byte-count fields hold at most 28 summed words safely;
    # bucket_bits <= 9 keeps WPB = 2^(bucket_bits-5) <= 16 within that
    assert bucket_bits <= 9, (
        f"bucket_bits={bucket_bits} would overflow the popcount byte fields"
    )
    b = bucket_bits
    NB = 1 << (P - b)
    WPB = 1 << (b - 5)

    # host-side per-bucket tables
    import bisect

    cb = c[:K]
    wtab = [[0] * NB for _ in range(WPB)]
    for v in cb:
        wtab[(v >> 5) & (WPB - 1)][v >> b] |= 1 << (v & 31)
    basec, aux = [], []
    for u_ in range(NB):
        i = bisect.bisect_left(cb, u_ << b)
        basec.append(i)
        prev = cb[i - 1] if i > 0 else 0
        i2 = bisect.bisect_left(cb, (u_ + 1) << b)
        nxt = cb[i2] if i2 < K else (1 << P)
        aux.append(prev | (nxt << 16))

    qu = q.astype(jnp.uint32)
    u = (qu >> b).astype(jnp.int32)
    bits = [(u & np.int32(1 << k)) != 0 for k in range(P - b)]
    words = [_select_tree(bits, wtab[w]) for w in range(WPB)]
    auxv = _select_tree(bits, aux)
    basev = _select_tree(bits, basec)

    # split each word at q: le = boundary bits <= q, gt = bits > q
    q_lo = (qu & np.uint32((1 << b) - 1)).astype(jnp.int32)
    les, gts = [], []
    for w in range(WPB):
        rel = q_lo - np.int32(32 * w)
        sh = jnp.clip(rel, 0, 31).astype(jnp.uint32)
        m = (jnp.full(q.shape, 2, jnp.uint32) << sh) - np.uint32(1)
        if w > 0:
            m = jnp.where(rel < 0, np.uint32(0), m)
        wv = words[w] + jnp.zeros(q.shape, jnp.uint32)  # broadcast constants
        le = wv & m
        les.append(le)
        gts.append(wv ^ le)

    pcb = _popc_bytes(les[0])
    for le in les[1:]:
        pcb = pcb + _popc_bytes(le)
    pc = _popc_fold(pcb)
    sym = (basev + jnp.zeros(q.shape, jnp.uint32)).astype(jnp.int32) + pc - 1

    bucket_base = (u << b)

    # cum: highest boundary bit <= q (prev-boundary constant if none)
    sel = les[0]
    base_w = jnp.zeros(q.shape, jnp.int32)
    for w in range(1, WPB):
        nz = les[w] != 0
        sel = jnp.where(nz, les[w], sel)
        base_w = jnp.where(nz, np.int32(32 * w), base_w)
    sm = sel | (sel >> 1)
    sm = sm | (sm >> 2)
    sm = sm | (sm >> 4)
    sm = sm | (sm >> 8)
    sm = sm | (sm >> 16)
    msb = _popcount32(sm) - 1
    prevv = (auxv & np.uint32(0xFFFF)).astype(jnp.int32) + jnp.zeros(
        q.shape, jnp.int32
    )
    cum = jnp.where(pc > 0, bucket_base + base_w + msb, prevv)

    # next: lowest boundary bit > q (next-boundary constant if none)
    selg = gts[WPB - 1]
    gbase = jnp.full(q.shape, np.int32(32 * (WPB - 1)), jnp.int32)
    for w in range(WPB - 2, -1, -1):
        nz = gts[w] != 0
        selg = jnp.where(nz, gts[w], selg)
        gbase = jnp.where(nz, np.int32(32 * w), gbase)
    iso = selg & (np.uint32(0) - selg)
    lsb = _popcount32(iso - np.uint32(1))
    nextv = (auxv >> 16).astype(jnp.int32) + jnp.zeros(q.shape, jnp.int32)
    nxt = jnp.where(selg != 0, bucket_base + gbase + lsb, nextv)

    prob = (nxt - cum).astype(jnp.uint32)
    return sym, cum.astype(jnp.uint32), prob


def _segtree_cost(K: int, P: int, B2: int) -> int:
    """Static vector-op estimate for _compare_sum_segtree."""
    B1 = -(-K // B2)
    B1p = 1 << max(B1 - 1, 1).bit_length() if B1 > 1 else 1
    per = 2 if P <= 15 else 1
    naccs = B2 // per + 1
    return (
        2 * (B1 - 1)              # coarse compares + cb accumulation
        + 2 * max(B1p - 1, 1).bit_length()
        + naccs * (B1p - 1)       # tree materialization
        + (B2 + 2)                # unpack
        + B2                      # d1
        + 5 * (B2 - 1)            # level-2 compare-sum
        + 10
    )


def _compare_sum_segtree(q: jax.Array, cdf: np.ndarray, precision: int,
                         B2: int | None = None):
    """(sym, cum, prob) via coarse compares + TREE-materialized segment
    boundaries: the coarse ge-masks against every B2-th boundary yield the
    segment index cb; cb's BITS then steer constant-select trees that
    materialize the segment's 2-packed boundary pairs (1 select per pair
    per tree level, vs 2 masked-add ops per pair per segment in
    :func:`_compare_sum_segmented`), and a short flat compare-sum finishes
    within the segment.  ~190 ops at K=100 vs the packed form's 297;
    bitstream-identical to every other form.  Requires B2 a power of two.
    """
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    top = 1 << P
    if B2 is None:
        B2 = min((b for b in (8, 16, 32, 64) if b < K),
                 key=lambda b: _segtree_cost(K, P, b))
    B1 = -(-K // B2)
    B1p = 1 << max(B1 - 1, 1).bit_length() if B1 > 1 else 1
    cpad = c + [top] * (B1p * B2 + 2 - len(c))

    qi = q.astype(jnp.int32)
    # coarse segment index: one ge-compare per real segment boundary
    cb = jnp.zeros(q.shape, jnp.int32)
    for s in range(1, B1):
        cb = cb + jnp.where(qi >= np.int32(cpad[s * B2]), 1, 0)
    nbits = max(B1p - 1, 1).bit_length() if B1p > 1 else 0
    bits = [(cb & np.int32(1 << k)) != 0 for k in range(nbits)]

    # materialize the segment's boundaries b_0..b_B2 via constant trees
    per = 2 if P <= 15 else 1
    vals = []
    if per == 2:
        for t in range(0, B2 + 1, 2):
            u = min(t + 1, B2)
            leaves = [
                (cpad[s * B2 + t] << 16) | cpad[s * B2 + u]
                for s in range(B1p)
            ]
            acc = _select_tree(bits, leaves) + jnp.zeros(q.shape, jnp.uint32)
            vals.append((acc >> 16).astype(jnp.int32))
            if u == t + 1:
                vals.append((acc & np.uint32(0xFFFF)).astype(jnp.int32))
    else:
        for t in range(B2 + 1):
            leaves = [cpad[s * B2 + t] for s in range(B1p)]
            acc = _select_tree(bits, leaves) + jnp.zeros(q.shape, jnp.uint32)
            vals.append(acc.astype(jnp.int32))

    # level 2: flat compare-sum within the segment (same as segmented form).
    # acc2 packs off << SH | cum; SH = 16 suffices for P <= 15, and for the
    # default-preset precisions (P <= 24) the off field still fits because
    # off < B2 <= 2^(32 - P).
    SH = 16 if P <= 16 else P
    assert B2 <= (1 << (32 - SH))
    acc2, cn = _level2_accumulate(
        lambda i: qi >= vals[i], vals, B2, q.shape, SH
    )
    cum = acc2 & np.uint32((1 << SH) - 1)
    off = (acc2 >> SH).astype(jnp.int32)
    prob = cn - cum
    sym = cb * np.int32(B2) + off
    return sym, cum, prob


def _compare_sum_auto(q: jax.Array, cdf: np.ndarray, precision: int):
    """Pick the cheapest exact inversion by static vector-op cost:

    - packed single-accumulator compare-sum (3 ops/boundary; needs the
      2P + log2(K) <= 32 field budget) -- small alphabets,
    - segtree (coarse compares + tree-materialized segment, ~190 ops at
      K=100; measured 13.2 GB/s vs packed's 11.3) -- mid alphabets,
    - bitmap-rank (K-independent ~350 ops; P <= 15) -- large alphabets,
    - segmented / wide compare-sums as the general fallback.

    All forms return identical (sym, cum, prob) -- the choice never
    changes the bitstream.
    """
    K = len(cdf) - 1
    P = precision
    # wide packs sym << P | cum: needs sym < 2^(32 - P)
    candidates = []
    if K <= (1 << (32 - P)):
        candidates.append(("wide", 5 * (K - 1)))
    if 2 * P + max(K - 1, 1).bit_length() <= 32:
        candidates.append(("packed", 3 * (K - 1)))
    if K > 16:
        candidates.append(("segmented", min(
            _seg_cost(K, bb, P) for bb in (8, 16, 32, 64, 128) if bb < K
        )))
    if K > 8:
        candidates.append(("segtree", min(
            _segtree_cost(K, P, bb) for bb in (8, 16, 32, 64) if bb < K
        )))
    if P <= 15 and 5 < P and int(cdf[0]) == 0:
        candidates.append(("bitmap", min(
            _bitmap_cost(P, bb) for bb in range(5, min(P, 10))
        )))
    best = min(candidates, key=lambda kv: kv[1])[0]
    forced = os.environ.get("CTPU_FORCE_INVERSION", "")
    if forced:
        # perf-experiment knob: every form returns identical (sym, cum,
        # prob), so forcing one only changes speed.  Honored only when the
        # form's static constraints hold for this (K, P, cdf).
        valid = {name for name, _ in candidates}
        if forced in valid:
            best = forced
        else:
            import warnings

            warnings.warn(
                f"CTPU_FORCE_INVERSION={forced!r} is not valid for "
                f"K={K}, P={P} (valid: {sorted(valid)}); using {best!r}"
            )
    if best == "packed":
        return _compare_sum_packed(q, cdf, P)
    if best == "segtree":
        return _compare_sum_segtree(q, cdf, P)
    if best == "bitmap":
        return _compare_sum_bitmap(q, cdf, P)
    if best == "segmented":
        return _compare_sum_segmented(q, cdf, P)
    return _compare_sum_wide(q, cdf, P)


def _u32_to_f32(x: jax.Array) -> jax.Array:
    """u32 -> f32 (round-to-nearest) without relying on unsigned itofp."""
    hi = (x >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (x & np.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * np.float32(65536.0) + lo


def _exact_div(diff: jax.Array, scale: jax.Array, qbits: int = 21) -> jax.Array:
    """Exact floor(diff / scale) for u32 inputs via f32 divide + correction.

    Default envelope (``qbits <= 21``): true quotient < 2^21.  The f32
    estimate's relative error is ~2^-23 (inputs rounded to f32, division
    correctly rounded), so its absolute error on such a quotient is < 1/2
    and a single +-1 integer remainder correction recovers the floor.

    For ``qbits`` in (21, 32] (the rANS encoders' ``state // prob`` has
    quotients up to 2^(S-P), e.g. 2^24 at precision 8) the estimate can be
    off by up to E = 2^(qbits-23) + 1, beyond +-1's reach.  This path
    additionally requires ``scale < 2^16`` (f32-exact; holds for entropy
    model probabilities, scale < 2^P <= 2^16) and recovers the floor with a
    second f32 division of the small signed remainder, shifted by B*scale
    so the numerator is non-negative and < 2^13 (hence f32-exact): the
    shifted quotient is <= 2B+1 < 2^10, so its f32 error is < 2^-14 while
    any nonzero fractional part is >= 1/scale > 2^-P with 2^(10-P)-bounded
    B*scale products keeping the two separated -- truncation is exact.
    """
    qf = _u32_to_f32(diff) / _u32_to_f32(scale)
    qh = qf.astype(jnp.int32)
    r = (diff - qh.astype(jnp.uint32) * scale).astype(jnp.int32)
    if qbits > 21:
        scale_i = scale.astype(jnp.int32)
        B = (1 << max(qbits - 23, 0)) + 1
        r2 = r + np.int32(B) * scale_i
        corr = (r2.astype(jnp.float32) / scale_i.astype(jnp.float32))
        qh = qh + corr.astype(jnp.int32) - np.int32(B)
        r = (diff - qh.astype(jnp.uint32) * scale).astype(jnp.int32)
    qh = qh + jnp.where(r >= scale.astype(jnp.int32), 1, 0)
    qh = qh - jnp.where(r < 0, 1, 0)
    return qh.astype(jnp.uint32)



def _init_stream_window(pltpu, pl, stream_hbm, win, sem, R):
    """Blocking DMA of the first (R+1)-row stream window into slot 0."""
    dma = pltpu.make_async_copy(
        stream_hbm.at[pl.ds(0, R + 1)], win.at[0], sem.at[0]
    )
    dma.start()
    dma.wait()


def _refill_words(pltpu, pl, *, stream_hbm, win, sem, base, m, t, T, R):
    """Shared decode-side refill machinery.

    Given the refill mask ``m`` and the current stream word offset ``base``:
    counts refills, prefetches the NEXT window (row-clamped so corrupt input
    degrades to garbage output instead of an out-of-bounds DMA), extracts
    the current L-word chunk at the word-granular offset (dynamic lane
    rotate + row-boundary select), butterfly-distributes it to refilling
    lanes, and waits for the prefetch.  Returns ``(ex, nxt)``: the per-lane
    refill word (valid where ``m``) and the next word offset.
    """
    lane = _lane_iota(R)
    lane_flat = _row_iota(R) * LANES + lane
    m32 = jnp.where(m, 1, 0)
    k = jnp.sum(m32)
    nxt = base + k
    slot = t % 2
    row = jnp.minimum(nxt >> 7, np.int32(stream_hbm.shape[0] - (R + 1)))

    @pl.when(t + 1 < T)
    def _prefetch():
        pltpu.make_async_copy(
            stream_hbm.at[pl.ds(row, R + 1)], win.at[1 - slot], sem.at[1 - slot]
        ).start()

    s_off = base & 127
    a = pltpu.roll(win[slot], (128 - s_off) & 127, 1)  # dyn lane rotate by -s
    chunk = jnp.where(lane < 128 - s_off, a[0:R], a[1 : R + 1])
    ranks = _ranks_flat(pltpu, m32)
    ex = _expand_monotone_2d(pltpu, chunk, lane_flat - ranks)

    @pl.when(t + 1 < T)
    def _wait_next():
        pltpu.make_async_copy(
            stream_hbm.at[pl.ds(row, R + 1)], win.at[1 - slot], sem.at[1 - slot]
        ).wait()

    return ex, nxt


def _decode_kernel_body(
    pltpu,
    pl,
    *,
    cdf: np.ndarray,
    cfg: LaneConfig,
    T: int,
    tail: int,
    R: int,
):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)

    def kernel(states_in, stream_hbm, syms_out, states_out,
               states_s, win, base_s, sem):
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            states_s[:] = states_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        states = states_s[:]

        # --- model inversion + state update (reference rANS algebra,
        # stack.rs:1086-1096) ------------------------------------------------
        q = states & qmask
        sym, cum, prob = _compare_sum_auto(q, cdf, P)
        new_states = (states >> P) * prob + (q - cum)
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            new_states = jnp.where(active, new_states, states)
        states = new_states

        m = states < lower
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        states = jnp.where(m, (states << W) | (ex & np.uint32(cfg.word_mask)), states)

        states_s[:] = states
        base_s[0] = nxt
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            states_out[:] = states_s[:]

    return kernel


def _compact_monotone_2d(pltpu, vals: jax.Array, d: jax.Array) -> jax.Array:
    """Inverse of _expand_monotone_2d: moves vals[l] down by d[l] positions
    (flat order), LSB->MSB, carrying displacements along.  For d = lane -
    rank (monotone), renorm lane l lands exactly at position rank_l; other
    positions receive junk that callers must mask by position."""
    R = vals.shape[0]
    L = R * LANES
    log_l = _log2(L)
    lane = _lane_iota(R)
    ex, dd = vals, d
    for b in range(log_l):
        sh = 1 << b
        ex2 = _flat_roll(pltpu, ex, L - sh, lane)
        dd2 = _flat_roll(pltpu, dd, L - sh, lane)
        take = (dd2 >> b) & 1
        ex = jnp.where(take, ex2, ex)
        dd = jnp.where(take, dd2, dd)
    return ex


def _cum_prob_from_sym_flat(sym: jax.Array, cdf: np.ndarray, precision: int):
    """(cum, prob) for known symbols via the packed compare-sum (encode
    side): acc = cum << P | prob, 3 vector ops per CDF boundary."""
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    acc = jnp.full(sym.shape, np.uint32(c[1] - c[0]), dtype=jnp.uint32)
    zero = jnp.zeros_like(acc)
    for j in range(1, K):
        e = sym >= np.int32(j)
        d1 = c[j] - c[j - 1]
        w = (c[j + 1] - c[j]) - d1
        packed = np.uint32(((d1 << P) + w) & 0xFFFFFFFF)
        acc = acc + jnp.where(e, packed, zero)
    mask = np.uint32((1 << P) - 1)
    return (acc >> P) & mask, acc & mask


def _cum_prob_from_sym_segmented(sym: jax.Array, cdf: np.ndarray,
                                 precision: int, B2: int | None = None):
    """(cum, prob) for known symbols via the segmented two-level lookup
    (encode-side twin of _compare_sum_segmented): the segment selector is
    the symbol itself (e_s = sym >= s*B2, host-constant thresholds), the
    segment's boundaries are materialized per lane gather-free, and the
    in-segment offset masks (off >= i) accumulate cum and cumnext.
    ~1 op per boundary instead of 3 for large alphabets."""
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    top = 1 << P
    if B2 is None:
        B2 = min((b for b in (8, 16, 32, 64, 128) if b < K),
                 key=lambda b: _seg_cost(K, b, precision))
    B1 = -(-K // B2)
    cpad = c + [top] * (B1 * B2 + 1 - len(c))

    si = sym.astype(jnp.int32)
    es = [si >= np.int32(s * B2) for s in range(1, B1)]
    vals = _materialize_boundaries(es, cpad, B1, B2, P, sym.shape)

    cb = jnp.zeros(sym.shape, jnp.int32)
    one_i = jnp.ones(sym.shape, jnp.int32)
    zero_i = jnp.zeros(sym.shape, jnp.int32)
    for e in es:
        cb = cb + jnp.where(e, one_i, zero_i)
    off = si - cb * np.int32(B2)

    cum, cn = _level2_accumulate(
        lambda i: off >= np.int32(i), vals, B2, sym.shape
    )
    return cum, cn - cum


def _select_tree_vec(bits, leaves):
    """Vector-leaf twin of :func:`_select_tree`: selects among materialized
    per-lane arrays by index bits (LSB first); len(leaves)-1 `where` ops."""
    n = len(leaves)
    if n == 1:
        return leaves[0]
    half = n // 2
    lo = _select_tree_vec(bits[:-1], leaves[:half])
    hi = _select_tree_vec(bits[:-1], leaves[half:])
    if lo is hi:
        return lo
    return jnp.where(bits[-1], hi, lo)


def _tree_cost(K: int, P: int, B2: int) -> int:
    B1 = -(-K // B2)
    per = 2 if P <= 15 else 1
    naccs = B2 // per + 1
    nb1 = max(B1 - 1, 1).bit_length() if B1 > 1 else 0
    return (
        naccs * ((1 << nb1) - 1)          # coarse constant trees
        + 2 * (B2 // per - 0)             # two fine vector trees (~B2/per each)
        + 2 * (nb1 + max(B2 // per, 1).bit_length()) + 8
    )


def _cum_prob_from_sym_tree(sym: jax.Array, cdf: np.ndarray, precision: int,
                            B2: int | None = None):
    """(cum, prob) for known symbols with NO compares at all: the symbol
    index is an input, so its bits directly steer constant-select trees.

    Split the alphabet into segments of B2 (a power of two).  The coarse
    bits of ``sym`` select, via :func:`_select_tree`, the segment's packed
    boundary pairs (two boundaries per u32 for P <= 15); the fine bits then
    select the (cum, next) pair among the materialized vectors via
    :func:`_select_tree_vec`, and the parity bit picks the half.  Cost
    ~(B2/2+1)(B1-1) + B2 selects: ~100 ops at K=100 (vs 297 for the flat
    packed compare-sum), ~580 at K=1000 (vs ~1400 segmented).
    """
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    top = 1 << P
    per = 2 if P <= 15 else 1
    if B2 is None:
        B2 = min((b for b in (8, 16, 32, 64, 128) if b // per >= 1),
                 key=lambda b: _tree_cost(K, P, b))
    lb2 = B2.bit_length() - 1
    B1 = -(-K // B2)
    B1p = 1 << max(B1 - 1, 1).bit_length() if B1 > 1 else 1
    cpad = c + [top] * (B1p * B2 + 2 - len(c))

    si = sym.astype(jnp.int32)
    s_hi = si >> lb2
    off = si & np.int32(B2 - 1)
    hi_bits = [(s_hi & np.int32(1 << k)) != 0
               for k in range(max(B1p - 1, 1).bit_length() if B1p > 1 else 0)]

    if per == 2:
        # materialize the segment's boundary pairs b_{2j} | b_{2j+1} << 16
        npairs = B2 // 2 + 1
        pairs = []
        for j in range(npairs):
            leaves = [
                cpad[s * B2 + 2 * j] | (cpad[s * B2 + 2 * j + 1] << 16)
                for s in range(B1p)
            ]
            pairs.append(_select_tree(hi_bits, leaves))
        u = off >> 1
        u_bits = [(u & np.int32(1 << k)) != 0
                  for k in range(max(B2 // 2 - 1, 1).bit_length())]
        t1 = _select_tree_vec(u_bits, pairs[: B2 // 2])
        t2 = _select_tree_vec(u_bits, pairs[1 : B2 // 2 + 1])
        t1 = t1 + jnp.zeros(sym.shape, jnp.uint32)
        t2 = t2 + jnp.zeros(sym.shape, jnp.uint32)
        odd = (off & 1) != 0
        lo16 = np.uint32(0xFFFF)
        cum = jnp.where(odd, t1 >> 16, t1 & lo16)
        nxt = jnp.where(odd, t2 & lo16, t1 >> 16)
        return cum, nxt - cum

    # P = 16: one boundary per accumulator
    vals = []
    for j in range(B2 + 1):
        leaves = [cpad[s * B2 + j] for s in range(B1p)]
        vals.append(_select_tree(hi_bits, leaves))
    o_bits = [(off & np.int32(1 << k)) != 0
              for k in range(max(B2 - 1, 1).bit_length())]
    cum = _select_tree_vec(o_bits, vals[:B2]) + jnp.zeros(sym.shape, jnp.uint32)
    nxt = _select_tree_vec(o_bits, vals[1 : B2 + 1]) + jnp.zeros(
        sym.shape, jnp.uint32
    )
    return cum, nxt - cum


def _bitmapsel_cost(precision: int, b: int) -> int:
    """Static vector-op estimate for _cum_prob_from_sym_bitmap at bucket
    width 2^b (used to pick b and to dispatch against the tree form)."""
    nb = 1 << (precision - b)
    wpb = 1 << (b - 5)
    # bucket rank + (words + base + next) select trees + per-word popcounts
    # and the word pick + in-word bit select + next-bit scan
    return 2 * (nb - 1) + (wpb + 2) * (nb - 1) + 12 * wpb + 120


def _cum_prob_from_sym_bitmap(sym: jax.Array, cdf: np.ndarray,
                              precision: int, bucket_bits: int | None = None):
    """(cum, prob) for known symbols with cost INDEPENDENT of K: the
    encode-side twin of :func:`_compare_sum_bitmap`.

    The boundary positions ``cdf[0..K-1]`` form a 2^P-bit bitmap over
    quantile space (distinct: leaky models have every prob >= 1), so
    ``cum = cdf[sym]`` is the position of the ``sym``-th set bit -- a
    SELECT, the inverse of the decoder's RANK.  Split quantile space into
    2^(P-b) buckets of 2^b bits.  Per lane:

    1. the bucket holding the ``sym``-th bit is the rank of ``sym`` in the
       per-bucket base counts (compare-sum over <= 2^(P-b) host constants,
       deduplicated);
    2. select the bucket's bitmap words + base count + after-bucket next
       boundary via :func:`_select_tree` on the bucket-index bits;
    3. in-bucket select: per-word popcounts pick the word, SWAR byte
       counts pick the byte, two halving steps pick the bit;
    4. ``nxt = cdf[sym+1]`` is the next set bit after ``cum`` (isolate-LSB
       on the masked word, then the first nonzero later word, else the
       selected after-bucket constant -- which is 2^P when sym+1 == K).

    Bitstream-identical to the other encode lookups.  Requires
    cdf[0] == 0 and P <= 15 (positions fit the select constants); at
    K=4096/P=12 this is ~330 ops vs the select tree's ~2100."""
    c = [int(v) for v in cdf]
    K = len(c) - 1
    P = precision
    assert c[0] == 0 and P <= 15
    if bucket_bits is None:
        bucket_bits = min(range(5, min(P, 10)),
                          key=lambda bb: _bitmapsel_cost(P, bb))
    assert bucket_bits <= 9
    b = bucket_bits
    NB = 1 << (P - b)
    WPB = 1 << (b - 5)

    import bisect
    from collections import Counter

    cb = c[:K]
    wtab = [[0] * NB for _ in range(WPB)]
    for v in cb:
        wtab[(v >> 5) & (WPB - 1)][v >> b] |= 1 << (v & 31)
    basec, nxta = [], []
    for u_ in range(NB):
        basec.append(bisect.bisect_left(cb, u_ << b))
        i2 = bisect.bisect_left(cb, (u_ + 1) << b)
        nxta.append(cb[i2] if i2 < K else (1 << P))

    si = sym.astype(jnp.int32)
    zero = jnp.zeros(sym.shape, jnp.int32)

    # 1. bucket u = max{u : basec[u] <= sym} as a rank over the (sorted)
    #    base counts; equal thresholds collapse to one compare
    u = zero
    const_hits = 0
    for val, mult in sorted(Counter(basec[1:]).items()):
        if val == 0:
            const_hits += mult
        else:
            u = u + jnp.where(si >= np.int32(val), np.int32(mult), zero)
    if const_hits:
        u = u + np.int32(const_hits)

    # 2. bucket constants by u's bits
    bits = [(u & np.int32(1 << k)) != 0 for k in range(P - b)]
    uz32 = jnp.zeros(sym.shape, jnp.uint32)
    words = [_select_tree(bits, wtab[w]) + uz32 for w in range(WPB)]
    basev = (_select_tree(bits, basec) + uz32).astype(jnp.int32)
    nxtv = (_select_tree(bits, nxta) + uz32).astype(jnp.int32)
    r = si - basev  # 0-based rank of the target bit within the bucket

    # 3a. pick the word holding the r-th set bit (prefix popcounts)
    selw = words[0]
    rbase = zero
    wbase = zero
    if WPB > 1:
        pref = _popcount32(words[0])
        for w in range(1, WPB):
            gow = r >= pref
            selw = jnp.where(gow, words[w], selw)
            rbase = jnp.where(gow, pref, rbase)
            wbase = jnp.where(gow, np.int32(32 * w), wbase)
            if w < WPB - 1:
                pref = pref + _popcount32(words[w])
    r2 = r - rbase

    # 3b. byte within the word (SWAR byte counts)
    bc = _popc_bytes(selw)
    p1 = (bc & np.uint32(0xFF)).astype(jnp.int32)
    p2 = p1 + ((bc >> 8) & np.uint32(0xFF)).astype(jnp.int32)
    p3 = p2 + ((bc >> 16) & np.uint32(0xFF)).astype(jnp.int32)
    i1 = r2 >= p1
    i2_ = r2 >= p2
    i3 = r2 >= p3
    byte = (jnp.where(i1, 1, 0) + jnp.where(i2_, 1, 0)
            + jnp.where(i3, 1, 0))
    rb = r2 - jnp.where(i3, p3, jnp.where(i2_, p2, jnp.where(i1, p1, zero)))
    xb = (selw >> (byte * 8).astype(jnp.uint32)) & np.uint32(0xFF)

    # 3c. bit within the byte (halving descend; each level tests the rank
    #     against the popcount of the low half)
    lo4 = xb & np.uint32(0xF)
    p4 = ((lo4 & 1) + ((lo4 >> 1) & 1) + ((lo4 >> 2) & 1)
          + (lo4 >> 3)).astype(jnp.int32)
    hi4 = rb >= p4
    nib = jnp.where(hi4, xb >> 4, lo4)
    r4 = rb - jnp.where(hi4, p4, zero)
    lo2 = nib & np.uint32(0x3)
    p2b = ((lo2 & 1) + (lo2 >> 1)).astype(jnp.int32)
    hi2 = r4 >= p2b
    pr = jnp.where(hi2, nib >> 2, lo2) & np.uint32(0x3)
    r5 = r4 - jnp.where(hi2, p2b, zero)
    hi1 = r5 >= (pr & 1).astype(jnp.int32)
    pos = (byte * 8 + jnp.where(hi4, 4, 0) + jnp.where(hi2, 2, 0)
           + jnp.where(hi1, 1, 0))
    bucket_base = u << b
    cum = bucket_base + wbase + pos

    # 4. next boundary: first set bit after pos in selw, else the first
    #    nonzero later word, else the after-bucket constant
    above = selw & ~((np.uint32(2) << pos.astype(jnp.uint32)) - np.uint32(1))
    found = above
    fbase = wbase
    for w in range(1, WPB):
        use = jnp.logical_and(
            jnp.logical_and(np.int32(32 * w) > wbase, words[w] != 0),
            found == 0,
        )
        found = jnp.where(use, words[w], found)
        fbase = jnp.where(use, np.int32(32 * w), fbase)
    iso = found & (np.uint32(0) - found)
    lsb = _popcount32(iso - np.uint32(1))
    nxt = jnp.where(found != 0, bucket_base + fbase + lsb, nxtv)
    return cum.astype(jnp.uint32), (nxt - cum).astype(jnp.uint32)


def _cum_prob_from_sym(sym: jax.Array, cdf: np.ndarray, precision: int):
    """Encode-side (cum, prob) lookup, picked by static vector-op cost:

    - flat packed compare-sum (3 ops/boundary; needs 2P <= 32) -- tiny
      alphabets,
    - bit-steered select trees (the symbol is an input, so its bits can
      directly steer constant selects) -- small/mid alphabets and all
      P > 15,
    - bitmap select (K-independent ~330 ops; P <= 15) -- large alphabets.

    All forms return identical (cum, prob) -- the choice never changes
    the bitstream.  CTPU_FORCE_INVERSION's "tree"/"bitmap" values are
    honored here too (when valid) so perf experiments can steer both
    sides of the coder."""
    K = len(cdf) - 1
    P = precision
    candidates = []
    if K <= 16 and P <= 15:
        candidates.append(("flat", 3 * (K - 1)))
    per = 2 if P <= 15 else 1
    candidates.append(("tree", min(
        _tree_cost(K, P, bb) for bb in (8, 16, 32, 64, 128) if bb // per >= 1
    )))
    if 5 < P <= 15 and int(cdf[0]) == 0:
        candidates.append(("bitmap", min(
            _bitmapsel_cost(P, bb) for bb in range(5, min(P, 10))
        )))
    best = min(candidates, key=lambda kv: kv[1])[0]
    forced = os.environ.get("CTPU_FORCE_INVERSION", "")
    if forced and forced in {name for name, _ in candidates}:
        best = forced
    if best == "bitmap":
        return _cum_prob_from_sym_bitmap(sym, cdf, P)
    if best == "tree":
        return _cum_prob_from_sym_tree(sym, cdf, P)
    return _cum_prob_from_sym_flat(sym, cdf, P)



def _emit_words(pltpu, pl, *, stream_out, img, sem, arow_s, renorm, vals,
                t, T, R):
    """Shared encode-side emission machinery.

    Compacts ``vals`` (the W-bit words of renormalizing lanes) into stream
    order via the inverse monotone butterfly and writes them right-to-left
    at the decreasing end pointer ``arow_s[0]``: each (R+1)-row window image
    is built by merging the new chunk over the previous image shifted into
    place (so finalized words above the end pointer are rewritten with their
    true values), and window DMAs are serialized but overlap compute.
    Returns the emission count ``k``; commits the new end pointer."""
    lane_flat = _row_iota(R) * LANES + _lane_iota(R)
    slot = t % 2
    e = arow_s[0]
    a_prev = arow_s[1]

    r32 = jnp.where(renorm, 1, 0)
    k = jnp.sum(r32)
    ranks = _ranks_flat(pltpu, r32)
    compacted = _compact_monotone_2d(pltpu, vals, lane_flat - ranks)

    e_new = e - k
    a = e_new >> 7
    s_off = e_new & 127
    rel = a_prev - a

    # image buffers are padded to a multiple of 8 rows (dynamic sublane
    # rotates require 8-aligned shapes); only rows [0, R+1) are DMA'd
    RPAD = -(-(R + 1) // 8) * 8
    ext = jnp.concatenate(
        [compacted, jnp.zeros((RPAD - R, LANES), jnp.uint32)], axis=0
    )
    lane1 = _lane_iota(RPAD)
    flat1 = _row_iota(RPAD) * LANES + lane1
    aa = pltpu.roll(ext, s_off, 1)
    rot = jnp.where(lane1 >= s_off, aa, pltpu.roll(aa, 1, 0))
    mask_new = jnp.logical_and(flat1 >= s_off, flat1 < s_off + k)
    prev = pltpu.roll(img[1 - slot], rel, 0)
    img[slot] = jnp.where(mask_new, rot, prev)

    @pl.when(t > 0)
    def _wait_prev():
        pltpu.make_async_copy(
            img.at[1 - slot, pl.ds(0, R + 1)],
            stream_out.at[pl.ds(a_prev, R + 1)], sem.at[1 - slot],
        ).wait()

    pltpu.make_async_copy(
        img.at[slot, pl.ds(0, R + 1)],
        stream_out.at[pl.ds(a, R + 1)], sem.at[slot],
    ).start()

    arow_s[0] = e_new
    arow_s[1] = a

    @pl.when(t == T - 1)
    def _final_wait():
        pltpu.make_async_copy(
            img.at[slot, pl.ds(0, R + 1)],
            stream_out.at[pl.ds(a, R + 1)], sem.at[slot],
        ).wait()

    return e_new


def _encode_kernel_body(
    pltpu,
    pl,
    *,
    table_src,
    n_inputs: int,
    cfg: LaneConfig,
    T: int,
    tail: int,
    R: int,
    cap_rows: int,
    seeded: bool = False,
):
    """ILANS2 encoder (mirror of the decoder; oracle:
    ops/interleaved2.encode_shared).  Walks encode steps T-1..0 (the grid
    index is reversed in the symbol BlockSpec), emits renormalization words
    right-to-left into the stream buffer at a decreasing end pointer, and
    resolves the word-granular window writes by merging each new chunk over
    the previous window image (so already-finalized words above the end
    pointer are rewritten with their true values, never clobbered).

    ``table_src(input_refs)`` supplies the per-lane ``(cum, prob)`` for the
    step -- from a symbol tile + host CDF (_build_encoder), or from
    precomputed exact-family planes (ops/exact_family.py); the coding
    algebra is written ONCE.

    ``seeded=True`` appends one [R, 128] u32 input after the table inputs:
    per-lane encoder START states in [2^(S-W), 2^S) instead of the floor
    (the v2 framing's payload carrier, ops/framing.py)."""
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    seed = np.uint32(1 << (S - W))
    wmask = np.uint32(cfg.word_mask)
    n_all = n_inputs + (1 if seeded else 0)

    def kernel(*refs):
        ins = refs[:n_inputs]
        (stream_out, states_out, end_out,
         states_s, img, arow_s, sem) = refs[n_all:]
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            if seeded:
                states_s[:] = refs[n_inputs][:]
            else:
                states_s[:] = jnp.full((R, LANES), seed, jnp.uint32)
            arow_s[0] = cap_rows * LANES  # end pointer e (words)
            arow_s[1] = cap_rows  # previous window bottom row a_prev

        states = states_s[:]
        cum, prob = table_src(ins)

        if tail < L:
            active = jnp.logical_or(t > 0, lane_flat < tail)
        else:
            active = None

        renorm = (states >> (S - P)) >= prob
        if active is not None:
            renorm = jnp.logical_and(renorm, active)
        vals = jnp.where(renorm, states & wmask, np.uint32(0))
        e_new = _emit_words(
            pltpu, pl, stream_out=stream_out, img=img, sem=sem, arow_s=arow_s,
            renorm=renorm, vals=vals, t=t, T=T, R=R,
        )

        # state update (reference rANS encode algebra, stack.rs:1035-1046)
        shifted = jnp.where(renorm, states >> W, states)
        q = _exact_div(shifted, prob, qbits=S - P)
        rem = shifted - q * prob
        new_states = (q << P) | (cum + rem)
        if active is not None:
            new_states = jnp.where(active, new_states, shifted)
        states_s[:] = new_states

        @pl.when(t == T - 1)
        def _final():
            states_out[:] = states_s[:]
            end_out[0] = e_new
            end_out[1] = 0

    return kernel


@functools.lru_cache(maxsize=32)
def _build_encoder(cdf_tuple, cfg: LaneConfig, T: int, tail: int, L: int,
                   cap_rows: int, interpret: bool, seeded: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    def _cdf_src(ins):
        return _cum_prob_from_sym(ins[0][0], cdf, cfg.precision)

    kernel = _encode_kernel_body(
        pltpu, pl, table_src=_cdf_src, n_inputs=1, cfg=cfg, T=T, tail=tail,
        R=R, cap_rows=cap_rows, seeded=seeded,
    )

    in_specs = [
        # encode walks steps T-1..0: reverse the block index
        pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if seeded:
        in_specs.append(
            pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stream buffer in HBM
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + R + 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),        # states
            pltpu.VMEM((2, -(-(R + 1) // 8) * 8, LANES), jnp.uint32),  # window images (8-aligned)
            pltpu.SMEM((2,), jnp.int32),                # e, a_prev
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def encode_iid_pallas(
    symbols,
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: bool | None = None,
    seeds: np.ndarray | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Encode i.i.d. categorical symbols into the ILANS2 format on TPU.

    Bit-exact with ops/interleaved2.encode_shared (the host encoder):
    returns ``(init_states u32[L], stream u32[num_words])``.

    ``seeds`` (u32[L], each in [2^(S-W), 2^S)) sets per-lane encoder start
    states -- the v2 framing's recoverable payload carrier
    (ops/framing.py); default is the 2^(S-W) floor.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    assert cfg.state_bits == 32 and cfg.word_bits == 16
    symbols = jnp.asarray(symbols, dtype=jnp.int32)
    n = int(symbols.shape[0])
    T = -(-n // L) if n else 0
    if T == 0:
        if seeds is not None:
            return (jnp.asarray(np.asarray(seeds, np.uint32)),
                    jnp.zeros((0,), jnp.uint32))
        return (jnp.full(L, np.uint32(1 << (cfg.state_bits - cfg.word_bits)),
                         jnp.uint32), jnp.zeros((0,), jnp.uint32))
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = -(-(T * L) // LANES) + 1  # worst case one word/lane/step

    syms3d = jnp.concatenate(
        [symbols, jnp.zeros(T * L - n, jnp.int32)]
    ).reshape(T, R, LANES)
    fn = _build_encoder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, cap_rows,
        interpret, seeded=seeds is not None,
    )
    if seeds is not None:
        s2d = jnp.asarray(
            np.asarray(seeds, np.uint32).reshape(R, LANES)
        )
        stream_buf, states, end = fn(syms3d, s2d)
    else:
        stream_buf, states, end = fn(syms3d)
    e = int(end[0])
    return states.reshape(-1), stream_buf.reshape(-1)[e : cap_rows * LANES]


def _range_decode_kernel_body(
    pltpu,
    pl,
    *,
    cdf: np.ndarray,
    cfg: LaneConfig,
    T: int,
    tail: int,
    R: int,
    seeded: bool = False,
):
    """ILANS2-R: shared-stream interleaved RANGE decoding (oracle:
    ops/interleaved2.decode_shared_range_cdf; reference per-lane algebra
    /root/reference/src/stream/queue.rs:968-1035).  Differences from rANS:
    three u32 state arrays (lower, range, point), a per-lane division for
    the quantile (f32 divide + exact correction), and the refill shifts all
    three.

    ``seeded=True`` adds two [R, 128] u32 inputs (initial lows, ranges)
    after the points: a full mid-stream decoder state, for resuming from a
    within-block checkpoint (interleaved2.decode_range_from_checkpoint)."""
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    lower_bound = np.uint32(1 << (S - W))

    def kernel(*refs):
        if seeded:
            (points_in, lows_in, rngs_in, stream_hbm, syms_out, points_out,
             bad_out, lows_s, rngs_s, pts_s, win, base_s, sem) = refs
        else:
            (points_in, stream_hbm, syms_out, points_out, bad_out,
             lows_s, rngs_s, pts_s, win, base_s, sem) = refs
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            if seeded:
                lows_s[:] = lows_in[:]
                rngs_s[:] = rngs_in[:]
            else:
                lows_s[:] = jnp.zeros((R, LANES), jnp.uint32)
                rngs_s[:] = jnp.full(
                    (R, LANES), np.uint32(0xFFFFFFFF), jnp.uint32
                )
            pts_s[:] = points_in[:]
            base_s[0] = 0
            base_s[1] = 0  # invalid-data flag
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)

        lows, rngs, pts = lows_s[:], rngs_s[:], pts_s[:]

        scale = rngs >> P
        q = _exact_div(pts - lows, scale)
        # invalid-data detection (queue.rs:991-993): a quantile >= 2^P means
        # the data is inconsistent with the entropy model.  The reduction
        # runs in i32 (q < 2^21 always; Mosaic has no unsigned reductions).
        qi_chk = q.astype(jnp.int32)
        if tail < L:
            act_q = jnp.logical_or(t < T - 1, lane_flat < tail)
            qmaxv = jnp.max(jnp.where(act_q, qi_chk, 0))
        else:
            qmaxv = jnp.max(qi_chk)
        base_s[1] = base_s[1] | jnp.where(
            qmaxv >= np.int32(1 << P), np.int32(1), np.int32(0)
        )
        sym, cum, prob = _compare_sum_auto(q, cdf, P)
        new_lows = lows + scale * cum
        new_rngs = scale * prob
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            new_lows = jnp.where(active, new_lows, lows)
            new_rngs = jnp.where(active, new_rngs, rngs)
        lows, rngs = new_lows, new_rngs

        m = rngs < lower_bound
        ex, nxt = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        lows_s[:] = jnp.where(m, lows << W, lows)
        rngs_s[:] = jnp.where(m, rngs << W, rngs)
        pts_s[:] = jnp.where(
            m, (pts << W) | (ex & np.uint32(cfg.word_mask)), pts
        )
        base_s[0] = nxt
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            points_out[:] = pts_s[:]
            bad_out[0] = base_s[1]
            bad_out[1] = 0

    return kernel


@inversion_keyed_cache(maxsize=32)
def _build_range_decoder(cdf_tuple, cfg: LaneConfig, T: int, tail: int, L: int,
                         interpret: bool, seeded: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _range_decode_kernel_body(
        pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R, seeded=seeded
    )

    in_specs = [
        pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
    ]
    if seeded:
        in_specs += [
            pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def _stream_rows(num_words: int, R: int) -> int:
    """Rows of the [rows, LANES] stream window for a num_words stream: the
    (R + 2)-row margin lets the decoder's window DMA run past the end."""
    return -(-num_words // LANES) + (R + 2)


def _pad_stream2d(stream, R: int):
    stream = jnp.asarray(stream, dtype=jnp.uint32)
    rows = _stream_rows(int(stream.shape[0]), R)
    pad = rows * LANES - int(stream.shape[0])
    return jnp.concatenate(
        [stream, jnp.zeros(pad, dtype=jnp.uint32)]
    ).reshape(rows, LANES)


def decode_shared_range_pallas(
    points,
    stream,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_symbols: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Decode an ILANS2-R container with the Pallas TPU kernel (matches
    ops/interleaved2.decode_shared_range_cdf exactly)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    assert cfg.state_bits == 32 and cfg.word_bits == 16
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        return jnp.zeros((0,), jnp.int32)
    tail = num_symbols - (T - 1) * L
    R = L // LANES
    fn = _build_range_decoder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )
    syms, _pts, bad = fn(
        jnp.asarray(points, dtype=jnp.uint32).reshape(R, LANES),
        _pad_stream2d(stream, R),
    )
    if int(bad[0]):
        raise ValueError(
            "Tried to decode data that is inconsistent with the entropy model."
        )
    return syms.reshape(-1)[:num_symbols]


@inversion_keyed_cache(maxsize=32)
def _build_decoder(cdf_tuple, cfg: LaneConfig, T: int, tail: int, L: int,
                   interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdf = np.asarray(cdf_tuple, dtype=np.int64)
    R = L // LANES
    kernel = _decode_kernel_body(
        pltpu, pl, cdf=cdf, cfg=cfg, T=T, tail=tail, R=R
    )

    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stream stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.uint32),       # states
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),  # stream windows
            pltpu.SMEM((1,), jnp.int32),                # base word offset
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def decode_shared_pallas(
    init_states,
    stream,
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_symbols: int,
    interpret: bool | None = None,
    return_final_states: bool = False,
) -> jax.Array:
    """Decode an ILANS2 container with the Pallas TPU kernel.

    Matches ops/interleaved2.decode_shared_cdf exactly.  ``stream`` is the
    u32 word array (one W-bit word per element); padding and reshaping to
    the [rows, 128] window layout happen here.  ``interpret=None`` selects
    the Pallas interpreter automatically off-TPU (tests on the CPU mesh).

    ``return_final_states=True`` returns ``(symbols, final_states u32[L])``
    (after a full decode these equal the encoder's seeds; the v2 framing's
    payload recovery, ops/framing.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0, "num_lanes must be a multiple of 128"
    assert cfg.state_bits == 32 and cfg.word_bits == 16
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        empty = jnp.zeros((0,), jnp.int32)
        if return_final_states:
            return empty, np.asarray(init_states, np.uint32).reshape(-1)
        return empty
    tail = num_symbols - (T - 1) * L
    R = L // LANES

    stream2d = _pad_stream2d(stream, R)

    fn = _build_decoder(
        tuple(int(x) for x in np.asarray(cdf)),
        cfg, T, tail, L, interpret,
    )
    syms, states = fn(
        jnp.asarray(init_states, dtype=jnp.uint32).reshape(R, LANES), stream2d
    )
    if return_final_states:
        return (
            syms.reshape(-1)[:num_symbols],
            np.asarray(states, np.uint32).reshape(-1),
        )
    return syms.reshape(-1)[:num_symbols]

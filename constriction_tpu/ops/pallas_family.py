"""Device-native quantized continuous families for the ILANS2 Pallas coder.

The neural-compression workload (BASELINE config 5) models every symbol with
its own continuous distribution (per-element mean/scale from a hyperprior).
The host path builds exactly-invertible f64 tables (models/quantized.py,
mirroring /root/reference/src/stream/model/quantize.rs:525-568); this module
is the TPU-native counterpart: the leaky-quantizer formula is evaluated
*inside the kernel*, with per-step (mean, scale) parameter blocks streamed
by explicit double-buffered DMA.

Exactness contract.  Float transcendentals on this target are NOT monotone
(measured: Mosaic tanh has tens of thousands of non-monotone steps, exp a
handful), and a non-monotone quantized CDF silently breaks the leakiness
guarantee ``prob >= 1`` (a zero-width interval corrupts the stream).  The
CDF here is therefore computed in **exact integer arithmetic**:

- the standardized argument t = (x - 0.5 - mean) * (1 / scale) uses three
  correctly-rounded f32 ops (monotone in x by IEEE-754), then truncates to
  12-bit fixed point;
- e^-m is 2^(-m log2 e) with the exponent split into integer/fraction; the
  fraction uses an integer quadratic P(xf) exhaustively verified monotone
  (max rel. error 0.19%);
- the logistic form sigma = N / (4096 + e) uses the exact f32-divide +
  integer-correction floor division (pallas_coder._exact_div), and exact
  floor of a monotone rational is monotone.

Every op is identical under numpy, XLA and Mosaic, so the SAME bitstream is
produced and consumed on host, CPU and TPU (unlike float transcendentals).
The math helpers take an ``xp`` namespace (numpy or jax.numpy) so the host
oracle in this file *is* the kernel math.

Families (t standardized): gaussian ~ sigma(1.5958 (t + 0.044715 t^3))
(logistic approximation of Phi, max CDF error ~2e-3 — a modeling choice
with negligible rate cost); laplace (exact form, 0.5 e^t / 1 - 0.5 e^-t);
logistic (exact form).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interleaved import LaneConfig
from .pallas_coder import (
    LANES,
    _emit_words,
    _exact_div,
    _init_stream_window,
    _lane_iota,
    _pad_stream2d,
    _refill_words,
    _row_iota,
)

FAMILIES = ("gaussian", "laplace", "logistic", "cauchy")

FX = 12  # fixed-point fraction bits (matches precision 12)
_T_CLAMP = 8 << FX  # |t| <= 8 standard deviations; beyond is leak-level mass
# integer quadratic for 2^(-xf/4096) * 2^18, exhaustively verified monotone
# non-increasing with P(4095) >= P(0) >> 1 (see tests/test_family_int.py)
_P0, _P1, _P2 = 261640, 174919, 44856
_PG = 6  # guard bits of P
_LOG2E = 5909  # round(log2(e) * 4096)
_GA = 6536  # round(1.5958 * 4096)   sigma(1.5958 (t + c t^3)) ~ Phi(t)
_GB = 292  # round(1.5958 * 0.044715 * 4096)
# cauchy: atan(x) ~ x / (1 + 0.28 x^2) on [0,1], reciprocal-reflected beyond;
# _PI2EFF = 2 * atan_fix(4096) keeps the piecewise boundary exactly
# continuous (the approximation's own pi/2), and _PIEFF = 2 * _PI2EFF its pi
_CA = 1147  # round(0.28 * 4096)
_PI2EFF = 6398
_PIEFF = 12796


def _t_fixed(xp, x_i32, mean, inv_scale):
    """Fixed-point standardized argument; monotone in x (3 correctly-rounded
    f32 ops + truncating cast, each order-preserving)."""
    xf = x_i32.astype(xp.float32)
    tf = ((xf - np.float32(0.5)) - mean) * inv_scale
    tf = tf * np.float32(1 << FX)
    tf = xp.clip(tf, np.float32(-_T_CLAMP), np.float32(_T_CLAMP - 1))
    return tf.astype(xp.int32)


def _exp2_neg(xp, mag):
    """e_fix ~ 4096 * e^-(mag / 4096) for mag i32 >= 0; exact-integer and
    verified non-increasing in mag."""
    m = (mag * np.int32(_LOG2E)) >> FX
    # clamp at 25 so the total shift (xi + _PG = 6) stays < 32: shifting an
    # int32 by >= 32 is implementation-defined across backends, and every
    # shift >= 18 already yields the intended 0 (P < 2^18)
    xi = xp.minimum(m >> FX, np.int32(25))
    xfr = m & np.int32((1 << FX) - 1)
    P = (
        np.int32(_P0)
        - ((np.int32(_P1) * xfr) >> FX)
        + ((np.int32(_P2) * ((xfr * xfr) >> FX)) >> FX)
    )
    return P >> (np.int32(_PG) + xi)


def _mag(xp, family: str, u):
    """Positive sigmoid argument from |t_fix| (exact integer, monotone)."""
    if family == "gaussian":
        u2 = (u * u) >> FX
        u3 = ((u2 >> 4) * u) >> (FX - 4)
        return ((np.int32(_GA) * u) >> FX) + ((np.int32(_GB) * u3) >> FX)
    return u  # laplace, logistic


def _floor_div_small(xp, num, den):
    """Exact floor(num / den) for 0 <= num < 2^24 (f32-exact) and exact den
    < 2^20 with quotient error < 1 (correctly-rounded f32 divide + one-step
    integer correction)."""
    qf = num.astype(xp.float32) / den.astype(xp.float32)
    qh = qf.astype(xp.int32)
    r = num - qh * den
    qh = qh + xp.where(r >= den, np.int32(1), np.int32(0))
    qh = qh - xp.where(r < 0, np.int32(1), np.int32(0))
    return qh


def _atan_fix(xp, u):
    """atan(u / 4096) in units of 1/4096 rad; exact-integer, exhaustively
    verified monotone over every representable u (tests)."""
    one = np.int32(1 << FX)

    def a_small(v):
        v2 = (v * v) >> FX
        den = one + ((np.int32(_CA) * v2) >> FX)
        return _floor_div_small(xp, v << FX, den)

    inv = _floor_div_small(xp, xp.full(u.shape, np.int32(1 << (2 * FX))),
                           xp.maximum(u, np.int32(1)))
    small = u <= one
    return xp.where(
        small, a_small(xp.minimum(u, one)),
        np.int32(_PI2EFF) - a_small(xp.minimum(inv, one)),
    )


def _ctrunc(xp, family: str, t_fix, free: int):
    """trunc(free * CDF(t)) in exact integer arithmetic, monotone in t_fix."""
    neg = t_fix < 0
    u = xp.where(neg, -t_fix, t_fix)
    freei = np.int32(free)
    if family == "cauchy":
        # C(t) = 1/2 + atan(t)/pi; corr = floor((free*A >> 2) / (pi_eff >> 2))
        # keeps the numerator f32-exact (< 2^24) while staying monotone
        A = _atan_fix(xp, u)
        corr = _floor_div_small(
            xp, (freei * A) >> 2, np.int32(_PIEFF >> 2)
        )
        half = np.int32(free >> 1)
        return xp.where(neg, half - corr, half + corr)
    e = _exp2_neg(xp, _mag(xp, family, u))
    if family == "laplace":
        v = freei * e
        return xp.where(
            neg, v >> (FX + 1), freei - ((v + np.int32(8191)) >> (FX + 1))
        )
    num = xp.where(neg, freei * e, np.int32(free << FX))
    return _floor_div_small(xp, num, np.int32(1 << FX) + e)


def _left_fn(family: str, min_sym: int, precision: int, free: float):
    """left(x) for interior x in (min, max]: (x - min) + trunc(free*CDF) —
    the reference's leaky quantizer (quantize.rs:525-568), exact-integer."""
    assert precision == FX, "device families run at the small preset (P=12)"
    free_i = int(free)

    def left(x_i32, mean, inv_scale, xp=jnp):
        t = _t_fixed(xp, x_i32, mean, inv_scale)
        return (x_i32 - np.int32(min_sym)) + _ctrunc(xp, family, t, free_i)

    return left


# ---------------------------------------------------------------------------
# Host oracle (numpy): identical math, loopy coder — used by tests and as the
# host-side codec for device-family bitstreams.
# ---------------------------------------------------------------------------


def family_tables_host(symbols, means, scales, family, min_sym, max_sym,
                       precision=FX):
    """(cum, prob) u32 arrays for given symbols — numpy twin of the kernel
    math (bit-identical), pluggable into interleaved2.encode_shared."""
    free = (1 << precision) - 1 - (max_sym - min_sym)
    left = _left_fn(family, min_sym, precision, free)
    sym = np.asarray(symbols, dtype=np.int32)
    mean = np.asarray(means, dtype=np.float32)
    inv_scale = np.float32(1.0) / np.asarray(scales, dtype=np.float32)
    lo = np.where(sym == min_sym, 0, left(sym, mean, inv_scale, xp=np))
    hi = np.where(
        sym == max_sym, 1 << precision, left(sym + 1, mean, inv_scale, xp=np)
    )
    return lo.astype(np.uint64), (hi - lo).astype(np.uint64)


def decode_family_host(init_states, stream, means, scales, family,
                       min_sym, max_sym, cfg: LaneConfig, num_symbols):
    """Numpy oracle decoder for device-family ILANS2 streams."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    T = -(-num_symbols // L) if num_symbols else 0
    lower = np.uint64(1 << (S - W))
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = _left_fn(family, min_sym, P, free)
    means = np.asarray(means, dtype=np.float32)
    scales = np.asarray(scales, dtype=np.float32)

    states = init_states.astype(np.uint64)
    base = 0
    out = np.empty(T * L, dtype=np.int32)
    lanes = np.arange(L)
    for t in range(T):
        idx = t * L + lanes
        active = idx < num_symbols
        mean = np.where(active, means[np.minimum(idx, num_symbols - 1)], 0.0).astype(np.float32)
        inv_scale = np.float32(1.0) / np.where(
            active, scales[np.minimum(idx, num_symbols - 1)], 1.0
        ).astype(np.float32)
        q = (states & np.uint64((1 << P) - 1)).astype(np.int32)
        lo = np.full(L, min_sym, np.int32)
        hi = np.full(L, max_sym + 1, np.int32)
        for _ in range(max(max_sym - min_sym, 1).bit_length()):
            mid = (lo + hi) >> 1
            take = left(mid, mean, inv_scale, xp=np) <= q
            lo = np.where(take, mid, lo)
            hi = np.where(take, hi, mid)
        sym = lo
        cum = np.where(sym == min_sym, 0, left(sym, mean, inv_scale, xp=np))
        right = np.where(
            sym == max_sym, 1 << P, left(sym + 1, mean, inv_scale, xp=np)
        )
        prob = (right - cum).astype(np.uint64)
        new_states = (states >> np.uint64(P)) * prob + (
            q.astype(np.uint64) - cum.astype(np.uint64)
        )
        states = np.where(active, new_states, states)
        m = states < lower
        k = int(m.sum())
        if k:
            words = np.zeros(k, dtype=np.uint64)
            avail = stream[base : base + k]
            words[: len(avail)] = avail
            states[m] = (states[m] << np.uint64(W)) | words
            base += k
        out[idx] = sym
    return out[:num_symbols]


def _invert_family(left, qi, min_sym: int, max_sym: int, precision: int):
    """Bisection for sym = max{x : left(x) <= q}, then (cum, prob).

    The left() values at the surviving endpoints are carried through the
    bisection, so no extra CDF evaluations are needed afterwards: at
    termination lo's value was computed when it was last taken (or is the
    pinned 0 at min), and hi == lo + 1 with its value from the last
    rejection (or the pinned 2^P at max + 1)."""
    lo = jnp.full(qi.shape, np.int32(min_sym), jnp.int32)
    hi = jnp.full(qi.shape, np.int32(max_sym + 1), jnp.int32)

    def mk(mean, inv_scale):
        l, h = lo, hi
        cum = jnp.zeros(qi.shape, jnp.int32)  # left(min) is pinned to 0
        right = jnp.full(qi.shape, np.int32(1 << precision), jnp.int32)
        span = max_sym + 1 - min_sym
        iters = max(span - 1, 1).bit_length()
        for _ in range(iters):
            # never evaluate left(min): its formula value is NOT the pinned 0
            # (heavy-tailed families have real mass below min), and a
            # converged [min, min+1) interval would otherwise falsely reject
            mid = jnp.maximum((l + h) >> 1, np.int32(min_sym + 1))
            lmid = left(mid, mean, inv_scale)
            take = lmid <= qi
            l = jnp.where(take, mid, l)
            h = jnp.where(take, h, mid)
            cum = jnp.where(take, lmid, cum)
            right = jnp.where(take, right, lmid)
        return l, cum.astype(jnp.uint32), (right - cum).astype(jnp.uint32)

    return mk


def _inv_cdf_guess(xp, family: str, r):
    """Approximate CONTINUOUS inverse of the family's standardized CDF in
    f32 (guess only -- exactness comes from the verified window around
    it).  ``r`` is the clipped CDF fraction in (0, 1); returns t (real
    units, the same standardization _t_fixed uses)."""
    if family == "cauchy":
        y = (r - np.float32(0.5)) * np.float32(math.pi)
        return xp.sin(y) / xp.cos(y)
    M = xp.log(r / (np.float32(1.0) - r))
    if family == "logistic":
        return M
    if family == "laplace":
        # CDF: e^t/2 (t<0), 1 - e^-t/2: invert directly
        neg = r < np.float32(0.5)
        t_neg = xp.log(np.float32(2.0) * r)
        t_pos = -xp.log(np.float32(2.0) * (np.float32(1.0) - r))
        return xp.where(neg, t_neg, t_pos)
    # gaussian: sigma(a t + b t^3) with a = _GA/4096, b = _GB/4096; two
    # Newton steps from t0 = M/a
    a = np.float32(_GA / 4096.0)
    b = np.float32(_GB / 4096.0)
    t = M / a
    for _ in range(2):
        f = a * t + b * t * t * t - M
        fp = a + np.float32(3.0) * b * t * t
        t = t - f / fp
    return t


def _cdf_pdf_f32(xp, family: str, t):
    """Continuous f32 (CDF, dCDF/dt) of the standardized family, with the
    same +-_T_CLAMP/4096 argument clamp the fixed-point path applies --
    beyond it the CDF is constant and the derivative 0, which makes the
    Newton model EXACTLY linear in the ramp region."""
    tmax = np.float32(_T_CLAMP / 4096.0)
    tc = xp.clip(t, -tmax, tmax)
    clamped = xp.abs(t) >= tmax
    if family == "cauchy":
        C = np.float32(0.5) + xp.arctan(tc) * np.float32(1.0 / math.pi)
        D = np.float32(1.0 / math.pi) / (np.float32(1.0) + tc * tc)
    elif family == "laplace":
        e = xp.exp(-xp.abs(tc))
        C = xp.where(
            tc < 0, np.float32(0.5) * e,
            np.float32(1.0) - np.float32(0.5) * e,
        )
        D = np.float32(0.5) * e
    else:
        if family == "logistic":
            z = tc
            dz = np.float32(1.0)
        else:  # gaussian: sigma(a t + b t^3)
            a = np.float32(_GA / 4096.0)
            b = np.float32(_GB / 4096.0)
            z = a * tc + b * tc * tc * tc
            dz = a + np.float32(3.0) * b * tc * tc
        s = np.float32(1.0) / (np.float32(1.0) + xp.exp(-z))
        C = s
        D = s * (np.float32(1.0) - s) * dz
    return C, xp.where(clamped, np.float32(0.0), D)


def _guess_sym(xp, family: str, qi, mean, inv_scale, min_sym: int,
               max_sym: int, free: int):
    """f32 initial symbol guess for the guided inversion.

    An inverse-CDF seed followed by two Newton steps on the CONTINUOUS
    leaky model L(x) = (x - min) + free * CDF((x - 1/2 - mean)/scale):
    the derivative 1 + free * pdf handles both regimes automatically --
    CDF-dominated centrally, and the EXACTLY-linear leak ramp in the
    tails (where the clamped CDF is flat and the slope is 1).  Returns
    i32 in [min_sym + 1, max_sym]."""
    free_f = np.float32(free)
    scale = np.float32(1.0) / inv_scale
    tmax = np.float32(_T_CLAMP / 4096.0)
    eps = np.float32(1e-6)
    qf = qi.astype(xp.float32)
    r0 = xp.clip(qf / free_f, eps, np.float32(1.0) - eps)
    t0 = xp.clip(_inv_cdf_guess(xp, family, r0), -tmax - 2, tmax + 2)
    x = mean + np.float32(0.5) + t0 * scale
    lo = np.float32(min_sym + 1)
    hi = np.float32(max_sym)
    x = xp.clip(x, lo - np.float32(free), hi + np.float32(free))
    for _ in range(2):
        t = (x - np.float32(0.5) - mean) * inv_scale
        C, D = _cdf_pdf_f32(xp, family, t)
        Lx = (x - np.float32(min_sym)) + free_f * C
        deriv = np.float32(1.0) + free_f * D * inv_scale
        x = x - (Lx - qf) / deriv
    return xp.floor(
        xp.clip(x, lo, hi) + np.float32(0.5)
    ).astype(xp.int32)


GUIDED_WINDOW = 8


def _guided_enabled() -> bool:
    """Guided quantile inversion EXPERIMENT (default off; set
    CTPU_GUIDED_FAMILY=1 to enable).  Either path yields the identical
    bitstream by construction -- the guess only proposes a bracket and a
    lax.cond falls back to the full bisection whenever any lane's window
    misses -- but offline measurement shows the f32 guess machinery costs
    about as much as the exact evals it saves, and the guess miss rate
    (~3% of lanes over the q distribution) would trigger the per-tile
    fallback nearly every step at L=32768.  Kept as an opt-in for
    on-chip tuning."""
    return os.environ.get("CTPU_GUIDED_FAMILY", "0") == "1"


def _invert_family_guided(left, qi, min_sym: int, max_sym: int,
                          precision: int, family: str):
    """Guided twin of :func:`_invert_family`: an f32 inverse-CDF guess
    brackets the symbol in a GUIDED_WINDOW-wide window, two exact left()
    evals verify containment, and a short exact bisection finishes --
    3 + log2(window) exact CDF evals instead of log2(span) (8 at the
    default +-100 support).  Any step whose tile contains a
    non-contained lane falls back to the FULL bisection via lax.cond, so
    the result is bitstream-identical to _invert_family by construction
    (the guess only picks the bracket; every decision is an exact
    left() compare)."""
    WN = GUIDED_WINDOW
    P = precision
    full = _invert_family(left, qi, min_sym, max_sym, precision)
    free = (1 << P) - 1 - (max_sym - min_sym)

    def mk(mean, inv_scale):
        xh = _guess_sym(jnp, family, qi, mean, inv_scale, min_sym,
                        max_sym, free)
        e0 = left(xh, mean, inv_scale)
        below = e0 <= qi
        l = jnp.where(below, xh, jnp.maximum(xh - WN, np.int32(min_sym)))
        h = jnp.where(
            below, jnp.minimum(xh + WN, np.int32(max_sym + 1)), xh
        )
        other = jnp.where(below, h, l)
        oc = jnp.clip(other, np.int32(min_sym + 1), np.int32(max_sym))
        eo = left(oc, mean, inv_scale)
        # pinned endpoint values (left(min) = 0 / left(max+1) = 2^P are
        # definitional, never evaluated -- same convention as the full
        # bisection)
        eo = jnp.where(other == np.int32(min_sym), np.int32(0), eo)
        eo = jnp.where(
            other == np.int32(max_sym + 1), np.int32(1 << P), eo
        )
        lval = jnp.where(below, e0, eo)
        hval = jnp.where(below, eo, e0)
        contained = (lval <= qi) & (qi < hval)

        def narrow(_):
            l_, h_ = l, h
            cum, right = lval, hval
            for _ in range(WN.bit_length() - 1):  # window <= WN = 2^k
                mid = jnp.maximum((l_ + h_) >> 1, np.int32(min_sym + 1))
                lm = left(mid, mean, inv_scale)
                take = lm <= qi
                l_ = jnp.where(take, mid, l_)
                h_ = jnp.where(take, h_, mid)
                cum = jnp.where(take, lm, cum)
                right = jnp.where(take, right, lm)
            return (
                l_, cum.astype(jnp.uint32),
                (right - cum).astype(jnp.uint32),
            )

        def fallback(_):
            return full(mean, inv_scale)

        return jax.lax.cond(jnp.all(contained), narrow, fallback, 0)

    return mk


def _family_decode_kernel_body(
    pltpu, pl, *, family: str, min_sym: int, max_sym: int,
    cfg: LaneConfig, T: int, tail: int, R: int,
):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)
    free = float((1 << P) - 1 - (max_sym - min_sym))
    left = _left_fn(family, min_sym, P, free)

    def kernel(states_in, params_hbm, stream_hbm,
               syms_out, states_out, states_s, win, pbuf, base_s, sem, psem):
        # params_hbm: [T, 2, R, 128] f32 (mean, scale) — streamed with our
        # own double-buffered DMA.  (Pallas auto-pipelined inputs combined
        # with pipelined outputs AND manual DMA in the same kernel hit a
        # runtime failure at grid sizes >= 64 on this target, so every
        # transfer in this kernel is explicit.)
        t = pl.program_id(0)
        lane = _lane_iota(R)
        lane_flat = _row_iota(R) * LANES + lane
        slot = t % 2

        @pl.when(t == 0)
        def _init():
            states_s[:] = states_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)
            pdma = pltpu.make_async_copy(
                params_hbm.at[0], pbuf.at[0], psem.at[0]
            )
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

        states = states_s[:]
        mean = pbuf[slot, 0]
        inv_scale = np.float32(1.0) / pbuf[slot, 1]

        q = states & qmask
        qi = q.astype(jnp.int32)
        if _guided_enabled():
            sym, cum, prob = _invert_family_guided(
                left, qi, min_sym, max_sym, P, family
            )(mean, inv_scale)
        else:
            sym, cum, prob = _invert_family(left, qi, min_sym, max_sym, P)(
                mean, inv_scale
            )
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
        states = jnp.where(
            m, (states << W) | (ex & np.uint32(cfg.word_mask)), states
        )

        states_s[:] = states
        base_s[0] = nxt
        syms_out[0] = sym  # bisection already yields absolute symbol values

        @pl.when(t == T - 1)
        def _final():
            states_out[:] = states_s[:]

    return kernel


def _family_encode_kernel_body(
    pltpu, pl, *, family: str, min_sym: int, max_sym: int,
    cfg: LaneConfig, T: int, tail: int, R: int, cap_rows: int,
):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    seed = np.uint32(1 << (S - W))
    wmask = np.uint32(cfg.word_mask)
    free = float((1 << P) - 1 - (max_sym - min_sym))
    left = _left_fn(family, min_sym, P, free)

    def kernel(syms_in, means_in, scales_in, stream_out, states_out, end_out,
               states_s, img, arow_s, sem):
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)

        @pl.when(t == 0)
        def _init():
            states_s[:] = jnp.full((R, LANES), seed, jnp.uint32)
            arow_s[0] = cap_rows * LANES
            arow_s[1] = cap_rows

        states = states_s[:]
        sym = syms_in[0]  # absolute symbol values (i32)
        mean = means_in[0]
        inv_scale = np.float32(1.0) / scales_in[0]
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

        shifted = jnp.where(renorm, states >> W, states)
        qd = _exact_div(shifted, prob, qbits=S - P)
        rem = shifted - qd * prob
        new_states = (qd << P) | (cum + rem)
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
def _build_family_decoder(family, min_sym, max_sym, cfg, T, tail, L, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    kernel = _family_decode_kernel_body(
        pltpu, pl, family=family, min_sym=min_sym, max_sym=max_sym,
        cfg=cfg, T=T, tail=tail, R=R,
    )
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # params [T, 2, R, 128]
            pl.BlockSpec(memory_space=pl.ANY),  # stream
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
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, R + 1, LANES), jnp.uint32),
            pltpu.VMEM((2, 2, R, LANES), jnp.float32),  # param double buffer
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _build_family_encoder(family, min_sym, max_sym, cfg, T, tail, L, cap_rows,
                          interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    kernel = _family_encode_kernel_body(
        pltpu, pl, family=family, min_sym=min_sym, max_sym=max_sym,
        cfg=cfg, T=T, tail=tail, R=R, cap_rows=cap_rows,
    )
    RPAD = -(-(R + 1) // 8) * 8
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
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
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def _blocks3d(arr, T, R, n, dtype, fill=0):
    arr = jnp.asarray(arr, dtype=dtype)
    pad = T * R * LANES - n
    if pad:
        arr = jnp.concatenate([arr, jnp.full(pad, fill, dtype)])
    return arr.reshape(T, R, LANES)


def encode_family_pallas(
    symbols, means, scales, family: str,
    min_sym: int, max_sym: int, cfg: LaneConfig,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """On-device encode with per-symbol (mean, scale) parameters.

    Returns ``(init_states u32[L], stream u32[num_words])``; decode with
    :func:`decode_family_pallas` on the same backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0 and cfg.state_bits == 32 and cfg.word_bits == 16
    assert family in FAMILIES
    assert max_sym > min_sym, (
        "degenerate single-symbol support: _invert_family's min-pin breaks "
        "when min_sym == max_sym (the only symbol needs no bits anyway)"
    )
    assert (1 << cfg.precision) - 1 - (max_sym - min_sym) >= max_sym - min_sym + 1, \
        "support too wide for precision (free weight must cover leakiness)"
    n = int(np.asarray(symbols).shape[0])
    T = -(-n // L) if n else 0
    if T == 0:
        return (jnp.full(L, np.uint32(1 << (cfg.state_bits - cfg.word_bits)),
                         jnp.uint32), jnp.zeros((0,), jnp.uint32))
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = T * R + 1

    syms3d = _blocks3d(symbols, T, R, n, jnp.int32, min_sym)
    means3d = _blocks3d(means, T, R, n, jnp.float32)
    scales3d = _blocks3d(scales, T, R, n, jnp.float32, 1.0)
    fn = _build_family_encoder(
        family, int(min_sym), int(max_sym), cfg, T, tail, L, cap_rows,
        interpret,
    )
    buf, states, end = fn(syms3d, means3d, scales3d)
    e = int(end[0])
    return states.reshape(-1), buf.reshape(-1)[e : cap_rows * LANES]


def decode_family_pallas(
    init_states, stream, means, scales, family: str,
    min_sym: int, max_sym: int, cfg: LaneConfig, num_symbols: int,
    interpret: bool | None = None,
) -> jax.Array:
    """On-device decode with per-symbol (mean, scale) parameters."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0 and cfg.state_bits == 32 and cfg.word_bits == 16
    assert max_sym > min_sym, (
        "degenerate single-symbol support: _invert_family's min-pin breaks "
        "when min_sym == max_sym"
    )
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        return jnp.zeros((0,), jnp.int32)
    tail = num_symbols - (T - 1) * L
    R = L // LANES
    means3d = _blocks3d(means, T, R, num_symbols, jnp.float32)
    scales3d = _blocks3d(scales, T, R, num_symbols, jnp.float32, 1.0)
    params = jnp.stack([means3d, scales3d], axis=1)  # [T, 2, R, 128]
    fn = _build_family_decoder(
        family, int(min_sym), int(max_sym), cfg, T, tail, L, interpret
    )
    syms, _ = fn(
        jnp.asarray(init_states, dtype=jnp.uint32).reshape(R, LANES),
        params, _pad_stream2d(stream, R),
    )
    return syms.reshape(-1)[:num_symbols]

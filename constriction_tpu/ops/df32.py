"""Double-f32 (compensated) arithmetic and window evaluation.

XLA emulates f64 on TPU in software; the exact-table window evaluation
(ops/exact_tables_jax.py) only needs ~2^-13 ABSOLUTE accuracy on
A = free * CDF (the trunc-ambiguity margin plus safety), which a
double-f32 representation (value = hi + lo, two f32s, ~2^-45 relative)
delivers with plain f32 vector ops -- native speed on the VPU.

The catch: XLA's algebraic simplifier folds error-free transforms
(two_sum, two_prod) back into plain f32 on BOTH CPU and TPU backends,
even behind optimization barriers, silently destroying the compensation.
This module is therefore written as a backend-generic twin:

- with ``xp=numpy`` the ops are correctly rounded by the hardware and the
  algebra is exactly as written -- THE reference implementation, used by
  tests to pin every accuracy claim;
- a Pallas kernel can call the same functions with ``xp=jnp`` INSIDE a
  kernel body, where Mosaic lowers arithmetic directly without XLA's HLO
  simplifier; whether a given compiler version preserves the semantics is
  decided at runtime by the same per-backend CANARY that guards the f64
  builder (exact_family._device_builder_canary) -- the path turns itself
  off wherever the check fails.

Every df number is a pair (hi, lo) of f32 arrays with |lo| <= ulp(hi)/2.
Error bounds (pinned by tests/test_df32.py): add/mul ~2^-45 relative,
the full gaussian window evaluation < 2^-20 absolute on A in [0, 2^24] --
a >100x safety factor under the 2^-6 ambiguity margin.
"""

from __future__ import annotations

import math

import numpy as np

from . import exact_tables_jax as etj

F32 = np.float32
_SPLIT = np.float32(4097.0)  # Veltkamp split factor for f32: 2^12 + 1


def _f(xp, v):
    return xp.float32(v) if hasattr(xp, "float32") else np.float32(v)


def two_sum(xp, a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(xp, a, b):
    """Requires |a| >= |b| (all call sites normalize)."""
    s = a + b
    return s, b - (s - a)


def split(xp, a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(xp, a, b):
    p = a * b
    ah, al = split(xp, a)
    bh, bl = split(xp, b)
    err = (((ah * bh - p) + ah * bl + al * bh)) + al * bl
    return p, err


def df_add(xp, xh, xl, yh, yl):
    s, e = two_sum(xp, xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(xp, s, e)


def df_sub(xp, xh, xl, yh, yl):
    return df_add(xp, xh, xl, -yh, -yl)


def df_mul(xp, xh, xl, yh, yl):
    p, e = two_prod(xp, xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(xp, p, e)


def df_mul_f(xp, xh, xl, c):
    """df * plain f32 constant."""
    p, e = two_prod(xp, xh, c)
    e = e + xl * c
    return quick_two_sum(xp, p, e)


def df_recip(xp, xh, xl):
    """1 / x via one df Newton step from the f32 reciprocal."""
    r0 = np.float32(1.0) / xh
    # r1 = r0 * (2 - x*r0), evaluated in df
    ph, pl = df_mul_f(xp, xh, xl, r0)
    th, tl = df_add(xp, np.float32(2.0), np.float32(0.0), -ph, -pl)
    return df_mul_f(xp, th, tl, r0)


def df_div(xp, xh, xl, yh, yl):
    rh, rl = df_recip(xp, yh, yl)
    return df_mul(xp, xh, xl, rh, rl)


def df_const(c: float):
    """Split a Python float into an exact df pair (host side)."""
    hi = np.float32(c)
    lo = np.float32(np.float64(c) - np.float64(hi))
    return hi, lo


def df_from_f64(x: np.ndarray):
    hi = np.float32(x)
    lo = np.float32(np.float64(x) - np.float64(hi))
    return hi, lo


def df_poly(xp, coeffs, xh, xl):
    """Horner evaluation with df coefficient pairs."""
    ch, cl = df_const(float(coeffs[-1]))
    rh = xp.full_like(xh, ch)
    rl = xp.full_like(xh, cl)
    for k in range(len(coeffs) - 2, -1, -1):
        rh, rl = df_mul(xp, rh, rl, xh, xl)
        ch, cl = df_const(float(coeffs[k]))
        rh, rl = df_add(xp, rh, rl, xp.full_like(xh, ch),
                        xp.full_like(xh, cl))
    return rh, rl


_LOG2E = df_const(1.4426950408889634074)
_LN2 = df_const(0.6931471805599453094)


def _exp2_scale(xp, k):
    """2^k for integer k in [-126, 127] via exponent-field construction
    (exact)."""
    ki = k.astype(xp.int32) if hasattr(k, "astype") else np.int32(k)
    bits = (ki + 127) << 23
    if xp is np:
        return bits.astype(np.int32).view(np.float32)
    import jax

    return jax.lax.bitcast_convert_type(bits, xp.float32)


def df_exp_neg(xp, xh, xl):
    """e^(-x) for x in [0, 50], df-accurate (same reduction as the f64
    path: base-2 with exact scaling + Taylor residual)."""
    kf = xp.round(-(xh * _LOG2E[0]))  # f32 estimate is enough for k
    # r = -x - k*ln2 in df
    th, tl = df_mul_f(xp, _LN2[0] * xp.ones_like(xh), _LN2[1]
                      * xp.ones_like(xh), kf)
    rh, rl = df_add(xp, -xh, -xl, -th, -tl)
    qh, ql = df_poly(xp, etj._C_EXP, rh, rl)
    s = _exp2_scale(xp, kf)
    return df_mul_f(xp, qh, ql, s)


def df_erf(xp, th, tl):
    """erf in df32 with the SAME Chebyshev fits as the f64 evaluator
    (etj._C_ERF / _C_ERFC_G): approximation error identical, arithmetic
    error ~2^-44 instead of f64's ~2^-52 -- both orders of magnitude
    under the ambiguity margin."""
    neg = th < 0
    ah = xp.where(neg, -th, th)
    al = xp.where(neg, -tl, tl)
    # [0, 1] branch: t * P(t^2)
    t1h = xp.minimum(ah, np.float32(1.0))
    t1l = xp.where(ah <= np.float32(1.0), al, np.float32(0.0))
    x2h, x2l = df_mul(xp, t1h, t1l, t1h, t1l)
    p1h, p1l = df_poly(xp, etj._C_ERF, x2h, x2l)
    e1h, e1l = df_mul(xp, t1h, t1l, p1h, p1l)
    # [1, 6.75] branch: 1 - G(1/t) * exp(-t^2) / t
    tch = xp.clip(ah, np.float32(1.0), np.float32(6.75))
    tcl = xp.where((ah >= np.float32(1.0)) & (ah <= np.float32(6.75)),
                   al, np.float32(0.0))
    uh, ul = df_recip(xp, tch, tcl)
    gh, gl = df_poly(xp, etj._C_ERFC_G, uh, ul)
    t2h, t2l = df_mul(xp, tch, tcl, tch, tcl)
    exh, exl = df_exp_neg(xp, t2h, t2l)
    mh, ml = df_mul(xp, gh, gl, exh, exl)
    mh, ml = df_mul(xp, mh, ml, uh, ul)
    e2h, e2l = df_add(xp, np.float32(1.0), np.float32(0.0), -mh, -ml)
    small = ah <= np.float32(1.0)
    eh = xp.where(small, e1h, e2h)
    el = xp.where(small, e1l, e2l)
    eh = xp.where(ah > np.float32(6.75), np.float32(1.0), eh)
    el = xp.where(ah > np.float32(6.75), np.float32(0.0), el)
    return xp.where(neg, -eh, eh), xp.where(neg, -el, el)


def df_atan(xp, th, tl):
    """atan in df32 with the f64 evaluator's Chebyshev fit (etj._C_ATAN):
    |t| <= 1 direct, else pi/2 - atan(1/t)."""
    neg = th < 0
    ah = xp.where(neg, -th, th)
    al = xp.where(neg, -tl, tl)
    big = ah > np.float32(1.0)
    ih, il = df_recip(xp, xp.maximum(ah, np.float32(1.0)),
                      xp.where(big, al, np.float32(0.0)))
    vh = xp.where(big, ih, xp.minimum(ah, np.float32(1.0)))
    vl = xp.where(big, il, al)
    v2h, v2l = df_mul(xp, vh, vl, vh, vl)
    ph, pl = df_poly(xp, etj._C_ATAN, v2h, v2l)
    rh, rl = df_mul(xp, vh, vl, ph, pl)
    hp = df_const(math.pi / 2.0)
    bh, bl = df_add(xp, hp[0] + xp.zeros_like(rh), hp[1] + xp.zeros_like(rl),
                    -rh, -rl)
    oh = xp.where(big, bh, rh)
    ol = xp.where(big, bl, rl)
    return xp.where(neg, -oh, oh), xp.where(neg, -ol, ol)


def df_cdf_from_arg(xp, family: str, th, tl):
    """df32 CDF in the standardized argument (same formula shapes as
    etj._cdf_from_arg); returns a df pair."""
    half = np.float32(0.5)
    if family == "gaussian":
        eh, el = df_erf(xp, th, tl)
        oh, ol = df_add(xp, np.float32(1.0) + xp.zeros_like(eh),
                        xp.zeros_like(eh), eh, el)
        return df_mul_f(xp, oh, ol, half)
    if family == "laplace":
        ah = xp.where(th < 0, -th, th)
        al = xp.where(th < 0, -tl, tl)
        ah = xp.minimum(ah, np.float32(45.0))
        al = xp.where(ah < np.float32(45.0), al, np.float32(0.0))
        exh, exl = df_exp_neg(xp, ah, al)
        lo_h, lo_l = df_mul_f(xp, exh, exl, half)
        hi_h, hi_l = df_add(xp, np.float32(1.0) + xp.zeros_like(lo_h),
                            xp.zeros_like(lo_h), -lo_h, -lo_l)
        neg = th < 0
        return xp.where(neg, lo_h, hi_h), xp.where(neg, lo_l, hi_l)
    # cauchy: 1/2 + atan(t)/pi
    ah, al = df_atan(xp, th, tl)
    ip = df_const(1.0 / math.pi)
    mh, ml = df_mul(xp, ah, al, ip[0] + xp.zeros_like(ah),
                    ip[1] + xp.zeros_like(al))
    return df_add(xp, half + xp.zeros_like(mh), xp.zeros_like(mh), mh, ml)


def eval_window_df(xp, family, means, scales, ws, *, min_sym, max_sym,
                   precision, W):
    """df32 twin of etj._eval_window64: same windows, same margin rules,
    same saturation threshold, different arithmetic.  ``means``/``scales``
    are f64 on the host; ``ws`` i32.  Returns
    ``(tv i32 [n, W], ambig bool [n, W])``.

    Decision differences vs the f64 evaluator can only move entries
    between 'unambiguous' and 'patch' (both legal); accepted entries'
    trunc values are exact by the margin bound, pinned by
    tests/test_df32.py against the exact oracle."""
    free = float((1 << precision) - 1 - (max_sym - min_sym))
    freei = np.int32(int(free))
    j = np.arange(W, dtype=np.int64)
    s = np.asarray(ws, np.int64)[:, None] + j[None, :]
    # x = s - 0.5 - mean  (exact in f64 on host), then df split
    x64 = s.astype(np.float64) - 0.5 - np.asarray(means, np.float64)[:, None]
    sc = np.asarray(scales, np.float64)
    inv64 = 1.0 / (sc * math.sqrt(2.0)) if family == "gaussian" else 1.0 / sc
    xh, xl = df_from_f64(x64)
    ivh, ivl = df_from_f64(np.broadcast_to(inv64[:, None], x64.shape))
    th, tl = df_mul(xp, xh, xl, ivh, ivl)
    Ch, Cl = df_cdf_from_arg(xp, family, th, tl)
    fh, fl = df_const(free)
    Ah, Al = df_mul(xp, Ch, Cl, xp.full_like(Ch, fh), xp.full_like(Cl, fl))

    # margin rules on A (f64 reconstruction of the df pair is exact)
    A = np.float64(Ah) + np.float64(Al)
    t64 = np.float64(th) + np.float64(tl)
    I = np.round(A)
    f = A - I
    Ii = I.astype(np.int32)
    u = Ii + np.floor(f).astype(np.int32)
    fr = f - np.floor(f)
    m = etj.MARGIN
    unamb_frac = (fr > m) & (fr < 1.0 - m)
    unamb_zero = (u <= 0) & (A < 1.0 - m)
    t_star = etj.sat_threshold(family)
    if math.isinf(t_star):
        certain_sat = np.zeros(A.shape, bool)
        band = np.zeros(A.shape, bool)
    else:
        # band widened to this evaluator's argument error (~2^-44
        # relative on t, dominated by the f64 path's 2^-30 allowance)
        eps = abs(t_star) * 2.0 ** -30 + 2.0 ** -30
        d = t64 - t_star
        certain_sat = d > eps
        band = np.abs(d) <= eps
    unamb_top = (~certain_sat) & (~band) & (A > free - 1.0 + m)
    tv = np.maximum(u, 0)
    tv = np.where(unamb_zero, 0, tv)
    tv = np.where(unamb_top, freei - 1, tv)
    tv = np.where(certain_sat, freei, tv)
    unamb = unamb_frac | unamb_zero | unamb_top | certain_sat
    ambig = (~unamb) | band
    oos = s > max_sym
    tv = np.where(oos, freei, tv)
    ambig = np.where(oos, False, ambig)
    return tv.astype(np.int32), ambig


def eval_window_gaussian_df(xp, means, scales, ws, **kw):
    return eval_window_df(xp, "gaussian", means, scales, ws, **kw)

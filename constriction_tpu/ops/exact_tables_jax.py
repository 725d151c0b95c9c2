"""ON-DEVICE reference-exact boundary-table construction.

The wide exact decode tables (ops/exact_family.py) are pure per-symbol
functions of (mean, scale): tv(s) = trunc_u32(free * CDF_f64(s - 1/2)),
evaluated with glibc libm on the host.  This module evaluates the SAME
integer outcomes on the accelerator:

- each window entry's A ~ free * CDF is computed in plain float64 (on TPU
  that is XLA's software-emulated f64 -- measured per-op relative error
  ~3e-12 worst case, and being the compiler's own emulation no
  optimization pass can degrade it, unlike hand-built compensated-f32
  arithmetic, which XLA's simplifier silently folds back to f32);
- an entry's trunc value is taken from A whenever A is margin-far
  (2^-6, a >100x safety factor over the accumulated evaluation error,
  pinned by an error-bound test) from an integer; the rare margin-close
  entries are flagged and re-evaluated on the host with exact glibc calls
  (ctpu_exact_tv_at), then scattered back;
- CDF == 1.0 saturation (the right core edge: trunc >= free requires the
  f64 CDF to round to EXACTLY 1.0) is decided by a per-family THRESHOLD on
  the standardized argument, found once by bisection over f64 bit patterns
  against the host libm -- without it, the entire deep-saturated stretch
  of every window would sit margin-close to the integer `free` and defeat
  the patching economics;
- belt-and-braces, the caller (exact_family.packed_tables_on_device) runs
  a one-time per-process CANARY comparing device-built tables against the
  host builder bit-for-bit and disables this path on any backend where it
  fails.

The derived tables are therefore BIT-IDENTICAL to the host path (pinned
by tests), but they are built on the accelerator and never round-trip
through host memory -- the packed planes feed the decode kernels
directly, and on a sharded mesh every device builds its own block's
tables in parallel (the host builder is one core per PROCESS).

Everything here is plain jnp under a jax.enable_x64 scope -- no Pallas
needed, and the same program runs on CPU (true IEEE f64) for testing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

MARGIN = 2.0 ** -6

# Chebyshev fits shared with native/surrogate.cpp: erf <= ~4e-15 abs on
# [0,1]; the erfc form <= ~4e-12 abs on [1, 6.75]; atan <= ~3e-14 abs.
_C_ERF = np.array([
    1.12837916709551456e+00, -3.76126389032917119e-01, 1.12837916756339349e-01,
    -2.68661713833858451e-02, 5.22398368496215272e-03, -8.54862547085402224e-04,
    1.20648117470194637e-04, -1.51269071388316866e-05, 1.93514562377730892e-06,
    -4.40843970696300705e-07, 1.85114372069329434e-07, -6.18344640042375854e-08,
    9.58439555071015393e-09,
])
_C_ERFC_G = np.array([
    5.64185754490934221e-01, 1.58037007709310381e-04, -2.85051816944363767e-01,
    3.32108286928615923e-02, 1.73763316271747986e-01, 1.31525511993783395e+00,
    -6.00726102275856455e+00, 1.30591954849878462e+01, -1.86885438275975169e+01,
    1.90648631741469714e+01, -1.40957221367313412e+01, 7.42929053165331332e+00,
    -2.65628245666613250e+00, 5.78508774119375624e-01, -5.79861844447834632e-02,
])
_C_ATAN = np.array([
    9.99999999999994449e-01, -3.33333333330076309e-01, 1.99999999678049267e-01,
    -1.42857130096936707e-01, 1.11110842527539055e-01, -9.09056325307180807e-02,
    7.68934343987882213e-02, -6.64879398355174567e-02, 5.80358527801216884e-02,
    -5.00219591990031173e-02, 4.09747564554019533e-02, -3.02209514526401990e-02,
    1.88308640764455158e-02, -9.23774738272707327e-03, 3.27528064858460723e-03,
    -7.36310963610188173e-04, 7.81376237794734283e-05,
])
_C_EXP = np.array([1.0 / math.factorial(k) for k in range(14)])


def _poly(c, x):
    r = jnp.full_like(x, c[-1])
    for k in range(len(c) - 2, -1, -1):
        r = r * x + c[k]
    return r


def _exp_neg(x):
    """e^(-x) for x in [0, 50] via base-2 reduction (transcendental-free:
    the 2^k scaling is an exponent-field construction, exact on every
    backend; the residual polynomial is a short Taylor series)."""
    LOG2E = 1.4426950408889634074
    LN2 = 0.6931471805599453094
    kf = jnp.round(-x * LOG2E)
    r = -x - kf * LN2
    q = _poly(_C_EXP, r)
    k = kf.astype(jnp.int64)
    bits = ((k + 1023) << 52).astype(jnp.int64)
    scale = jax.lax.bitcast_convert_type(bits, jnp.float64)
    return q * scale


def _erf(t):
    at = jnp.abs(t)
    t1 = jnp.minimum(at, 1.0)
    e1 = t1 * _poly(_C_ERF, t1 * t1)
    tc = jnp.clip(at, 1.0, 6.75)
    u = 1.0 / tc
    erfc2 = _poly(_C_ERFC_G, u) * _exp_neg(tc * tc) * u
    e = jnp.where(at <= 1.0, e1, 1.0 - erfc2)
    e = jnp.where(at > 6.75, 1.0, e)
    return jnp.where(t < 0, -e, e)


def _atan(v):
    av = jnp.abs(v)
    vin = jnp.where(av <= 1.0, av, 1.0 / jnp.maximum(av, 1.0))
    r = vin * _poly(_C_ATAN, vin * vin)
    ab = jnp.where(av <= 1.0, r, 0.5 * math.pi - r)
    return jnp.where(v < 0, -ab, ab)


def _cdf_from_arg(family, t):
    """CDF in the standardized argument (gaussian: t is the ERF argument
    (x - mean)/(scale*sqrt2), matching sat_threshold's standardization)."""
    if family == "gaussian":
        return 0.5 * (1.0 + _erf(t))
    if family == "laplace":
        e = _exp_neg(jnp.minimum(jnp.abs(t), 45.0))
        return jnp.where(t < 0, 0.5 * e, 1.0 - 0.5 * e)
    return 0.5 + _atan(t) * (1.0 / math.pi)


# ---------------------------------------------------------------------------
# Saturation thresholds: the smallest f64 standardized argument at which the
# host's f64 CDF formula rounds to exactly 1.0 (bisection over bit patterns
# against the live libm -- the same one the exact path uses).
# ---------------------------------------------------------------------------


def _bits(x: float) -> int:
    return np.float64(x).view(np.int64).item()


def _from_bits(b: int) -> float:
    return np.int64(b).view(np.float64).item()


def _cdf_std(family: str, t: float) -> float:
    """Host CDF in the SAME standardized argument _eval_window64 produces
    (gaussian: the erf argument u = (x - mean)/(scale*sqrt2)), matching
    the formula shapes in native/codec.cpp."""
    if family == "gaussian":
        return (1.0 + math.erf(t)) / 2.0
    if family == "laplace":
        if t < 0:
            return 0.5 * math.exp(t)
        return 1.0 - 0.5 * math.exp(-t)
    return 0.5 + math.atan(t) / math.pi


@functools.lru_cache(maxsize=None)
def sat_threshold(family: str) -> float:
    """Smallest f64 t with CDF_std(t) == 1.0, +inf when none below 1e18.
    All three families currently return finite thresholds -- including
    cauchy, whose atan reaches fl(pi/2) around t ~ 2.5e15, far outside any
    real support but still finite (the band/certain_sat logic handles it
    like the others)."""
    hi = 1e18
    if _cdf_std(family, hi) < 1.0:
        return math.inf
    lo = 0.0
    assert _cdf_std(family, lo) < 1.0
    blo, bhi = _bits(lo), _bits(hi)
    while bhi - blo > 1:
        mid = (blo + bhi) // 2
        if _cdf_std(family, _from_bits(mid)) >= 1.0:
            bhi = mid
        else:
            blo = mid
    return _from_bits(bhi)


# ---------------------------------------------------------------------------
# Window evaluation: tv + ambiguity flags
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("family", "min_sym", "max_sym", "precision", "W"),
)
def _eval_window64(means, scales, ws, *, family, min_sym, max_sym,
                   precision, W):
    free = float((1 << precision) - 1 - (max_sym - min_sym))
    freei = jnp.int32(int(free))
    j = jnp.arange(W, dtype=jnp.int64)
    s = ws.astype(jnp.int64)[:, None] + j[None, :]
    x = s.astype(jnp.float64) - 0.5 - means[:, None]
    if family == "gaussian":
        t = x / (scales[:, None] * math.sqrt(2.0))
    else:
        t = x / scales[:, None]
    A = free * _cdf_from_arg(family, t)

    I = jnp.round(A)
    f = A - I
    Ii = I.astype(jnp.int32)
    u = Ii + jnp.floor(f).astype(jnp.int32)
    fr = f - jnp.floor(f)

    m = MARGIN
    unamb_frac = (fr > m) & (fr < 1.0 - m)
    # A + margin < 1 pins trunc to 0 regardless of sign wobble near 0
    unamb_zero = (u <= 0) & (A < 1.0 - m)

    t_star = sat_threshold(family)
    if math.isinf(t_star):
        certain_sat = jnp.zeros(A.shape, bool)
        band = jnp.zeros(A.shape, bool)
    else:
        # band covers the device evaluation's argument error plus the
        # host's own f64 argument rounding (~2^-51 relative)
        eps = abs(t_star) * 2.0 ** -30 + 2.0 ** -30
        d = t - t_star
        certain_sat = d > eps
        band = jnp.abs(d) <= eps
    # below the threshold the CDF is certainly < 1.0: trunc <= free - 1,
    # so A margin-close to `free` from below pins the value to free - 1
    unamb_top = (~certain_sat) & (~band) & (A > free - 1.0 + m)

    tv = jnp.maximum(u, 0)
    tv = jnp.where(unamb_zero, 0, tv)
    tv = jnp.where(unamb_top, freei - 1, tv)
    tv = jnp.where(certain_sat, freei, tv)

    unamb = unamb_frac | unamb_zero | unamb_top | certain_sat
    ambig = (~unamb) | band

    oos = s > max_sym
    tv = jnp.where(oos, freei, tv)
    ambig = jnp.where(oos, False, ambig)
    return tv, ambig


def eval_window(means, scales, ws, *, family, min_sym, max_sym, precision,
                W):
    """tv / ambiguity over the per-symbol windows s = ws + j, j in [0, W).

    Returns ``(tv i32 [n, W], ambig bool [n, W])`` where unambiguous
    entries carry their EXACT trunc value and ambiguous entries need the
    host oracle.  Out-of-support entries are saturated sentinels."""
    with jax.enable_x64(True):
        return _eval_window64(
            jnp.asarray(np.asarray(means, np.float64)),
            jnp.asarray(np.asarray(scales, np.float64)),
            jnp.asarray(np.asarray(ws, np.int32)),
            family=family, min_sym=min_sym, max_sym=max_sym,
            precision=precision, W=W,
        )


@jax.jit
def ambig_count(ambig):
    """Just the ambiguous-entry count (a 4-byte readback): lets the caller
    size the index fetch to ~count instead of hauling the worst-case
    n*W/16-entry index array over the host link (up to ~80 MB/segment on
    the tunneled dev chip -- the dominant prep cost it replaced)."""
    return jnp.sum(ambig.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("K",))
def _ambig_indices(ambig, *, K):
    flat = ambig.reshape(-1)
    n_total = flat.shape[0]
    idx = jnp.nonzero(flat, size=K, fill_value=n_total)[0]
    return idx, jnp.sum(flat.astype(jnp.int32))


def ambig_indices(ambig, *, K):
    """Flat indices of ambiguous entries, padded with n*W (one-past-end --
    the scatter target carries one scratch slot there), plus the true
    count (host checks it against K)."""
    return _ambig_indices(ambig, K=K)


@functools.partial(
    jax.jit,
    static_argnames=("min_sym", "max_sym", "precision", "cmax", "nsteps",
                     "R"),
)
def derive_pack(tv, ws, patch_idx, patch_vals, *, min_sym, max_sym,
                precision, cmax, nsteps, R):
    """Patch ambiguous entries, derive (core_lo, ncore), and emit the
    packed device planes [nsteps, CP1, R, 128] -- same rules as the host
    row fill (codec.cpp qm_fill_fast_row / Python pack_decode_tables).

    Returns ``(tabs4, incon bool [n], overflow bool [n])``; inconclusive
    or overflowing symbols must be patched with host rows."""
    n, W = tv.shape
    free = (1 << precision) - 1 - (max_sym - min_sym)
    freei = jnp.int32(free)
    padm1 = jnp.uint32((1 << precision) - 1)

    flat = jnp.concatenate([tv.reshape(-1), jnp.zeros((1,), jnp.int32)])
    flat = flat.at[patch_idx].set(patch_vals)
    tv = flat[:-1].reshape(n, W)

    j = jnp.arange(W, dtype=jnp.int32)
    n_eval = jnp.minimum(jnp.int32(W), max_sym - ws + 1)
    in_support = j[None, :] < n_eval[:, None]
    # pos must exclude the out-of-support sentinels (tv = free there);
    # sat deliberately includes them -- they terminate the core exactly
    # like the host's run-off-at-support-end rule
    pos = (tv >= 1) & in_support
    sat = tv > freei - 1
    has_pos = jnp.any(pos, axis=1)
    has_sat = jnp.any(sat, axis=1)
    j0 = jnp.argmax(pos, axis=1).astype(jnp.int32)
    first_sat = jnp.argmax(sat, axis=1).astype(jnp.int32)

    window_covers_end = ws + jnp.int32(W) - 1 >= max_sym

    # all-zero-trunc special case (conclusive only at the support end):
    # core_lo clamps to max_sym, single entry
    allzero = (~has_pos) & window_covers_end
    j0 = jnp.where(allzero, n_eval - 1, j0)
    # the core_lo entry is UNCONDITIONAL (host clamp rule: ncore >= 1 even
    # when tv(core_lo) is already saturated -- sharp-step models)
    ncore = jnp.where(allzero, 1, jnp.maximum(first_sat - j0, 1))

    incon = ((~has_pos) & (~window_covers_end)) \
        | (has_pos & (j0 == 0) & (ws != min_sym + 1)) \
        | (~has_sat)
    overflow = (~incon) & (ncore > cmax)

    idx = j0[:, None] + jnp.arange(cmax, dtype=jnp.int32)[None, :]
    vals = jnp.take_along_axis(tv, jnp.clip(idx, 0, W - 1), axis=1)
    b = vals.astype(jnp.uint32) + (
        ws[:, None] + idx - min_sym).astype(jnp.uint32) - 1
    k = jnp.arange(cmax, dtype=jnp.int32)[None, :]
    G = -(-cmax // 4)
    bm1 = jnp.where(k < ncore[:, None], b, padm1)
    if 4 * G > cmax:
        bm1 = jnp.concatenate(
            [bm1, jnp.full((n, 4 * G - cmax), padm1, jnp.uint32)], axis=1)
    core_lo = ws + j0
    aux = (core_lo - min_sym).astype(jnp.uint32) \
        | (ncore.astype(jnp.uint32) << 24)
    q = bm1.reshape(n, G, 4)
    w0 = q[..., 0] | (q[..., 1] << 24)
    w1 = (q[..., 1] >> 8) | (q[..., 2] << 16)
    w2 = (q[..., 2] >> 16) | (q[..., 3] << 8)
    planes = jnp.stack([w0, w1, w2], axis=2).reshape(n, 3 * G)
    tabs = jnp.concatenate([aux[:, None], planes], axis=1)  # [n, CP1]
    CP1 = 1 + 3 * G
    tabs4 = tabs.reshape(nsteps, R * 128, CP1).transpose(0, 2, 1) \
        .reshape(nsteps, CP1, R, 128)
    ncore_max = jnp.max(jnp.where(incon | overflow, 0, ncore))
    return tabs4, incon, overflow, ncore_max

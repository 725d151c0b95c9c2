"""Reference-exact per-symbol continuous families on device.

The fast on-device family kernels (ops/pallas_family.py) use an exact
INTEGER CDF -- self-consistent across backends but not bit-compatible with
the reference's ``LeakyQuantizer`` over f64 float CDFs
(/root/reference/src/stream/model/quantize.rs:525-568).  This module is the
bit-compatible path: the model tables are computed on the host with the
exact f64 formulas (models/quantized.py, golden-verified against the
reference), and the TPU runs the full rANS coding loop against them.

- Encode: the host evaluates 2 CDFs per symbol -> per-symbol ``(cum, prob)``
  planes are DMA'd per step into a stream-table encoder kernel.
- Decode: the host cannot know the symbols, so it precomputes, per symbol
  position, a COMPACT exact description of the whole quantile partition:
  the LeakyQuantizer table is exactly LINEAR in both tails (where
  ``trunc(free * CDF(x - 1/2))`` is pinned at 0 / free-1, the boundary is
  ``b(s) = s - min`` resp. ``free - 1 + s - min``), so only the CORE
  boundaries (at most ``cmax`` of them, clamped analytically and verified
  exactly) are materialized and DMA'd; the kernel inverts the quantile with
  ~7 vector ops per core boundary plus closed-form tail handling.

Both directions are bit-identical to the host twins (`encode_shared` /
the numpy oracle below), hence to a reference-produced model: a
constriction stream re-coded per-lane round-trips on TPU with zero rate
change.  The price of exactness is host-side table generation (erf in f64
has no TPU equivalent); the fast integer family remains the performance
path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import special
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

EXACT_FAMILIES = ("gaussian", "laplace", "cauchy", "binomial")


def _cdf(family: str, x, mean, scale):
    """For the continuous families (mean, scale) are location/scale; for
    "binomial" the pair is (n_trials, p) -- same generic two-parameter slot
    convention as the native codec's DIST_KIND."""
    if family == "gaussian":
        return special.gaussian_cdf(x, mean, scale)
    if family == "laplace":
        return special.laplace_cdf(x, mean, scale)
    if family == "cauchy":
        return special.cauchy_cdf(x, mean, scale)
    if family == "binomial":
        return special.binomial_cdf(x, mean, scale)
    raise ValueError(f"unknown family {family!r}")


def _ppf_guess(family: str, p: float, mean, scale):
    """Approximate inverse CDF -- only a WINDOW GUESS; exactness comes from
    verifying the trunc values at the window edges."""
    mean = np.asarray(mean, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    if family == "gaussian":
        from scipy.special import ndtri

        return mean + scale * ndtri(p)
    if family == "laplace":
        if p < 0.5:
            return mean + scale * np.log(2.0 * p)
        return mean - scale * np.log(2.0 * (1.0 - p))
    if family == "cauchy":
        return mean + scale * np.tan(np.pi * (p - 0.5))
    if family == "binomial":
        from scipy.special import ndtri

        mu = mean * scale  # n * p
        sd = np.sqrt(np.maximum(mean * scale * (1.0 - scale), 0.0))
        return mu + sd * ndtri(p)
    raise ValueError(family)


def _dedup_probe(mean, scale):
    """(unique_pairs, inverse) when a full exact-pair dedup is likely to
    pay, else None.  A 4096-point sample gates the O(n log n) np.unique --
    fully-continuous parameter batches (sampled unique fraction > 1/2)
    skip it entirely."""
    n = len(mean)
    if n >= 4096:
        step = max(n // 4096, 1)
        zs = mean[::step] + 1j * scale[::step]
        if len(np.unique(zs)) > len(zs) // 2:
            return None
    z = mean + 1j * scale
    uz, inv = np.unique(z, return_inverse=True)
    return (uz, inv) if len(uz) <= n // 2 else None



def exact_ncore(
    means, scales, family: str, min_sym: int, max_sym: int, precision: int,
) -> np.ndarray:
    """Per-symbol core sizes (number of non-linear boundaries) -- used to
    auto-size ``cmax`` before paying for the table fill.  Twin of the C++
    ``qm_core_edges`` bisection; numpy fallback below is bit-identical."""
    mean = np.asarray(means, dtype=np.float64).reshape(-1)
    scale = np.asarray(scales, dtype=np.float64).reshape(-1)
    n = len(mean)
    from .. import native

    if native.LIB is not None and family in EXACT_FAMILIES:
        # core size depends only on the (mean, scale) pair: probe unique
        # pairs once (see packed_tables_device's memo note)
        dd = _dedup_probe(mean, scale)
        if dd is not None:
            uz, inv = dd
            out_u = np.empty(len(uz), dtype=np.uint32)
            native.LIB.ctpu_exact_ncore(
                native.DIST_KIND[family], min_sym, max_sym, precision,
                np.ascontiguousarray(uz.real), np.ascontiguousarray(uz.imag),
                len(uz), out_u,
            )
            return out_u[inv]
        out = np.empty(n, dtype=np.uint32)
        native.LIB.ctpu_exact_ncore(
            native.DIST_KIND[family], min_sym, max_sym, precision,
            np.ascontiguousarray(mean), np.ascontiguousarray(scale), n, out,
        )
        return out

    # numpy twin: vectorized bisection on the monotone trunc value
    free = float((1 << precision) - 1 - (max_sym - min_sym))
    freeu = int(free)

    def tv(s):
        return _trunc(free * _cdf(family, s.astype(np.float64) - 0.5,
                                  mean, scale))

    def bisect(lo, hi, threshold):
        # batch bisection: lanes stop updating once hi - lo == 1 (a shared
        # loop over the max lane width; converged lanes are masked)
        while np.any(hi - lo > 1):
            active = (hi - lo) > 1
            mid = lo + ((hi - lo) >> 1)
            pred = tv(mid) >= threshold
            hi = np.where(active & pred, mid, hi)
            lo = np.where(active & ~pred, mid, lo)
        return hi

    tv_max = tv(np.full(n, max_sym, np.int64))
    # core_lo: first s in (min, max] with tv >= 1 (max_sym when none)
    hi = bisect(np.full(n, min_sym, np.int64),
                np.full(n, max_sym, np.int64), 1)
    core_lo = np.where(tv_max < 1, max_sym, hi)
    # core_hi: last s with tv <= free-1 == (first s with tv >= free) - 1
    hi = bisect(np.full(n, min_sym + 1, np.int64),
                np.full(n, max_sym, np.int64), freeu)
    tv_lo1 = tv(np.full(n, min_sym + 1, np.int64))
    core_hi = np.where(
        tv_max <= freeu - 1, max_sym,
        np.where(tv_lo1 >= freeu, min_sym, hi - 1),
    )
    core_hi = np.maximum(core_hi, core_lo)
    return (core_hi - core_lo + 1).astype(np.uint32)


def _trunc(x: np.ndarray) -> np.ndarray:
    """Truncating f64 -> u32 cast with Rust `as` semantics (saturating,
    NaN -> 0); twin of models/quantized._trunc_to_uint."""
    hi = float((1 << 32) - 1)
    with np.errstate(invalid="ignore"):
        clipped = np.clip(x, 0.0, hi)
        clipped = np.where(np.isnan(x), 0.0, clipped)
    return np.trunc(clipped).astype(np.int64)


def exact_ecp(
    symbols, means, scales, family: str, min_sym: int, max_sym: int,
    precision: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-symbol (cum, prob) with the exact reference formulas
    (quantize.rs:525-568), vectorized over per-symbol (mean, scale)."""
    s = np.asarray(symbols, dtype=np.int64)
    if np.any((s < min_sym) | (s > max_sym)):
        raise ValueError("symbol outside support")
    mean = np.asarray(means, dtype=np.float64)
    scale = np.asarray(scales, dtype=np.float64)
    free = float((1 << precision) - 1 - (max_sym - min_sym))
    if free < 1.0:
        raise ValueError("support too large for precision")
    from .. import native

    if (
        native.LIB is not None
        and family in EXACT_FAMILIES
        and mean.ndim == 1
        and len(s) == len(mean)
        and len(s) >= 64
    ):
        # same per-symbol formulas in C++ (glibc libm, bit-identical to the
        # numpy path below); ~100x the numpy/frompyfunc throughput
        cums32 = np.empty(len(s), dtype=np.uint32)
        probs32 = np.empty(len(s), dtype=np.uint32)
        err = native.LIB.ctpu_quantized_ecp(
            native.DIST_KIND[family], min_sym, max_sym, precision,
            np.ascontiguousarray(s, dtype=np.int32),
            np.ascontiguousarray(mean), np.ascontiguousarray(scale),
            len(s), cums32, probs32,
        )
        if err != 0 or np.any((probs32 - 1) >= np.uint32(1 << precision)):
            # twin of the numpy path's prob <= 0 check (a wrapped
            # right - left shows up as a huge u32 here)
            raise ValueError("invalid underlying continuous distribution")
        return cums32, probs32
    slack = s - min_sym
    sf = s.astype(np.float64)
    left = _trunc(free * _cdf(family, sf - 0.5, mean, scale)) + slack
    left = np.where(s == min_sym, 0, left)
    right = _trunc(free * _cdf(family, sf + 0.5, mean, scale)) + slack + 1
    right = np.where(s == max_sym, 1 << precision, right)
    prob = right - left
    if np.any(prob <= 0):
        raise ValueError("invalid underlying continuous distribution")
    return left.astype(np.uint32), prob.astype(np.uint32)


def exact_boundary_tables(
    means, scales, family: str, min_sym: int, max_sym: int, precision: int,
    cmax: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compact exact decode tables: per symbol position, the core boundary
    values ``b(s) = trunc(free * CDF(s - 1/2)) + (s - min)`` for s in
    [core_lo, core_hi], where the core is the maximal range outside which
    the trunc value is exactly 0 (left tail) or free-1 (right tail).

    Returns ``(aux u32[n], core u32[n, cmax])``.  For P <= 16 ("narrow"
    tables, two boundaries per u32 on the device) ``aux = (core_lo - min) |
    ncore << 16`` and pads are 0xFFFF; for 16 < P <= 24 ("wide" tables,
    the default-preset precisions; one u32 boundary per plane)
    ``aux = (core_lo - min) | ncore << 24`` and pads are ``1 << P`` — a
    value no real boundary can take (they are <= 2^P - 2) that doubles as
    the no-next-boundary sentinel, so the pads need no masking at all.
    Raises if any symbol's core exceeds ``cmax`` (increase cmax; a very
    flat distribution can make the whole support non-linear).
    """
    mean = np.asarray(means, dtype=np.float64).reshape(-1)
    scale = np.asarray(scales, dtype=np.float64).reshape(-1)
    n = len(mean)
    P = precision
    assert P <= 24, "exact tables support precisions up to 24"
    wide = P > 16
    padv = (1 << P) if wide else 0xFFFF
    aux_shift = 24 if wide else 16
    if cmax is None:
        # auto-size: probe per-symbol core sizes (2 bisections each, no
        # value fill), then use the tight max -- table bytes and the
        # kernel's scan both cost O(cmax), so a tight cmax is the main
        # throughput lever for the exact path
        ncore = exact_ncore(mean, scale, family, min_sym, max_sym, P)
        cmax = max(int(ncore.max()) if n else 1, 1)
        if not wide:
            cmax += cmax & 1  # narrow tables pack boundary PAIRS
        if cmax >= (1 << (32 - aux_shift)):
            raise ValueError(
                f"core needs {cmax} boundaries; the {'wide' if wide else 'narrow'}"
                f" table format caps ncore at {(1 << (32 - aux_shift)) - 1}"
                " (use the host decode path for this model)"
            )
    assert cmax < (1 << (32 - aux_shift))
    free = float((1 << P) - 1 - (max_sym - min_sym))
    if free < 2.0:
        raise ValueError("support too large for precision")
    span = max_sym - min_sym

    # native path: per-edge bisection in C++ (glibc libm, bit-identical),
    # log2(span) CDF evals per edge instead of a full evaluation window;
    # the C++ generator emits the same narrow/wide pad + aux packing
    from .. import native

    if native.LIB is not None and family in EXACT_FAMILIES:
        aux = np.empty(n, dtype=np.uint32)
        core = np.empty((n, cmax), dtype=np.uint32)
        bad = native.LIB.ctpu_exact_boundaries(
            native.DIST_KIND[family], min_sym, max_sym, P,
            np.ascontiguousarray(mean), np.ascontiguousarray(scale),
            n, cmax, aux, core.reshape(-1),
        )
        if bad:
            raise ValueError(
                f"core of symbol {int(bad) - 1} needs more than cmax={cmax} "
                "boundaries; increase cmax (flat distributions make the "
                "whole support non-linear)"
            )
        return aux, core

    # window guess from the approximate PPF, with margin; exactness is then
    # verified on the evaluated trunc values at the window edges
    margin = 4
    wwin = min(cmax + 2 * margin, span + 1)
    lo_g = np.floor(_ppf_guess(family, 1.0 / free, mean, scale))
    lo_g = np.where(np.isfinite(lo_g), lo_g, float(min_sym))
    a = np.clip(
        lo_g.astype(np.int64) - margin, min_sym + 1, max(min_sym + 1, max_sym - wwin + 1)
    )
    grid = a[:, None] + np.arange(wwin)[None, :]  # [n, wwin] symbol values
    valid = grid <= max_sym
    gridc = np.minimum(grid, max_sym)
    tv = _trunc(
        free * _cdf(family, gridc.astype(np.float64) - 0.5,
                    mean[:, None], scale[:, None])
    )
    # cdf rounds to exactly 1.0 in f64 well inside heavy right tails, so
    # trunc(free * cdf) takes the value free there (NOT free-1); the single
    # right-linear regime is b(s) = free + s - min, and everything below
    # saturation (including the trunc == free-1 stretch) belongs to the core
    pos = (tv >= 1) & valid
    nonsat = (tv <= int(free) - 1) & valid

    any_pos = pos.any(axis=1)
    lo_w = np.where(any_pos, pos.argmax(axis=1), wwin - 1)
    # window-edge verification: the first positive trunc must be INSIDE the
    # window (edge value 0) unless the window starts at the support edge
    edge_ok = (~any_pos) | (lo_w > 0) | (a == min_sym + 1)
    if not np.all(edge_ok):
        raise ValueError(
            "core window missed the left edge (distribution wider than "
            f"cmax={cmax}? increase cmax)"
        )
    any_ns = nonsat.any(axis=1)
    hi_w = np.where(any_ns, wwin - 1 - nonsat[:, ::-1].argmax(axis=1), lo_w)
    # the right edge is covered when the last non-saturated value is inside
    # the window (something saturated/invalid follows it) OR the window
    # already reaches the end of the support (a core touching max is fine)
    hi_ok = (hi_w < wwin - 1) | (grid[:, wwin - 1] >= max_sym)
    if not np.all(hi_ok):
        raise ValueError(
            "core window missed the right edge (distribution wider than "
            f"cmax={cmax}? increase cmax)"
        )
    # clamp to a non-empty core (all-linear / sharp-step cases)
    lo_w = np.where(any_pos, lo_w, np.minimum(max_sym - a, wwin - 1))
    hi_w = np.maximum(hi_w, lo_w)
    ncore = hi_w - lo_w + 1
    if np.any(ncore > cmax):
        raise ValueError(
            f"core needs {int(ncore.max())} boundaries > cmax={cmax}; "
            "increase cmax (flat distributions make the whole support "
            "non-linear)"
        )

    b = tv + (gridc - min_sym)  # boundary values on the window grid
    idx = lo_w[:, None] + np.arange(cmax)[None, :]
    take = np.take_along_axis(
        np.concatenate([b, np.full((n, cmax), padv, np.int64)], axis=1),
        np.minimum(idx, wwin + cmax - 1),
        axis=1,
    )
    core = np.where(np.arange(cmax)[None, :] < ncore[:, None], take, padv)
    core_lo_rel = (np.take_along_axis(grid, lo_w[:, None], 1)[:, 0] - min_sym)
    aux = (core_lo_rel.astype(np.uint32)
           | (ncore.astype(np.uint32) << aux_shift))
    return aux, core.astype(np.uint32)


def pack_decode_tables(
    aux: np.ndarray, core: np.ndarray, precision: int
) -> Tuple[np.ndarray, int]:
    """(aux, core) -> device table planes ``[n, CP1] u32`` in the decode
    kernels' packed (b - 1) layout, plus the effective (rounded) cmax.

    Plane 0 is aux.  Narrow (P <= 16): u16 (b - 1) pairs (even | odd << 16)
    with pads forced to 0xFFFF by the ncore index mask -- raw narrow tables
    cannot distinguish a saturated 2^P - 1 boundary from a pad by value.
    Wide (16 < P <= 24): 24-bit (b - 1) quads, 4 boundaries per 3 planes;
    raw wide pads are 2^P, so ``core - 1`` maps them to the 0xFFFFFF pad
    uniformly with the real boundaries (which are >= 1).  The (b - 1)
    store is what lets the kernels scan with a strict ``<`` prefix mask
    and no pad masking; see the kernel bodies.
    """
    n, cmax = core.shape
    if precision > 16:
        G = -(-cmax // 4)
        bm1 = np.full((n, 4 * G), (1 << precision) - 1, np.uint32)
        bm1[:, :cmax] = core - 1
        grp = bm1.reshape(n, G, 4)
        tabs = np.empty((n, 1 + 3 * G), np.uint32)
        tabs[:, 0] = aux
        w = np.empty((n, G, 3), np.uint32)
        w[..., 0] = grp[..., 0] | (grp[..., 1] << 24)
        w[..., 1] = (grp[..., 1] >> 8) | (grp[..., 2] << 16)
        w[..., 2] = (grp[..., 2] >> 16) | (grp[..., 3] << 8)
        tabs[:, 1:] = w.reshape(n, 3 * G)
        return tabs, 4 * G
    assert cmax % 2 == 0
    ncore = (aux >> 16).astype(np.int64)
    bm1 = np.where(
        np.arange(cmax)[None, :] < ncore[:, None], core - 1, 0xFFFF
    ).astype(np.uint32)
    tabs = np.empty((n, cmax // 2 + 1), np.uint32)
    tabs[:, 0] = aux
    tabs[:, 1:] = bm1[:, 0::2] | (bm1[:, 1::2] << 16)
    return tabs, cmax


def packed_tables_device(
    means, scales, family: str, min_sym: int, max_sym: int, precision: int,
    cmax: int, nsteps: int, R: int,
) -> Tuple[np.ndarray, int]:
    """Wide decode tables in the device layout ``[nsteps, CP1, R, 128]``
    (plane axis in front of the lane axes), plus the rounded cmax.

    The native path fuses boundary fill + 24-bit-quad packing in one C++
    pass (no [n, cmax] intermediate) followed by a blocked transpose --
    on a single-core host the numpy pack + strided transpose cost ~5x the
    CDF evaluations themselves.  Falls back to exact_boundary_tables +
    pack_decode_tables + numpy transpose (bit-identical output).

    Repeated (mean, scale) pairs are memoized: a row depends only on the
    pair (for fixed family/support/precision), so unique pairs are built
    once and gathered back.  Neural-compression parameter batches hit this
    hard -- scale-hyperprior codecs commonly quantize scales to a small
    discrete table, and the CDF evaluations (~ncore glibc erf calls per
    row) dominate prep cost."""
    mean = np.ascontiguousarray(np.asarray(means, np.float64).reshape(-1))
    scale = np.ascontiguousarray(np.asarray(scales, np.float64).reshape(-1))
    n = nsteps * R * 128
    assert len(mean) == n
    assert 16 < precision <= 24

    from .. import native

    # continuous batches with the native lib ride the fully-fused C++ path:
    # boundary fill + quad packing + transpose in one pass, no [n, CP1]
    # intermediate (its allocation faults + extra read/write pass cost as
    # much as the CDF math on a single-core host)
    dd = _dedup_probe(mean, scale)
    if (dd is None and native.LIB is not None and family in EXACT_FAMILIES
            and cmax <= 255):

        def _fused(cm):
            G = -(-cm // 4)
            CP1 = 1 + 3 * G
            t4 = np.empty((nsteps, CP1, R * 128), dtype=np.uint32)
            ncm = np.zeros(1, np.int32)
            bad = native.LIB.ctpu_exact_tables_packed_t(
                native.DIST_KIND[family], min_sym, max_sym, precision,
                mean, scale, nsteps, R * 128, cm, t4.reshape(-1), ncm,
            )
            if bad:
                raise ValueError(
                    f"core of symbol {int(bad) - 1} needs more than "
                    f"cmax={cm} boundaries; increase cmax (flat "
                    "distributions make the whole support non-linear)"
                )
            return t4.reshape(nsteps, CP1, R, 128), 4 * G, int(ncm[0])

        tabs4, cmax_r, ncore_max = _fused(cmax)
        # the caller's cmax is an upper BOUND (group_plan's deterministic
        # estimate); the kernel scan and table DMA cost O(width), so when
        # the batch's true max core is at least one quad narrower, refill
        # at the tight width -- the fill is cheap, the kernels are not
        tight = max(4, -(-max(ncore_max, 1) // 4) * 4)
        if tight < cmax_r:
            tabs4, cmax_r, _ = _fused(tight)
        return tabs4, cmax_r
    if dd is not None:
        uz, inv = dd
        tabs_u, cmax_r = _packed_table_rows(
            np.ascontiguousarray(uz.real), np.ascontiguousarray(uz.imag),
            family, min_sym, max_sym, precision, cmax,
        )
        tight = max(4, -(-max(int((tabs_u[:, 0] >> 24).max()), 1) // 4) * 4)
        if tight < cmax_r:
            tabs_u, cmax_r = _packed_table_rows(
                np.ascontiguousarray(uz.real),
                np.ascontiguousarray(uz.imag),
                family, min_sym, max_sym, precision, tight,
            )
        tabs = tabs_u[inv]
    else:
        tabs, cmax_r = _packed_table_rows(
            mean, scale, family, min_sym, max_sym, precision, cmax
        )
        tight = max(4, -(-max(int((tabs[:, 0] >> 24).max()), 1) // 4) * 4)
        if tight < cmax_r:
            tabs, cmax_r = _packed_table_rows(
                mean, scale, family, min_sym, max_sym, precision, tight
            )
    CP1 = tabs.shape[1]

    if native.LIB is not None:
        tabs4 = np.empty((nsteps, CP1, R * 128), dtype=np.uint32)
        native.LIB.ctpu_transpose_u32(
            np.ascontiguousarray(tabs).reshape(-1), tabs4.reshape(-1),
            nsteps, R * 128, CP1,
        )
        return tabs4.reshape(nsteps, CP1, R, 128), cmax_r
    tabs4 = np.ascontiguousarray(
        tabs.reshape(nsteps, R, 128, CP1).transpose(0, 3, 1, 2)
    )
    return tabs4, cmax_r


_DEVICE_BUILDER_OK: dict = {}
_DF32_EVAL_OK: dict = {}


def _df32_eval_enabled() -> bool:
    """Whether the double-f32 Pallas window evaluator replaces the XLA-f64
    one for gaussian segments on this backend.

    Decided ONCE per backend: the df32 spot canary must pass on real
    hardware (interpret mode is non-authoritative -- XLA-CPU folds the
    compensated arithmetic, ops/df32_pallas.py docstring), and
    CTPU_DF32_EVAL=0 force-disables.  The full table-builder canary then
    validates the combined pipeline bit-for-bit (and downgrades to the
    f64 evaluator if the combination fails)."""
    import os

    if os.environ.get("CTPU_DF32_EVAL", "1") == "0":
        return False
    backend = jax.default_backend()
    ok = _DF32_EVAL_OK.get(backend)
    if ok is None:
        if backend != "tpu":
            ok = False
        else:
            try:
                from . import df32_pallas as dfp

                ok = bool(dfp.df32_eval_canary())
            except Exception:
                ok = False
        _DF32_EVAL_OK[backend] = ok
    return ok


def _device_builder_canary() -> bool:
    """One-time per-process/backend validation of the on-device table
    builder: build tables for a random parameter batch on the device and
    compare bit-for-bit against the host builder.  Numerical behavior of
    accelerator backends is outside this library's control (XLA's f64
    emulation, future compiler changes), so the device path turns itself
    off wherever the check fails rather than trusting an error analysis
    alone."""
    backend = jax.default_backend()
    ok = _DEVICE_BUILDER_OK.get(backend)
    if ok is not None:
        return ok
    rng = np.random.RandomState(0xC0FFEE)
    n = 4 * 128
    means = rng.randn(n) * 40.0
    scales = np.exp(rng.normal(0.3, 1.0, n))

    def _check() -> bool:
        for fam in ("gaussian", "laplace", "cauchy"):
            nc = exact_ncore(means, scales, fam, -100, 100, 24)
            cmax = min(max(int(nc.max()), 1), 255)
            host, ch = packed_tables_device(
                means, scales, fam, -100, 100, 24, cmax, 2, 2)
            dev = _packed_tables_on_device_impl(
                means, scales, fam, -100, 100, 24, cmax, 2, 2)
            if dev is None or ch != dev[1] or not np.array_equal(
                    host, np.asarray(dev[0])):
                return False
        return True

    ok = _check()
    if not ok and _df32_eval_enabled():
        # the combination failed: downgrade to the f64 evaluator and give
        # the device path one more chance before disabling it entirely
        _DF32_EVAL_OK[backend] = False
        ok = _check()
    _DEVICE_BUILDER_OK[backend] = ok
    return ok


def packed_tables_on_device(
    means, scales, family: str, min_sym: int, max_sym: int, precision: int,
    cmax: int, nsteps: int, R: int,
):
    """Wide decode tables in the device layout, BUILT ON THE ACCELERATOR
    (ops/exact_tables_jax.py): f64 CDF evaluation with a trunc ambiguity
    margin, exact glibc host patches for the rare margin-close entries,
    structure derivation + quad packing on device.  Bit-identical to
    :func:`packed_tables_device` (pinned by tests AND a one-time runtime
    canary per backend); the returned ``tabs4`` is a DEVICE array that
    feeds the decode kernels with no host round-trip of the (much larger)
    table planes.  Returns None when unavailable (no native patch oracle,
    canary failure, or pathological ambiguity) -- callers fall back to the
    host builder."""
    from .. import native

    if native.LIB is None or family not in ("gaussian", "laplace",
                                            "cauchy"):
        return None
    if max(abs(int(min_sym)), abs(int(max_sym))) > (1 << 40):
        return None
    if not _device_builder_canary():
        return None
    return _packed_tables_on_device_impl(
        means, scales, family, min_sym, max_sym, precision, cmax, nsteps, R
    )


def _packed_tables_on_device_impl(
    means, scales, family, min_sym, max_sym, precision, cmax, nsteps, R,
):
    # the canary itself validates through this entry: skip the canary
    # gate here or it would recurse
    res = packed_tables_on_device_batch(
        [(means, scales, cmax, nsteps)], family, min_sym, max_sym,
        precision, R, _canary=False,
    )
    return None if res is None else res[0]


def _host_segment_tables(p, family, min_sym, max_sym, precision, R):
    """Per-segment host fallback for the batch builder: the fused C++
    builder's planes, device_put so downstream kernel feeding is uniform."""
    tabs4, cmax_r = packed_tables_device(
        p["mean"], p["scale"], family, min_sym, max_sym, precision,
        p["cmax"], p["nsteps"], R,
    )
    return jnp.asarray(tabs4), cmax_r


def packed_tables_on_device_batch(segs, family, min_sym, max_sym,
                                  precision, R, _canary=True):
    """Pipelined on-device table build for a LIST of segments.

    ``segs`` is ``[(means, scales, cmax, nsteps), ...]`` (one entry per
    grouped-decode segment).  The build is phased so the tunneled dev
    chip's latency and the host patch oracle overlap with device work:

    1. dispatch every segment's f64 window evaluation + ambiguity count
       (async -- the device queue runs them back to back);
    2. per segment: read back the COUNT (4 bytes), fetch the ambiguous
       indices at a power-of-two bucket sized to the count (the old path
       hauled the worst-case n*W/16-entry index array AND an equally
       sized patch array over the link -- ~120 MB/segment at suite
       scale), and run the exact glibc patch oracle on the host while
       later segments' evals still run on device;
    3. dispatch every derive_pack;
    4. finalize: tighten by SLICING the packed planes (packing is plane 0
       aux + 3 u32 per ascending 4-boundary group, so narrowing is a
       column truncation -- bit-identical to re-deriving at the tight
       width, without the second derive pass), and patch host-fallback
       rows for the rare inconclusive windows.

    Returns a list of ``(tabs4, cmax_r)`` (device arrays), or ``None``
    when the device path is unavailable (callers use the host builder).
    """
    from .. import native
    from . import exact_tables_jax as etj

    if (native.LIB is None or family not in ("gaussian", "laplace",
                                             "cauchy")):
        return None
    if max(abs(int(min_sym)), abs(int(max_sym))) > (1 << 40):
        return None
    if _canary and not _device_builder_canary():
        return None

    CL = _EST_C[family][0]
    ph = []
    # phase 1: window evals + counts, all segments, async
    for means, scales, cmax, nsteps in segs:
        mean = np.ascontiguousarray(np.asarray(means, np.float64).reshape(-1))
        scale = np.ascontiguousarray(
            np.asarray(scales, np.float64).reshape(-1)
        )
        n = nsteps * R * 128
        assert len(mean) == n and 16 < precision <= 24 and cmax <= 255
        # window starts from the deterministic core lower bound (coarse is
        # fine: inconclusive windows fall back to host rows)
        if np.isinf(CL):
            ws = np.full(n, min_sym + 1, np.int64)
        else:
            ws = np.clip(
                np.ceil(mean - CL * scale) - 3.0, min_sym + 1, max_sym
            ).astype(np.int64)
        W = min(cmax + 16, max_sym - min_sym + 1 + 16)
        ws32 = ws.astype(np.int32)
        if _df32_eval_enabled():
            from . import df32_pallas as dfp

            tv, ambig = dfp.eval_window_family_pallas(
                family, mean, scale, ws32, min_sym=int(min_sym),
                max_sym=int(max_sym), precision=int(precision), W=int(W),
            )
        else:
            tv, ambig = etj.eval_window(
                mean, scale, ws32, family=family, min_sym=int(min_sym),
                max_sym=int(max_sym), precision=int(precision), W=int(W),
            )
        ph.append(dict(
            mean=mean, scale=scale, ws=ws, ws32=ws32, n=n, W=W,
            cmax=int(cmax), nsteps=int(nsteps), tv=tv, ambig=ambig,
            cnt=etj.ambig_count(ambig),
        ))

    # phase 2: count readback, bucketed index fetch, host glibc patches
    # (a pathological segment degrades to the host builder ALONE -- the
    # other segments keep their device pipeline)
    for p in ph:
        count = int(p["cnt"])
        if count > max(4096, (p["n"] * p["W"]) // 16):
            p["host"] = True
            continue
        K2 = 1 << max(12, (max(count, 1) - 1).bit_length())
        idx, _ = etj.ambig_indices(p["ambig"], K=K2)
        idx_h = np.asarray(idx)
        live = idx_h < p["n"] * p["W"]
        sym_i = (idx_h[live] // p["W"]).astype(np.int64)
        svals = (p["ws"][sym_i] + (idx_h[live] % p["W"])).astype(np.int32)
        patch_vals = np.zeros(len(idx_h), np.int32)
        if len(sym_i):
            out = np.empty(len(sym_i), np.uint32)
            native.LIB.ctpu_exact_tv_at(
                native.DIST_KIND[family], min_sym, max_sym, precision,
                p["mean"], p["scale"], np.ascontiguousarray(sym_i),
                np.ascontiguousarray(svals), len(sym_i), out,
            )
            patch_vals[live] = out.astype(np.int32)
        p["idx"] = idx
        p["patch_vals"] = patch_vals

    # phase 3: derive + pack, all segments, async
    for p in ph:
        if p.get("host"):
            continue
        tabs4, incon, overflow, ncore_max = etj.derive_pack(
            p["tv"], jnp.asarray(p["ws32"]), p["idx"],
            jnp.asarray(p["patch_vals"]),
            min_sym=int(min_sym), max_sym=int(max_sym),
            precision=int(precision), cmax=p["cmax"],
            nsteps=p["nsteps"], R=int(R),
        )
        p.update(tabs4=tabs4, incon=incon, overflow=overflow,
                 ncm=ncore_max)

    # phase 4: host-fallback rows, slice-tighten, finalize
    results = []
    for p in ph:
        if p.get("host"):
            results.append(_host_segment_tables(p, family, min_sym,
                                                max_sym, precision, R))
            continue
        G = -(-p["cmax"] // 4)
        # Host-fallback rows for the (rare) inconclusive/overflowing
        # windows are built at the caller's cmax BEFORE tightening, so
        # their true ncore folds into the tighten bound and their width
        # always agrees with tabs4.  A row that genuinely needs more than
        # cmax boundaries sends the whole batch to the host builder.
        bad = np.asarray(p["incon"] | p["overflow"])
        bad_idx = np.nonzero(bad)[0]
        rows = None
        rows_nc = 0
        if len(bad_idx):
            try:
                rows, cmax_r = _packed_table_rows(
                    np.ascontiguousarray(p["mean"][bad_idx]),
                    np.ascontiguousarray(p["scale"][bad_idx]),
                    family, min_sym, max_sym, precision, p["cmax"],
                )
            except ValueError:
                # a row overflows cmax: this segment goes to the host
                # builder; the rest of the batch stays on-device
                results.append(_host_segment_tables(p, family, min_sym,
                                                    max_sym, precision, R))
                continue
            assert cmax_r == 4 * G
            aux_shift = 24 if int(precision) > 16 else 16
            rows_nc = int((rows[:, 0] >> np.uint32(aux_shift)).max())
        # tighten: the caller's cmax is group_plan's upper BOUND; kernel
        # scan and table DMA cost O(width)
        tight = max(4, -(-max(int(p["ncm"]), rows_nc, 1) // 4) * 4)
        tabs4 = p["tabs4"]
        if tight < 4 * G:
            G = tight // 4
            tabs4 = tabs4[:, : 1 + 3 * G]
            if rows is not None:
                rows = rows[:, : 1 + 3 * G]
        if rows is not None:
            t_i = (bad_idx // (R * 128)).astype(np.int32)
            rem = bad_idx % (R * 128)
            r_i = (rem // 128).astype(np.int32)
            l_i = (rem % 128).astype(np.int32)
            tabs4 = tabs4.at[t_i, :, r_i, l_i].set(jnp.asarray(rows))
        results.append((tabs4, 4 * G))
    return results


def _packed_table_rows(
    mean, scale, family: str, min_sym: int, max_sym: int, precision: int,
    cmax: int,
) -> Tuple[np.ndarray, int]:
    """Packed wide-table rows ``[n, 1 + 3*ceil(cmax/4)] u32`` (plane 0 is
    aux) for arbitrary-length parameter vectors; fused C++ when available."""
    from .. import native

    n = len(mean)
    G = -(-cmax // 4)
    CP1 = 1 + 3 * G
    if (native.LIB is not None and family in EXACT_FAMILIES
            and cmax <= 255):
        tabs = np.empty((n, CP1), dtype=np.uint32)
        bad = native.LIB.ctpu_exact_tables_packed(
            native.DIST_KIND[family], min_sym, max_sym, precision,
            mean, scale, n, cmax, tabs.reshape(-1),
        )
        if bad:
            raise ValueError(
                f"core of symbol {int(bad) - 1} needs more than cmax={cmax} "
                "boundaries; increase cmax (flat distributions make the "
                "whole support non-linear)"
            )
        return tabs, 4 * G
    aux, core = exact_boundary_tables(
        mean, scale, family, min_sym, max_sym, precision, cmax
    )
    return pack_decode_tables(aux, core, precision)


# ---------------------------------------------------------------------------
# Numpy oracle decode (twin of the kernel, used for verification)
# ---------------------------------------------------------------------------


def _invert_with_tables(q, aux, core, min_sym, max_sym, precision):
    """Vectorized quantile inversion from (aux, core) tables; exact twin of
    the kernel's region logic.  q, aux: [L]; core: [L, cmax]."""
    P = precision
    free = (1 << P) - 1 - (max_sym - min_sym)
    span = max_sym - min_sym
    wide = P > 16
    aux_shift = 24 if wide else 16
    q = q.astype(np.int64)
    cl = (aux & ((1 << aux_shift) - 1)).astype(np.int64)
    nc = (aux >> aux_shift).astype(np.int64)
    c = core.astype(np.int64)  # pads: 0xFFFF (narrow) / 2^P (wide)
    # Real boundaries can reach 2^P - 1 (a clamped sharp-step core holds
    # the saturated b = free + s_rel), so pads cannot be told apart by
    # value alone — at P = 16 a real 0xFFFF boundary would collide with the
    # narrow pad, and q itself can be 0xFFFF.  Mask by index instead: entry
    # j is real iff j < ncore.  The no-next sentinel is 2^P (which is also
    # exactly the wide pad value).
    real = np.arange(core.shape[1])[None, :] < nc[:, None]
    le = (c <= q[:, None]) & real
    cnt = le.sum(axis=1)
    cumc = np.where(le, c, 0).max(axis=1)
    nxtc = np.where(le | ~real, 1 << P, c).min(axis=1)
    core_hi_rel = cl + nc - 1
    rstart = np.where(
        core_hi_rel >= span, 1 << P, free + core_hi_rel + 1
    )
    # left-linear region
    s_rel_l = np.minimum(q, cl - 1)
    next_l = np.where(s_rel_l >= cl - 1, nxtc, s_rel_l + 1)
    # core region
    sym_c = cl + cnt - 1
    next_c = np.minimum(nxtc, rstart)
    # right-linear region (saturated: b(s) = free + s - min)
    s_rel_r = np.minimum(q - free, span)
    cum_r = free + s_rel_r
    next_r = np.where(s_rel_r >= span, 1 << P, cum_r + 1)

    right = q >= rstart
    leftr = cnt == 0
    s_rel = np.where(right, s_rel_r, np.where(leftr, s_rel_l, sym_c))
    cum = np.where(right, cum_r, np.where(leftr, s_rel_l, cumc))
    nxt = np.where(right, next_r, np.where(leftr, next_l, next_c))
    return (
        (s_rel + min_sym).astype(np.int64),
        cum.astype(np.uint64),
        (nxt - cum).astype(np.uint64),
    )


def decode_family_exact_host(
    init_states, stream, means, scales, family: str, min_sym: int,
    max_sym: int, cfg: LaneConfig, num_symbols: int, cmax: int | None = None,
) -> np.ndarray:
    """Numpy oracle for the exact-family decoder (same schedule as
    ops/interleaved2.decode_shared_cdf, per-symbol tables)."""
    L = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    T = -(-num_symbols // L) if num_symbols else 0
    lower = np.uint64(1 << (S - W))
    aux_all, core_all = exact_boundary_tables(
        *_pad_params(means, scales, T * L, family, max_sym), family,
        min_sym, max_sym, P, cmax,
    )
    states = np.asarray(init_states).astype(np.uint64)
    base = 0
    out = np.empty(T * L, dtype=np.int64)
    lanes = np.arange(L)
    stream = np.asarray(stream)
    for t in range(T):
        idx = t * L + lanes
        active = idx < num_symbols
        q = states & np.uint64((1 << P) - 1)
        sym, cum, prob = _invert_with_tables(
            q.astype(np.int64), aux_all[idx], core_all[idx],
            min_sym, max_sym, P,
        )
        new_states = (states >> np.uint64(P)) * prob + (q - cum)
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


def _pad_to(arr, n, fill=0.0):
    arr = np.asarray(arr, dtype=np.float64).reshape(-1)
    if len(arr) >= n:
        return arr[:n]
    out = np.full(n, fill, np.float64)
    out[: len(arr)] = arr
    return out


def _pad_params(means, scales, n, family, max_sym):
    """Pad (mean, scale) slots for inactive tail lanes.  The continuous
    families take a unit model at the origin; binomial's slots are
    (n_trials, p), where (0, 1) would be degenerate (lgamma poles), so pad
    with (max_sym trials, p=1/2)."""
    if family == "binomial":
        return (_pad_to(means, n, float(max_sym)), _pad_to(scales, n, 0.5))
    return _pad_to(means, n), _pad_to(scales, n, 1.0)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _exact_decode_kernel_body(
    pltpu, pl, *, min_sym: int, max_sym: int, cfg: LaneConfig,
    T: int, tail: int, R: int, cmax: int,
):
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    lower = np.uint32(1 << (S - W))
    qmask = np.uint32((1 << P) - 1)
    free = (1 << P) - 1 - (max_sym - min_sym)
    span = max_sym - min_sym
    CP1 = cmax // 2 + 1  # aux plane + packed core pairs

    def kernel(states_in, tabs_hbm, stream_hbm,
               syms_out, states_out, states_s, win, tbuf, base_s, sem, tsem):
        # tabs_hbm: [T, CP1, R, 128] u32; plane 0 = aux, 1.. = core pairs
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)
        slot = t % 2

        @pl.when(t == 0)
        def _init():
            states_s[:] = states_in[:]
            base_s[0] = 0
            _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)
            d = pltpu.make_async_copy(tabs_hbm.at[0], tbuf.at[0], tsem.at[0])
            d.start()
            d.wait()

        @pl.when(t + 1 < T)
        def _prefetch_tabs():
            pltpu.make_async_copy(
                tabs_hbm.at[t + 1], tbuf.at[1 - slot], tsem.at[1 - slot]
            ).start()

        @pl.when(t > 0)
        def _wait_tabs():
            pltpu.make_async_copy(
                tabs_hbm.at[t], tbuf.at[slot], tsem.at[slot]
            ).wait()

        states = states_s[:]
        q = (states & qmask).astype(jnp.int32)

        aux = tbuf[slot, 0]
        cl = (aux & np.uint32(0xFFFF)).astype(jnp.int32)
        nc = (aux >> 16).astype(jnp.int32)

        # Core scan over (b - 1) u16 pairs.  The device table stores
        # boundaries MINUS ONE with pads forced to 0xFFFF by an ncore index
        # mask on the host (raw narrow tables are ambiguous: a saturated
        # sharp-step boundary b = 2^P - 1 collides with the 0xFFFF pad at
        # P = 16; in b-1 space real entries are <= 2^P - 2).  Boundaries
        # ascend within a lane, so ``le = b-1 < q`` (<=> b <= q) is a
        # prefix mask over the plane index: ``cnt`` counts it, ``cumc`` is
        # the LAST selected entry (plain select), and ``nxtc`` is that
        # entry's SUCCESSOR.  A pad successor yields nxtc = 0x10000, which
        # is only ever consumed through min(nxtc, rstart) with
        # rstart <= 2^P -- the table builder guarantees ncore >= 1, so the
        # cnt == 0 path always sees the real first boundary.
        cnt = jnp.zeros((R, LANES), jnp.int32)
        cumc = jnp.full((R, LANES), np.int32(-1), jnp.int32)
        nxtc = None
        pend = None
        for w in range(cmax // 2):
            pairs = tbuf[slot, 1 + w]
            b0 = (pairs & np.uint32(0xFFFF)).astype(jnp.int32)
            b1 = (pairs >> 16).astype(jnp.int32)
            if nxtc is None:
                nxtc = b0
            for b, bnext in ((pend, b0), (b0, b1)):
                if b is None:
                    continue
                le = b < q
                cnt = cnt + le.astype(jnp.int32)
                cumc = jnp.where(le, b, cumc)
                nxtc = jnp.where(le, bnext, nxtc)
            pend = b1
        le = pend < q
        cnt = cnt + le.astype(jnp.int32)
        cumc = jnp.where(le, pend, cumc)
        nxtc = jnp.where(le, np.int32(0xFFFF), nxtc)
        cumc = cumc + 1  # back to b space (only consumed when cnt > 0)
        nxtc = nxtc + 1

        core_hi_rel = cl + nc - 1
        rstart = jnp.where(
            core_hi_rel >= np.int32(span),
            np.int32(1 << P),
            np.int32(free + 1) + core_hi_rel,  # free + core_hi_rel + 1
        )
        # left-linear
        s_rel_l = jnp.minimum(q, cl - 1)
        next_l = jnp.where(s_rel_l >= cl - 1, nxtc, s_rel_l + 1)
        # core
        sym_c = cl + cnt - 1
        next_c = jnp.minimum(nxtc, rstart)
        # right-linear (saturated: b(s) = free + s - min)
        s_rel_r = jnp.minimum(q - np.int32(free), np.int32(span))
        cum_r = np.int32(free) + s_rel_r
        next_r = jnp.where(
            s_rel_r >= np.int32(span), np.int32(1 << P), cum_r + 1
        )

        right = q >= rstart
        leftr = cnt == 0
        s_rel = jnp.where(right, s_rel_r, jnp.where(leftr, s_rel_l, sym_c))
        cum = jnp.where(
            right, cum_r, jnp.where(leftr, s_rel_l, cumc)
        ).astype(jnp.uint32)
        nxt = jnp.where(right, next_r, jnp.where(leftr, next_l, next_c))
        prob = nxt.astype(jnp.uint32) - cum
        sym = s_rel + np.int32(min_sym)

        qf = (states & qmask)
        new_states = (states >> P) * prob + (qf - cum)
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            new_states = jnp.where(active, new_states, states)
        states = new_states

        m = states < lower
        ex, nxt_b = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        states_s[:] = jnp.where(
            m, (states << W) | (ex & np.uint32(cfg.word_mask)), states
        )
        base_s[0] = nxt_b
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            states_out[:] = states_s[:]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_exact_decoder(min_sym, max_sym, cfg, T, tail, L, cmax, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    CP1 = cmax // 2 + 1
    kernel = _exact_decode_kernel_body(
        pltpu, pl, min_sym=min_sym, max_sym=max_sym, cfg=cfg,
        T=T, tail=tail, R=R, cmax=cmax,
    )
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tables [T, CP1, R, 128]
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
            pltpu.VMEM((2, CP1, R, LANES), jnp.uint32),  # table double buffer
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _build_exact_encoder(cfg, T, tail, L, cap_rows, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    from .pallas_coder import _encode_kernel_body

    kernel = _encode_kernel_body(
        pltpu, pl, table_src=_planes_src, n_inputs=2, cfg=cfg, T=T,
        tail=tail, R=R, cap_rows=cap_rows
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


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def encode_tables_pallas(
    cums, probs, cfg: LaneConfig, interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """ILANS2 encode of explicit per-symbol (cum, prob) tables on TPU;
    bit-exact with ops/interleaved2.encode_shared on the same tables."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    wide = cfg.state_bits == 64
    assert (cfg.state_bits, cfg.word_bits) in ((32, 16), (64, 32))
    # _div64's digit-estimate exactness argument needs prob <= 2^24 (f32
    # mantissa); the decode twin and the iid entry points assert the same.
    assert cfg.precision <= 24, (
        f"precision {cfg.precision} > 24 is outside the 64-bit encoder's "
        "exact-division bound"
    )
    cums = np.asarray(cums, dtype=np.uint32).reshape(-1)
    n = len(cums)
    T = -(-n // L) if n else 0
    if T == 0:
        if wide:
            return (np.full(L, 1 << 32, dtype=np.uint64),
                    jnp.zeros((0,), jnp.uint32))
        return (jnp.full(L, np.uint32(1 << (cfg.state_bits - cfg.word_bits)),
                         jnp.uint32), jnp.zeros((0,), jnp.uint32))
    tail = n - (T - 1) * L
    R = L // LANES
    cap_rows = T * R + 1
    cpad = np.zeros(T * L, np.uint32)
    ppad = np.ones(T * L, np.uint32)
    cpad[:n] = cums
    ppad[:n] = np.asarray(probs, dtype=np.uint32).reshape(-1)
    if wide:
        fn = _build_exact_encoder64(cfg, T, tail, L, cap_rows, interpret)
        buf, hi, lo, end = fn(
            jnp.asarray(cpad).reshape(T, R, LANES),
            jnp.asarray(ppad).reshape(T, R, LANES),
        )
        e = int(end[0])
        states = (
            np.asarray(hi, dtype=np.uint64).reshape(-1) << np.uint64(32)
        ) | np.asarray(lo, dtype=np.uint64).reshape(-1)
        return states, buf.reshape(-1)[e : cap_rows * LANES]
    fn = _build_exact_encoder(cfg, T, tail, L, cap_rows, interpret)
    buf, states, end = fn(
        jnp.asarray(cpad).reshape(T, R, LANES),
        jnp.asarray(ppad).reshape(T, R, LANES),
    )
    e = int(end[0])
    return states.reshape(-1), buf.reshape(-1)[e : cap_rows * LANES]


def encode_family_exact(
    symbols, means, scales, family: str, min_sym: int, max_sym: int,
    cfg: LaneConfig, interpret: bool | None = None,
):
    """Reference-exact family encode: host f64 tables, device coding."""
    assert family in EXACT_FAMILIES
    cums, probs = exact_ecp(
        symbols, means, scales, family, min_sym, max_sym, cfg.precision
    )
    return encode_tables_pallas(cums, probs, cfg, interpret)


def decode_family_exact(
    init_states, stream, means, scales, family: str, min_sym: int,
    max_sym: int, cfg: LaneConfig, num_symbols: int, cmax: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Reference-exact family decode: host f64 boundary tables, device
    inversion + rANS state machine.  Matches decode_family_exact_host.

    ``cmax=None`` (default) auto-sizes the table width to the tightest
    per-symbol core of THIS parameter batch -- table DMA bytes and the
    kernel's boundary scan both cost O(cmax), so the auto mode is also the
    fast mode (11 GB/s at cmax=28 vs 1.4 GB/s at cmax=136 on one v5e chip).
    """
    assert family in EXACT_FAMILIES
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    wide = cfg.state_bits == 64
    assert (cfg.state_bits, cfg.word_bits) in ((32, 16), (64, 32))
    if wide:
        # wide tables hold one boundary per u32 plane: any cmax works
        assert 16 < cfg.precision <= 24
    else:
        # narrow tables pack two u16 boundaries per u32
        assert cfg.precision <= 16
        assert cmax is None or cmax % 2 == 0
    T = -(-num_symbols // L) if num_symbols else 0
    if T == 0:
        return jnp.zeros((0,), jnp.int32)
    tail = num_symbols - (T - 1) * L
    R = L // LANES
    pm, ps = _pad_params(means, scales, T * L, family, max_sym)
    if wide:
        if cmax is None:
            nc = exact_ncore(pm, ps, family, min_sym, max_sym, cfg.precision)
            cmax = max(int(nc.max()) if len(nc) else 1, 1)
        tabs4, cmax = packed_tables_device(
            pm, ps, family, min_sym, max_sym, cfg.precision, cmax, T, R
        )
        fn = _build_exact_decoder64(
            int(min_sym), int(max_sym), cfg, T, tail, L, cmax, interpret
        )
        st = np.asarray(init_states, dtype=np.uint64)
        syms, _hi, _lo = fn(
            jnp.asarray((st >> np.uint64(32)).astype(np.uint32)).reshape(
                R, LANES
            ),
            jnp.asarray(
                (st & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            ).reshape(R, LANES),
            jnp.asarray(tabs4),
            _pad_stream2d(stream, R),
        )
        return syms.reshape(-1)[:num_symbols]
    aux, core = exact_boundary_tables(
        pm, ps, family, min_sym, max_sym, cfg.precision, cmax,
    )
    tabs, cmax = pack_decode_tables(aux, core, cfg.precision)
    CP1 = tabs.shape[1]
    tabs4 = np.ascontiguousarray(
        tabs.reshape(T, R, LANES, CP1).transpose(0, 3, 1, 2)
    )
    fn = _build_exact_decoder(
        int(min_sym), int(max_sym), cfg, T, tail, L, cmax, interpret
    )
    syms, _ = fn(
        jnp.asarray(init_states, dtype=jnp.uint32).reshape(R, LANES),
        jnp.asarray(tabs4),
        _pad_stream2d(stream, R),
    )
    return syms.reshape(-1)[:num_symbols]


# ---------------------------------------------------------------------------
# Core-size-grouped coding: the decode kernel's cost is O(cmax) in both
# table DMA and scan ops, but cmax is a BATCH max -- one wide-core symbol
# (a flat distribution) inflates every lane's cost.  The grouped path
# stable-sorts symbols by per-symbol core size (exact_ncore -- derivable
# from (means, scales) alone, so the decoder reconstructs the identical
# order), encodes them as ONE stream in that order, and decodes in
# consecutive SEGMENTS of grid steps, each segment running a kernel whose
# static cmax is the segment's own tight bound.  Lane states and the
# stream word offset chain between segment launches, so the wire format is
# exactly the ungrouped format of the permuted message: one state header,
# zero rate cost.  Measured on the Q.npz-style workload (mean ncore 29,
# max 161) the weighted table width drops ~4.7x.
# ---------------------------------------------------------------------------


def _segment_dp(stepw: np.ndarray, max_segments: int):
    """Partition the non-decreasing per-step width sequence into at most
    ``max_segments`` contiguous segments minimizing sum(len * max); the
    step sequence is sorted, so candidate boundaries are the distinct-width
    run edges.  Returns [(t0, nsteps, cmax)]."""
    T = len(stepw)
    vals, starts = [], []
    for t in range(T):
        if not vals or stepw[t] != vals[-1]:
            vals.append(int(stepw[t]))
            starts.append(t)
    starts.append(T)
    m = len(vals)
    if m <= max_segments:
        return [
            (starts[i], starts[i + 1] - starts[i], vals[i]) for i in range(m)
        ]
    # dp[k][j]: min cost of runs 0..j with k+1 segments; cost of a segment
    # of runs i..j is (#steps) * vals[j] (widths ascend)
    INF = float("inf")
    nsteps = lambda i, j: starts[j + 1] - starts[i]
    dp = [[INF] * m for _ in range(max_segments)]
    choice = [[0] * m for _ in range(max_segments)]
    for j in range(m):
        dp[0][j] = nsteps(0, j) * vals[j]
    for k in range(1, max_segments):
        for j in range(k, m):
            best, bi = INF, k
            for i in range(k, j + 1):
                c = dp[k - 1][i - 1] + nsteps(i, j) * vals[j]
                if c < best:
                    best, bi = c, i
            dp[k][j] = best
            choice[k][j] = bi
    segs = []
    j = m - 1
    k = max_segments - 1
    while k > 0:
        i = choice[k][j]
        segs.append((starts[i], starts[j + 1] - starts[i], vals[j]))
        j = i - 1
        k -= 1
    segs.append((0, starts[j + 1], vals[j]))
    return segs[::-1]


# Per-family tail constants for the core-interval OVERESTIMATE below,
# asymmetric because the two core edges have different mechanisms:
# - LEFT edge: first s with trunc(free*CDF) >= 1, i.e. CDF >= 1/free;
#   for free <= 2^24 that is standardized t >= Phi^-1(2^-24) = -5.37
#   (gaussian) resp. t >= ln(2*2^-24) = -16.64 (laplace);
# - RIGHT edge: saturation needs trunc >= free, i.e. the f64 CDF must
#   round to EXACTLY 1.0 -- erf(u) == 1.0 first at u ~ 5.92, i.e.
#   t = u*sqrt(2) ~ 8.38 (gaussian); 1 - 0.5 e^-t == 1.0 needs
#   e^-t <= 2^-53, t >= 36.74 (laplace).  Cauchy's atan reaches fl(pi/2)
#   only at |v| ~ 1/ulp, i.e. effectively the whole support.
# Generous fixed literals so the estimate needs NO transcendentals.
_EST_C = {
    "gaussian": (5.5, 8.6),
    "laplace": (16.8, 37.2),
    "cauchy": (np.inf, np.inf),
    # binomial slots hold (a, b) of the half-width a*sd + b around the
    # mean nt*p with sd = sqrt(nt*p*(1-p)); IEEE sqrt is correctly
    # rounded, so the bound stays platform-deterministic.  Calibrated
    # against exact_ncore over nt <= 255, p in [0.001, 0.999] at P in
    # {16, 24} (worst observed half-width ratio ~9.0; pinned by
    # tests/test_exact_family.py::test_binomial_ncore_estimate_upper_bound)
    "binomial": (10.0, 6.0),
}


def _ncore_estimate(means, scales, family, min_sym, max_sym):
    """Deterministic per-symbol upper bound on the core size, computed with
    IEEE +,-,*,sqrt,ceil/floor/clip ONLY (every platform agrees
    bit-for-bit -- unlike libm calls, whose last-ulp differences could
    flip a sort key and silently desynchronize encoder and decoder).
    Overestimates by a few entries; used for the grouping ORDER and for
    safe table widths.  A rare underestimate cannot corrupt anything
    either: derive overflow routes those rows to the host builder."""
    m = np.asarray(means, np.float64)
    s = np.asarray(scales, np.float64)
    if family == "binomial":
        a, b = _EST_C[family]
        pp = np.clip(s, 0.0, 1.0)
        mu = m * pp
        half = a * np.sqrt(m * pp * (1.0 - pp)) + b
        lo = np.clip(np.ceil(mu - half) - 1.0, min_sym + 1, max_sym)
        hi = np.clip(np.floor(mu + half) + 1.0, lo, max_sym)
        return (hi - lo).astype(np.int64) + 1
    CL, CR = _EST_C[family]
    lo = np.clip(np.ceil(m - CL * s) - 1.0, min_sym + 1, max_sym)
    hi = np.clip(np.floor(m + CR * s) + 1.0, lo, max_sym)
    return (hi - lo).astype(np.int64) + 1


def group_plan(
    means, scales, family: str, min_sym: int, max_sym: int, precision: int,
    L: int, num_symbols: int, max_segments: int = 10,
):
    """Deterministic core-size grouping shared by encoder and decoder.

    Returns ``(perm, segments)``: ``perm`` (i64[n]) is the stable symbol
    order (sorted by the per-symbol core-size bound); ``segments`` is
    ``[(t0, nsteps, cmax)]`` over the permuted message's grid steps, with
    each cmax a multiple of 4 (the wide-table packing quantum).  Both sides
    compute this from (means, scales) alone via :func:`_ncore_estimate`,
    whose pure-IEEE arithmetic is bit-identical on every platform -- and
    whose upper-bound property makes the segment widths safe without ever
    probing exact core sizes (the old exact probe cost ~half the total
    table-prep time)."""
    n = num_symbols
    T = -(-n // L) if n else 0
    ncore = _ncore_estimate(
        np.asarray(means, np.float64).reshape(-1)[:n],
        np.asarray(scales, np.float64).reshape(-1)[:n],
        family, min_sym, max_sym,
    )
    # u16 key => numpy's stable sort runs its O(n) radix path (keys above
    # the wide-table cap all fail the width check below, so clipping them
    # into one bucket cannot change any surviving plan)
    perm = np.argsort(
        np.minimum(ncore, 0xFFFF).astype(np.uint16), kind="stable"
    )
    # inactive tail lanes get the _pad_params unit model at the origin --
    # whose core is NOT size 1 (a unit gaussian needs ~14 boundaries, a
    # unit laplace ~55): size the final segment for the pad model too, or
    # the decode-side table build overflows on short / low-core batches
    if family == "binomial":
        # the tail-lane pad model is (max_sym trials, p=1/2); see
        # _pad_params (a (0, 1) slot pair would be degenerate)
        pad_core = int(_ncore_estimate(
            np.full(1, float(max_sym)), np.full(1, 0.5), family,
            min_sym, max_sym)[0])
    else:
        pad_core = int(_ncore_estimate(
            np.zeros(1), np.ones(1), family, min_sym, max_sym)[0])
    padded = np.full(T * L, pad_core, np.int64)
    padded[:n] = ncore[perm]
    stepmax = padded.reshape(T, L).max(axis=1)
    stepw = np.minimum((stepmax + 3) & ~3, np.int64(255 & ~3) + 4)
    if int(stepw.max(initial=0)) >= (1 << 8):
        raise ValueError(
            f"core needs {int(stepmax.max())} boundaries; the wide table "
            "format caps ncore at 255 (use the host decode path)"
        )
    return perm, _segment_dp(stepw, max_segments)


def encode_family_exact_grouped(
    symbols, means, scales, family: str, min_sym: int, max_sym: int,
    cfg: LaneConfig, interpret: bool | None = None, max_segments: int = 10,
):
    """Core-size-grouped reference-exact encode: same wire format as
    :func:`encode_family_exact` applied to the core-sorted symbol order;
    decode with :func:`decode_family_exact_grouped` (same max_segments)."""
    if family not in _EST_C:
        raise ValueError(
            f"grouped coding supports families {sorted(_EST_C)} (the "
            f"group_plan core-size estimator does not cover {family!r}); "
            "use the ungrouped encode_family_exact instead"
        )
    symbols = np.asarray(symbols).reshape(-1)
    means = np.asarray(means, np.float64).reshape(-1)
    scales = np.asarray(scales, np.float64).reshape(-1)
    perm, _ = group_plan(
        means, scales, family, min_sym, max_sym, cfg.precision,
        cfg.num_lanes, len(symbols), max_segments,
    )
    return encode_family_exact(
        symbols[perm], means[perm], scales[perm], family, min_sym, max_sym,
        cfg, interpret,
    )


def decode_family_exact_grouped(
    init_states, stream, means, scales, family: str, min_sym: int,
    max_sym: int, cfg: LaneConfig, num_symbols: int,
    interpret: bool | None = None, max_segments: int = 10,
    device_tables: bool | None = None,
) -> np.ndarray:
    """Decode a :func:`encode_family_exact_grouped` stream: reconstructs
    the core-size order from (means, scales), decodes each segment with a
    tight-cmax kernel (lane states + stream offset chain between segment
    launches), and scatters symbols back to their original positions.

    ``device_tables`` selects the accelerator-side table builder
    (:func:`packed_tables_on_device`; bit-identical output, no host
    round-trip of the packed planes).  Default ``None`` auto-enables it on
    a real TPU backend when the native patch oracle is available."""
    if family not in _EST_C:
        raise ValueError(
            f"grouped coding supports families {sorted(_EST_C)} (the "
            f"group_plan core-size estimator does not cover {family!r}); "
            "use the ungrouped decode_family_exact instead"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    assert L % LANES == 0
    assert cfg.state_bits == 64 and cfg.word_bits == 32, (
        "grouped decode covers the wide-table (S=64) path; use "
        "decode_family_exact for narrow configs"
    )
    assert 16 < cfg.precision <= 24
    n = num_symbols
    if n == 0:
        return np.zeros(0, np.int64)
    means = np.asarray(means, np.float64).reshape(-1)
    scales = np.asarray(scales, np.float64).reshape(-1)
    perm, segments = group_plan(
        means, scales, family, min_sym, max_sym, cfg.precision, L, n,
        max_segments,
    )
    T = -(-n // L)
    R = L // LANES
    pm, ps = _pad_params(means[perm], scales[perm], T * L, family, max_sym)

    st = np.asarray(init_states, dtype=np.uint64)
    hi = jnp.asarray((st >> np.uint64(32)).astype(np.uint32)).reshape(R, LANES)
    lo = jnp.asarray((st & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(
        R, LANES
    )
    stream2d = _pad_stream2d(stream, R)
    base = jnp.zeros((1,), jnp.int32)
    outs = []
    from .. import native

    if device_tables is None:
        device_tables = (
            not interpret
            and native.LIB is not None
            and max(abs(int(min_sym)), abs(int(max_sym))) <= (1 << 22)
        )
    # all segments' tables build in one PIPELINED pass (device evals
    # overlap the host patch oracle and the link round trips; see
    # packed_tables_on_device_batch) before any decode kernel launches
    built_all = None
    if device_tables and native.LIB is not None:
        built_all = packed_tables_on_device_batch(
            [(pm[t0 * L: (t0 + ns) * L], ps[t0 * L: (t0 + ns) * L],
              cmax, ns) for t0, ns, cmax in segments],
            family, min_sym, max_sym, cfg.precision, R,
        )
    for i, (t0, nsteps, cmax) in enumerate(segments):
        sl = slice(t0 * L, (t0 + nsteps) * L)
        if built_all is not None:
            tabs4, cmax_r = built_all[i]
        else:
            tabs4, cmax_r = packed_tables_device(
                pm[sl], ps[sl], family, min_sym, max_sym, cfg.precision,
                cmax, nsteps, R,
            )
        last = t0 + nsteps == T
        tail_s = (n - (T - 1) * L) if last else L
        fn = _build_exact_decoder64_seg(
            int(min_sym), int(max_sym), cfg, nsteps, tail_s, L, cmax_r,
            interpret,
        )
        syms, hi, lo, base = fn(base, hi, lo, jnp.asarray(tabs4), stream2d)
        outs.append(np.asarray(syms).reshape(-1))
    out = np.empty(n, dtype=np.int64)
    out[perm] = np.concatenate(outs)[:n]
    return out


# ---------------------------------------------------------------------------
# DEFAULT-preset (W=32 / S=64 / 16 < P <= 24) twins: wide tables, u32-pair
# lane states (state algebra from ops/pallas_coder64.py).  This makes the
# reference's actual default-preset models (P = 24, the precision the
# Python API pins, quantize.rs:525-568 at PRECISION = 24) codable on
# device with bit-identical tables.
# ---------------------------------------------------------------------------


def _table_gchunk(R: int, G: int) -> int:
    """Boundary-plane groups per streamed chunk: sized so the two chunk
    buffers stay within ~9 MB of VMEM regardless of cmax (the chunked DMA
    removes the old whole-table double-buffer's VMEM ceiling).  At
    L=32768 this keeps cmax <= 48 single-chunk -- the bulk of a typical
    grouped plan -- and only the wide-core tail segments pay the chunk
    handoff."""
    budget = 9 * 1024 * 1024
    return max(1, min(G, budget // (3 * R * LANES * 4 * 2)))


def _exact_decode_kernel_body64(
    pltpu, pl, *, min_sym: int, max_sym: int, cfg: LaneConfig,
    T: int, tail: int, R: int, cmax: int, seg: bool = False,
):
    from .pallas_coder64 import _mul40x25

    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    L = R * LANES
    qmask = np.uint32((1 << P) - 1)
    free = (1 << P) - 1 - (max_sym - min_sym)
    span = max_sym - min_sym
    G = cmax // 4
    CP1 = 1 + 3 * G  # aux plane + 3 packed planes per 4-boundary group
    GC = _table_gchunk(R, G)
    NC = -(-G // GC)

    def kernel(*refs):
        # tabs_hbm: [T, CP1, R, 128] u32; plane 0 = aux, 1.. = boundaries
        # (pads carry 2^P: un-matchable and identical to the sentinel).
        # ``seg`` kernels additionally take the starting stream word offset
        # as a scalar-prefetch arg and emit the final offset, so segment
        # launches chain into one continuous decode (grouped path).
        if seg:
            (base_in, hi_in, lo_in, tabs_hbm, stream_hbm,
             syms_out, hi_out, lo_out, base_out,
             hi_s, lo_s, win, abuf, cbuf, base_s, sem, asem, tsem) = refs
        else:
            (hi_in, lo_in, tabs_hbm, stream_hbm,
             syms_out, hi_out, lo_out,
             hi_s, lo_s, win, abuf, cbuf, base_s, sem, asem, tsem) = refs
        t = pl.program_id(0)
        lane_flat = _row_iota(R) * LANES + _lane_iota(R)
        slot = t % 2
        # chunk-buffer slots follow the GLOBAL chunk index t*NC + c so the
        # two buffers alternate seamlessly across step boundaries
        parity = (t % 2) * (NC % 2)

        def _aux_copy(tt, sl):
            return pltpu.make_async_copy(
                tabs_hbm.at[tt, 0], abuf.at[sl], asem.at[sl]
            )

        def _chunk_copy(tt, c, sl):
            npl = min(3 * GC, CP1 - 1 - 3 * GC * c)  # static per unrolled c
            return pltpu.make_async_copy(
                tabs_hbm.at[tt, pl.ds(1 + 3 * GC * c, npl)],
                cbuf.at[sl, pl.ds(0, npl)],
                tsem.at[sl],
            )

        @pl.when(t == 0)
        def _init():
            hi_s[:] = hi_in[:]
            lo_s[:] = lo_in[:]
            if seg:
                b0 = base_in[0]
                base_s[0] = b0
                row0 = jnp.minimum(
                    b0 >> 7, np.int32(stream_hbm.shape[0] - (R + 1))
                )
                d0 = pltpu.make_async_copy(
                    stream_hbm.at[pl.ds(row0, R + 1)], win.at[0], sem.at[0]
                )
                d0.start()
                d0.wait()
            else:
                base_s[0] = 0
                _init_stream_window(pltpu, pl, stream_hbm, win, sem, R)
            _aux_copy(0, 0).start()
            _chunk_copy(0, 0, 0).start()

        @pl.when(t + 1 < T)
        def _prefetch_aux():
            _aux_copy(t + 1, 1 - slot).start()

        _aux_copy(t, slot).wait()

        hi = hi_s[:]
        lo = lo_s[:]
        q = (lo & qmask).astype(jnp.int32)

        aux = abuf[slot]
        cl = (aux & np.uint32(0xFFFFFF)).astype(jnp.int32)
        nc = (aux >> 24).astype(jnp.int32)

        # Core scan over PACKED 24-bit (b - 1) fields, 4 boundaries per 3
        # planes (25% less table DMA and VMEM than one-per-plane -- the
        # kernel is table-DMA-bound), STREAMED in GC-group chunks: chunk c
        # is scanned while chunk c+1 (or the next step's chunk 0) DMAs into
        # the other buffer, so VMEM stays bounded at any cmax.  Within a
        # lane the boundaries ascend, so ``le`` is a prefix mask over the
        # plane index: ``cnt`` counts it, ``cumc`` is the LAST selected
        # boundary (plain select, no max lattice), and ``nxtc`` is that
        # boundary's SUCCESSOR (select of b_next under the same mask).
        # Storing b - 1 makes the compare a strict `<` and fits the pad in
        # 24 bits: pads are 0xFFFFFF = 2^P - 1 in b-1 space -- never
        # `< q`, and + 1 turns the successor of the last real boundary
        # into the 2^P sentinel.
        m24 = np.uint32(0xFFFFFF)
        m16 = np.uint32(0xFFFF)
        m8 = np.uint32(0xFF)
        cnt = jnp.zeros((R, LANES), jnp.int32)
        cumc = jnp.full((R, LANES), np.int32(-1), jnp.int32)
        nxtc = None  # initialized from b_0 (covers the cnt == 0 case)
        pend = None  # boundary awaiting its successor
        for c in range(NC):
            sc = (parity + c) % 2
            _chunk_copy(t, c, sc).wait()
            if c + 1 < NC:
                _chunk_copy(t, c + 1, (parity + c + 1) % 2).start()
            else:

                @pl.when(t + 1 < T)
                def _prefetch_next_step():
                    _chunk_copy(t + 1, 0, (parity + NC) % 2).start()

            for j in range(min(GC, G - c * GC)):
                w0 = cbuf[sc, 3 * j]
                w1 = cbuf[sc, 3 * j + 1]
                w2 = cbuf[sc, 3 * j + 2]
                b0 = (w0 & m24).astype(jnp.int32)
                b1 = ((w0 >> 24) | ((w1 & m16) << 8)).astype(jnp.int32)
                b2 = ((w1 >> 16) | ((w2 & m8) << 16)).astype(jnp.int32)
                b3 = (w2 >> 8).astype(jnp.int32)
                if nxtc is None:
                    nxtc = b0
                for b, bnext in ((pend, b0), (b0, b1), (b1, b2), (b2, b3)):
                    if b is None:
                        continue
                    le = b < q  # b - 1 < q  <=>  b <= q
                    cnt = cnt + le.astype(jnp.int32)
                    cumc = jnp.where(le, b, cumc)
                    nxtc = jnp.where(le, bnext, nxtc)
                pend = b3
        le = pend < q
        cnt = cnt + le.astype(jnp.int32)
        cumc = jnp.where(le, pend, cumc)
        nxtc = jnp.where(le, np.int32((1 << P) - 1), nxtc)
        cumc = cumc + 1  # back to b space (only consumed when cnt > 0)
        nxtc = nxtc + 1

        core_hi_rel = cl + nc - 1
        rstart = jnp.where(
            core_hi_rel >= np.int32(span),
            np.int32(1 << P),
            np.int32(free + 1) + core_hi_rel,
        )
        s_rel_l = jnp.minimum(q, cl - 1)
        next_l = jnp.where(s_rel_l >= cl - 1, nxtc, s_rel_l + 1)
        sym_c = cl + cnt - 1
        next_c = jnp.minimum(nxtc, rstart)
        s_rel_r = jnp.minimum(q - np.int32(free), np.int32(span))
        cum_r = np.int32(free) + s_rel_r
        next_r = jnp.where(
            s_rel_r >= np.int32(span), np.int32(1 << P), cum_r + 1
        )

        right = q >= rstart
        leftr = cnt == 0
        s_rel = jnp.where(right, s_rel_r, jnp.where(leftr, s_rel_l, sym_c))
        cum = jnp.where(
            right, cum_r, jnp.where(leftr, s_rel_l, cumc)
        ).astype(jnp.uint32)
        nxt = jnp.where(right, next_r, jnp.where(leftr, next_l, next_c))
        prob = nxt.astype(jnp.uint32) - cum
        sym = s_rel + np.int32(min_sym)

        # 64-bit rANS update (stack.rs:1086-1096 on the (hi, lo) pair)
        sh_lo = (hi << (32 - P)) | (lo >> P)
        sh_hi = hi >> P
        nhi, nlo = _mul40x25(sh_hi, sh_lo, prob)
        qc = (lo & qmask) - cum
        nlo = nlo + qc
        nhi = nhi + jnp.where(nlo < qc, np.uint32(1), np.uint32(0))
        if tail < L:
            active = jnp.logical_or(t < T - 1, lane_flat < tail)
            nhi = jnp.where(active, nhi, hi)
            nlo = jnp.where(active, nlo, lo)

        m = nhi == 0
        ex, nxt_b = _refill_words(
            pltpu, pl, stream_hbm=stream_hbm, win=win, sem=sem,
            base=base_s[0], m=m, t=t, T=T, R=R,
        )
        hi_s[:] = jnp.where(m, nlo, nhi)
        lo_s[:] = jnp.where(m, ex, nlo)
        base_s[0] = nxt_b
        syms_out[0] = sym

        @pl.when(t == T - 1)
        def _final():
            hi_out[:] = hi_s[:]
            lo_out[:] = lo_s[:]
            if seg:
                base_out[0] = base_s[0]

    return kernel


@functools.lru_cache(maxsize=16)
def _build_exact_decoder64(min_sym, max_sym, cfg, T, tail, L, cmax,
                           interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    assert cmax % 4 == 0
    CP1 = 1 + 3 * (cmax // 4)
    kernel = _exact_decode_kernel_body64(
        pltpu, pl, min_sym=min_sym, max_sym=max_sym, cfg=cfg,
        T=T, tail=tail, R=R, cmax=cmax,
    )
    fn = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tables [T, CP1, R, 128]
            pl.BlockSpec(memory_space=pl.ANY),  # stream
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
        scratch_shapes=_seg64_scratch(pltpu, R, cmax),
        interpret=interpret,
    )
    return jax.jit(fn)


def _seg64_scratch(pltpu, R, cmax):
    """Scratch set shared by the wide decoders: states, stream windows,
    aux double buffer, chunked core-plane buffers, and their semaphores."""
    G = cmax // 4
    GC = _table_gchunk(R, G)
    return [
        pltpu.VMEM((R, LANES), jnp.uint32),            # state hi
        pltpu.VMEM((R, LANES), jnp.uint32),            # state lo
        pltpu.VMEM((2, R + 1, LANES), jnp.uint32),     # stream windows
        pltpu.VMEM((2, R, LANES), jnp.uint32),         # aux planes
        pltpu.VMEM((2, 3 * GC, R, LANES), jnp.uint32),  # core chunks
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),                 # stream
        pltpu.SemaphoreType.DMA((2,)),                 # aux
        pltpu.SemaphoreType.DMA((2,)),                 # chunks
    ]


@functools.lru_cache(maxsize=64)
def _build_exact_decoder64_seg(min_sym, max_sym, cfg, T, tail, L, cmax,
                               interpret):
    """Segment variant of :func:`_build_exact_decoder64` for the grouped
    path: takes the starting stream word offset as a scalar-prefetch input
    and returns the final offset, so consecutive launches decode one
    continuous stream.  Called as ``fn(base, hi, lo, tabs4, stream2d) ->
    (syms, hi, lo, base)``."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    assert cmax % 4 == 0
    CP1 = 1 + 3 * (cmax // 4)
    kernel = _exact_decode_kernel_body64(
        pltpu, pl, min_sym=min_sym, max_sym=max_sym, cfg=cfg,
        T=T, tail=tail, R=R, cmax=cmax, seg=True,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tables [T, CP1, R, 128]
            pl.BlockSpec(memory_space=pl.ANY),  # stream
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=_seg64_scratch(pltpu, R, cmax),
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def _planes_src(ins):
    """(cum, prob) directly from the DMA'd exact-table planes -- feeds the
    shared S=64 encode kernel body (pallas_coder64._encode_kernel_body64),
    which owns the coding algebra."""
    return ins[0][0], ins[1][0]


@functools.lru_cache(maxsize=16)
def _build_exact_encoder64(cfg, T, tail, L, cap_rows, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = L // LANES
    from .pallas_coder64 import _encode_kernel_body64

    kernel = _encode_kernel_body64(
        pltpu, pl, table_src=_planes_src, n_inputs=2, cfg=cfg, T=T,
        tail=tail, R=R, cap_rows=cap_rows
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
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((2, RPAD, LANES), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)

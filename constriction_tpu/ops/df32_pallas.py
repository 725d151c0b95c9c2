"""Pallas double-f32 window evaluator (gaussian family).

The on-device exact-table builder's window evaluation runs in XLA's
software-emulated f64 on TPU.  This kernel computes the SAME margin/flag
outcomes in double-f32 arithmetic (ops/df32.py -- validated to ~2^-44
relative by its numpy reference twin, far under the 2^-6 ambiguity
margin), using only native f32 vector ops.

Why Pallas: XLA's HLO simplifier folds error-free transforms (two_sum /
two_prod) back to plain f32 on every backend, even behind optimization
barriers; inside a Pallas kernel Mosaic lowers the arithmetic directly.
Whether a given Mosaic version preserves the semantics is decided at
runtime by the table-builder CANARY (exact_family._device_builder_canary
compares built tables bit-for-bit against the host builder and disables
the device path on mismatch) plus this module's own spot check
(:func:`df32_eval_canary`).  NOTE: interpret mode routes the kernel
through XLA-CPU where the folding CAN occur, so only the numpy twin and
the on-chip canary are authoritative -- not interpret-mode runs.

Layout: symbols tiled [8, 128]; the W window positions run as a static
in-kernel loop (no gathers -- each step is pure vector arithmetic on the
symbol tile).  Inputs are per-symbol df pairs (mean, 1/(scale*sqrt2))
prepared exactly on the host from the f64 parameters.

Outputs per grid step: tv i32 [W, 8, 128] and ambig (0/1) i32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import df32 as df
from . import exact_tables_jax as etj

_TS = 8  # sublane rows per symbol tile
_LN = 128


def _kernel_body(pl, *, family: str, min_sym: int, max_sym: int,
                 precision: int, W: int):
    free = float((1 << precision) - 1 - (max_sym - min_sym))
    freei = np.int32(int(free))
    fh, fl = df.df_const(free)
    t_star = etj.sat_threshold(family)
    tsh, tsl = df.df_const(float(min(t_star, 1e30)))
    # band eps: the f64 path's allowance (2^-30 terms) plus this
    # evaluator's coarser argument error; widening only moves entries to
    # the patch oracle
    eps = np.float32(abs(t_star) * 2.0 ** -26 + 2.0 ** -26)
    margin = np.float32(etj.MARGIN)

    def kernel(ws_ref, mh_ref, ml_ref, ivh_ref, ivl_ref, tv_ref, amb_ref):
        mh = mh_ref[0]
        ml = ml_ref[0]
        ivh = ivh_ref[0]
        ivl = ivl_ref[0]
        ws = ws_ref[0].astype(jnp.float32)  # |ws| <= 2^22 guard upstream
        for j in range(W):
            # x = (ws + j - 0.5) - mean in df: sj exact in f32 for the
            # supported |symbol| range; the subtraction is compensated
            sj = ws + np.float32(j - 0.5)
            xh, xl = df.df_add(jnp, sj, jnp.zeros_like(sj), -mh, -ml)
            th, tl = df.df_mul(jnp, xh, xl, ivh, ivl)
            Ch, Cl = df.df_cdf_from_arg(jnp, family, th, tl)
            Ah, Al = df.df_mul(jnp, Ch, Cl,
                               fh + jnp.zeros_like(Ch),
                               fl + jnp.zeros_like(Cl))
            # frac/int decomposition without f64: r = (Ah - round(Ah)) + Al
            # is exact (Sterbenz) and small, so plain f32 finishes it
            # frac/int decomposition without f64: r = (Ah - round(Ah))
            # + Al is exact (Sterbenz) and small, so f32 finishes it; all
            # >= 1-magnitude comparisons run on the EXACT integer part Ii
            # (<= 2^24, exact in f32 and i32) plus the small frac f --
            # f32 could not compare A directly against free - 1 + margin
            # at A ~ 2^24 (ulp there is 2)
            ih = jnp.round(Ah)
            r = (Ah - ih) + Al
            rr = jnp.round(r)
            I = ih + rr            # nearest integer to A (as f32, exact)
            f = r - rr             # A - I in [-0.5, 0.5]
            fr = jnp.where(f < 0, f + np.float32(1.0), f)
            Ii = I.astype(jnp.int32)
            u = Ii + jnp.where(f < 0, np.int32(-1), np.int32(0))
            unamb_frac = (fr > margin) & (fr < np.float32(1.0) - margin)
            # A < 1 - margin  <=>  I <= 0, or I == 1 with f < -margin
            unamb_zero = (u <= 0) & (
                (Ii <= 0) | ((Ii == 1) & (f < -margin))
            )
            dh, _dl = df.df_add(jnp, th, tl,
                                -(tsh + jnp.zeros_like(th)),
                                -tsl + jnp.zeros_like(tl))
            certain_sat = dh > eps
            band = jnp.abs(dh) <= eps
            # A > free - 1 + margin  <=>  I >= free, or I == free - 1
            # with f > margin
            unamb_top = (~certain_sat) & (~band) & (
                (Ii >= freei) | ((Ii == freei - 1) & (f > margin))
            )
            tv = jnp.maximum(u, np.int32(0))
            tv = jnp.where(unamb_zero, np.int32(0), tv)
            tv = jnp.where(unamb_top, freei - 1, tv)
            tv = jnp.where(certain_sat, freei, tv)
            unamb = unamb_frac | unamb_zero | unamb_top | certain_sat
            ambig = (~unamb) | band
            oos = ws + np.float32(j) > np.float32(max_sym)
            tv = jnp.where(oos, freei, tv)
            # logical-and, NOT a select: Mosaic lowers where(pred, False,
            # bool) through an i8 select + i1 truncation it cannot compile
            # ("Unsupported target bitwidth for truncation"); and_i1 is
            # supported and equivalent
            ambig = ambig & jnp.logical_not(oos)
            tv_ref[0, j] = tv
            amb_ref[0, j] = ambig.astype(jnp.int32)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_eval(family: str, min_sym: int, max_sym: int, precision: int,
                W: int, n_tiles: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _kernel_body(
        pl, family=family, min_sym=min_sym, max_sym=max_sym,
        precision=precision, W=W
    )
    tile = pl.BlockSpec((1, _TS, _LN), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile] * 5,
        out_specs=[
            pl.BlockSpec((1, W, _TS, _LN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, _TS, _LN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, W, _TS, _LN), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, W, _TS, _LN), jnp.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def eval_window_family_pallas(family, means, scales, ws, *, min_sym,
                              max_sym, precision, W, interpret=None):
    """Drop-in twin of etj.eval_window: returns device arrays
    ``(tv i32 [n, W], ambig bool [n, W])``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mean64 = np.asarray(means, np.float64).reshape(-1)
    n = len(mean64)
    sc = np.asarray(scales, np.float64).reshape(-1)
    inv64 = (1.0 / (sc * math.sqrt(2.0)) if family == "gaussian"
             else 1.0 / sc)
    mh, ml = df.df_from_f64(mean64)
    ivh, ivl = df.df_from_f64(inv64)
    per = _TS * _LN
    n_tiles = -(-n // per)
    pad = n_tiles * per - n

    def _tile(a, fill):
        a = np.concatenate([a, np.full(pad, fill, a.dtype)]) if pad else a
        return jnp.asarray(a.reshape(n_tiles, _TS, _LN))

    ws32 = np.asarray(ws, np.int32)
    fn = _build_eval(str(family), int(min_sym), int(max_sym),
                     int(precision), int(W), n_tiles, interpret)
    tv4, amb4 = fn(
        _tile(ws32, np.int32(min_sym + 1)),
        _tile(mh, np.float32(0)), _tile(ml, np.float32(0)),
        _tile(ivh, np.float32(1)), _tile(ivl, np.float32(0)),
    )
    tv = tv4.transpose(0, 2, 3, 1).reshape(n_tiles * per, W)[:n]
    amb = amb4.transpose(0, 2, 3, 1).reshape(n_tiles * per, W)[:n] != 0
    return tv, amb


def eval_window_gaussian_pallas(means, scales, ws, **kw):
    return eval_window_family_pallas("gaussian", means, scales, ws, **kw)


def df32_eval_canary(backend: str | None = None) -> bool:
    """Spot check: the Pallas df32 evaluator's ACCEPTED entries must carry
    the exact trunc values (vs the host oracle) on a random batch.  Run
    once per backend before trusting the path (the table-builder canary
    then covers the full pipeline)."""
    from .. import native
    from . import exact_family as ef

    if native.LIB is None:
        return False
    rng = np.random.RandomState(0xDF32)
    n, W = 1024, 40
    MIN, MAX, P = -100, 100, 24
    for family in ("gaussian", "laplace", "cauchy"):
        means = rng.uniform(-110, 110, n)
        scales = np.exp(rng.uniform(np.log(0.05), np.log(8.0), n))
        CL = ef._EST_C[family][0]
        if np.isinf(CL):
            ws = np.full(n, MIN + 1, np.int64)
            Wf = MAX - MIN + 1 + 8
        else:
            ws = np.clip(np.ceil(means - CL * scales) - 3.0, MIN + 1, MAX
                         ).astype(np.int64)
            Wf = W
        tv, amb = eval_window_family_pallas(
            family, means, scales, ws, min_sym=MIN, max_sym=MAX,
            precision=P, W=Wf
        )
        tv = np.asarray(tv).reshape(-1).astype(np.int64)
        amb = np.asarray(amb).reshape(-1)
        sym_i = np.repeat(np.arange(n), Wf)
        svals = (ws[:, None] + np.arange(Wf)[None, :]).reshape(-1).astype(
            np.int32
        )
        live = svals <= MAX
        out = np.empty(int(live.sum()), np.uint32)
        native.LIB.ctpu_exact_tv_at(
            native.DIST_KIND[family], MIN, MAX, P,
            np.ascontiguousarray(means), np.ascontiguousarray(scales),
            np.ascontiguousarray(sym_i[live]),
            np.ascontiguousarray(svals[live]), int(live.sum()), out,
        )
        exact = np.full(n * Wf, (1 << P) - 1 - (MAX - MIN), np.int64)
        exact[live] = out.astype(np.int64)
        if not bool(np.all(amb | (tv == exact))):
            return False
        if float(amb.mean()) >= 0.2:  # patch volume must stay workable
            return False
    return True

"""Double-f32 window evaluator (ops/df32.py + ops/df32_pallas.py).

The numpy twin is THE correctness reference: numpy f32 ops are correctly
rounded and never algebraically folded, so the compensated arithmetic is
exactly as written.  These tests pin (a) the primitive error bounds and
(b) the end guarantee -- every entry the evaluator ACCEPTS carries the
exact trunc value (vs the host glibc oracle), which is what makes the
margin/patch architecture sound regardless of which evaluator runs.

The Pallas kernel mirrors the twin op-for-op; whether a given Mosaic
build preserves the semantics is decided on-chip by
df32_pallas.df32_eval_canary plus the table-builder canary (interpret
mode is non-authoritative: XLA-CPU folds the compensation -- observed as
+-1 trunc errors on ~3% of entries -- which is exactly why the runtime
gate exists).
"""

import numpy as np
import pytest

from constriction_tpu.ops import df32 as df


def test_df_primitive_error_bounds():
    rng = np.random.RandomState(0)
    a64 = rng.uniform(-1e3, 1e3, 100_000)
    b64 = rng.uniform(-1e3, 1e3, 100_000)
    ah, al = df.df_from_f64(a64)
    bh, bl = df.df_from_f64(b64)
    ph, pl = df.df_mul(np, ah, al, bh, bl)
    true_p = (np.float64(ah) + np.float64(al)) * (
        np.float64(bh) + np.float64(bl)
    )
    rel = np.abs((np.float64(ph) + np.float64(pl)) - true_p) / np.maximum(
        np.abs(true_p), 1e-30
    )
    assert rel.max() < 2.0 ** -43
    rh, rl = df.df_recip(np, bh, bl)
    true_r = 1.0 / (np.float64(bh) + np.float64(bl))
    rel = np.abs((np.float64(rh) + np.float64(rl)) - true_r) / np.abs(true_r)
    assert rel.max() < 2.0 ** -40


def test_df_erf_absolute_error():
    """erf in df32 vs math.erf: the approximation error is the shared
    Chebyshev fits'; the arithmetic adds < 2^-40."""
    import math

    rng = np.random.RandomState(1)
    t64 = np.concatenate([
        rng.uniform(-8, 8, 20_000),
        rng.uniform(-1.1, 1.1, 20_000),
    ])
    th, tl = df.df_from_f64(t64)
    eh, el = df.df_erf(np, th, tl)
    got = np.float64(eh) + np.float64(el)
    want = np.array([math.erf(t) for t in t64])
    assert np.abs(got - want).max() < 1e-11  # erfc-fit regime bound


@pytest.mark.parametrize("family", ["gaussian", "laplace", "cauchy"])
def test_df_window_accepted_entries_exact_families(family):
    """All three families' twins: accepted entries exact vs the oracle."""
    from constriction_tpu import native
    from constriction_tpu.ops import exact_family as ef

    if native.LIB is None:
        pytest.skip("native oracle unavailable")
    rng = np.random.RandomState(11)
    P, MIN, MAX = 24, -100, 100
    n = 2000
    means = rng.uniform(-110, 110, n)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(8.0), n))
    CL = ef._EST_C[family][0]
    if np.isinf(CL):
        ws = np.full(n, MIN + 1, np.int64)
        W = MAX - MIN + 1 + 8
    else:
        ws = np.clip(np.ceil(means - CL * scales) - 3.0, MIN + 1, MAX
                     ).astype(np.int64)
        W = 48
    tv, amb = df.eval_window_df(
        np, family, means, scales, ws, min_sym=MIN, max_sym=MAX,
        precision=P, W=W
    )
    tv = tv.reshape(-1).astype(np.int64)
    amb = amb.reshape(-1)
    sym_i = np.repeat(np.arange(n), W)
    svals = (ws[:, None] + np.arange(W)[None, :]).reshape(-1).astype(
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
    exact = np.full(n * W, (1 << P) - 1 - (MAX - MIN), np.int64)
    exact[live] = out.astype(np.int64)
    assert np.all(amb | (tv == exact)), family
    assert amb.mean() < 0.06


def test_df_window_accepted_entries_exact():
    """THE guarantee: every accepted (unambiguous) entry's trunc equals
    the host glibc oracle's, over a randomized (mean, scale) sweep."""
    from constriction_tpu import native
    from constriction_tpu.ops import exact_family as ef

    if native.LIB is None:
        pytest.skip("native oracle unavailable")
    rng = np.random.RandomState(2)
    P, MIN, MAX, W = 24, -100, 100, 40
    n = 4000
    means = rng.uniform(-110, 110, n)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(8.0), n))
    CL = ef._EST_C["gaussian"][0]
    ws = np.clip(np.ceil(means - CL * scales) - 3.0, MIN + 1, MAX
                 ).astype(np.int64)
    tv, amb = df.eval_window_gaussian_df(
        np, means, scales, ws, min_sym=MIN, max_sym=MAX, precision=P, W=W
    )
    tv = tv.reshape(-1).astype(np.int64)
    amb = amb.reshape(-1)
    assert amb.mean() < 0.05  # patch volume stays workable
    sym_i = np.repeat(np.arange(n), W)
    svals = (ws[:, None] + np.arange(W)[None, :]).reshape(-1).astype(
        np.int32
    )
    live = svals <= MAX
    out = np.empty(int(live.sum()), np.uint32)
    native.LIB.ctpu_exact_tv_at(
        native.DIST_KIND["gaussian"], MIN, MAX, P,
        np.ascontiguousarray(means), np.ascontiguousarray(scales),
        np.ascontiguousarray(sym_i[live]),
        np.ascontiguousarray(svals[live]), int(live.sum()), out,
    )
    exact = np.full(n * W, (1 << P) - 1 - (MAX - MIN), np.int64)
    exact[live] = out.astype(np.int64)
    assert np.all(amb | (tv == exact))

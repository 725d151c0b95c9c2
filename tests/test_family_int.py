"""Device-native quantized families: exact-integer CDF properties + round
trips.  The integer construction is what guarantees `prob >= 1` (leakiness);
these tests pin the exhaustive monotonicity claims made in
ops/pallas_family.py.
"""

import numpy as np
import pytest

from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops import pallas_family as pf
from constriction_tpu.ops.interleaved import LaneConfig


def test_exp2_poly_monotone_exhaustive():
    xf = np.arange(1 << pf.FX, dtype=np.int64)
    P = (
        pf._P0
        - ((pf._P1 * xf) >> pf.FX)
        + ((pf._P2 * ((xf * xf) >> pf.FX)) >> pf.FX)
    )
    assert np.all(np.diff(P) <= 0), "P must be non-increasing"
    assert P[-1] >= (P[0] >> 1), "octave boundary continuity"
    true = (1 << (pf.FX + pf._PG)) * np.exp2(-xf / (1 << pf.FX))
    assert np.abs(P - true).max() / (1 << (pf.FX + pf._PG)) < 3e-3


def test_exp2_neg_monotone_full_range():
    # e(m) over every representable exponent must be non-increasing
    mag = np.arange(0, 210000, dtype=np.int32)
    e = pf._exp2_neg(np, mag)
    assert np.all(np.diff(e.astype(np.int64)) <= 0)
    assert e[0] <= (1 << pf.FX)
    assert e[-1] == 0


@pytest.mark.parametrize("family", pf.FAMILIES)
def test_left_monotone_and_leaky(family):
    # over random (mean, scale) the quantized CDF must be strictly leaky:
    # left(x+1) >= left(x) + 1 for every x in support
    rng = np.random.RandomState(0)
    min_sym, max_sym, P = -100, 100, 12
    free = (1 << P) - 1 - (max_sym - min_sym)
    left = pf._left_fn(family, min_sym, P, free)
    xs = np.arange(min_sym + 1, max_sym + 1, dtype=np.int32)
    for _ in range(200):
        mean = np.float32(rng.randn() * 50)
        scale = np.float32(np.exp(rng.randn() * 2) * 2)
        m = np.full_like(xs, mean, dtype=np.float32)
        inv = np.full_like(xs, np.float32(1.0) / scale, dtype=np.float32)
        lv = left(xs, m, inv, xp=np).astype(np.int64)
        assert np.all(np.diff(lv) >= 1), (family, mean, scale)
        assert lv[0] >= 1 and lv[-1] <= (1 << P) - 1


@pytest.mark.parametrize("family", pf.FAMILIES)
def test_family_roundtrip(family):
    rng = np.random.RandomState(3)
    L, n = 128, 3000
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    means = (rng.randn(n) * 10).astype(np.float32)
    scales = (0.3 + np.abs(rng.randn(n)) * 5).astype(np.float32)
    symbols = np.clip(
        np.round(means + rng.randn(n) * scales), -100, 100
    ).astype(np.int32)
    states, stream = pf.encode_family_pallas(
        symbols, means, scales, family, -100, 100, cfg
    )
    out = np.asarray(
        pf.decode_family_pallas(
            np.asarray(states), np.asarray(stream), means, scales,
            family, -100, 100, cfg, n,
        )
    )
    np.testing.assert_array_equal(out, symbols)


def test_family_host_pallas_bit_identical():
    # the numpy oracle and the kernel produce the SAME bitstream (the whole
    # point of the exact-integer construction)
    rng = np.random.RandomState(7)
    L, n = 128, 2000
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    means = (rng.randn(n) * 20).astype(np.float32)
    scales = (0.5 + np.abs(rng.randn(n)) * 3).astype(np.float32)
    symbols = np.clip(
        np.round(means + rng.randn(n) * scales), -100, 100
    ).astype(np.int32)

    # host: tables -> generic ILANS2 encoder
    cums, probs = pf.family_tables_host(
        symbols, means, scales, "gaussian", -100, 100
    )
    ref_states, ref_stream = il2.encode_shared(cums, probs, cfg)

    got_states, got_stream = pf.encode_family_pallas(
        symbols, means, scales, "gaussian", -100, 100, cfg
    )
    np.testing.assert_array_equal(np.asarray(got_states), ref_states)
    np.testing.assert_array_equal(np.asarray(got_stream), ref_stream)

    # host oracle decoder reads it back
    out = pf.decode_family_host(
        ref_states, ref_stream, means, scales, "gaussian", -100, 100, cfg, n
    )
    np.testing.assert_array_equal(out, symbols)


def test_family_rate_near_optimal():
    # compressed size should be close to the model's information content
    rng = np.random.RandomState(1)
    L, n = 256, 1 << 15
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    means = np.zeros(n, np.float32)
    scales = np.full(n, 4.0, np.float32)
    symbols = np.clip(np.round(rng.randn(n) * 4.0), -100, 100).astype(np.int32)
    cums, probs = pf.family_tables_host(
        symbols, means, scales, "gaussian", -100, 100
    )
    info_bits = -np.sum(np.log2(probs.astype(np.float64) / (1 << 12)))
    states, stream = il2.encode_shared(cums, probs, cfg)
    actual_bits = len(stream) * 16 + L * 32  # payload + state header
    # per-lane state flush costs ~L*16 bits amortized; stay within 15%
    assert actual_bits < info_bits * 1.15 + L * 40


def test_cauchy_atan_exhaustive_monotone():
    # 1-D in the fixed-point argument => verify EVERY value
    u = np.arange(0, (8 << 12) + 1, dtype=np.int32)
    a = pf._atan_fix(np, u).astype(np.int64)
    assert np.all(np.diff(a) >= 0)
    assert a[0] == 0 and a[-1] <= pf._PI2EFF
    true = np.arctan(u / 4096.0) * 4096.0
    # max error ~56 units (~0.9% of pi/2): the rational approximation plus
    # the continuity-preserving effective pi/2 (tail bias) — a modeling
    # choice; monotonicity (above) is the correctness property
    assert np.abs(a - true).max() < 60


def test_cauchy_ctrunc_exhaustive_monotone_bounded():
    t = np.arange(-(8 << 12), (8 << 12), dtype=np.int32)
    for free in (4095 - 200, 4085, 2000, 100):
        c = pf._ctrunc(np, "cauchy", t, free).astype(np.int64)
        assert np.all(np.diff(c) >= 0), free
        assert c.min() >= 0 and c.max() <= free, free


def test_cauchy_family_roundtrip():
    rng = np.random.RandomState(4)
    L, n = 128, 3000
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    means = (rng.randn(n) * 10).astype(np.float32)
    scales = (0.5 + np.abs(rng.randn(n)) * 3).astype(np.float32)
    symbols = np.clip(
        np.round(means + rng.standard_cauchy(n) * scales), -100, 100
    ).astype(np.int32)
    states, stream = pf.encode_family_pallas(
        symbols, means, scales, "cauchy", -100, 100, cfg
    )
    out = np.asarray(
        pf.decode_family_pallas(
            np.asarray(states), np.asarray(stream), means, scales,
            "cauchy", -100, 100, cfg, n,
        )
    )
    np.testing.assert_array_equal(out, symbols)

    # host oracle bit-identity
    cums, probs = pf.family_tables_host(symbols, means, scales, "cauchy", -100, 100)
    ref_states, ref_stream = il2.encode_shared(cums, probs, cfg)
    np.testing.assert_array_equal(np.asarray(states), ref_states)
    np.testing.assert_array_equal(np.asarray(stream), ref_stream)


@pytest.mark.parametrize("family", pf.FAMILIES)
def test_family_extreme_parameters(family):
    """Mirror the reference's quantizer stress grid (quantize.rs:879-1023):
    near-delta scales, huge scales, and means far outside the support must
    stay leaky and round-trip."""
    rng = np.random.RandomState(11)
    L = 128
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    cases = []
    for mean in (-500.0, -100.0, 0.0, 99.7, 500.0):
        for scale in (1e-6, 0.01, 1.0, 1e4, 1e6):
            cases.append((mean, scale))
    n = len(cases) * 8
    means = np.array([c[0] for c in cases] * 8, np.float32)
    scales = np.array([c[1] for c in cases] * 8, np.float32)
    # symbols anywhere in support (decode must invert regardless of how
    # unlikely the symbol is under its model)
    symbols = rng.randint(-100, 101, size=n).astype(np.int32)

    cums, probs = pf.family_tables_host(
        symbols, means, scales, family, -100, 100
    )
    assert probs.min() >= 1  # leaky for every (symbol, parameter) combo

    states, stream = pf.encode_family_pallas(
        symbols, means, scales, family, -100, 100, cfg
    )
    out = np.asarray(
        pf.decode_family_pallas(
            np.asarray(states), np.asarray(stream), means, scales,
            family, -100, 100, cfg, n,
        )
    )
    np.testing.assert_array_equal(out, symbols)

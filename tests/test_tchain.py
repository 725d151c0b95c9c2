"""TChain-16 (TPU bits-back): oracle round trips + Pallas bit-exactness."""

import numpy as np
import pytest

from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops import tchain
from constriction_tpu.ops.interleaved import LaneConfig


def _cfg(L):
    return LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=16)


@pytest.mark.parametrize("L,T,alphabet", [(256, 4, 16), (256, 1, 2), (512, 7, 100)])
def test_tchain_host_roundtrip(L, T, alphabet):
    rng = np.random.RandomState(L + T)
    cfg = _cfg(L)
    probs = rng.dirichlet(np.full(alphabet, 0.8))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    data = rng.randint(0, 1 << 16, size=L * T).astype(np.uint16)
    syms, rem, heads = tchain.tchain_decode_host(data, model.cdf, cfg)
    q2, h2 = tchain.tchain_encode_host(syms, rem, heads, model.cdf, cfg)
    np.testing.assert_array_equal(q2, data)
    assert np.all(h2 == 1)


@pytest.mark.parametrize("L,T,alphabet", [(256, 4, 16), (512, 5, 60)])
def test_tchain_pallas_matches_oracle(L, T, alphabet):
    rng = np.random.RandomState(L * 3 + T)
    cfg = _cfg(L)
    probs = rng.dirichlet(np.full(alphabet, 1.2))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    data = rng.randint(0, 1 << 16, size=L * T).astype(np.uint16)
    ref_syms, ref_rem, ref_heads = tchain.tchain_decode_host(data, model.cdf, cfg)
    syms, rem, heads = tchain.tchain_decode_pallas(data, model.cdf, cfg)
    np.testing.assert_array_equal(syms, ref_syms)
    np.testing.assert_array_equal(rem, ref_rem)
    np.testing.assert_array_equal(heads, ref_heads)

    q2, h2 = tchain.tchain_encode_pallas(syms, rem, heads, model.cdf, cfg)
    np.testing.assert_array_equal(q2, data)
    assert np.all(h2 == 1)


def test_tchain_symbol_locality():
    # changing one step's model changes only that step's symbols
    rng = np.random.RandomState(0)
    L, T = 256, 3
    cfg = _cfg(L)
    p1 = rng.dirichlet(np.ones(8))
    m1 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p1, 16)
    data = rng.randint(0, 1 << 16, size=L * T).astype(np.uint16)
    syms1, _, _ = tchain.tchain_decode_host(data, m1.cdf, cfg)
    # flip a quantile in step 1 only
    data2 = data.copy()
    data2[L + 5] ^= 0x1234
    syms2, _, _ = tchain.tchain_decode_host(data2, m1.cdf, cfg)
    diff = np.nonzero(syms1 != syms2)[0]
    assert np.all((diff >= L) & (diff < 2 * L))


@pytest.mark.parametrize("family", ("gaussian", "laplace", "logistic", "cauchy"))
def test_tchain12_family_roundtrip(family):
    """Neural bits-back: per-symbol continuous models at P=12."""
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(hash(family) % 1000)
    L, T = 1024, 3
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    n = L * T
    means = (rng.randn(n) * 10).astype(np.float32)
    scales = (0.4 + np.abs(rng.randn(n)) * 4).astype(np.float32)
    data = rng.randint(0, 1 << 12, size=n).astype(np.uint16)

    rs, rr, rh = tchain.tchain12_family_decode_host(
        data, means, scales, family, -100, 100, cfg
    )
    syms, rem, heads = tchain.tchain12_family_decode_pallas(
        data, means, scales, family, -100, 100, cfg
    )
    np.testing.assert_array_equal(syms, rs)
    np.testing.assert_array_equal(rem, rr)
    np.testing.assert_array_equal(heads, rh)

    q2, h2 = tchain.tchain12_family_encode_pallas(
        syms, rem, heads, means, scales, family, -100, 100, cfg
    )
    np.testing.assert_array_equal(q2, data)
    assert np.all(h2 == 16)  # back to the seed = 2^(S-W-P)


def test_pack_q12_roundtrip():
    rng = np.random.RandomState(9)
    q = rng.randint(0, 1 << 12, size=1024 * 5).astype(np.uint16)
    w = tchain.pack_q12(q, 1024)
    np.testing.assert_array_equal(
        tchain.unpack_q12(w).reshape(-1).astype(np.uint16), q
    )


# ---------------------------------------------------------------------------
# TChain-24: bits-back at the reference's DEFAULT precision (S=64/W=32/P=24)
# ---------------------------------------------------------------------------

CFG24 = LaneConfig(num_lanes=512, word_bits=32, state_bits=64, precision=24)


def _cdf24(K, seed):
    rng = np.random.RandomState(seed)
    p = rng.dirichlet(np.full(K, 1.5))
    return ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        p, 24
    ).cdf


@pytest.mark.parametrize("K,T", [(40, 4), (1000, 3), (1, 2), (2, 5)])
def test_tchain24_roundtrip_and_oracle(K, T):
    """Default-preset bits-back: host round trip, kernel == oracle, heads
    return to the invariant seed 2^(S-W-P) = 2^8."""
    cdf = (np.array([0, 1 << 24], np.uint32) if K == 1 else _cdf24(K, K + T))
    rng = np.random.RandomState(T)
    n = T * CFG24.num_lanes
    q0 = rng.randint(0, 1 << 24, size=n).astype(np.uint32)

    syms, rem, heads = tchain.tchain24_decode_host(q0, cdf, CFG24)
    q1, h1 = tchain.tchain24_encode_host(syms, rem, heads, cdf, CFG24)
    np.testing.assert_array_equal(q1, q0)
    assert np.all(h1 == 256)

    syms_k, rem_k, heads_k = tchain.tchain24_decode_pallas(q0, cdf, CFG24)
    np.testing.assert_array_equal(syms_k, syms)
    np.testing.assert_array_equal(rem_k, rem)
    np.testing.assert_array_equal(heads_k, heads)
    q2, h2 = tchain.tchain24_encode_pallas(syms_k, rem_k, heads_k, cdf, CFG24)
    np.testing.assert_array_equal(q2, q0)
    assert np.all(h2 == 256)


def test_pack_q24_roundtrip():
    rng = np.random.RandomState(9)
    q = rng.randint(0, 1 << 24, size=512 * 8).astype(np.uint32)
    w = tchain.pack_q24(q, 512)
    np.testing.assert_array_equal(tchain.unpack_q24(w).reshape(-1), q)


def test_entry_point_guards():
    """Misuse guards added after review: empty messages return spec values
    (seeded heads, empty streams) instead of uninitialized kernel output;
    ragged lengths and oversized quantiles are rejected up front."""
    rng = np.random.RandomState(77)
    probs = rng.dirichlet(np.ones(20))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    cfg = LaneConfig(num_lanes=256, word_bits=16, state_bits=32, precision=16)
    cdf = model.cdf

    # T == 0: decode returns (empty, empty, seed heads); encode echoes heads
    syms, rem, heads = tchain.tchain_decode_pallas(
        np.zeros(0, np.uint16), cdf, cfg
    )
    assert len(syms) == 0 and len(rem) == 0 and np.all(heads == 1)
    q, h = tchain.tchain_encode_pallas(
        np.zeros(0, np.int32), rem, heads, cdf, cfg
    )
    assert len(q) == 0 and np.all(h == 1)

    # ragged host encode is rejected (decode already was)
    with pytest.raises(AssertionError):
        tchain.tchain_encode_host(
            np.zeros(300, np.int64), np.zeros(0, np.uint32),
            np.ones(256, np.uint32), cdf, cfg,
        )

    # tchain12 family: oversized quantiles rejected; empty message seeds 16
    cfg12 = LaneConfig(num_lanes=1024, word_bits=16, state_bits=32, precision=12)
    means = np.zeros(1024, np.float32)
    scales = np.ones(1024, np.float32)
    bad_q = np.full(1024, 1 << 12, np.uint16)
    with pytest.raises(ValueError, match="12-bit"):
        tchain.tchain12_family_decode_pallas(
            bad_q, means, scales, "gaussian", -100, 100, cfg12
        )
    s0, r0, h0 = tchain.tchain12_family_decode_pallas(
        np.zeros(0, np.uint16), np.zeros(0, np.float32),
        np.zeros(0, np.float32), "gaussian", -100, 100, cfg12
    )
    assert len(s0) == 0 and len(r0) == 0 and np.all(h0 == 16)

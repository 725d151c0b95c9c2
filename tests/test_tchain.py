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

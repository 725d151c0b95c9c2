"""Vectorized chain decode vs the scalar core (bit-exact, all tail phases)."""

import numpy as np
import pytest

from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops import chain_jax
from constriction_tpu.ops.chain import ChainCoderCore


def _random_chain_data(rng, words):
    data = rng.randint(1, 2**32, size=words, dtype=np.uint64).astype(np.uint32)
    data[-1] |= 0x8000_0000  # head init needs a large trailing word
    return data


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 100, 257])
@pytest.mark.parametrize("alphabet", [2, 17, 100])
def test_chain_decode_iid_matches_core(n, alphabet):
    rng = np.random.RandomState(n * 31 + alphabet)
    probs = rng.dirichlet(np.full(alphabet, 1.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    )
    data = _random_chain_data(rng, n + 8)
    core = ChainCoderCore.from_compressed(list(data))
    ref = core.decode_iid_symbols(n, model)
    got = np.asarray(chain_jax.chain_decode_iid(data, n, model.cdf, xp=np))
    np.testing.assert_array_equal(got, ref)
    # and through jax (CPU backend in tests)
    got_j = np.asarray(chain_jax.chain_decode_iid(data, n, model.cdf))
    np.testing.assert_array_equal(got_j, ref)


def test_chain_decode_rows_matches_core():
    rng = np.random.RandomState(5)
    n, K = 203, 7
    rowsf = rng.dirichlet(np.full(K, 0.8), size=n)
    models = [
        ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
            rowsf[i], 24
        )
        for i in range(n)
    ]
    rows = np.stack([m.cdf for m in models]).astype(np.uint32)
    data = _random_chain_data(rng, n + 8)
    core = ChainCoderCore.from_compressed(list(data))
    ref = np.array([core.decode_symbol(models[i]) for i in range(n)], np.int32)
    got = np.asarray(chain_jax.chain_decode_rows(data, rows, xp=np))
    np.testing.assert_array_equal(got, ref)
    got_j = np.asarray(chain_jax.chain_decode_rows(data, rows))
    np.testing.assert_array_equal(got_j, ref)


def test_chain_decode_iid_rejects_truncated_data():
    """The scalar core raises OutOfCompressedData on truncated data; the
    parallel decoder must not silently zero-pad and return symbol-0 runs."""
    import pytest

    from constriction_tpu.ops.chain import ChainCoderCore, OutOfCompressedData
    from constriction_tpu.ops.chain_jax import chain_decode_iid

    rng = np.random.RandomState(9)
    probs = rng.dirichlet(np.ones(16))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    )
    words = rng.randint(0, 2**32, size=100, dtype=np.uint64).astype(np.uint32)
    cc = ChainCoderCore.from_compressed(list(words))
    data = words  # from_compressed framing
    full = chain_decode_iid(data, 60, model.cdf, xp=np)
    ref = cc.decode_iid_symbols(60, model)
    np.testing.assert_array_equal(full, ref)
    with pytest.raises(OutOfCompressedData):
        chain_decode_iid(data[:20], 60, model.cdf, xp=np)

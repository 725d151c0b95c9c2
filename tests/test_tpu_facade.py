"""Public TPU facade round trips (interpreter mode on the CPU test mesh)."""

import numpy as np
import pytest

import constriction_tpu.tpu as ctpu
from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)


def test_facade_iid_roundtrip():
    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.ones(30))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    symbols = rng.choice(30, size=5000, p=probs).astype(np.int64)
    data = ctpu.encode_iid(symbols, model.cdf)
    out = ctpu.decode_iid(data, model.cdf)
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_facade_family_roundtrip():
    rng = np.random.RandomState(1)
    n = 2000
    means = (rng.randn(n) * 5).astype(np.float32)
    scales = (0.5 + np.abs(rng.randn(n))).astype(np.float32)
    symbols = np.clip(np.round(means + rng.randn(n) * scales), -50, 50).astype(np.int32)
    states, stream = ctpu.encode_family(symbols, means, scales, "gaussian", -50, 50)
    out = ctpu.decode_family(states, stream, means, scales, "gaussian", -50, 50, n)
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_facade_chain_decode():
    from constriction_tpu.ops.chain import ChainCoderCore

    rng = np.random.RandomState(2)
    probs = rng.dirichlet(np.ones(9))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    )
    data = rng.randint(1, 2**32, size=64, dtype=np.uint64).astype(np.uint32)
    data[-1] |= 0x80000000
    core = ChainCoderCore.from_compressed(list(data))
    ref = core.decode_iid_symbols(40, model)
    out = ctpu.decode_chain_iid(data, 40, model.cdf)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_facade_non_contiguous_alphabet():
    """Device coding for non-contiguous alphabets: host index mapping,
    device codes indices (non_contiguous.rs parity on the TPU path)."""
    import numpy as np

    import constriction_tpu.tpu as ctpu
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(4)
    alphabet = np.array([-70, -3, 8, 99, 400, 1000])
    K = len(alphabet)
    extra = rng.multinomial((1 << 12) - K, rng.dirichlet(np.full(K, 1.0)))
    cdf = np.concatenate([[0], np.cumsum(1 + extra)]).astype(np.uint32)
    p = (cdf[1:] - cdf[:-1]) / 4096.0
    syms = rng.choice(alphabet, size=9000, p=p)
    cfg = LaneConfig(128, 16, 32, 12)
    cont = ctpu.encode_iid(syms, cdf, cfg, alphabet=alphabet)
    out = ctpu.decode_iid(cont, cdf, alphabet=alphabet)
    np.testing.assert_array_equal(out, syms)
    import pytest

    with pytest.raises(ValueError, match="not in the alphabet"):
        ctpu.encode_iid(np.array([5]), cdf, cfg, alphabet=alphabet)


def test_facade_encode_iid_rejects_out_of_range_symbols():
    rng = np.random.RandomState(5)
    probs = rng.dirichlet(np.ones(10))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    import pytest

    with pytest.raises(ValueError, match="symbols must be in"):
        ctpu.encode_iid(np.array([-1, 0, 1]), model.cdf)
    with pytest.raises(ValueError, match="symbols must be in"):
        ctpu.encode_iid(np.array([0, 10]), model.cdf)


def test_facade_range_decode_host_fallback_for_ineligible_config():
    """encode_iid_range silently falls back to the host encoder for
    configs the Pallas kernels do not cover; decode_iid_range must decode
    that data through the same host oracle instead of tripping a kernel
    assert."""
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(6)
    probs = rng.dirichlet(np.ones(20))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    syms = rng.choice(20, size=500, p=probs).astype(np.int64)
    cfg = LaneConfig(num_lanes=64, word_bits=16, state_bits=32, precision=12)
    assert not __import__(
        "constriction_tpu.ops.interleaved2", fromlist=["x"]
    )._pallas_eligible(cfg)  # 64 lanes don't tile the 128-wide VPU
    pts, stream = ctpu.encode_iid_range(syms, model.cdf, cfg=cfg)
    out = ctpu.decode_iid_range(pts, stream, model.cdf, len(syms), cfg=cfg)
    assert np.array_equal(np.asarray(out)[: len(syms)], syms)


def test_facade_precision_follows_model():
    """The facade infers the lane config from the model's fixed-point CDF:
    a P=24 model rides the S=64 kernels with no explicit cfg (before this,
    the facade pinned P=12 and rejected default-preset models)."""
    import constriction_tpu.tpu as ctpu
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )

    rng = np.random.RandomState(4)
    p = np.array([0.9] + [0.1 / 9] * 9)
    syms = rng.choice(10, size=600, p=p)
    m24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 24)
    data = ctpu.encode_iid(syms, m24.cdf)
    from constriction_tpu.ops import framing

    cfg = framing.peek_cfg(np.asarray(data))
    assert (cfg.precision, cfg.state_bits, cfg.word_bits) == (24, 64, 32)
    np.testing.assert_array_equal(ctpu.decode_iid(data, m24.cdf), syms)

    m16 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 16)
    d16 = ctpu.encode_iid(syms, m16.cdf)
    cfg16 = framing.peek_cfg(np.asarray(d16))
    assert (cfg16.precision, cfg16.state_bits) == (16, 32)
    np.testing.assert_array_equal(ctpu.decode_iid(d16, m16.cdf), syms)

    with pytest.raises(ValueError, match="power of two"):
        # 11-entry cdf (10 symbols, all syms in range) topping at 110
        ctpu.encode_iid(syms, np.arange(0, 121, 11))

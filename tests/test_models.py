"""Port of the reference's model test strategy (SURVEY.md §4):

- `test_entropy_model` (model.rs:960-989): for EVERY symbol in support,
  encode and decode agree exactly at the left edge, right edge - 1, and
  midpoint of the quantile interval, and probabilities sum to exactly 2**P.
- quantizer grids over Gaussian/Laplace/Cauchy/Binomial parameters including
  near-delta sigma and means far outside the support (quantize.rs:879-1023).
"""

import numpy as np
import pytest

from constriction_tpu.models import (
    Binomial,
    Cauchy,
    ContiguousCategoricalEntropyModel,
    ContiguousLookupDecoderModel,
    Gaussian,
    Laplace,
    LazyContiguousCategoricalEntropyModel,
    LeakyQuantizer,
    NonContiguousCategoricalDecoderModel,
    NonContiguousLookupDecoderModel,
    UniformModel,
)


def check_entropy_model(model, support):
    """Array port of model.rs `test_entropy_model`."""
    total = 0
    for symbol in support:
        left, prob = model.ecp(symbol)
        assert prob >= 1
        total += prob
        for q in {left, left + prob - 1, left + prob // 2}:
            s2, l2, p2 = model.qf(q)
            assert (s2, l2, p2) == (symbol, left, prob), (
                symbol, left, prob, q, s2, l2, p2,
            )
    assert total == 1 << model.precision


@pytest.mark.parametrize("precision", [8, 12, 24])
def test_uniform(precision):
    for size in [2, 3, 4, 5, 6, 7, 8, 9, 62, 63, 64, 254, 255]:
        if size - 1 >= (1 << precision):
            continue
        check_entropy_model(UniformModel(size, precision), range(size))


@pytest.mark.parametrize(
    "mean,std",
    [
        (3.2, 9.6),
        (-50.3, 0.4),
        (100.0, 30.0),  # mean at the edge of support
        (-500.0, 4.0),  # mean far outside support
        (27.0, 1e-30),  # near-delta
        (0.0, 1e3),
    ],
)
def test_quantized_gaussian_invertible(mean, std):
    quantizer = LeakyQuantizer(-100, 100, 24)
    model = quantizer.quantize(Gaussian(mean, std))
    check_entropy_model(model, range(-100, 101))


@pytest.mark.parametrize("mean,scale", [(10.5, 20.0), (-80.0, 0.1), (150.0, 5.0)])
def test_quantized_laplace_invertible(mean, scale):
    quantizer = LeakyQuantizer(-100, 100, 24)
    check_entropy_model(quantizer.quantize(Laplace(mean, scale)), range(-100, 101))


@pytest.mark.parametrize("loc,scale", [(0.0, 10.0), (60.0, 0.5), (-200.0, 3.0)])
def test_quantized_cauchy_invertible(loc, scale):
    quantizer = LeakyQuantizer(-100, 100, 24)
    check_entropy_model(quantizer.quantize(Cauchy(loc, scale)), range(-100, 101))


@pytest.mark.parametrize("n,p", [(10, 0.2), (40, 0.5), (100, 0.9), (5, 0.0), (5, 1.0)])
def test_quantized_binomial_invertible(n, p):
    quantizer = LeakyQuantizer(0, n, 24)
    check_entropy_model(quantizer.quantize(Binomial(n, p)), range(0, n + 1))


def test_small_preset_quantizer():
    quantizer = LeakyQuantizer(-50, 50, 12)
    check_entropy_model(quantizer.quantize(Gaussian(3.2, 9.6)), range(-50, 51))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("kind", ["fast", "perfect", "lazy"])
def test_categorical_invertible(kind, dtype):
    rng = np.random.RandomState(5)
    probs = rng.dirichlet(np.full(37, 0.5)).astype(dtype)
    if kind == "fast":
        m = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 24)
    elif kind == "perfect":
        m = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_perfect(probs, 24)
    else:
        m = LazyContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 24)
    check_entropy_model(m, range(37))


def test_lazy_matches_fast():
    """Lazy and eager 'fast' models must be bitstream-identical
    (lazy_contiguous.rs:32-43)."""
    rng = np.random.RandomState(11)
    for dtype in (np.float32, np.float64):
        probs = rng.dirichlet(np.ones(50)).astype(dtype)
        eager = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 24)
        lazy = LazyContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 24)
        for s in range(50):
            assert eager.ecp(s) == lazy.ecp(s)
        for q in rng.randint(0, 1 << 24, size=200):
            assert eager.qf(int(q)) == lazy.qf(int(q))


def test_lookup_models():
    rng = np.random.RandomState(3)
    probs = rng.dirichlet(np.ones(30))
    m = ContiguousLookupDecoderModel.from_floating_point_probabilities_fast(probs, 12)
    check_entropy_model(m, range(30))

    symbols = [2 * s + 10 for s in range(30)]
    weights = np.diff(m.cdf.astype(np.int64))
    nc = NonContiguousLookupDecoderModel.from_symbols_and_nonzero_fixed_point_probabilities(
        symbols, weights, 12
    )
    for s in symbols:
        left, prob = nc.ecp(s)
        s2, l2, p2 = nc.qf(left)
        assert (s2, l2, p2) == (s, left, prob)


def test_non_contiguous_roundtrip():
    symbols = [-5, 100, 3, 7]
    probs = np.array([0.2, 0.4, 0.1, 0.3])
    dec = NonContiguousCategoricalDecoderModel.from_symbols_and_floating_point_probabilities_fast(
        symbols, probs, 24
    )
    check_entropy_model(dec, symbols)


def test_perfect_quantization_optimal():
    """The perfect quantizer should have KL <= the fast quantizer's."""
    rng = np.random.RandomState(17)
    probs = rng.dirichlet(np.full(64, 0.3))
    fast = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 12)
    perfect = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_perfect(probs, 12)
    assert perfect.kl_divergence_base2(probs) <= fast.kl_divergence_base2(probs) + 1e-12
    assert perfect.kl_divergence_base2(probs) < 1e-2


def test_diagnostics():
    m = UniformModel(4, precision=24)
    assert abs(m.entropy_base2() - 2.0) < 1e-6
    probs = [0.25, 0.25, 0.25, 0.25]
    assert abs(m.cross_entropy_base2(probs) - 2.0) < 1e-6
    assert abs(m.kl_divergence_base2(probs)) < 1e-6
    assert abs(m.reverse_kl_divergence_base2(probs)) < 1e-6


def test_model_conversions():
    rng = np.random.RandomState(9)
    probs = rng.dirichlet(np.ones(20))
    quantizer = LeakyQuantizer(0, 19, 12)
    base = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 12)
    enc = base.to_generic_encoder_model()
    dec = base.to_generic_decoder_model()
    lut = base.to_generic_lookup_decoder_model()
    for s in range(20):
        assert enc.ecp(s) == base.ecp(s)
    for q in rng.randint(0, 1 << 12, size=100):
        assert dec.qf(int(q)) == base.qf(int(q))
        assert lut.qf(int(q)) == base.qf(int(q))


# ---------------------------------------------------------------------------
# Round-2 review regression tests (reference-cast semantics, tie order,
# input validation)
# ---------------------------------------------------------------------------


def test_perfect_quantization_f32_normalizes_in_f64():
    """The reference widens each element to f64 BEFORE summing
    (categorical.rs:79), so f32 and f64 inputs of the same values must
    produce identical weights."""
    from constriction_tpu.models.categorical import (
        perfectly_quantized_probabilities,
    )

    rng = np.random.RandomState(11)
    p32 = rng.dirichlet(np.ones(200)).astype(np.float32)
    w32 = perfectly_quantized_probabilities(p32, 12)
    w64 = perfectly_quantized_probabilities(p32.astype(np.float64), 12)
    np.testing.assert_array_equal(w32, w64)
    assert int(w32.sum()) == 1 << 12


def test_perfect_quantization_rejects_oversized_alphabet():
    from constriction_tpu.models.categorical import (
        perfectly_quantized_probabilities,
    )

    with pytest.raises(ValueError, match="invalid number"):
        perfectly_quantized_probabilities(np.ones(5000) / 5000, 12)


def test_fast_quantization_saturates_negative_cumsum():
    """A negative probability entry saturates to 0 in the fixed-point cast
    (Rust `as` semantics) instead of wrapping to ~2**64 and erroring."""
    from constriction_tpu.models.categorical import fast_quantized_cdf

    cdf = fast_quantized_cdf(np.array([-0.1, 0.6, 0.5]), 12)
    assert cdf[0] == 0 and cdf[-1] == 1 << 12
    assert np.all(np.diff(cdf.astype(np.int64)) > 0)


def test_lazy_scalar_and_array_paths_agree_on_negative_entry():
    m = LazyContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        np.array([-0.1, 0.6, 0.5]), 12
    )
    for s in range(3):
        left, prob = m.ecp(s)
        la, pa = m.ecp_array(np.array([s]))
        assert (left, prob) == (int(la[0]), int(pa[0]))


def test_family_rejects_nonfinite_mean_at_encode():
    from constriction_tpu.models.quantized import QuantizedFamily

    fam = QuantizedFamily("gaussian", -10, 10, [0.0, np.nan], [1.0, 1.0], 12)
    with pytest.raises(ValueError, match="Invalid model parameter"):
        fam.ecp_all(np.array([0, 1]))


def test_noncontiguous_duplicate_symbols():
    """Encoder rejects duplicates (non_contiguous.rs:946 Occupied -> Err);
    decoder preserves them (Vec semantics)."""
    from constriction_tpu.models.categorical import (
        NonContiguousCategoricalEncoderModel,
    )

    probs = np.array([1 << 11, 1 << 10, 1 << 10], dtype=np.uint64)
    with pytest.raises(ValueError, match="duplicate symbol"):
        NonContiguousCategoricalEncoderModel.from_symbols_and_nonzero_fixed_point_probabilities(
            [7, 7, 3], probs, 12
        )
    dec = NonContiguousCategoricalDecoderModel.from_symbols_and_nonzero_fixed_point_probabilities(
        [7, 7, 3], probs, 12
    )
    assert dec.symbols == [7, 7, 3]
    # both duplicate entries stay addressable by quantile
    assert dec.qf(0)[0] == 7 and dec.qf(1 << 11)[0] == 7
    assert dec.qf((1 << 11) + (1 << 10))[0] == 3


def test_i32_param_overflow_raises():
    """Integer model parameters outside int32 must error instead of
    silently wrapping through astype(np.int32)."""
    import constriction_tpu as constriction

    enc = constriction.stream.queue.RangeEncoder()
    with pytest.raises(OverflowError, match="int32 range"):
        enc.encode(
            np.array([0], dtype=np.int32),
            constriction.stream.model.Uniform(),
            np.array([2**31], dtype=np.int64),
        )


def test_encoder_num_symbols_is_property():
    from constriction_tpu.models.categorical import (
        NonContiguousCategoricalEncoderModel,
    )

    enc = NonContiguousCategoricalEncoderModel.from_symbols_and_nonzero_fixed_point_probabilities(
        [3, 9], np.array([1 << 11, 1 << 11], dtype=np.uint64), 12
    )
    assert enc.num_symbols == 2

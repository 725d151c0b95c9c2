"""More golden vectors from the reference's doc examples
(pybindings/stream/{queue.rs, model.rs} docstrings), plus cross-validation of
the native Laplace/Cauchy CDF formulas against scipy callbacks."""

import numpy as np
import pytest
import scipy.stats

import constriction_tpu as constriction


def test_queue_doc_examples():
    # NOTE: the reference's docstrings show float32 here, but its CI replays
    # these examples with float64 (tests/python/test_docexamples.py:546-573);
    # the goldens below are the CI-verified float64 ones.
    probabilities = np.array([0.1, 0.6, 0.3], dtype=np.float64)
    model = constriction.stream.model.Categorical(probabilities, perfect=False)
    symbols = np.array([0, 2, 1, 2, 0, 2, 0, 2, 1], dtype=np.int32)
    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(symbols, model)
    assert np.all(encoder.get_compressed() == np.array([369323576], dtype=np.uint32))

    model_family = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = np.array([10.3, -4.7, 20.5], dtype=np.float64)
    stds = np.array([5.2, 24.2, 3.1], dtype=np.float64)
    symbols = np.array([12, -13, 25], dtype=np.int32)
    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(symbols, model_family, means, stds)
    assert np.all(encoder.get_compressed() == np.array([2655472005], dtype=np.uint32))
    decoder = constriction.stream.queue.RangeDecoder(
        np.array([2655472005], dtype=np.uint32)
    )
    assert np.all(decoder.decode(model_family, means, stds) == [12, -13, 25])

    probabilities = np.array(
        [[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]], dtype=np.float32
    )
    model_family = constriction.stream.model.Categorical(perfect=False)
    symbols = np.array([3, 1], dtype=np.int32)
    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(symbols, model_family, probabilities)
    # round trip (the docstring constant for this one is not CI-verified)
    decoder = constriction.stream.queue.RangeDecoder(encoder.get_compressed())
    assert np.all(decoder.decode(model_family, probabilities) == [3, 1])


def test_queue_seek_doc_example():
    probabilities = np.array([0.2, 0.4, 0.1, 0.3], dtype=np.float64)
    model = constriction.stream.model.Categorical(probabilities, perfect=False)
    message_part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    message_part2 = np.array([2, 2, 0, 1, 3], dtype=np.int32)

    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(message_part1, model)
    position, state = encoder.pos()
    encoder.encode(message_part2, model)

    compressed = encoder.get_compressed()
    decoder = constriction.stream.queue.RangeDecoder(compressed)
    assert decoder.decode(model) == 1
    decoder.seek(position, state)
    assert np.all(decoder.decode(model, 5) == message_part2)


def test_model_doc_examples():
    model = constriction.stream.model.QuantizedGaussian(-100, 100, 12.6, 7.3)
    symbols = np.array([12, 15, 4, -2, 18, 5], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    assert np.all(coder.get_compressed() == np.array([745994372, 25704], dtype=np.uint32))
    assert np.all(coder.decode(model, 6) == symbols)

    model_family = constriction.stream.model.QuantizedGaussian(-100, 100)
    symbols = np.array([12, 15, 4, -2, 18, 5], dtype=np.int32)
    means = np.array([13.2, 17.9, 7.3, -4.2, 25.1, 3.2], dtype=np.float32)
    stds = np.array([3.2, 4.7, 5.2, 3.1, 6.3, 2.9], dtype=np.float32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model_family, means, stds)
    assert np.all(coder.get_compressed() == np.array([2051912079, 1549], dtype=np.uint32))
    assert np.all(coder.decode(model_family, means, stds) == symbols)

    probabilities = np.array([0.2, 0.4, 0.1, 0.3], dtype=np.float32)
    model = constriction.stream.model.Categorical(probabilities, perfect=False)
    symbols = np.array([0, 3, 2, 3, 2, 0, 2, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    assert np.all(coder.get_compressed() == np.array([2484720979, 175], dtype=np.uint32))
    assert np.all(coder.decode(model, 8) == symbols)

    model_family = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [
            [0.3, 0.1, 0.1, 0.3, 0.2],
            [0.1, 0.4, 0.2, 0.1, 0.2],
            [0.4, 0.2, 0.1, 0.2, 0.1],
        ],
        dtype=np.float32,
    )
    symbols = np.array([0, 4, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model_family, probabilities)
    assert np.all(coder.get_compressed() == np.array([104018743], dtype=np.uint32))
    assert np.all(coder.decode(model_family, probabilities) == symbols)


def test_scipy_cauchy_doc_examples():
    scipy_model = scipy.stats.cauchy(loc=6.7, scale=12.4)
    model = constriction.stream.model.ScipyModel(scipy_model, -100, 100)
    symbols = np.array([22, 14, 5, -3, 19, 7], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    assert np.all(
        coder.get_compressed() == np.array([3569876501, 1944098], dtype=np.uint32)
    )
    assert np.all(coder.decode(model, 6) == symbols)

    model_family = constriction.stream.model.ScipyModel(scipy.stats.cauchy, -100, 100)
    symbols = np.array([22, 14, 5, -3, 19, 7], dtype=np.int32)
    locs = np.array([26.2, 10.9, 8.7, -6.3, 25.1, 8.9], dtype=np.float32)
    scales = np.array([4.3, 7.4, 2.9, 4.1, 9.7, 3.4], dtype=np.float32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model_family, locs, scales)
    assert np.all(
        coder.get_compressed() == np.array([3611353862, 17526], dtype=np.uint32)
    )
    assert np.all(coder.decode(model_family, locs, scales) == symbols)


@pytest.mark.parametrize("kind", ["laplace", "cauchy"])
def test_native_vs_scipy_crossvalidation(kind):
    """The native Laplace/Cauchy CDF formulas should agree with scipy's to
    within the fixed-point truncation on a broad random grid (the exact
    constriction goldens for these families are pinned via the gaussian and
    scipy-callback tests; this cross-checks the formula shapes)."""
    rng = np.random.RandomState(2024)
    n = 200
    locs = rng.uniform(-80, 80, n)
    scales = rng.uniform(0.3, 30, n)
    symbols = np.clip(
        np.round(rng.standard_cauchy(n) * scales * 0.2 + locs), -100, 100
    ).astype(np.int32)

    if kind == "laplace":
        native = constriction.stream.model.QuantizedLaplace(-100, 100)
        scipy_cls = scipy.stats.laplace
    else:
        native = constriction.stream.model.QuantizedCauchy(-100, 100)
        scipy_cls = scipy.stats.cauchy

    custom = constriction.stream.model.CustomModel(
        lambda x, loc, scale: scipy_cls.cdf(x, loc, scale),
        lambda q, loc, scale: scipy_cls.ppf(q, loc, scale),
        -100,
        100,
    )

    enc_native = constriction.stream.stack.AnsCoder()
    enc_native.encode_reverse(symbols, native, locs, scales)
    enc_scipy = constriction.stream.stack.AnsCoder()
    enc_scipy.encode_reverse(symbols, custom, locs, scales)
    assert np.array_equal(enc_native.get_compressed(), enc_scipy.get_compressed())
    assert np.all(enc_native.decode(native, locs, scales) == symbols)

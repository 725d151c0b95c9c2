"""Parity with the reference's f32 / lazy Python test suites.

Golden compressed arrays are vendored from
/root/reference/tests/python/test_docexamples{,_f32}.py and test_lazy_*.py
(data constants only).  They pin: (a) f32 model parameters quantize in f32
arithmetic (bitstreams differ from f64 by design, e.g. categorical.rs:16-54
is generic over the float type); (b) Categorical(lazy=True) is bitstream-
compatible with the eager fast constructor (lazy_contiguous.rs:32-43).
"""

import numpy as np

import constriction_tpu as constriction


def test_module_example1_scalar_golden():
    message = np.array([6, 10, -4, 2, 5, 2, 1, 0, 2], dtype=np.int32)
    model = constriction.stream.model.QuantizedGaussian(-50, 50, 3.2, 9.6)
    encoder = constriction.stream.stack.AnsCoder()
    encoder.encode_reverse(message, model)
    compressed = encoder.get_compressed()
    assert np.all(compressed == np.array([3114258274, 357938615], dtype=np.uint32))
    decoder = constriction.stream.stack.AnsCoder(compressed)
    assert np.all(decoder.decode(model, 9) == message)


def test_module_example2_scalar_golden():
    message = np.array([6, 10, -4, 2, 5, 2, 1, 0, 2], dtype=np.int32)
    model = constriction.stream.model.QuantizedGaussian(-50, 50, 3.2, 9.6)
    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(message, model)
    compressed = encoder.get_compressed()
    assert np.all(compressed == np.array([2682585243, 513522013], dtype=np.uint32))
    decoder = constriction.stream.queue.RangeDecoder(compressed)
    assert np.all(decoder.decode(model, 9) == message)


def _example3(dtype, lazy, expected_word):
    message = np.array([6, 10, -4, 2, 5, 2, 1, 0, 2], dtype=np.int32)
    means = np.array([2.3, 6.1, -8.5, 4.1, 1.3], dtype=dtype)
    stds = np.array([6.2, 5.3, 3.8, 3.2, 4.7], dtype=dtype)
    model1 = constriction.stream.model.QuantizedGaussian(-50, 50)
    model2 = constriction.stream.model.Categorical(
        np.array([0.2, 0.5, 0.3], dtype=dtype), lazy=lazy
    )
    encoder = constriction.stream.queue.RangeEncoder()
    encoder.encode(message[0:5], model1, means, stds)
    encoder.encode(message[5:9], model2)
    compressed = encoder.get_compressed()
    assert np.all(compressed == np.array([expected_word], dtype=np.uint32)), compressed
    decoder = constriction.stream.queue.RangeDecoder(compressed)
    part1 = decoder.decode(model1, means, stds)
    part2 = decoder.decode(model2, 4)
    assert np.all(np.concatenate((part1, part2)) == message)


def test_module_example3_f64_lazy():
    _example3(np.float64, True, 3176507208)


def test_module_example3_f32_lazy():
    _example3(np.float32, True, 3176507206)


def test_module_example3_f32_eager_fast():
    # lazy and eager-fast must agree bitstream-for-bitstream
    _example3(np.float32, False, 3176507206)


def test_chain_lazy_family_locality():
    data = np.array([0x80D14131, 0xDDA97C6C, 0x5017A640, 0x01170A3E], np.uint32)
    probabilities = np.array(
        [[0.1, 0.7, 0.1, 0.1], [0.2, 0.2, 0.1, 0.5], [0.2, 0.1, 0.4, 0.3]]
    )
    family = constriction.stream.model.Categorical(lazy=True)

    ans = constriction.stream.stack.AnsCoder(data, seal=True)
    assert np.all(ans.decode(family, probabilities) == np.array([0, 0, 2], np.int32))

    perturbed = probabilities.copy()
    perturbed[0, :] = np.array([0.09, 0.71, 0.1, 0.1])
    ans = constriction.stream.stack.AnsCoder(data, seal=True)
    assert np.all(ans.decode(family, perturbed) == np.array([1, 0, 0], np.int32))

    # chain coder: only the changed symbol's decode changes
    chain = constriction.stream.chain.ChainCoder(data, seal=True)
    syms = chain.decode(family, probabilities)
    chain2 = constriction.stream.chain.ChainCoder(data, seal=True)
    syms2 = chain2.decode(family, perturbed)
    assert syms[1] == syms2[1] and syms[2] == syms2[2]


def test_lazy_eager_equivalence_random():
    # property: Categorical(lazy=True) and eager fast produce identical
    # bitstreams for both f32 and f64 inputs
    rng = np.random.RandomState(0)
    for dtype in (np.float32, np.float64):
        for trial in range(10):
            k = rng.randint(2, 50)
            probs = rng.dirichlet(np.ones(k)).astype(dtype)
            n = rng.randint(1, 100)
            symbols = rng.randint(0, k, size=n).astype(np.int32)
            out = []
            for lazy in (True, False):
                model = constriction.stream.model.Categorical(probs, lazy=lazy)
                enc = constriction.stream.stack.AnsCoder()
                enc.encode_reverse(symbols, model)
                out.append(enc.get_compressed())
            np.testing.assert_array_equal(out[0], out[1])

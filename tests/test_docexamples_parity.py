"""Remaining doc-example parity with the reference Python suite.

Golden constants vendored from /root/reference/tests/python/test_docexamples.py
(data only); scenarios re-expressed against constriction_tpu's API.  Together
with test_golden_reference.py / test_docexamples.py / test_docexamples_f32_lazy
this covers the reference's documented call forms and their exact bitstreams.
"""

import numpy as np

import constriction_tpu as constriction


def _cat(probs, **kw):
    return constriction.stream.model.Categorical(np.asarray(probs), **kw)


def test_chain_bits_back_roundtrip_gaussians():
    leaky_gaussian = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = np.array([3.2, -14.3, 5.7])
    stds = np.array([6.4, 4.2, 3.9])
    np.random.seed(123)
    side_information = np.random.randint(2**32, size=10, dtype=np.uint32)

    coder = constriction.stream.chain.ChainCoder(side_information, seal=True)
    symbols = coder.decode(leaky_gaussian, means, stds)
    r1, r2 = coder.get_remainders()
    remaining = np.concatenate([r1, r2])

    coder2 = constriction.stream.chain.ChainCoder(remaining, is_remainders=True)
    coder2.encode_reverse(symbols, leaky_gaussian, means, stds)
    d1, d2 = coder2.get_data(unseal=True)
    np.testing.assert_array_equal(np.concatenate([d1, d2]), side_information)


def test_chain_vs_ans_sensitivity():
    data = np.array([0x80D14131, 0xDDA97C6C, 0x5017A640, 0x01170A3E], np.uint32)
    probabilities = np.array(
        [[0.1, 0.7, 0.1, 0.1], [0.2, 0.2, 0.1, 0.5], [0.2, 0.1, 0.4, 0.3]]
    )
    family = constriction.stream.model.Categorical(perfect=False)

    ans = constriction.stream.stack.AnsCoder(data, seal=True)
    np.testing.assert_array_equal(ans.decode(family, probabilities), [0, 0, 2])
    perturbed = probabilities.copy()
    perturbed[0, :] = [0.09, 0.71, 0.1, 0.1]
    ans = constriction.stream.stack.AnsCoder(data, seal=True)
    np.testing.assert_array_equal(ans.decode(family, perturbed), [1, 0, 0])

    chain = constriction.stream.chain.ChainCoder(data, seal=True)
    np.testing.assert_array_equal(chain.decode(family, probabilities), [0, 3, 3])
    chain = constriction.stream.chain.ChainCoder(data, seal=True)
    np.testing.assert_array_equal(chain.decode(family, perturbed), [1, 3, 3])


def test_stack_two_part_message():
    part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    model1 = _cat([0.2, 0.4, 0.1, 0.3], perfect=False)
    part2 = np.array([6, 10, -4, 2], dtype=np.int32)
    means2 = np.array([2.5, 13.1, -1.1, -3.0])
    stds2 = np.array([4.1, 8.7, 6.2, 5.4])
    fam2 = constriction.stream.model.QuantizedGaussian(-100, 100)

    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(part2, fam2, means2, stds2)
    coder.encode_reverse(part1, model1)
    np.testing.assert_array_equal(coder.decode(model1, 7), part1)
    np.testing.assert_array_equal(coder.decode(fam2, means2, stds2), part2)


def test_stack_gaussian_roundtrip_with_empty_check():
    symbols = np.array([2, -1, 0, 2, 3], dtype=np.int32)
    model = constriction.stream.model.QuantizedGaussian(-10, 10)
    means = np.array([2.3, -1.7, 0.1, 2.2, -5.1])
    stds = np.array([1.1, 5.3, 3.8, 1.4, 3.9])
    ans = constriction.stream.stack.AnsCoder()
    ans.encode_reverse(symbols, model, means, stds)
    ans2 = constriction.stream.stack.AnsCoder(ans.get_compressed())
    np.testing.assert_array_equal(ans2.decode(model, means, stds), symbols)
    assert ans2.is_empty()


def test_ans_decode_golden_vectors():
    model = _cat([0.1, 0.6, 0.3], perfect=False)
    coder = constriction.stream.stack.AnsCoder(
        np.array([2514924296, 114], dtype=np.uint32)
    )
    assert coder.decode(model) == 2

    coder = constriction.stream.stack.AnsCoder(
        np.array([1441153686, 108], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        coder.decode(model, 9), [2, 0, 0, 1, 2, 2, 1, 2, 2]
    )

    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = np.array([10.3, -4.7, 20.5])
    stds = np.array([5.2, 24.2, 3.1])
    coder = constriction.stream.stack.AnsCoder(
        np.array([597775281, 3], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(fam, means, stds), [12, -13, 25])

    catfam = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]]
    )
    coder = constriction.stream.stack.AnsCoder(
        np.array([2142112014, 31], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(catfam, probabilities), [3, 1])


def test_ans_encode_golden_vectors():
    model = _cat([0.1, 0.6, 0.3], perfect=False)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(
        np.array([0, 2, 1, 2, 0, 2, 0, 2, 1], dtype=np.int32), model
    )
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([1276728145, 172], dtype=np.uint32)
    )

    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(
        np.array([12, -13, 25], dtype=np.int32), fam,
        np.array([10.3, -4.7, 20.5]), np.array([5.2, 24.2, 3.1]),
    )
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([597775281, 3], dtype=np.uint32)
    )

    catfam = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]]
    )
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(np.array([3, 1], dtype=np.int32), catfam, probabilities)
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([45298481], dtype=np.uint32)
    )


def test_ans_seek_checkpoint():
    model = _cat([0.2, 0.4, 0.1, 0.3], perfect=False)
    part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    part2 = np.array([2, 2, 0, 1, 3], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(part2, model)
    position, state = coder.pos()
    coder.encode_reverse(part1, model)
    assert coder.decode(model) == 1
    coder.seek(position, state)
    np.testing.assert_array_equal(coder.decode(model, 5), part2)


def test_range_encode_golden_vectors():
    model = _cat([0.1, 0.6, 0.3], perfect=False)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(np.array([0, 2, 1, 2, 0, 2, 0, 2, 1], dtype=np.int32), model)
    np.testing.assert_array_equal(
        enc.get_compressed(), np.array([369323576], dtype=np.uint32)
    )

    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(
        np.array([12, -13, 25], dtype=np.int32), fam,
        np.array([10.3, -4.7, 20.5]), np.array([5.2, 24.2, 3.1]),
    )
    np.testing.assert_array_equal(
        enc.get_compressed(), np.array([2655472005], dtype=np.uint32)
    )

    catfam = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]]
    )
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(np.array([3, 1], dtype=np.int32), catfam, probabilities)
    np.testing.assert_array_equal(
        enc.get_compressed(), np.array([2705829254], dtype=np.uint32)
    )


def test_range_decode_golden_vectors():
    model = _cat([0.1, 0.6, 0.3], perfect=False)
    dec = constriction.stream.queue.RangeDecoder(
        np.array([3089773345, 1894195597], dtype=np.uint32)
    )
    assert dec.decode(model) == 2

    dec = constriction.stream.queue.RangeDecoder(
        np.array([369323576], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        dec.decode(model, 9), [0, 2, 1, 2, 0, 2, 0, 2, 1]
    )

    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    dec = constriction.stream.queue.RangeDecoder(
        np.array([2655472005], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        dec.decode(fam, np.array([10.3, -4.7, 20.5]), np.array([5.2, 24.2, 3.1])),
        [12, -13, 25],
    )

    catfam = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]]
    )
    dec = constriction.stream.queue.RangeDecoder(
        np.array([2705829535], dtype=np.uint32)
    )
    np.testing.assert_array_equal(dec.decode(catfam, probabilities), [3, 1])


def test_range_seek_checkpoint():
    model = _cat([0.2, 0.4, 0.1, 0.3], perfect=False)
    part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    part2 = np.array([2, 2, 0, 1, 3], dtype=np.int32)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(part1, model)
    position, state = enc.pos()
    enc.encode(part2, model)
    dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
    assert dec.decode(model) == 1
    dec.seek(position, state)
    np.testing.assert_array_equal(dec.decode(model, 5), part2)


def test_categorical_golden_vectors():
    model = _cat([0.2, 0.4, 0.1, 0.3], perfect=False)
    symbols = np.array([0, 3, 2, 3, 2, 0, 2, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([488222996, 175], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(model, 8), symbols)

    fam = constriction.stream.model.Categorical(perfect=False)
    probabilities = np.array(
        [[0.3, 0.1, 0.1, 0.3, 0.2], [0.1, 0.4, 0.2, 0.1, 0.2],
         [0.4, 0.2, 0.1, 0.2, 0.1]]
    )
    symbols = np.array([0, 4, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, probabilities)
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([104018741], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(fam, probabilities), symbols)


def test_huffman_golden_vectors():
    probabils = np.array([0.3, 0.2, 0.4, 0.1])
    message = [1, 3, 2, 3, 0, 1, 3, 0, 2, 1, 1, 3, 3, 1, 2, 0, 1, 3, 1]

    enc = constriction.symbol.QueueEncoder()
    book = constriction.symbol.huffman.EncoderHuffmanTree(probabils)
    for s in message:
        enc.encode_symbol(s, book)
    compressed, bitrate = enc.get_compressed()
    np.testing.assert_array_equal(
        compressed, np.array([3756389791, 61358], dtype=np.uint32)
    )
    assert bitrate == 48
    dec = constriction.symbol.QueueDecoder(compressed)
    dbook = constriction.symbol.huffman.DecoderHuffmanTree(probabils)
    assert [dec.decode_symbol(dbook) for _ in message] == message

    coder = constriction.symbol.StackCoder()
    for s in reversed(message):
        coder.encode_symbol(s, book)
    compressed, bitrate = coder.get_compressed()
    np.testing.assert_array_equal(
        compressed, np.array([2818274807, 129455], dtype=np.uint32)
    )
    assert bitrate == 48
    assert [coder.decode_symbol(dbook) for _ in message] == message


def test_quantized_gaussian_scalar_and_family_goldens():
    model = constriction.stream.model.QuantizedGaussian(-100, 100, 12.6, 7.3)
    symbols = np.array([12, 15, 4, -2, 18, 5], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([745994372, 25704], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(model, 6), symbols)

    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = np.array([13.2, 17.9, 7.3, -4.2, 25.1, 3.2])
    stds = np.array([3.2, 4.7, 5.2, 3.1, 6.3, 2.9])
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, means, stds)
    np.testing.assert_array_equal(
        coder.get_compressed(), np.array([2051958011, 1549], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(fam, means, stds), symbols)


def test_binomial_scipy_crossvalidation():
    # Binomial has no published golden vector; pin it against ScipyModel
    # (both must build identical fixed-point tables from the same f64 CDF)
    import scipy.stats

    n_, p_ = 20, 0.37
    bin_model = constriction.stream.model.Binomial(n_, p_)
    scipy_model = constriction.stream.model.ScipyModel(
        scipy.stats.binom(n_, p_), 0, n_
    )
    symbols = np.array([3, 7, 11, 0, 20, 8], dtype=np.int32)
    outs = []
    for m in (bin_model, scipy_model):
        coder = constriction.stream.stack.AnsCoder()
        coder.encode_reverse(symbols, m)
        outs.append(coder.get_compressed())
        np.testing.assert_array_equal(coder.decode(m, 6), symbols)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_exp_golomb_rejects_maximal_codeword_with_nonzero_payload():
    """exp_golomb.rs:165: a 32-zeros codeword is only valid when the value
    payload wraps to exactly zero (symbol u32::MAX); any other payload is
    InvalidCodeword, not a silently wrapped symbol."""
    import pytest

    from constriction_tpu.symbol.exp_golomb import ExpGolomb

    book = ExpGolomb(32)
    # 32 zeros, the terminating 1, then 32 payload bits '1' + 31 zeros:
    bits = [False] * 32 + [True] + [True] + [False] * 31
    it = iter(bits)

    def read_bit():
        return next(it, None)

    with pytest.raises(ValueError, match="Invalid codeword"):
        book.decode_symbol(read_bit)
    # the all-zero payload IS legal and decodes to 2**32 - 1
    bits2 = [False] * 32 + [True] + [False] * 32
    it2 = iter(bits2)
    assert book.decode_symbol(lambda: next(it2, None)) == (1 << 32) - 1


def test_bool_symbols_accepted_like_reference():
    """pyo3 extracts Python bools as integers: encode_reverse(True, model)
    encodes symbol 1 and decode(model, True) decodes one symbol."""
    import constriction_tpu as constriction

    m = constriction.stream.model.Categorical(
        np.array([0.3, 0.7]), perfect=False
    )
    enc = constriction.stream.stack.AnsCoder()
    enc.encode_reverse(True, m)
    dec = constriction.stream.stack.AnsCoder(enc.get_compressed())
    got = dec.decode(m, True)
    assert np.array_equal(np.asarray(got), [1])

"""Complete doc-example parity: every scenario of the reference's
tests/python/test_docexamples.py (43 functions), re-run over the f32 and
lazy-categorical grids the reference duplicates in test_docexamples_f32.py
and test_lazy_{f64,f32}.py.

Golden constants are vendored from those reference files (data only; the
harness code here is constriction_tpu's own).  One repo test function per
reference function, same name, parameterized over the variant grid; the
manifest in docs/DOCEXAMPLE_PARITY.md maps the full reference suite.

Variants: "f64" (reference test_docexamples.py), "f32" (model parameters
cast to float32, test_docexamples_f32.py), and for every scenario touching
a Categorical the "lazy_*" duplications (Categorical(lazy=True), which is
bitstream-compatible with the fast eager path -- the reference's
test_lazy_* files pin exactly this).
"""

import numpy as np
import pytest
import scipy.stats

import constriction_tpu as constriction

F_VARIANTS = ["f64", "f32"]
CAT_VARIANTS = ["f64", "f32", "lazy_f64", "lazy_f32"]


def _dt(variant):
    return np.float32 if variant.endswith("f32") else np.float64


def _p(arr, variant):
    """Model parameters in the variant's float dtype."""
    return np.asarray(arr, dtype=_dt(variant))


def _cat(variant, probs=None):
    kw = {"lazy": True} if variant.startswith("lazy") else {"perfect": False}
    if probs is None:
        return constriction.stream.model.Categorical(**kw)
    return constriction.stream.model.Categorical(_p(probs, variant), **kw)


GOLD = {
    # scenario: {variant-class: words}; lazy variants share the eager golds
    "module_example1": {"f32": [3114258274, 357938615]},
    "module_example2": {"f32": [2682585243, 513522013]},
    "module_example3": {"f64": [3176507208], "f32": [3176507206]},
    "ans_encode_reverse2": {"f64": [1276728145, 172], "f32": [1276732052, 172]},
    "ans_encode_reverse3": {"f64": [597775281, 3], "f32": [597775281, 3]},
    "ans_encode_reverse4": {"f64": [45298481], "f32": [45298482]},
    "range_coder_encode2": {"f64": [369323576], "f32": [369323598]},
    "range_coder_encode3": {"f64": [2655472005], "f32": [2655472005]},
    "range_coder_encode4": {"f64": [2705829254], "f32": [2705829510]},
    "range_coding_decode4": {"f64": [2705829535], "f32": [2705829510]},
    "model_mod1": {"f64": [745994372, 25704], "f32": [745994372, 25704]},
    "model_mod2": {"f64": [2051958011, 1549], "f32": [2051912079, 1549]},
    "categorical1": {"f64": [488222996, 175], "f32": [2484720979, 175]},
    "categorical2": {"f64": [104018741], "f32": [104018743]},
    "scipy_model1": {"f64": [3569876501, 1944098], "f32": [3569876501, 1944098]},
    "scipy_model2": {"f64": [3493721376, 17526], "f32": [3611353862, 17526]},
}


def _gold(name, variant):
    g = GOLD[name]["f32" if variant.endswith("f32") else "f64"]
    return np.array(g, dtype=np.uint32)


MSG9 = np.array([6, 10, -4, 2, 5, 2, 1, 0, 2], dtype=np.int32)


def test_module_example1():
    model = constriction.stream.model.QuantizedGaussian(-50, 50, 3.2, 9.6)
    enc = constriction.stream.stack.AnsCoder()
    enc.encode_reverse(MSG9, model)
    comp = enc.get_compressed()
    # the f64 reference file only prints; the f32 file asserts this golden
    # (constructor scalars are f64 either way, so the streams coincide)
    np.testing.assert_array_equal(comp, _gold("module_example1", "f32"))
    dec = constriction.stream.stack.AnsCoder(comp)
    np.testing.assert_array_equal(dec.decode(model, 9), MSG9)


def test_module_example2():
    model = constriction.stream.model.QuantizedGaussian(-50, 50, 3.2, 9.6)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(MSG9, model)
    comp = enc.get_compressed()
    np.testing.assert_array_equal(comp, _gold("module_example2", "f32"))
    dec = constriction.stream.queue.RangeDecoder(comp)
    np.testing.assert_array_equal(dec.decode(model, 9), MSG9)


def test_old_module_example1():
    model = constriction.stream.model.QuantizedGaussian(-100, 100)
    symbols = np.array([23, -15, 78, 43, -69], dtype=np.int32)
    means = np.array([35.2, -1.7, 30.1, 71.2, -75.1])
    stds = np.array([10.1, 25.3, 23.8, 35.4, 3.9])
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model, means, stds)
    assert coder.num_bits() >= coder.num_valid_bits() > 0
    coder = constriction.stream.stack.AnsCoder(coder.get_compressed())
    np.testing.assert_array_equal(coder.decode(model, means, stds), symbols)
    assert coder.is_empty()


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_module_example3(variant):
    means = _p([2.3, 6.1, -8.5, 4.1, 1.3], variant)
    stds = _p([6.2, 5.3, 3.8, 3.2, 4.7], variant)
    m1 = constriction.stream.model.QuantizedGaussian(-50, 50)
    m2 = _cat(variant, [0.2, 0.5, 0.3])
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(MSG9[0:5], m1, means, stds)
    enc.encode(MSG9[5:9], m2)
    comp = enc.get_compressed()
    np.testing.assert_array_equal(comp, _gold("module_example3", variant))
    dec = constriction.stream.queue.RangeDecoder(comp)
    out = np.concatenate([dec.decode(m1, means, stds), dec.decode(m2, 4)])
    np.testing.assert_array_equal(out, MSG9)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_chain1(variant):
    gauss = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = _p([3.2, -14.3, 5.7], variant)
    stds = _p([6.4, 4.2, 3.9], variant)
    np.random.seed(123)
    side_info = np.random.randint(2**32, size=10, dtype=np.uint32)
    coder = constriction.stream.chain.ChainCoder(side_info, seal=True)
    symbols = coder.decode(gauss, means, stds)
    r1, r2 = coder.get_remainders()
    coder2 = constriction.stream.chain.ChainCoder(
        np.concatenate([r1, r2]), is_remainders=True
    )
    coder2.encode_reverse(symbols, gauss, means, stds)
    d1, d2 = coder2.get_data(unseal=True)
    np.testing.assert_array_equal(np.concatenate([d1, d2]), side_info)


_CHAIN_DATA = np.array(
    [0x80D14131, 0xDDA97C6C, 0x5017A640, 0x01170A3E], np.uint32
)
_CHAIN_PROBS = [
    [0.1, 0.7, 0.1, 0.1],
    [0.2, 0.2, 0.1, 0.5],
    [0.2, 0.1, 0.4, 0.3],
]


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_chain2(variant):
    fam = _cat(variant)
    probs = _p(_CHAIN_PROBS, variant)
    coder = constriction.stream.stack.AnsCoder(_CHAIN_DATA, seal=True)
    np.testing.assert_array_equal(coder.decode(fam, probs), [0, 0, 2])
    probs[0, :] = _p([0.09, 0.71, 0.1, 0.1], variant)
    coder = constriction.stream.stack.AnsCoder(_CHAIN_DATA, seal=True)
    np.testing.assert_array_equal(coder.decode(fam, probs), [1, 0, 0])


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_chain3(variant):
    fam = _cat(variant)
    probs = _p(_CHAIN_PROBS, variant)
    coder = constriction.stream.chain.ChainCoder(_CHAIN_DATA, seal=True)
    np.testing.assert_array_equal(coder.decode(fam, probs), [0, 3, 3])
    probs[0, :] = _p([0.09, 0.71, 0.1, 0.1], variant)
    coder = constriction.stream.chain.ChainCoder(_CHAIN_DATA, seal=True)
    np.testing.assert_array_equal(coder.decode(fam, probs), [1, 3, 3])


def _two_part_message(variant, coder_kind):
    part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    model1 = _cat(variant, [0.2, 0.4, 0.1, 0.3])
    part2 = np.array([6, 10, -4, 2], dtype=np.int32)
    means2 = _p([2.5, 13.1, -1.1, -3.0], variant)
    stds2 = _p([4.1, 8.7, 6.2, 5.4], variant)
    fam2 = constriction.stream.model.QuantizedGaussian(-100, 100)
    if coder_kind == "stack":
        coder = constriction.stream.stack.AnsCoder()
        coder.encode_reverse(part2, fam2, means2, stds2)
        coder.encode_reverse(part1, model1)
        d1 = coder.decode(model1, 7)
        d2 = coder.decode(fam2, means2, stds2)
    else:
        enc = constriction.stream.queue.RangeEncoder()
        enc.encode(part1, model1)
        enc.encode(part2, fam2, means2, stds2)
        dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
        d1 = dec.decode(model1, 7)
        d2 = dec.decode(fam2, means2, stds2)
    np.testing.assert_array_equal(d1, part1)
    np.testing.assert_array_equal(d2, part2)


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_stack1(variant):
    _two_part_message(variant, "stack")


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coding_mod(variant):
    _two_part_message(variant, "queue")


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_stack2(variant):
    model = constriction.stream.model.QuantizedGaussian(-10, 10)
    symbols = np.array([2, -1, 0, 2, 3], dtype=np.int32)
    means = _p([2.3, -1.7, 0.1, 2.2, -5.1], variant)
    stds = _p([1.1, 5.3, 3.8, 1.4, 3.9], variant)
    ans = constriction.stream.stack.AnsCoder()
    ans.encode_reverse(symbols, model, means, stds)
    assert ans.num_valid_bits() > 0
    ans = constriction.stream.stack.AnsCoder(ans.get_compressed())
    np.testing.assert_array_equal(ans.decode(model, means, stds), symbols)
    assert ans.is_empty()


test_ans_example = test_stack2  # the stream-module ANS example is identical


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_decode1(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    coder = constriction.stream.stack.AnsCoder(
        np.array([2514924296, 114], dtype=np.uint32)
    )
    assert coder.decode(model) == 2


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_decode2(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    comp = ([2514924296, 114] if variant.endswith("f32")
            else [1441153686, 108])
    want = ([2, 0, 0, 1, 2, 2, 1, 2, 2] if variant.endswith("f32")
            else [2, 0, 0, 1, 2, 2, 1, 2, 2])
    coder = constriction.stream.stack.AnsCoder(np.array(comp, np.uint32))
    np.testing.assert_array_equal(coder.decode(model, 9), want)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_ans_decode3(variant):
    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = _p([10.3, -4.7, 20.5], variant)
    stds = _p([5.2, 24.2, 3.1], variant)
    coder = constriction.stream.stack.AnsCoder(
        np.array([597775281, 3], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        coder.decode(fam, means, stds), [12, -13, 25]
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_decode4(variant):
    fam = _cat(variant)
    probs = _p([[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]], variant)
    coder = constriction.stream.stack.AnsCoder(
        np.array([2142112014, 31], dtype=np.uint32)
    )
    np.testing.assert_array_equal(coder.decode(fam, probs), [3, 1])


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_encode_reverse1(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(2, model)
    assert coder.num_valid_bits() > 0


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_encode_reverse2(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    symbols = np.array([0, 2, 1, 2, 0, 2, 0, 2, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("ans_encode_reverse2", variant)
    )


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_ans_encode_reverse3(variant):
    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = _p([10.3, -4.7, 20.5], variant)
    stds = _p([5.2, 24.2, 3.1], variant)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(np.array([12, -13, 25], np.int32), fam, means, stds)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("ans_encode_reverse3", variant)
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_encode_reverse4(variant):
    fam = _cat(variant)
    probs = _p([[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]], variant)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(np.array([3, 1], np.int32), fam, probs)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("ans_encode_reverse4", variant)
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_ans_seek(variant):
    model = _cat(variant, [0.2, 0.4, 0.1, 0.3])
    part1 = np.array([1, 2, 0, 3, 2, 3, 0], dtype=np.int32)
    part2 = np.array([2, 2, 0, 1, 3], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(part2, model)
    position, state = coder.pos()
    coder.encode_reverse(part1, model)
    assert coder.decode(model) == 1
    coder.seek(position, state)
    np.testing.assert_array_equal(coder.decode(model, 5), part2)


def test_old_module_example2():
    model = constriction.stream.model.QuantizedGaussian(-100, 100)
    symbols = np.array([23, -15, 78, 43, -69], dtype=np.int32)
    means = np.array([35.2, -1.7, 30.1, 71.2, -75.1])
    stds = np.array([10.1, 25.3, 23.8, 35.4, 3.9])
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(symbols, model, means, stds)
    assert enc.num_bits() > 0
    dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
    np.testing.assert_array_equal(dec.decode(model, means, stds), symbols)
    assert dec.maybe_exhausted()


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coder_encode1(variant):
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(2, _cat(variant, [0.1, 0.6, 0.3]))
    assert enc.num_bits() >= 0


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coder_encode2(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    symbols = np.array([0, 2, 1, 2, 0, 2, 0, 2, 1], dtype=np.int32)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(symbols, model)
    np.testing.assert_array_equal(
        enc.get_compressed(), _gold("range_coder_encode2", variant)
    )


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_range_coder_encode3(variant):
    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = _p([10.3, -4.7, 20.5], variant)
    stds = _p([5.2, 24.2, 3.1], variant)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(np.array([12, -13, 25], np.int32), fam, means, stds)
    np.testing.assert_array_equal(
        enc.get_compressed(), _gold("range_coder_encode3", variant)
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coder_encode4(variant):
    fam = _cat(variant)
    probs = _p([[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]], variant)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(np.array([3, 1], np.int32), fam, probs)
    np.testing.assert_array_equal(
        enc.get_compressed(), _gold("range_coder_encode4", variant)
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coding_decode1(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    dec = constriction.stream.queue.RangeDecoder(
        np.array([3089773345, 1894195597], dtype=np.uint32)
    )
    assert dec.decode(model) == 2


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coding_decode2(variant):
    model = _cat(variant, [0.1, 0.6, 0.3])
    comp = _gold("range_coder_encode2", variant)
    dec = constriction.stream.queue.RangeDecoder(comp)
    np.testing.assert_array_equal(
        dec.decode(model, 9), [0, 2, 1, 2, 0, 2, 0, 2, 1]
    )


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coding_seek(variant):
    model = _cat(variant, [0.2, 0.4, 0.1, 0.3])
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


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_range_coding_decode3(variant):
    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    means = _p([10.3, -4.7, 20.5], variant)
    stds = _p([5.2, 24.2, 3.1], variant)
    dec = constriction.stream.queue.RangeDecoder(
        np.array([2655472005], dtype=np.uint32)
    )
    np.testing.assert_array_equal(dec.decode(fam, means, stds), [12, -13, 25])


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_range_coding_decode4(variant):
    fam = _cat(variant)
    probs = _p([[0.1, 0.2, 0.3, 0.1, 0.3], [0.3, 0.2, 0.2, 0.2, 0.1]], variant)
    dec = constriction.stream.queue.RangeDecoder(
        _gold("range_coding_decode4", variant)
    )
    np.testing.assert_array_equal(dec.decode(fam, probs), [3, 1])


# -- CustomModel / ScipyModel scenarios -------------------------------------


def _custom_cauchy_model():
    m = scipy.stats.cauchy(loc=10.3, scale=5.8)
    return constriction.stream.model.CustomModel(m.cdf, m.ppf, -100, 100)


def _custom_cauchy_family():
    return constriction.stream.model.CustomModel(
        lambda x, loc, scale: scipy.stats.cauchy.cdf(x, loc, scale),
        lambda x, loc, scale: scipy.stats.cauchy.ppf(x, loc, scale),
        -100, 100,
    )


def _custom_binom_family():
    return constriction.stream.model.CustomModel(
        lambda x, params: scipy.stats.binom.cdf(x, n=10, p=params),
        lambda x, params: scipy.stats.binom.ppf(x, n=10, p=params),
        0, 10,
    )


_CAUCHY_PARAMS = np.array([(7.3, 3.9), (11.5, 5.2), (-3.2, 4.9), (25.9, 7.1)])


def test_custom_model_ans():
    symbols = np.array([5, 14, -1, 21], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    model = _custom_cauchy_model()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(coder.decode(model, 4), symbols)

    coder = constriction.stream.stack.AnsCoder()
    fam = _custom_cauchy_family()
    locs, scales = _CAUCHY_PARAMS[:, 0].copy(), _CAUCHY_PARAMS[:, 1].copy()
    coder.encode_reverse(symbols, fam, locs, scales)
    np.testing.assert_array_equal(coder.decode(fam, locs, scales), symbols)

    binom = _custom_binom_family()
    ps = np.array([0.3, 0.7, 0.2, 0.6])
    bsyms = np.array([4, 8, 1, 5], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(bsyms, binom, ps)
    np.testing.assert_array_equal(coder.decode(binom, ps), bsyms)


def test_custom_model_range():
    symbols = np.array([5, 14, -1, 21], dtype=np.int32)
    model = _custom_cauchy_model()
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(symbols, model)
    dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
    np.testing.assert_array_equal(dec.decode(model, 4), symbols)

    fam = _custom_cauchy_family()
    locs, scales = _CAUCHY_PARAMS[:, 0].copy(), _CAUCHY_PARAMS[:, 1].copy()
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(symbols, fam, locs, scales)
    dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
    np.testing.assert_array_equal(dec.decode(fam, locs, scales), symbols)

    binom = _custom_binom_family()
    ps = np.array([0.3, 0.7, 0.2, 0.6])
    bsyms = np.array([4, 8, 1, 5], dtype=np.int32)
    enc = constriction.stream.queue.RangeEncoder()
    enc.encode(bsyms, binom, ps)
    dec = constriction.stream.queue.RangeDecoder(enc.get_compressed())
    np.testing.assert_array_equal(dec.decode(binom, ps), bsyms)


_CHAIN10 = np.array(
    [0xA5DD25F7, 0xFAEF49B5, 0xD5B12228, 0x156CEB98, 0x71A0A92B,
     0x99E6D365, 0x2EEBFADB, 0x404A567B, 0xF6CBDC09, 0xE63F3848],
    dtype=np.uint32,
)


def test_old_custom_model_chain():
    model = _custom_cauchy_model()
    coder = constriction.stream.chain.ChainCoder(_CHAIN10, False, False)
    symbols = coder.decode(model, 4)
    np.testing.assert_array_equal(symbols, [18, 6, 33, 59])
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(np.hstack(coder.get_data()), _CHAIN10)

    fam = _custom_cauchy_family()
    locs, scales = _CAUCHY_PARAMS[:, 0].copy(), _CAUCHY_PARAMS[:, 1].copy()
    coder = constriction.stream.chain.ChainCoder(_CHAIN10, False, False)
    symbols = coder.decode(fam, locs, scales)
    np.testing.assert_array_equal(symbols, [13, 7, 16, 85])
    coder.encode_reverse(symbols, fam, locs, scales)
    np.testing.assert_array_equal(np.hstack(coder.get_data()), _CHAIN10)

    binom = _custom_binom_family()
    ps = np.array([0.3, 0.7, 0.2, 0.6])
    coder = constriction.stream.chain.ChainCoder(_CHAIN10, False, False)
    symbols = coder.decode(binom, ps)
    np.testing.assert_array_equal(symbols, [4, 6, 4, 9])
    coder.encode_reverse(symbols, binom, ps)
    np.testing.assert_array_equal(np.hstack(coder.get_data()), _CHAIN10)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_model_mod1(variant):
    model = constriction.stream.model.QuantizedGaussian(-100, 100, 12.6, 7.3)
    symbols = np.array([12, 15, 4, -2, 18, 5], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("model_mod1", variant)
    )
    np.testing.assert_array_equal(coder.decode(model, 6), symbols)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_model_mod2(variant):
    fam = constriction.stream.model.QuantizedGaussian(-100, 100)
    symbols = np.array([12, 15, 4, -2, 18, 5], dtype=np.int32)
    means = _p([13.2, 17.9, 7.3, -4.2, 25.1, 3.2], variant)
    stds = _p([3.2, 4.7, 5.2, 3.1, 6.3, 2.9], variant)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, means, stds)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("model_mod2", variant)
    )
    np.testing.assert_array_equal(coder.decode(fam, means, stds), symbols)


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_categorical1(variant):
    model = _cat(variant, [0.2, 0.4, 0.1, 0.3])
    symbols = np.array([0, 3, 2, 3, 2, 0, 2, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("categorical1", variant)
    )
    np.testing.assert_array_equal(coder.decode(model, 8), symbols)


@pytest.mark.parametrize("variant", CAT_VARIANTS)
def test_categorical2(variant):
    fam = _cat(variant)
    probs = _p(
        [[0.3, 0.1, 0.1, 0.3, 0.2],
         [0.1, 0.4, 0.2, 0.1, 0.2],
         [0.4, 0.2, 0.1, 0.2, 0.1]], variant,
    )
    symbols = np.array([0, 4, 1], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, probs)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("categorical2", variant)
    )
    np.testing.assert_array_equal(coder.decode(fam, probs), symbols)


def test_custom_model1():
    model = constriction.stream.model.CustomModel(
        lambda x: 0.5 + 0.5 * np.tanh(x * 0.1), lambda xi: xi, -100, 100
    )
    symbols = np.array([-3, 2, 5, 5, 6], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(coder.decode(model, 5), symbols)


def test_custom_model2():
    fam = constriction.stream.model.CustomModel(
        lambda x, a, b: 0.5 + 0.5 * np.tanh(a + x * b),
        lambda xi, a, b: xi,
        -100, 100,
    )
    symbols = np.array([-2, 1, 4], dtype=np.int32)
    p1 = np.array([1, 10, -3], dtype=np.float64)
    p2 = np.array([0.01, 0.04, 0.2], dtype=np.float64)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, p1, p2)
    np.testing.assert_array_equal(coder.decode(fam, p1, p2), symbols)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_scipy_model1(variant):
    model = constriction.stream.model.ScipyModel(
        scipy.stats.cauchy(loc=6.7, scale=12.4), -100, 100
    )
    symbols = np.array([22, 14, 5, -3, 19, 7], dtype=np.int32)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, model)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("scipy_model1", variant)
    )
    np.testing.assert_array_equal(coder.decode(model, 6), symbols)


@pytest.mark.parametrize("variant", F_VARIANTS)
def test_scipy_model2(variant):
    fam = constriction.stream.model.ScipyModel(scipy.stats.cauchy, -100, 100)
    symbols = np.array([22, 14, 5, -3, 19, 7], dtype=np.int32)
    locs = _p([26.2, 10.9, 8.7, -6.3, 25.1, 8.9], variant)
    scales = _p([4.3, 7.4, 2.9, 4.1, 9.7, 3.4], variant)
    coder = constriction.stream.stack.AnsCoder()
    coder.encode_reverse(symbols, fam, locs, scales)
    np.testing.assert_array_equal(
        coder.get_compressed(), _gold("scipy_model2", variant)
    )
    np.testing.assert_array_equal(coder.decode(fam, locs, scales), symbols)


_HUFF_PROBS = np.array([0.3, 0.2, 0.4, 0.1])
_HUFF_MSG = [1, 3, 2, 3, 0, 1, 3, 0, 2, 1, 1, 3, 3, 1, 2, 0, 1, 3, 1]


def test_huffman1():
    enc = constriction.symbol.QueueEncoder()
    book = constriction.symbol.huffman.EncoderHuffmanTree(_HUFF_PROBS)
    for s in _HUFF_MSG:
        enc.encode_symbol(s, book)
    compressed, bitrate = enc.get_compressed()
    np.testing.assert_array_equal(
        compressed, np.array([3756389791, 61358], dtype=np.uint32)
    )
    assert bitrate == 48
    dec = constriction.symbol.QueueDecoder(compressed)
    dbook = constriction.symbol.huffman.DecoderHuffmanTree(_HUFF_PROBS)
    assert [dec.decode_symbol(dbook) for _ in range(19)] == _HUFF_MSG


def test_huffman2():
    coder = constriction.symbol.StackCoder()
    book = constriction.symbol.huffman.EncoderHuffmanTree(_HUFF_PROBS)
    for s in reversed(_HUFF_MSG):
        coder.encode_symbol(s, book)
    compressed, bitrate = coder.get_compressed()
    np.testing.assert_array_equal(
        compressed, np.array([2818274807, 129455], dtype=np.uint32)
    )
    assert bitrate == 48
    dbook = constriction.symbol.huffman.DecoderHuffmanTree(_HUFF_PROBS)
    assert [coder.decode_symbol(dbook) for _ in range(19)] == _HUFF_MSG

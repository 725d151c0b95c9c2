"""API-surface parity checks (SURVEY Appendix A.1): constructor combos,
call-form dispatch, error contracts, random access."""

import numpy as np
import pytest

import constriction_tpu as c


def test_model_constructor_combinations():
    c.stream.model.CustomModel(
        lambda x, m, s: 0.5 * (1 + np.tanh((x - m) / s)),
        lambda q, m, s: m + s * np.arctanh(2 * q - 1),
        -10, 10,
    )
    import scipy.stats

    c.stream.model.ScipyModel(scipy.stats.norm(2.0, 5.0), -10, 10)
    c.stream.model.Categorical(np.array([0.2, 0.3, 0.5]), perfect=False)
    c.stream.model.Categorical(perfect=False)
    c.stream.model.Categorical(lazy=True)
    c.stream.model.Uniform(10)
    c.stream.model.Uniform()
    for cls, kw in [
        ("QuantizedGaussian", "std"),
        ("QuantizedLaplace", "scale"),
        ("QuantizedCauchy", "scale"),
    ]:
        K = getattr(c.stream.model, cls)
        K(-50, 50, 3.2, 9.6)  # both
        K(-50, 50)  # family
        K(-50, 50, 3.2)  # mean fixed
        K(-50, 50, **{kw: 9.6})  # scale fixed
    c.stream.model.Binomial(10, 0.3)
    c.stream.model.Binomial(10)
    c.stream.model.Binomial()
    c.stream.model.Binomial(p=0.3)
    c.stream.model.Bernoulli(0.3, perfect=False)
    c.stream.model.Bernoulli(perfect=False)


def test_scalar_symbol_encode_decode():
    m = c.stream.model.QuantizedGaussian(-50, 50, 3.2, 9.6)
    enc = c.stream.stack.AnsCoder()
    enc.encode_reverse(5, m)
    assert enc.decode(m) == 5


def test_scalar_symbol_with_family_params_errors():
    fam = c.stream.model.QuantizedGaussian(-50, 50)
    enc = c.stream.stack.AnsCoder()
    with pytest.raises((ValueError, TypeError)):
        enc.encode_reverse(5, fam, np.array([1.0]), np.array([2.0]))


def test_wrong_param_length_errors():
    fam = c.stream.model.QuantizedGaussian(-50, 50)
    enc = c.stream.stack.AnsCoder()
    with pytest.raises(ValueError):
        enc.encode_reverse(
            np.array([1, 2, 3], np.int32), fam,
            np.array([1.0, 2.0]), np.array([2.0, 1.0]),
        )


def test_empty_range_encoder_empty_output():
    assert len(c.stream.queue.RangeEncoder().get_compressed()) == 0


def test_range_random_access():
    m = c.stream.model.Categorical(np.array([0.2, 0.3, 0.5]), perfect=False)
    enc = c.stream.queue.RangeEncoder()
    enc.encode(np.array([0, 1, 2, 1] * 10, np.int32), m)
    snap = enc.pos()
    enc.encode(np.array([2, 2, 0, 1] * 10, np.int32), m)
    dec = c.stream.queue.RangeDecoder(enc.get_compressed())
    dec.seek(*snap)
    np.testing.assert_array_equal(dec.decode(m, 40), np.array([2, 2, 0, 1] * 10))


def test_ans_random_access():
    m = c.stream.model.Categorical(np.array([0.2, 0.3, 0.5]), perfect=False)
    enc = c.stream.stack.AnsCoder()
    enc.encode_reverse(np.array([2, 2, 0, 1] * 10, np.int32), m)
    snap = enc.pos()
    enc.encode_reverse(np.array([0, 1, 2, 1] * 10, np.int32), m)
    dec = enc.clone()
    dec.seek(*snap)
    np.testing.assert_array_equal(dec.decode(m, 40), np.array([2, 2, 0, 1] * 10))


def test_maybe_exhausted_and_num_valid_bits():
    m = c.stream.model.Categorical(np.array([0.5, 0.5]), perfect=False)
    enc = c.stream.queue.RangeEncoder()
    enc.encode(np.array([0, 1], np.int32), m)
    d = enc.get_decoder()
    d.decode(m, 2)
    assert d.maybe_exhausted()

    a = c.stream.stack.AnsCoder()
    a.encode_reverse(np.array([0, 1, 1], np.int32), m)
    assert 0 < a.num_valid_bits() <= a.num_bits()


def test_model_diagnostics_and_conversion():
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )

    m = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        np.array([0.2, 0.3, 0.5]), 24
    )
    assert abs(m.entropy_base2() - 1.485) < 0.01
    assert m.kl_divergence_base2([0.2, 0.3, 0.5]) >= 0
    assert m.cross_entropy_base2([0.2, 0.3, 0.5]) >= m.entropy_base2() - 1e-9
    lk = m.to_lookup_decoder_model() if hasattr(m, "to_lookup_decoder_model") else None
    if lk is not None:
        assert lk.qf(0)[0] == 0


def test_native_selftest_binary():
    """The native codec stands alone (the reference's ensure_no_std analog):
    build and run the self-test binary."""
    import os
    import shutil
    import subprocess
    import tempfile

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "constriction_tpu", "native", "selftest.cpp")
    with tempfile.TemporaryDirectory() as d:
        exe = os.path.join(d, "selftest")
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fopenmp", "-o", exe, src],
            check=True,
        )
        out = subprocess.run([exe], capture_output=True, text=True, check=True)
        assert "OK" in out.stdout


def test_raw_parts_roundtrip():
    """from_raw_parts/into_raw_parts expose exact coder internals
    (stack.rs:418-474, queue.rs:420-455 analogs)."""
    import numpy as np

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops.ans import AnsCoderCore
    from constriction_tpu.ops.range import RangeEncoderCore

    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.ones(20))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    )
    syms = rng.choice(20, size=300, p=probs).astype(np.int64)

    enc = AnsCoderCore()
    enc.encode_iid_symbols_reverse(syms, model)
    bulk, state = enc.into_raw_parts()
    enc2 = AnsCoderCore.from_raw_parts(bulk, state)
    np.testing.assert_array_equal(enc2.get_compressed(), enc.get_compressed())
    np.testing.assert_array_equal(
        enc2.decode_iid_symbols(len(syms), model), syms
    )

    renc = RangeEncoderCore()
    renc.encode_iid_symbols(syms, model)
    if renc.inverted is None:
        rb, rs = renc.into_raw_parts()
        renc2 = RangeEncoderCore.from_raw_parts(rb, rs)
        np.testing.assert_array_equal(
            renc2.get_compressed(), renc.get_compressed()
        )


def test_reference_exception_types():
    """Exceptions are catchable with the REFERENCE's exception types too:
    ImpossibleSymbol as KeyError (pybindings/stream/mod.rs:82-86),
    InvalidData / OutOfCompressedData / OutOfRemainders as AssertionError
    (queue.rs:676-684, chain.rs:520-538)."""
    import constriction_tpu as constriction
    from constriction_tpu.models.base import ImpossibleSymbol
    from constriction_tpu.ops.chain import (
        OutOfCompressedData,
        OutOfRemainders,
    )
    from constriction_tpu.ops.range import InvalidData

    assert issubclass(ImpossibleSymbol, KeyError)
    assert issubclass(ImpossibleSymbol, ValueError)
    assert issubclass(InvalidData, AssertionError)
    assert issubclass(OutOfCompressedData, AssertionError)
    assert issubclass(OutOfRemainders, AssertionError)

    m = constriction.stream.model.Categorical(
        np.array([0.5, 0.5]), perfect=False
    )
    dec = constriction.stream.queue.RangeDecoder(
        np.array([0xFFFFFFFF] * 4, dtype=np.uint32)
    )
    with pytest.raises(AssertionError):
        dec.decode(m, 50)


def test_seek_rejects_invalid_coder_state():
    import constriction_tpu as constriction

    dec = constriction.stream.queue.RangeDecoder(
        np.array([1, 2, 3], dtype=np.uint32)
    )
    with pytest.raises(ValueError, match="Invalid coder state"):
        dec.seek(0, (0, 0))


def test_word_inputs_do_not_wrap_silently():
    import constriction_tpu as constriction

    with pytest.raises(OverflowError, match="uint32"):
        constriction.stream.stack.AnsCoder(
            np.array([-1, 5], dtype=np.int64), seal=True
        )
    with pytest.raises(OverflowError, match="uint32"):
        constriction.stream.queue.RangeDecoder(
            np.array([2**33], dtype=np.int64)
        )
    with pytest.raises(TypeError, match="uint32"):
        constriction.stream.chain.ChainCoder(
            np.array([1.5, 2.5]), is_remainders=True
        )

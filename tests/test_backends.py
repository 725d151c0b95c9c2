"""Backend seam (constriction_tpu/backends.py): fixed-capacity Cursor
encode, callback sinks, iterator sources, and the WordBuffer bulk store.

Reference anchors: backends.rs:470-514 (Vec), 1061-1466 (Cursor),
1681-1861 (iterator sources / callback sinks), 807-849 (Reverse).
"""

import numpy as np
import pytest

from constriction_tpu.backends import (
    CallbackSink,
    CapacityError,
    QueueIterReader,
    StackIterReader,
    WordBuffer,
)
from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops.ans import AnsCoderCore
from constriction_tpu.ops.chain import ChainCoderCore
from constriction_tpu.ops.range import RangeDecoderCore, RangeEncoderCore


def _model(precision=24, K=50, seed=0):
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.ones(K))
    return ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, precision
    ), rng.choice(K, size=500, p=probs).astype(np.int64)


def test_word_buffer_protocol():
    b = WordBuffer()
    for i in range(100):
        b.append(i)
    assert len(b) == 100 and b[99] == 99 and b.pop() == 99 and len(b) == 99
    b.extend([7, 8, 9])
    assert b.tolist()[-3:] == [7, 8, 9]
    b.truncate(5)
    assert b.tolist() == [0, 1, 2, 3, 4]
    c = b.copy()
    c.append(77)
    assert len(b) == 5 and len(c) == 6
    np.testing.assert_array_equal(np.asarray(b, dtype=np.uint32),
                                  np.arange(5, dtype=np.uint32))


def test_fixed_capacity_overflow():
    b = WordBuffer(capacity=4, fixed=True)
    for i in range(4):
        b.append(i)
    with pytest.raises(CapacityError):
        b.append(4)
    with pytest.raises(CapacityError):
        b.extend([5, 6])


def test_ans_encode_into_preallocated():
    model, symbols = _model()
    ref = AnsCoderCore()
    ref.encode_iid_symbols_reverse(symbols, model)
    want = ref.get_compressed()

    cap = len(want) + 2
    coder = AnsCoderCore.with_write_backend(WordBuffer(capacity=cap, fixed=True))
    coder.encode_iid_symbols_reverse(symbols, model)
    np.testing.assert_array_equal(coder.get_compressed(), want)

    # too-small buffer errors instead of growing (Cursor semantics)
    tiny = AnsCoderCore.with_write_backend(WordBuffer(capacity=3, fixed=True))
    with pytest.raises(CapacityError):
        tiny.encode_iid_symbols_reverse(symbols, model)


def test_range_encode_into_preallocated():
    model, symbols = _model()
    ref = RangeEncoderCore()
    ref.encode_iid_symbols(symbols, model)
    want = ref.get_compressed()

    coder = RangeEncoderCore.with_write_backend(
        WordBuffer(capacity=len(want) + 2, fixed=True)
    )
    coder.encode_iid_symbols(symbols, model)
    np.testing.assert_array_equal(coder.get_compressed(), want)

    tiny = RangeEncoderCore.with_write_backend(WordBuffer(capacity=2, fixed=True))
    with pytest.raises(CapacityError):
        tiny.encode_iid_symbols(symbols, model)


def test_chain_encode_into_preallocated():
    model, symbols = _model()
    rng = np.random.RandomState(3)
    data = rng.randint(1, 1 << 32, size=200, dtype=np.uint32)
    dec = ChainCoderCore.from_binary(data)
    syms = dec.decode_iid_symbols(100, model)
    prefix, suffix = dec.into_remainders()

    ref = ChainCoderCore.from_remainders(suffix)
    ref.encode_iid_symbols_reverse(syms, model)
    want_pre, want_data = ref.into_binary()

    enc = ChainCoderCore.from_remainders(suffix)
    enc.compressed = WordBuffer(capacity=len(want_data) + 2, fixed=True)
    enc.encode_iid_symbols_reverse(syms, model)
    got_pre, got_data = enc.into_binary()
    np.testing.assert_array_equal(got_pre, want_pre)
    np.testing.assert_array_equal(got_data, want_data)


def test_callback_sink():
    model, symbols = _model()
    ref = AnsCoderCore()
    ref.encode_iid_symbols_reverse(symbols, model)
    want_bulk = list(ref.bulk)

    seen = []
    coder = AnsCoderCore.with_write_backend(CallbackSink(seen.append))
    coder.encode_iid_symbols_reverse(symbols, model)
    assert seen == want_bulk
    assert coder.state == ref.state


def test_range_decoder_iterator_source():
    model, symbols = _model()
    enc = RangeEncoderCore()
    enc.encode_iid_symbols(symbols, model)
    comp = enc.get_compressed()

    dec = RangeDecoderCore.from_word_iterator(iter(int(w) for w in comp))
    out = dec.decode_iid_symbols(len(symbols), model)
    np.testing.assert_array_equal(out, symbols)


def test_ans_reversed_iterator_source():
    model, symbols = _model()
    enc = AnsCoderCore()
    enc.encode_iid_symbols_reverse(symbols, model)
    comp = enc.get_compressed()

    dec = AnsCoderCore.from_reversed_compressed_iterator(
        int(w) for w in reversed(comp)
    )
    out = dec.decode_iid_symbols(len(symbols), model)
    np.testing.assert_array_equal(out, symbols)


@pytest.mark.parametrize(
    "W,S,P", [(32, 64, 24), (16, 32, 12), (16, 64, 16), (8, 16, 8)]
)
def test_grid_over_new_backends(W, S, P):
    """The (W, S, P) round-trip grid re-run with fixed-capacity write
    backends and iterator read sources."""
    K = min(50, (1 << P) - 1)
    model, symbols = _model(precision=P, K=K, seed=W * 100 + P)
    symbols = symbols[:200]

    ref = AnsCoderCore(W, S)
    ref.encode_iid_symbols_reverse(symbols, model)
    want = ref.get_compressed()
    coder = AnsCoderCore.with_write_backend(
        WordBuffer(capacity=len(want) + 4, fixed=True), W, S
    )
    coder.encode_iid_symbols_reverse(symbols, model)
    np.testing.assert_array_equal(coder.get_compressed(), want)
    dec = AnsCoderCore.from_reversed_compressed_iterator(
        (int(w) for w in reversed(want)), W, S
    )
    np.testing.assert_array_equal(
        dec.decode_iid_symbols(len(symbols), model), symbols
    )

    renc = RangeEncoderCore(W, S)
    renc.encode_iid_symbols(symbols, model)
    rwant = renc.get_compressed()
    rdec = RangeDecoderCore.from_word_iterator(
        (int(w) for w in rwant), W, S
    )
    np.testing.assert_array_equal(
        rdec.decode_iid_symbols(len(symbols), model), symbols
    )


def test_queue_iter_reader_memoizes_for_seek():
    model, symbols = _model()
    enc = RangeEncoderCore()
    enc.encode_iid_symbols(symbols, model)
    comp = enc.get_compressed()
    dec = RangeDecoderCore.from_word_iterator(iter(int(w) for w in comp))
    first = dec.decode_iid_symbols(100, model)
    pos, state = dec.pos()
    rest = dec.decode_iid_symbols(len(symbols) - 100, model)
    dec.seek(pos + dec.S // dec.W - (dec.S // dec.W), state)  # back to snapshot
    dec.seek(pos, state)
    rest2 = dec.decode_iid_symbols(len(symbols) - 100, model)
    np.testing.assert_array_equal(rest, rest2)
    np.testing.assert_array_equal(np.concatenate([first, rest]), symbols)


# ---------------------------------------------------------------------------
# Round-2 review regression tests (coder cores + backends)
# ---------------------------------------------------------------------------


def test_range_encode_tables_with_pending_inverted_run():
    """The native batch encoder used to size its buffer without the pending
    Inverted words (heap overflow / segfault for a long pending run); the
    output must equal the scalar path's."""
    model, symbols = _model()

    def build(with_native_batch):
        enc = RangeEncoderCore()
        # a long pending Inverted run: cum at the top of the interval keeps
        # the interval straddling the wrap point
        for _ in range(1000):
            enc._encode_cp((1 << 24) - 1, 1, 24)
        assert enc.inverted is not None and enc.inverted[0] > 100
        if with_native_batch:
            enc.encode_iid_symbols(symbols, model)  # >= 64 -> native path
        else:
            for s in symbols:
                enc.encode_symbol(int(s), model)
        return enc.get_compressed()

    np.testing.assert_array_equal(build(True), build(False))


def test_coder_rejects_incompatible_model_precision():
    """A 'small'-preset coder (W=16, S=32) with a default precision-24
    model used to silently corrupt the stream; now it errors up front."""
    model, symbols = _model(precision=24)
    small_ans = AnsCoderCore(16, 32)
    with pytest.raises(ValueError, match="incompatible"):
        small_ans.encode_iid_symbols_reverse(symbols[:5], model)
    small_rng = RangeEncoderCore(16, 32)
    with pytest.raises(ValueError, match="incompatible"):
        small_rng.encode_iid_symbols(symbols[:5], model)


def test_range_callback_sink_batch_encode():
    """CallbackSink-backed range encoders fall back to the scalar path for
    batch calls instead of crashing on the missing .view()."""
    model, symbols = _model()
    words = []
    enc = RangeEncoderCore.with_write_backend(CallbackSink(words.append))
    enc.encode_iid_symbols(symbols, model)  # >= 64 symbols
    ref = RangeEncoderCore()
    ref.encode_iid_symbols(symbols, model)
    np.testing.assert_array_equal(
        np.array(words + enc._seal_words(), dtype=np.uint64),
        ref.get_compressed().astype(np.uint64),
    )
    with pytest.raises(ValueError, match="write-only"):
        enc.clone()


def test_fixed_word_buffer_copy_keeps_capacity():
    wb = WordBuffer(capacity=100, fixed=True)
    for i in range(10):
        wb.append(i)
    c = wb.copy()
    for i in range(90):
        c.append(i)  # must not raise: the clone kept the headroom
    with pytest.raises(CapacityError):
        c.append(1)


def test_range_decoder_pos_seek_short_stream():
    """pos()/seek() round-trips even when the stream is shorter than S/W
    words (pos used to go negative and seek() rejected it)."""
    model, _ = _model(precision=12, K=4, seed=3)
    enc = RangeEncoderCore()
    enc.encode_symbol(1, model)
    comp = enc.get_compressed()
    dec = RangeDecoderCore.from_compressed(comp)
    p, st = dec.pos()
    assert p >= 0
    first = dec.decode_symbol(model)
    dec.seek(p, st)
    assert dec.decode_symbol(model) == first


def test_native_and_scalar_error_states_agree():
    """After InvalidData, the coder state must not depend on whether the
    native batch path or the per-symbol Python path decoded."""
    from constriction_tpu.models.categorical import (
        ContiguousLookupDecoderModel,
    )
    from constriction_tpu.ops.range import InvalidData

    base, _ = _model(precision=12, K=50, seed=4)
    model = ContiguousLookupDecoderModel(base.cdf, 12)
    assert isinstance(getattr(model, "lookup", None), np.ndarray) or hasattr(
        model, "inner"
    ), "test needs a lookup-table model to reach the native path"
    garbage = np.full(300, 0xFFFFFFFF, dtype=np.uint64)

    dec_n = RangeDecoderCore.from_compressed(garbage)
    try:
        dec_n.decode_iid_symbols(200, model)  # native (amt >= 64, P <= 16)
        state_n = None
    except InvalidData:
        state_n = (dec_n.lower, dec_n.range, dec_n.point, dec_n.cursor)

    dec_s = RangeDecoderCore.from_compressed(garbage)
    try:
        for _ in range(200):
            dec_s.decode_symbol(model)
        state_s = None
    except InvalidData:
        state_s = (dec_s.lower, dec_s.range, dec_s.point, dec_s.cursor)

    assert state_n == state_s and state_n is not None

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

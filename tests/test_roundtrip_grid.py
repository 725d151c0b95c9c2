"""Port of the reference's integration matrix (tests/random_data.rs:49-192):
generic encoder/decoder round trips over random Gaussian-modeled data,
instantiated over a grid of (word_bits, state_bits, precision) combos and
several message sizes, for all three stream coders.
"""

import numpy as np
import pytest

from constriction_tpu.models.quantized import Gaussian, LeakyQuantizer, QuantizedFamily
from constriction_tpu.ops.ans import AnsCoderCore
from constriction_tpu.ops.chain import ChainCoderCore
from constriction_tpu.ops.range import RangeDecoderCore, RangeEncoderCore

# (word_bits, state_bits, precision) -- the full reference `batch!` matrix
# (tests/random_data.rs:158-192: every (Word, State) pair it instantiates,
# with the same precision lists), plus odd widths the reference cannot
# express (non-power-of-two 24/48-bit states).
COMBOS = [
    # State = 128 bits
    (64, 128, 8), (64, 128, 12), (64, 128, 16), (64, 128, 24), (64, 128, 32),
    (32, 128, 8), (32, 128, 12), (32, 128, 16), (32, 128, 24), (32, 128, 32),
    (16, 128, 8), (16, 128, 12), (16, 128, 16),
    (8, 128, 8),
    # State = 64 bits
    (32, 64, 8), (32, 64, 12), (32, 64, 16), (32, 64, 24), (32, 64, 32),
    (16, 64, 8), (16, 64, 12), (16, 64, 16), (16, 64, 24),
    (8, 64, 8),
    # State = 32 bits
    (16, 32, 8), (16, 32, 12), (16, 32, 16),
    (8, 32, 8), (8, 32, 24),
    # State = 16 bits (P = W edge case)
    (8, 16, 8),
    # odd widths: 24/48-bit states, u8 words with wide precisions
    (8, 24, 8), (8, 24, 16), (8, 48, 8), (16, 48, 12), (16, 48, 16),
]

SIZES = [0, 1, 2, 17, 1000]


def _random_message(rng, n, precision):
    amt = max(1 << (precision // 2), 4)
    means = rng.uniform(-30.0, 30.0, size=n)
    stds = rng.uniform(0.5, 20.0, size=n)
    symbols = np.clip(np.round(rng.normal(means, stds)), -64, 63).astype(np.int64)
    return symbols, means, stds


def _models(means, stds, precision):
    quantizer = LeakyQuantizer(-64, 63, precision)
    return [quantizer.quantize(Gaussian(m, s)) for m, s in zip(means, stds)]


@pytest.mark.parametrize("word_bits,state_bits,precision", COMBOS)
@pytest.mark.parametrize("n", SIZES)
def test_ans_grid(word_bits, state_bits, precision, n):
    if precision > word_bits or state_bits < word_bits + precision:
        pytest.skip("invalid combo")
    rng = np.random.RandomState(precision * 1000 + n)
    symbols, means, stds = _random_message(rng, n, precision)
    models = _models(means, stds, precision)

    coder = AnsCoderCore(word_bits, state_bits)
    for s, m in zip(reversed(symbols), reversed(models)):
        coder.encode_symbol(int(s), m)
    compressed = coder.get_compressed()

    dec = AnsCoderCore.from_compressed(compressed, word_bits, state_bits)
    out = [dec.decode_symbol(m) for m in models]
    assert out == list(symbols)
    assert dec.is_empty()


@pytest.mark.parametrize("word_bits,state_bits,precision", COMBOS)
@pytest.mark.parametrize("n", SIZES)
def test_range_grid(word_bits, state_bits, precision, n):
    if precision > word_bits or state_bits < word_bits + precision or state_bits % word_bits:
        pytest.skip("invalid combo")
    rng = np.random.RandomState(precision * 1000 + n + 1)
    symbols, means, stds = _random_message(rng, n, precision)
    models = _models(means, stds, precision)

    enc = RangeEncoderCore(word_bits, state_bits)
    for s, m in zip(symbols, models):
        enc.encode_symbol(int(s), m)
    compressed = enc.get_compressed()
    assert len(compressed) == enc.num_words()

    dec = RangeDecoderCore.from_compressed(compressed, word_bits, state_bits)
    out = [dec.decode_symbol(m) for m in models]
    assert out == list(symbols)


@pytest.mark.parametrize(
    "word_bits,state_bits,precision",
    [(32, 64, 32), (32, 64, 24), (32, 64, 16), (32, 64, 8), (16, 32, 16),
     (16, 32, 12), (8, 16, 8), (8, 24, 8), (16, 48, 16), (64, 128, 32)],
)
@pytest.mark.parametrize("n", [0, 1, 10, 100])
def test_chain_grid(word_bits, state_bits, precision, n):
    rng = np.random.RandomState(precision * 100 + n + 2)
    symbols, means, stds = _random_message(rng, n, precision)
    models = _models(means, stds, precision)

    data = rng.randint(0, 1 << min(word_bits, 31), size=n + 2 * (state_bits // word_bits) + 4).astype(
        np.uint64
    ) | 1  # keep words nonzero-ish; last word nonzero required
    coder = ChainCoderCore.from_binary(data, word_bits, state_bits, precision)
    decoded = [coder.decode_symbol(m) for m in models]
    # re-encode in reverse restores the original data
    for s, m in zip(reversed(decoded), reversed(models)):
        coder.encode_symbol(int(s), m)
    prefix, suffix = coder.into_binary()
    rec = np.concatenate([prefix, suffix]).astype(np.uint64)
    assert np.array_equal(rec, data)


def test_stack_vs_queue_bitrates():
    """The reference prints stack-vs-queue bitrate comparisons
    (random_data.rs:96-192); here we assert both are within 2% of entropy."""
    rng = np.random.RandomState(99)
    n = 5000
    means = rng.uniform(-30.0, 30.0, size=n)
    stds = rng.uniform(3.0, 20.0, size=n)
    symbols = np.clip(np.round(rng.normal(means, stds)), -64, 63).astype(np.int64)
    fam = QuantizedFamily("gaussian", -64, 63, means, stds, 24)

    cums, probs = fam.ecp_all(symbols)
    info = -np.sum(np.log2(probs.astype(np.float64) / (1 << 24)))

    ans = AnsCoderCore()
    ans.encode_symbols_reverse(symbols, fam)
    ans_bits = ans.num_valid_bits()

    renc = RangeEncoderCore()
    renc.encode_symbols(symbols, fam)
    range_bits = renc.num_bits()

    assert ans_bits <= info * 1.02 + 64
    assert range_bits <= info * 1.02 + 64
    assert np.array_equal(ans.clone().decode_symbols(fam), symbols)
    assert np.array_equal(renc.get_decoder().decode_symbols(fam), symbols)

"""Tests for the lane-interleaved rANS format (ILANS): numpy host path,
JAX path, cross-implementation equality, and per-lane compatibility with the
exact scalar coder."""

import numpy as np
import pytest

from constriction_tpu.models.categorical import ContiguousCategoricalEntropyModel
from constriction_tpu.ops import jax_coder
from constriction_tpu.ops.ans import AnsCoderCore
from constriction_tpu.ops.interleaved import (
    DEFAULT,
    SMALL,
    LaneConfig,
    decode_iid_categorical,
    encode_interleaved,
    encode_iid_categorical,
    pack_container,
    unpack_container,
)


def _make_model(seed=1234, alphabet=100, precision=12):
    rng = np.random.RandomState(seed)
    probs = rng.dirichlet(np.ones(alphabet))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, precision
    )
    return rng, probs, model


@pytest.mark.parametrize("num_lanes", [1, 2, 64, 128])
@pytest.mark.parametrize("n", [0, 1, 63, 64, 10007])
def test_host_roundtrip(num_lanes, n):
    rng, probs, model = _make_model()
    symbols = rng.choice(100, size=n, p=probs)
    cfg = LaneConfig(num_lanes=num_lanes, word_bits=16, state_bits=32, precision=12)
    data = encode_iid_categorical(symbols, model.cdf, cfg)
    out = decode_iid_categorical(data, model.cdf)
    assert np.array_equal(out, symbols)


def test_default_preset_roundtrip():
    rng, probs, model = _make_model(precision=24)
    symbols = rng.choice(100, size=4099, p=probs)
    cfg = LaneConfig(num_lanes=32, word_bits=32, state_bits=64, precision=24)
    data = encode_iid_categorical(symbols, model.cdf, cfg)
    assert np.array_equal(decode_iid_categorical(data, model.cdf), symbols)


def test_lanes_scalar_compatible():
    """Every lane's stream must be decodable by the exact scalar AnsCoder."""
    rng, probs, model = _make_model()
    symbols = rng.choice(100, size=2003, p=probs)
    cfg = LaneConfig(num_lanes=16, word_bits=16, state_bits=32, precision=12)
    data = encode_iid_categorical(symbols, model.cdf, cfg)
    words, counts, n, cfg2 = unpack_container(data)
    for lane in range(16):
        lane_syms = symbols[lane::16]
        dec = AnsCoderCore.from_compressed(
            words[lane, : counts[lane]], word_bits=16, state_bits=32
        )
        model12 = model  # precision 12
        got = dec.decode_iid_symbols(len(lane_syms), model12)
        assert np.array_equal(got, lane_syms)
        assert dec.is_empty()


def test_container_roundtrip():
    rng, probs, model = _make_model()
    symbols = rng.choice(100, size=777, p=probs)
    cfg = LaneConfig(num_lanes=8, word_bits=16, state_bits=32, precision=12)
    cdf64 = model.cdf.astype(np.uint64)
    words, counts = encode_interleaved(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    data = pack_container(words, counts, len(symbols), cfg)
    w2, c2, n2, cfg2 = unpack_container(data)
    assert n2 == len(symbols) and cfg2 == cfg
    assert np.array_equal(c2, counts)
    for l in range(8):
        assert np.array_equal(w2[l, : c2[l]], words[l, : counts[l]])


def test_jax_matches_host():
    import jax.numpy as jnp

    rng, probs, model = _make_model()
    symbols = rng.choice(100, size=10007, p=probs)
    cdf = model.cdf
    cfg = LaneConfig(num_lanes=64, word_bits=16, state_bits=32, precision=12)

    cdf64 = cdf.astype(np.uint64)
    w_np, c_np = encode_interleaved(cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg)
    w_jx, c_jx = jax_coder.jax_encode_iid_categorical(symbols, cdf, cfg)
    w_jx, c_jx = np.asarray(w_jx), np.asarray(c_jx)
    assert np.array_equal(c_np, c_jx)
    for l in range(64):
        assert np.array_equal(w_np[l, : c_np[l]], w_jx[l, : c_jx[l]])

    T = -(-len(symbols) // 64)
    lookup = np.repeat(
        np.arange(100, dtype=np.uint32), np.diff(cdf.astype(np.int64))
    )
    packed = jax_coder.pack_cdf_u32(cdf)
    out = jax_coder.jax_decode_lookup(
        jnp.asarray(w_jx),
        jnp.asarray(c_jx),
        jnp.asarray(lookup),
        jnp.asarray(packed),
        cfg,
        T,
        len(symbols),
    )
    assert np.array_equal(np.asarray(out)[: len(symbols)], symbols)


def test_sharded_roundtrip():
    import jax
    import jax.numpy as jnp

    from constriction_tpu import parallel

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    rng, probs, model = _make_model(seed=7)
    cdf = model.cdf
    symbols = rng.choice(100, size=65521, p=probs)
    cfg = LaneConfig(num_lanes=128, word_bits=16, state_bits=32, precision=12)
    D = 4
    mesh = parallel.make_mesh(D)
    cums, probs_t, lens, T = parallel.prepare_blocks(symbols, cdf, D, cfg)
    words, counts = parallel.shard_encode(
        mesh, jnp.asarray(cums), jnp.asarray(probs_t), jnp.asarray(lens), cfg, T, T + 2
    )
    lookup = jnp.asarray(
        np.repeat(np.arange(100, dtype=np.uint32), np.diff(cdf.astype(np.int64)))
    )
    packed = jnp.asarray(jax_coder.pack_cdf_u32(cdf))
    out = np.asarray(
        parallel.shard_decode_lookup(
            mesh, words, counts, jnp.asarray(lens), lookup, packed, cfg, T
        )
    )
    rec = np.concatenate([out[d, : lens[d]] for d in range(D)])
    assert np.array_equal(rec, symbols)

    # Per-block streams identical to the host encoder (mesh-shape independent).
    blk = symbols[: lens[0]]
    cdf64 = cdf.astype(np.uint64)
    w_np, c_np = encode_interleaved(cdf64[blk], cdf64[blk + 1] - cdf64[blk], cfg)
    w0, c0 = np.asarray(words)[0], np.asarray(counts)[0]
    assert np.array_equal(c_np, c0)
    for l in range(cfg.num_lanes):
        assert np.array_equal(w_np[l, : c_np[l]], w0[l, : c0[l]])

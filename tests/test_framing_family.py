"""v2 container framing for reference-exact per-symbol families
(ops/framing_family.py): round trips, rate improvement over the raw
(states, stream) form, the compact-only short-message path, and the
facade pair.  Reference framing counterpart: stack.rs:891-895 (state
appended to the stream) + lib.rs:719-730 (container layout)."""

import numpy as np
import pytest

from constriction_tpu.ops.interleaved import LaneConfig
from constriction_tpu.ops import exact_family as ef
from constriction_tpu.ops import framing as fr
from constriction_tpu.ops import framing_family as ff

CFG = LaneConfig(num_lanes=256, word_bits=32, state_bits=64, precision=24)


def _batch(rng, n, family):
    if family == "binomial":
        nt = 40
        p = np.clip(rng.beta(2, 2, size=n), 0.05, 0.95)
        syms = rng.binomial(nt, p).astype(np.int64)
        return np.full(n, float(nt)), p, syms, 0, nt
    means = rng.randn(n) * 20
    scales = np.exp(rng.normal(0.5, 0.4, size=n))
    syms = np.clip(
        np.round(means + scales * rng.randn(n)), -60, 60
    ).astype(np.int64)
    return means, scales, syms, -60, 60


@pytest.mark.parametrize("family", sorted(ef._EST_C))
def test_family_v2_round_trip(family):
    rng = np.random.RandomState(7)
    means, scales, syms, lo, hi = _batch(rng, 3000, family)
    cont = ff.encode_family_v2(syms, means, scales, family, lo, hi, CFG)
    assert fr.container_version(cont) == 2
    out = ff.decode_family_v2(cont, means, scales, family, lo, hi)
    assert np.array_equal(out, syms)


@pytest.mark.parametrize("family", ["gaussian", "laplace"])
def test_family_v2_beats_raw_framing(family):
    """The v2 container must be strictly smaller than the raw grouped
    (states, stream) form (L*S-bit state header)."""
    rng = np.random.RandomState(11)
    means, scales, syms, lo, hi = _batch(rng, 4000, family)
    cont = ff.encode_family_v2(syms, means, scales, family, lo, hi, CFG)
    _st, strm = ef.encode_family_exact_grouped(
        syms, means, scales, family, lo, hi, CFG
    )
    raw_bits = len(np.asarray(strm)) * 32 + CFG.num_lanes * 64
    assert len(cont) * 32 < raw_bits


def test_family_v2_short_message_compact_only():
    """Short messages skip the region split (k_B == 0) but still pack
    states compactly."""
    rng = np.random.RandomState(13)
    means, scales, syms, lo, hi = _batch(rng, 300, "gaussian")
    cont = ff.encode_family_v2(syms, means, scales, "gaussian", lo, hi, CFG)
    p = fr.parse_v2(np.asarray(cont))
    assert p.k_B == 0
    out = ff.decode_family_v2(cont, means, scales, "gaussian", lo, hi)
    assert np.array_equal(out, syms)


def test_family_v2_region_split_engages():
    """Long low-ish-entropy messages must actually use the recovered-seed
    tail (k_B > 0) -- otherwise the rate win is only the packed states."""
    rng = np.random.RandomState(17)
    n = 40000
    means = rng.randn(n) * 5
    scales = np.full(n, 0.3)
    syms = np.clip(
        np.round(means + scales * rng.randn(n)), -60, 60
    ).astype(np.int64)
    cont = ff.encode_family_v2(syms, means, scales, "gaussian", -60, 60, CFG)
    p = fr.parse_v2(np.asarray(cont))
    assert p.k_B > 0
    out = ff.decode_family_v2(cont, means, scales, "gaussian", -60, 60)
    assert np.array_equal(out, syms)


def test_family_v2_wrong_model_count_raises():
    rng = np.random.RandomState(19)
    means, scales, syms, lo, hi = _batch(rng, 1000, "gaussian")
    cont = ff.encode_family_v2(syms, means, scales, "gaussian", lo, hi, CFG)
    with pytest.raises(ValueError, match="models given"):
        ff.decode_family_v2(cont, means[:-1], scales[:-1], "gaussian", lo, hi)


def test_facade_container_pair():
    import constriction_tpu.tpu as ctpu

    rng = np.random.RandomState(23)
    means, scales, syms, lo, hi = _batch(rng, 2000, "gaussian")
    cont = ctpu.encode_family_exact_container(
        syms, means, scales, "gaussian", lo, hi
    )
    out = ctpu.decode_family_exact_container(
        cont, means, scales, "gaussian", lo, hi
    )
    assert np.array_equal(out, syms)

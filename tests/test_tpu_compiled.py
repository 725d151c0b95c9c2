"""Compiled-TPU kernel gate: every Pallas kernel compiled through Mosaic.

The CPU suite runs kernels through the Pallas interpreter, which does not
enforce Mosaic lowering restrictions (no unsigned reductions, no 16-bit
compares/rotates, 8-aligned sublane shapes for dynamic rotates, ...).  This
module compiles and round-trips every kernel on the attached chip:

    CTPU_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -v

Run it before every bench capture and after touching any kernel.  All tests
skip automatically when no TPU is attached (so the default CPU suite stays
green everywhere).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (run with CTPU_TPU_TESTS=1)")
    return jax


@pytest.fixture(scope="module")
def workload():
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(0)
    L, n = 1024, 5000
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    probs = rng.dirichlet(np.full(60, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    symbols = rng.choice(60, size=n, p=probs).astype(np.int64)
    return rng, L, n, cfg, model.cdf, symbols


def test_rans_encode_decode(tpu, workload):
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc

    rng, L, n, cfg, cdf, symbols = workload
    cdf64 = cdf.astype(np.uint64)
    st, w = pc.encode_iid_pallas(symbols, cdf, cfg)
    ref_st, ref_w = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    np.testing.assert_array_equal(np.asarray(st), ref_st)
    np.testing.assert_array_equal(np.asarray(w), ref_w)
    out = np.asarray(pc.decode_shared_pallas(ref_st, ref_w, cdf, cfg, n))
    np.testing.assert_array_equal(out, symbols)


@pytest.mark.parametrize("K", [1000, 4096])
def test_rans_decode_bitmap_large_alphabet(tpu, workload, K):
    """The bitmap-rank inversion (K > 255) through Mosaic: variable shifts,
    u32 popcount multiplies, constant-select trees."""
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(K)
    cfg = LaneConfig(num_lanes=1024, word_bits=16, state_bits=32, precision=12)
    extra = rng.multinomial((1 << 12) - K, rng.dirichlet(np.full(K, 2.0)))
    cdf = np.concatenate([[0], np.cumsum(1 + extra)]).astype(np.uint32)
    p = (cdf[1:] - cdf[:-1]) / 4096.0
    symbols = rng.choice(K, size=5000, p=p).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)
    st, w = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    out = np.asarray(pc.decode_shared_pallas(st, w, cdf, cfg, len(symbols)))
    np.testing.assert_array_equal(out, symbols)


def test_rans_segmented_p16(tpu):
    """P=16 keeps the segmented compare-sum path (bitmap gated P <= 15)."""
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(3)
    cfg = LaneConfig(num_lanes=512, word_bits=16, state_bits=32, precision=16)
    probs = rng.dirichlet(np.full(700, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    cdf = model.cdf
    symbols = rng.choice(700, size=4000, p=probs).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)
    st, w = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    out = np.asarray(pc.decode_shared_pallas(st, w, cdf, cfg, len(symbols)))
    np.testing.assert_array_equal(out, symbols)


def test_range_encode_decode_and_detection(tpu, workload):
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops import pallas_range_enc as pre

    rng, L, n, cfg, cdf, symbols = workload
    pts, rw = pre.encode_iid_range_pallas(symbols, cdf, cfg)
    ref_pts, ref_rw = il2.encode_iid_categorical_range(symbols, cdf, cfg)
    np.testing.assert_array_equal(pts, ref_pts)
    np.testing.assert_array_equal(rw, ref_rw)
    out = np.asarray(pc.decode_shared_range_pallas(pts, rw, cdf, cfg, n))
    np.testing.assert_array_equal(out, symbols)
    with pytest.raises(ValueError):
        pc.decode_shared_range_pallas(
            np.full_like(np.asarray(pts), 0xFFFFFFFF), rw, cdf, cfg, n
        )


def test_device_families(tpu, workload):
    from constriction_tpu.ops import pallas_family as pf

    rng, L, n, cfg, cdf, symbols = workload
    means = (rng.randn(n) * 10).astype(np.float32)
    scales = (0.5 + np.abs(rng.randn(n)) * 3).astype(np.float32)
    fsyms = np.clip(
        np.round(means + rng.randn(n) * scales), -100, 100
    ).astype(np.int32)
    for family in pf.FAMILIES:
        fst, fw = pf.encode_family_pallas(
            fsyms, means, scales, family, -100, 100, cfg
        )
        fout = np.asarray(
            pf.decode_family_pallas(
                np.asarray(fst), np.asarray(fw), means, scales,
                family, -100, 100, cfg, n,
            )
        )
        np.testing.assert_array_equal(fout, fsyms, err_msg=family)


def test_tchain16_bits_back(tpu, workload):
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import tchain
    from constriction_tpu.ops.interleaved import LaneConfig

    rng, L, n, cfg, cdf, symbols = workload
    probs = np.diff(cdf.astype(np.int64)) / 4096.0
    m16 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    data16 = rng.randint(0, 1 << 16, size=2 * L).astype(np.uint16)
    cfg16 = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=16)
    syms16, rem, heads = tchain.tchain_decode_pallas(data16, m16.cdf, cfg16)
    q2, h2 = tchain.tchain_encode_pallas(syms16, rem, heads, m16.cdf, cfg16)
    np.testing.assert_array_equal(q2, data16)
    assert np.all(np.asarray(h2) == 1)


def test_tchain12_family_bits_back(tpu, workload):
    from constriction_tpu.ops import tchain

    rng, L, n, cfg, cdf, symbols = workload
    data12 = rng.randint(0, 1 << 12, size=2 * L).astype(np.uint16)
    m12 = (rng.randn(2 * L) * 10).astype(np.float32)
    s12 = (0.5 + np.abs(rng.randn(2 * L)) * 3).astype(np.float32)
    syms12, rem12, heads12 = tchain.tchain12_family_decode_pallas(
        data12, m12, s12, "gaussian", -100, 100, cfg
    )
    q12, h12 = tchain.tchain12_family_encode_pallas(
        syms12, rem12, heads12, m12, s12, "gaussian", -100, 100, cfg
    )
    np.testing.assert_array_equal(q12, data12)
    assert np.all(np.asarray(h12) == 16)


def test_sharded_container_on_chip(tpu, workload):
    """parallel.encode/decode on the (single-chip) device mesh."""
    from constriction_tpu import parallel
    from constriction_tpu.ops.interleaved import LaneConfig

    rng, L, n, cfg, cdf, symbols = workload
    cfg_c = LaneConfig(num_lanes=128, word_bits=16, state_bits=32, precision=12)
    cont = parallel.encode(symbols, cdf, cfg=cfg_c, num_blocks=4, device=True)
    out = parallel.decode(cont, cdf, device=True)
    np.testing.assert_array_equal(out, symbols)
    cont_h = parallel.encode(symbols, cdf, cfg=cfg_c, num_blocks=4, device=False)
    np.testing.assert_array_equal(cont, cont_h)


def test_exact_family_reference_exact(tpu, workload):
    """Reference-exact family path: host f64 LeakyQuantizer tables, device
    coding (ops/exact_family.py) -- encode bit-exact vs the host encoder,
    decode recovers the symbols."""
    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops import interleaved2 as il2

    rng, L, n, cfg, cdf, symbols = workload
    means = rng.uniform(-60, 60, n)
    scales = np.exp(rng.uniform(np.log(0.3), np.log(5.0), n))
    fsyms = np.clip(
        np.round(means + rng.randn(n) * scales), -100, 100
    ).astype(np.int64)
    cums, probs = ef.exact_ecp(fsyms, means, scales, "gaussian", -100, 100,
                               cfg.precision)
    ref_st, ref_w = il2.encode_shared(
        cums.astype(np.uint64), probs.astype(np.uint64), cfg
    )
    st, w = ef.encode_family_exact(
        fsyms, means, scales, "gaussian", -100, 100, cfg
    )
    np.testing.assert_array_equal(np.asarray(st), ref_st)
    np.testing.assert_array_equal(np.asarray(w), ref_w)
    out = np.asarray(
        ef.decode_family_exact(
            ref_st, ref_w, means, scales, "gaussian", -100, 100, cfg, n,
            cmax=128,
        )
    )
    np.testing.assert_array_equal(out, fsyms)


def test_default_preset_64(tpu, workload):
    """ILANS2-64 (W=32/S=64/P=24) encode + decode compiled through Mosaic."""
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder64 as pc64
    from constriction_tpu.ops.interleaved import LaneConfig

    rng, L, n, _cfg, _cdf, _symbols = workload
    cfg64 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    probs = rng.dirichlet(np.full(60, 2.0))
    cdf24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    ).cdf
    symbols = rng.choice(60, size=n, p=probs).astype(np.int64)
    cdf64b = cdf24.astype(np.uint64)
    ref_st, ref_w = il2.encode_shared(
        cdf64b[symbols], cdf64b[symbols + 1] - cdf64b[symbols], cfg64
    )
    st, w = pc64.encode_iid64_pallas(symbols, cdf24, cfg64)
    np.testing.assert_array_equal(st, ref_st)
    np.testing.assert_array_equal(np.asarray(w), ref_w)
    out = pc64.decode_shared64_pallas(ref_st, ref_w, cdf24, cfg64, n)
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_default_preset_range64(tpu, workload):
    """ILANS2-R64 (W=32/S=64/P=24 range coding) decode compiled through
    Mosaic; host C++ encode with u64 points."""
    from constriction_tpu import native
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder64 as pc64
    from constriction_tpu.ops.interleaved import LaneConfig

    if native.LIB is None:
        pytest.skip("needs the native codec")
    rng, L, n, _cfg, _cdf, _symbols = workload
    cfg = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    probs = rng.dirichlet(np.full(60, 2.0))
    cdf24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    ).cdf
    symbols = rng.choice(60, size=n, p=probs).astype(np.int64)
    pts, w = il2.encode_iid_categorical_range(symbols, cdf24, cfg)
    out = pc64.decode_shared_range64_pallas(pts, w, cdf24, cfg, n)
    np.testing.assert_array_equal(np.asarray(out), symbols)
    # device-side ENCODER (two-phase big-number carry resolution) bit-exact
    from constriction_tpu.ops import pallas_range_enc as pre

    pts_d, w_d = pre.encode_iid_range64_pallas(symbols, cdf24, cfg)
    np.testing.assert_array_equal(pts_d, pts)
    np.testing.assert_array_equal(np.asarray(w_d), w)


def test_tchain24_bits_back(tpu, workload):
    """TChain-24 (DEFAULT-precision bits-back) compiled through Mosaic."""
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import tchain
    from constriction_tpu.ops.interleaved import LaneConfig

    rng, L, n, _cfg, _cdf, _symbols = workload
    cfg24 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    probs = rng.dirichlet(np.full(60, 2.0))
    cdf24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    ).cdf
    data = rng.randint(0, 1 << 24, size=2 * L).astype(np.uint32)
    syms, rem, heads = tchain.tchain24_decode_pallas(data, cdf24, cfg24)
    rs, rr, rh = tchain.tchain24_decode_host(data, cdf24, cfg24)
    np.testing.assert_array_equal(np.asarray(syms), rs)
    np.testing.assert_array_equal(np.asarray(rem), rr)
    np.testing.assert_array_equal(heads, rh)
    q2, h2 = tchain.tchain24_encode_pallas(syms, rem, heads, cdf24, cfg24)
    np.testing.assert_array_equal(q2, data)
    assert np.all(h2 == 256)


def test_exact_family_grouped_multichunk(tpu):
    """Core-size-grouped exact decode compiled through Mosaic with the
    chunked table DMA active: a heavy-tailed scale mix at L=32768 forces a
    multi-segment plan whose widest segment streams its boundary planes in
    several chunks (exceeding the whole-table VMEM budget that capped the
    pre-chunking kernels)."""
    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(77)
    L = 32768
    n = 3 * L + 1000
    means = rng.uniform(-60, 60, n)
    # bimodal scales: mostly tight cores plus a wide-core tail
    scales = np.where(
        rng.rand(n) < 0.9,
        np.exp(rng.normal(0.4, 0.3, n)),
        np.exp(rng.normal(2.6, 0.2, n)),
    )
    syms = np.clip(
        np.round(means + rng.randn(n) * scales), -100, 100
    ).astype(np.int64)
    cfg = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    perm, segs = ef.group_plan(
        means, scales, "gaussian", -100, 100, 24, L, n
    )
    assert len(segs) >= 2
    widest = max(w for _, _, w in segs)
    G = widest // 4
    assert G > ef._table_gchunk(L // 128, G), "workload must force chunking"
    st, w = ef.encode_family_exact_grouped(
        syms, means, scales, "gaussian", -100, 100, cfg
    )
    out = ef.decode_family_exact_grouped(
        st, np.asarray(w), means, scales, "gaussian", -100, 100, cfg, n
    )
    np.testing.assert_array_equal(out, syms)


@pytest.mark.tpu
def test_device_table_builder_on_chip(tpu):
    """The on-device exact-table builder (XLA-emulated f64 on TPU) must
    reproduce the host builder bit-for-bit on the real chip, and the
    grouped decode must round-trip through it."""
    from constriction_tpu import native
    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops.interleaved import LaneConfig

    if native.LIB is None:
        pytest.skip("native library unavailable")
    assert ef._device_builder_canary(), "device-builder canary failed on TPU"
    rng = np.random.RandomState(99)
    R, nsteps = 2, 2
    n = nsteps * R * 128
    means = rng.randn(n) * 30
    scales = np.exp(rng.normal(0.4, 0.8, n))
    for fam in ("gaussian", "laplace", "cauchy"):
        nc = ef.exact_ncore(means, scales, fam, -100, 100, 24)
        cmax = min(max(int(nc.max()), 1), 255)
        host, ch = ef.packed_tables_device(
            means, scales, fam, -100, 100, 24, cmax, nsteps, R)
        built = ef.packed_tables_on_device(
            means, scales, fam, -100, 100, 24, cmax, nsteps, R)
        assert built is not None
        np.testing.assert_array_equal(host, np.asarray(built[0]))
    cfg = LaneConfig(num_lanes=256, word_bits=32, state_bits=64,
                     precision=24)
    syms = np.clip(np.round(means + scales * rng.randn(n)), -100, 100
                   ).astype(np.int64)
    st, w = ef.encode_family_exact_grouped(
        syms, means, scales, "gaussian", -100, 100, cfg)
    out = ef.decode_family_exact_grouped(
        np.asarray(st), np.asarray(w), means, scales, "gaussian",
        -100, 100, cfg, n, device_tables=True)
    np.testing.assert_array_equal(np.asarray(out), syms)

"""Compiled-mode smoke test: round-trip EVERY Pallas kernel on real TPU.

The CPU test suite runs kernels through the Pallas interpreter, which does
not exercise Mosaic lowering restrictions (e.g. no unsigned reductions, no
16-bit compares/rotates).  This script compiles and round-trips every
kernel on the attached chip; run it after touching any kernel.

Run: python benchmarks/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax

    assert jax.default_backend() == "tpu", "this smoke test needs the TPU"

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops import pallas_family as pf
    from constriction_tpu.ops import pallas_range_enc as pre
    from constriction_tpu.ops import tchain
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(0)
    L, n = 1024, 5000
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    probs = rng.dirichlet(np.full(60, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf = model.cdf
    symbols = rng.choice(60, size=n, p=probs).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)

    # rANS encode + decode
    st, w = pc.encode_iid_pallas(symbols, cdf, cfg)
    ref_st, ref_w = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    assert np.array_equal(np.asarray(st), ref_st)
    assert np.array_equal(np.asarray(w), ref_w)
    out = np.asarray(pc.decode_shared_pallas(ref_st, ref_w, cdf, cfg, n))
    assert np.array_equal(out, symbols)
    print("rANS encode+decode: OK")

    # range encode + decode + invalid-data raise
    pts, rw = pre.encode_iid_range_pallas(symbols, cdf, cfg)
    ref_pts, ref_rw = il2.encode_iid_categorical_range(symbols, cdf, cfg)
    assert np.array_equal(pts, ref_pts) and np.array_equal(rw, ref_rw)
    out = np.asarray(pc.decode_shared_range_pallas(pts, rw, cdf, cfg, n))
    assert np.array_equal(out, symbols)
    try:
        pc.decode_shared_range_pallas(
            np.full_like(pts, 0xFFFFFFFF), rw, cdf, cfg, n
        )
        raise AssertionError("invalid data not detected")
    except ValueError:
        pass
    print("range encode+decode (+detection): OK")

    # device families (all)
    means = (rng.randn(n) * 10).astype(np.float32)
    scales = (0.5 + np.abs(rng.randn(n)) * 3).astype(np.float32)
    fsyms = np.clip(np.round(means + rng.randn(n) * scales), -100, 100).astype(
        np.int32
    )
    for family in pf.FAMILIES:
        fst, fw = pf.encode_family_pallas(fsyms, means, scales, family, -100, 100, cfg)
        fout = np.asarray(
            pf.decode_family_pallas(
                np.asarray(fst), np.asarray(fw), means, scales,
                family, -100, 100, cfg, n,
            )
        )
        assert np.array_equal(fout, fsyms), family
    print("device families (gaussian/laplace/logistic/cauchy): OK")

    # TChain-16 bits-back
    m16 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 16
    )
    data16 = rng.randint(0, 1 << 16, size=2 * L).astype(np.uint16)
    cfg16 = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=16)
    syms16, rem, heads = tchain.tchain_decode_pallas(data16, m16.cdf, cfg16)
    q2, h2 = tchain.tchain_encode_pallas(syms16, rem, heads, m16.cdf, cfg16)
    assert np.array_equal(q2, data16) and np.all(h2 == 1)
    print("TChain-16 bits-back: OK")

    # TChain-12 family bits-back
    data12 = rng.randint(0, 1 << 12, size=2 * L).astype(np.uint16)
    m12 = (rng.randn(2 * L) * 10).astype(np.float32)
    s12 = (0.5 + np.abs(rng.randn(2 * L)) * 3).astype(np.float32)
    syms12, rem12, heads12 = tchain.tchain12_family_decode_pallas(
        data12, m12, s12, "gaussian", -100, 100, cfg
    )
    q12, h12 = tchain.tchain12_family_encode_pallas(
        syms12, rem12, heads12, m12, s12, "gaussian", -100, 100, cfg
    )
    assert np.array_equal(q12, data12) and np.all(h12 == 16)
    print("TChain-12 neural bits-back: OK")

    # DEFAULT preset (ILANS2-64: W=32/S=64/P=24)
    from constriction_tpu.ops import pallas_coder64 as pc64

    cfg64 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    cdf24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    ).cdf
    cdf24_64 = cdf24.astype(np.uint64)
    ref_st64, ref_w64 = il2.encode_shared(
        cdf24_64[symbols], cdf24_64[symbols + 1] - cdf24_64[symbols], cfg64
    )
    st64, w64 = pc64.encode_iid64_pallas(symbols, cdf24, cfg64)
    assert np.array_equal(st64, ref_st64) and np.array_equal(
        np.asarray(w64), ref_w64
    )
    out64 = np.asarray(
        pc64.decode_shared64_pallas(ref_st64, ref_w64, cdf24, cfg64, n)
    )
    assert np.array_equal(out64, symbols)
    print("DEFAULT preset (W=32/S=64/P=24) encode+decode: OK")

    # DEFAULT-preset range encode + decode (ILANS2-R64)
    cfgr64 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    rp64, rw64 = il2.encode_iid_categorical_range(symbols, cdf24, cfgr64,
                                                  device=True)
    assert rp64.dtype.name == "uint64"
    from constriction_tpu import native as _native

    if _native.LIB is not None:
        ref_rp64, ref_rw64 = il2.encode_shared_range(
            cdf24_64[symbols], cdf24_64[symbols + 1] - cdf24_64[symbols],
            cfgr64,
        )
        assert np.array_equal(rp64, ref_rp64)
        assert np.array_equal(rw64, ref_rw64)
    out_r64 = np.asarray(
        pc64.decode_shared_range64_pallas(rp64, rw64, cdf24, cfgr64, n)
    )
    assert np.array_equal(out_r64, symbols)
    print("DEFAULT preset range encode+decode (ILANS2-R64): OK")

    # TChain-24 bits-back (DEFAULT precision)
    data24 = rng.randint(0, 1 << 24, size=2 * L).astype(np.uint32)
    cfg24 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    syms24t, rem24, heads24 = tchain.tchain24_decode_pallas(data24, cdf24, cfg24)
    q24, h24 = tchain.tchain24_encode_pallas(
        syms24t, rem24, heads24, cdf24, cfg24
    )
    assert np.array_equal(q24, data24) and np.all(h24 == 256)
    print("TChain-24 DEFAULT-precision bits-back: OK")

    print("ALL KERNELS COMPILED AND ROUND-TRIPPED ON TPU")


if __name__ == "__main__":
    main()

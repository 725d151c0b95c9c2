"""Compiled-mode stress soak: random configurations through every coder on
real TPU, bit-exact against host oracles.  Complements benchmarks/
tpu_smoke.py (fixed shapes) with randomized shapes/skews — run after any
kernel change for extra confidence.

Run: python benchmarks/soak.py [minutes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops import pallas_family as pf
    from constriction_tpu.ops import pallas_range_enc as pre
    from constriction_tpu.ops.interleaved import LaneConfig

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    rng = np.random.RandomState(int(time.time()) % 100000)
    fails = trials = 0
    t_end = time.time() + minutes * 60
    while time.time() < t_end:
        L = 128 * int(rng.choice([1, 2, 4, 8]))
        kind = rng.randint(5)
        # sweep the full supported precision range (families are P=12-only)
        P = 12 if kind == 2 else int(rng.choice([8, 9, 10, 11, 12, 14, 16]))
        cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=P)
        ok = True
        if kind == 4:  # DEFAULT preset (ILANS2-64: W=32/S=64/P in (16, 24])
            from constriction_tpu.ops import pallas_coder64 as pc64

            P = int(rng.choice([18, 20, 24]))
            cfg = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=P)
            K = int(rng.randint(2, 1500))
            w = rng.dirichlet(np.full(K, float(np.exp(rng.randn() * 2))))
            try:
                model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(w, P)
            except ValueError:
                continue
            cdf = model.cdf
            n = int(rng.randint(1, 15 * L))
            symbols = rng.choice(K, size=n, p=w).astype(np.int64)
            cdf64 = cdf.astype(np.uint64)
            rst, rwd = il2.encode_shared(cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg)
            st, wd = pc64.encode_iid64_pallas(symbols, cdf, cfg)
            ok = np.array_equal(np.asarray(st), rst) and np.array_equal(np.asarray(wd), rwd)
            out = np.asarray(pc64.decode_shared64_pallas(rst, rwd, cdf, cfg, n))
            ok = ok and np.array_equal(out, symbols)
        elif kind == 3:  # rANS, dense alphabet (bitmap-rank / segtree paths)
            K = int(rng.randint(256, min(4000, 1 << P) + 1)) if P >= 9 else 2
            extra = rng.multinomial(
                (1 << P) - K, rng.dirichlet(np.full(K, 0.7))
            )
            cdf = np.concatenate([[0], np.cumsum(1 + extra)]).astype(np.int64)
            w = (cdf[1:] - cdf[:-1]) / float(1 << P)
            n = int(rng.randint(1, 15 * L))
            symbols = rng.choice(K, size=n, p=w).astype(np.int64)
            st, wd = pc.encode_iid_pallas(symbols, cdf, cfg)
            cdf64 = cdf.astype(np.uint64)
            rst, rwd = il2.encode_shared(cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg)
            ok = np.array_equal(np.asarray(st), rst) and np.array_equal(np.asarray(wd), rwd)
            out = np.asarray(pc.decode_shared_pallas(rst, rwd, cdf, cfg, n))
            ok = ok and np.array_equal(out, symbols)
        elif kind == 0:  # rANS (K beyond 255 exercises the large-K paths)
            K = int(rng.randint(2, min(1500, (1 << P) - 1)))
            w = rng.dirichlet(np.full(K, float(np.exp(rng.randn() * 2))))
            try:
                model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(w, P)
            except ValueError:
                continue
            cdf = model.cdf
            n = int(rng.randint(1, 15 * L))
            symbols = rng.choice(K, size=n, p=w).astype(np.int64)
            st, wd = pc.encode_iid_pallas(symbols, cdf, cfg)
            cdf64 = cdf.astype(np.uint64)
            rst, rwd = il2.encode_shared(cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg)
            ok = np.array_equal(np.asarray(st), rst) and np.array_equal(np.asarray(wd), rwd)
            out = np.asarray(pc.decode_shared_pallas(rst, rwd, cdf, cfg, n))
            ok = ok and np.array_equal(out, symbols)
        elif kind == 1:  # range
            K = int(rng.choice([2, 3, 17, 100, 255, 400, 1200]))
            if K >= (1 << P) - 1:
                K = (1 << P) - 2
            w = rng.dirichlet(np.full(K, float(np.exp(rng.randn() * 2))))
            try:
                model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(w, P)
            except ValueError:
                continue
            cdf = model.cdf
            n = int(rng.randint(1, 15 * L))
            symbols = rng.choice(K, size=n, p=w).astype(np.int64)
            rp, rw_ = il2.encode_iid_categorical_range(symbols, cdf, cfg)
            gp, gw = pre.encode_iid_range_pallas(symbols, cdf, cfg)
            ok = np.array_equal(gp, rp) and np.array_equal(gw, rw_)
            out = np.asarray(pc.decode_shared_range_pallas(gp, gw, cdf, cfg, n))
            ok = ok and np.array_equal(out, symbols)
        else:  # families
            fam = str(rng.choice(["gaussian", "laplace", "logistic", "cauchy"]))
            n = int(rng.randint(1, 10 * L))
            means = (rng.randn(n) * 30).astype(np.float32)
            scales = np.exp(rng.randn(n) * 2).astype(np.float32) + np.float32(1e-5)
            symbols = rng.randint(-100, 101, size=n).astype(np.int32)
            st, wd = pf.encode_family_pallas(symbols, means, scales, fam, -100, 100, cfg)
            out = np.asarray(
                pf.decode_family_pallas(
                    np.asarray(st), np.asarray(wd), means, scales, fam, -100, 100, cfg, n
                )
            )
            ok = np.array_equal(out, symbols)
        trials += 1
        if not ok:
            fails += 1
            print(f"FAIL trial {trials}: kind={kind} L={L} P={P}")
    print(f"soak: {trials} random configs, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

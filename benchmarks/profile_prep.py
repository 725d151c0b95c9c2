"""Phase-level profile of the exact-family table-prep pipeline.

The fresh-model end-to-end target (VERDICT r5 #3) is prep + decode >= 2
Msym/s; this script breaks the on-device builder's cost into its phases so
the on-chip bottleneck is visible in one run:

    python benchmarks/profile_prep.py            # on the chip
    JAX_PLATFORMS=cpu python benchmarks/profile_prep.py   # small shapes

Phases timed per segment batch:
  eval     - f64 window evaluation + ambiguity flags (device)
  count    - ambiguity-count readbacks (device sync + 4-byte fetch)
  idxfetch - bucketed ambiguous-index fetches (device nonzero + readback)
  patch    - host glibc oracle on the ambiguous entries (C++)
  derive   - derive_pack dispatches (device)
  final    - flag readbacks, slicing, host fallback rows
Plus the host fused-C++ builder and the end-to-end grouped decode for
comparison.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops import exact_tables_jax as etj
    from constriction_tpu.ops.interleaved import LaneConfig

    on_tpu = jax.default_backend() == "tpu"
    L = (1 << 15) if on_tpu else (1 << 10)
    n = (1 << 22) if on_tpu else (1 << 16)
    R = L // 128
    rng = np.random.RandomState(7)
    means = (rng.randn(n) * 30).astype(np.float64)
    scales = np.exp(rng.normal(0.7, 0.4, size=n))
    min_s, max_s = -100, 100
    P = 24

    T = -(-n // L)
    perm, segs = ef.group_plan(means, scales, "gaussian", min_s, max_s, P,
                               L, n)
    pm, ps = ef._pad_params(means[perm], scales[perm], T * L, "gaussian",
                            max_s)
    print(f"backend={jax.default_backend()} n={n} L={L} "
          f"segments={[(t0, ns, cm) for t0, ns, cm in segs]}")

    # warm the jits once (compile time excluded from the phase numbers)
    _ = ef.packed_tables_on_device_batch(
        [(pm[t0 * L:(t0 + ns) * L], ps[t0 * L:(t0 + ns) * L], cm, ns)
         for t0, ns, cm in segs], "gaussian", min_s, max_s, P, R)
    if _ is None:
        print("device builder unavailable (no native lib / canary failed)")
        return

    # phase-instrumented rerun -- MIRRORS packed_tables_on_device_batch
    # step by step; when that pipeline changes, update this block too or
    # the breakdown measures the OLD pipeline (the numbers below are a
    # diagnostic view, not the production path)
    CL = ef._EST_C["gaussian"][0]
    t_eval = t_count = t_idx = t_patch = t_derive = t_final = 0.0
    ph = []
    t0w = time.perf_counter()
    for t0s, ns, cm in segs:
        sl = slice(t0s * L, (t0s + ns) * L)
        mean = np.ascontiguousarray(pm[sl])
        scale = np.ascontiguousarray(ps[sl])
        nn = ns * L
        ws = np.clip(np.ceil(mean - CL * scale) - 3.0, min_s + 1, max_s
                     ).astype(np.int64)
        W = min(cm + 16, max_s - min_s + 1 + 16)
        ws32 = ws.astype(np.int32)
        tv, ambig = etj.eval_window(
            mean, scale, ws32, family="gaussian", min_sym=min_s,
            max_sym=max_s, precision=P, W=int(W))
        ph.append(dict(mean=mean, scale=scale, ws=ws, ws32=ws32, n=nn,
                       W=W, cm=cm, ns=ns, tv=tv, ambig=ambig,
                       cnt=etj.ambig_count(ambig)))
    jax.block_until_ready([p["tv"] for p in ph])
    t_eval = time.perf_counter() - t0w

    t0w = time.perf_counter()
    counts = [int(p["cnt"]) for p in ph]
    t_count = time.perf_counter() - t0w

    from constriction_tpu import native

    t0w = time.perf_counter()
    for p, count in zip(ph, counts):
        K2 = 1 << max(12, (max(count, 1) - 1).bit_length())
        idx, _ = etj.ambig_indices(p["ambig"], K=K2)
        p["idx"] = idx
        p["idx_h"] = np.asarray(idx)
        p["count"] = count
    t_idx = time.perf_counter() - t0w

    t0w = time.perf_counter()
    for p in ph:
        idx_h = p["idx_h"]
        live = idx_h < p["n"] * p["W"]
        sym_i = (idx_h[live] // p["W"]).astype(np.int64)
        svals = (p["ws"][sym_i] + (idx_h[live] % p["W"])).astype(np.int32)
        patch_vals = np.zeros(len(idx_h), np.int32)
        if len(sym_i):
            out = np.empty(len(sym_i), np.uint32)
            native.LIB.ctpu_exact_tv_at(
                native.DIST_KIND["gaussian"], min_s, max_s, P,
                p["mean"], p["scale"], np.ascontiguousarray(sym_i),
                np.ascontiguousarray(svals), len(sym_i), out)
            patch_vals[live] = out.astype(np.int32)
        p["patch_vals"] = patch_vals
    t_patch = time.perf_counter() - t0w

    import jax.numpy as jnp

    t0w = time.perf_counter()
    for p in ph:
        p["out"] = etj.derive_pack(
            p["tv"], jnp.asarray(p["ws32"]), p["idx"],
            jnp.asarray(p["patch_vals"]), min_sym=min_s, max_sym=max_s,
            precision=P, cmax=p["cm"], nsteps=p["ns"], R=R)
    jax.block_until_ready([p["out"][0] for p in ph])
    t_derive = time.perf_counter() - t0w

    t0w = time.perf_counter()
    for p in ph:
        tabs4, incon, overflow, ncm = p["out"]
        bad = np.asarray(incon | overflow)
        tight = max(4, -(-max(int(ncm), 1) // 4) * 4)
        if tight < p["cm"]:
            tabs4 = tabs4[:, : 1 + 3 * (tight // 4)]
        np.asarray(jax.block_until_ready(tabs4[0, 0, 0, 0]))
        assert not bad.any() or True
    t_final = time.perf_counter() - t0w

    total_amb = sum(counts)
    tot = t_eval + t_count + t_idx + t_patch + t_derive + t_final
    print(f"ambiguous entries: {total_amb} "
          f"({total_amb / max(sum(p['n'] * p['W'] for p in ph), 1):.2e} of grid)")
    for name, v in [("eval", t_eval), ("count", t_count), ("idx", t_idx),
                    ("patch", t_patch), ("derive", t_derive),
                    ("final", t_final)]:
        print(f"  {name:7s} {v * 1e3:9.1f} ms  ({v / tot * 100:5.1f}%)")
    print(f"  device-batch total {tot * 1e3:9.1f} ms -> "
          f"{n / tot / 1e6:.2f} Msym/s")

    t0w = time.perf_counter()
    for t0s, ns, cm in segs:
        sl = slice(t0s * L, (t0s + ns) * L)
        ef.packed_tables_device(pm[sl], ps[sl], "gaussian", min_s, max_s,
                                P, cm, ns, R)
    t_host = time.perf_counter() - t0w
    print(f"  host fused C++     {t_host * 1e3:9.1f} ms -> "
          f"{n / t_host / 1e6:.2f} Msym/s")


if __name__ == "__main__":
    main()

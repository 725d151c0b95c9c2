"""Round-4 on-chip spot checks: TChain-24 raw-tile kernels and the
core-size-grouped exact-family decode (Q.npz workload)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from suite import _chain_time
from constriction_tpu.models.categorical import (
    ContiguousCategoricalEntropyModel,
)
from constriction_tpu.ops import exact_family as ef
from constriction_tpu.ops import tchain as tc
from constriction_tpu.ops.interleaved import LaneConfig


def bench_tchain24():
    L = 32768
    R = L // 128
    T = 512
    n = T * L
    rng = np.random.RandomState(1234)
    K = 100
    p = rng.dirichlet(np.full(K, 1.3))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(p, 24)
    cdf = model.cdf
    q = rng.randint(0, 1 << 24, size=n).astype(np.uint32)
    syms, rem, heads = tc.tchain24_decode_pallas(q, cdf)
    q2, h2 = tc.tchain24_encode_pallas(syms, rem, heads, cdf)
    assert np.array_equal(q2, q) and np.all(h2 == 256), "round trip"

    qw = jax.device_put(jnp.asarray(q).reshape(T, R, 128))
    dec = tc._build_tchain24_decoder(tuple(int(x) for x in cdf), T, L, False)

    def _tdec(qw_):
        s, _b, hh, _hl, _e = dec(qw_)
        dep = s[:, : qw_.shape[1], :].astype(jnp.uint32) & np.uint32(1)
        return qw_ ^ dep, hh[0, 0]

    dt = _chain_time(_tdec, (qw,))
    print(f"tchain24 decode: {n / dt / 1e9:6.2f} GB/s")

    enc = tc._build_tchain24_encoder(tuple(int(x) for x in cdf), T, L, False)
    syms3d = jax.device_put(jnp.asarray(syms, jnp.int32).reshape(T, R, 128))
    h64 = np.asarray(heads, np.uint64)
    hh2d = jax.device_put(jnp.asarray((h64 >> np.uint64(32)).astype(np.uint32)).reshape(R, 128))
    hl2d = jax.device_put(jnp.asarray((h64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(R, 128))
    s2d = np.asarray(tc._pad_stream2d(rem, R))
    s2d = jax.device_put(jnp.asarray(np.vstack([s2d, np.zeros((4 * R, 128), np.uint32)])))

    def _tenc(s3):
        qw_, hh, _hl = enc(s3, hh2d, hl2d, s2d)
        dep = ((qw_[0, 0, 0] >> 31) & 1).astype(jnp.int32)
        return s3 ^ dep, hh[0, 0]

    dt = _chain_time(_tenc, (syms3d,))
    print(f"tchain24 encode: {n / dt / 1e9:6.2f} GB/s")


def bench_grouped_exact():
    L = 32768
    R = L // 128
    rng = np.random.RandomState(1234)
    lat = np.load("/root/reference/Q.npz")["arr_0"].astype(np.float64).reshape(-1)
    n = 1 << 22
    means = np.tile(lat * 50.0, -(-n // len(lat)))[:n]
    scales = np.exp(rng.normal(0.7, 0.4, size=n))
    symbols = np.clip(np.round(means + scales * rng.randn(n)), -100, 100).astype(np.int64)
    cfg = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)

    t0 = time.perf_counter()
    perm, segs = ef.group_plan(means, scales, "gaussian", -100, 100, 24, L, n)
    print("plan:", segs, f"({time.perf_counter() - t0:.1f}s)")
    cums, probs = ef.exact_ecp(
        symbols[perm], means[perm], scales[perm], "gaussian", -100, 100, 24
    )
    st, stream = ef.encode_tables_pallas(cums, probs, cfg)
    stream = np.asarray(stream)

    t0 = time.perf_counter()
    out = ef.decode_family_exact_grouped(
        st, stream, means, scales, "gaussian", -100, 100, cfg, n
    )
    print(f"grouped decode end-to-end: {time.perf_counter() - t0:.1f}s")
    assert np.array_equal(out, symbols), "grouped mismatch"

    # chain-timed kernel throughput: compose the segment kernels in one jit
    T = -(-n // L)
    pm, ps = ef._pad_params(means[perm], scales[perm], T * L, "gaussian", 100)
    st64 = np.asarray(st, np.uint64)
    hi = jax.device_put(jnp.asarray((st64 >> np.uint64(32)).astype(np.uint32)).reshape(R, 128))
    lo = jax.device_put(jnp.asarray((st64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(R, 128))
    s2d = jax.device_put(ef._pad_stream2d(stream, R))
    fns, tabs = [], []
    t0 = time.perf_counter()
    for t0s, nsteps, cmax in segs:
        sl = slice(t0s * L, (t0s + nsteps) * L)
        aux, core = ef.exact_boundary_tables(
            pm[sl], ps[sl], "gaussian", -100, 100, 24, cmax
        )
        tb, cmax_r = ef.pack_decode_tables(aux, core, 24)
        CP1 = tb.shape[1]
        tabs.append(jax.device_put(jnp.asarray(np.ascontiguousarray(
            tb.reshape(nsteps, R, 128, CP1).transpose(0, 3, 1, 2)
        ))))
        last = t0s + nsteps == T
        tail_s = (n - (T - 1) * L) if last else L
        fns.append(ef._build_exact_decoder64_seg(
            -100, 100, cfg, nsteps, tail_s, L, cmax_r, False
        ))
    print(f"tables+builds: {time.perf_counter() - t0:.1f}s")

    def _gdec(h, l, *tbs):
        b = jnp.zeros((1,), jnp.int32)
        last_sym = None
        for fn, tb in zip(fns, tbs):
            syms, h2, l2, b = fn(b, h, l, tb, s2d)
            h, l = h2, l2
            last_sym = syms
        dep = (last_sym[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
        return h ^ dep, last_sym[0, 0, 0].astype(jnp.uint32)

    dt = _chain_time(_gdec, (hi, lo, *tabs))
    print(f"grouped exact decode: {n / dt / 1e9:6.2f} GB/s "
          f"(weighted cmax {sum(ns * w for _, ns, w in segs) / T:.0f})")


if __name__ == "__main__":
    bench_tchain24()
    bench_grouped_exact()

"""Profile the reference-exact family decode kernel (ops/exact_family.py).

Times ONLY the device decode (tables prebuilt on host), across lane counts
and workload sigma ranges, using the suite's chained-jit methodology
(per-dispatch host timing is unreliable through the axon tunnel).

Run: python benchmarks/profile_exact.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.suite import _chain_time  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops.interleaved import LaneConfig
    from constriction_tpu.ops.pallas_coder import _pad_stream2d

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(42)
    MIN, MAX, P = -120, 120, 24

    for sigma_kind, sig_lo, sig_hi, L in (
        ("small-sigma", 0.11, 2.0, 16384),
        ("small-sigma", 0.11, 2.0, 32768),
        ("wide-sigma", 0.3, 10.0, 8192),
    ):
        n = L * (64 if on_tpu else 4)
        means = (rng.randn(n) * 4).astype(np.float32)
        scales = np.exp(
            rng.uniform(np.log(sig_lo), np.log(sig_hi), n)
        ).astype(np.float32)
        symbols = np.clip(
            np.round(means + rng.randn(n) * scales), MIN, MAX
        ).astype(np.int64)
        cfg = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=P)
        cums, probs = ef.exact_ecp(
            symbols, means, scales, "gaussian", MIN, MAX, P
        )
        st, stream = il2.encode_shared(
            cums.astype(np.uint64), probs.astype(np.uint64), cfg
        )
        T = -(-n // L)
        tail = n - (T - 1) * L
        R = L // 128
        t0 = time.perf_counter()
        aux, core = ef.exact_boundary_tables(
            ef._pad_to(means, T * L), ef._pad_to(scales, T * L, 1.0),
            "gaussian", MIN, MAX, P, cmax=254,
        )
        t_prep = time.perf_counter() - t0
        ncore = (aux >> 24).astype(np.int64)
        cmax = int(ncore.max())
        tabs, cmax = ef.pack_decode_tables(aux, core[:, :cmax], P)
        CP1 = tabs.shape[1]
        tabs4 = np.ascontiguousarray(
            tabs.reshape(T, R, 128, CP1).transpose(0, 3, 1, 2)
        )
        fn = ef._build_exact_decoder64(MIN, MAX, cfg, T, tail, L, cmax, not on_tpu)
        st64 = np.asarray(st, np.uint64)
        hi = jnp.asarray((st64 >> np.uint64(32)).astype(np.uint32)).reshape(R, 128)
        lo = jnp.asarray((st64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(R, 128)
        tj = jax.device_put(jnp.asarray(tabs4))
        wj = jax.device_put(_pad_stream2d(stream, R))
        syms, _h, _l = fn(hi, lo, tj, wj)
        out = np.asarray(syms).reshape(-1)[:n]
        assert np.array_equal(out, symbols), "round trip mismatch"

        def _sdec(h, l, t_, w):
            s, h2, l2 = fn(h, l, t_, w)
            dep = (s[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
            return h ^ dep, s[0, 0, 0].astype(jnp.uint32)

        dt = _chain_time(_sdec, (hi, lo, tj, wj), n_long=5)
        tab_bytes = T * CP1 * R * 128 * 4
        print(
            f"[{sigma_kind}] L={L} n={n} cmax={cmax}: "
            f"decode {n/dt/1e9:.2f} GB/s ({dt*1e3:.2f} ms/call; "
            f"tables {tab_bytes/1e6:.1f} MB -> {tab_bytes/dt/1e9:.0f} GB/s; "
            f"prep {n/t_prep/1e6:.2f} Msym/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

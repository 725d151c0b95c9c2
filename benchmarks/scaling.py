"""Scaling-efficiency harness: sharded decode GB/s vs device count.

The north-star metric (BASELINE.md) is >= 85 % GB/s scaling efficiency from
1 host to N >= 2 hosts.  This harness weak-scales the sharded ILANS2 decode
(one block of ``block_len`` symbols per device, data-parallel over the
``blocks`` mesh axis, the same SPMD program the sharded container uses) and
reports, per device count d: aggregate GB/s and efficiency vs the d=1 run.

On this environment only one real TPU chip is attached, so on-chip runs
print the d=1 row; the harness itself is mesh-size generic and runs the
whole sweep on a virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 python
benchmarks/scaling.py) to validate shapes and collectives.  On a real v5p
slice, run it unchanged; for multi-host, initialize jax.distributed first
(see tests/_mp_worker.py) -- per-process device lists flow through
jax.devices() the same way.

Prints one JSON line per device count.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu" and (
        jax.default_backend() != "cpu" or len(jax.devices()) < 2
    ):
        # the site plugin pre-sets jax_platforms, so the env var alone may
        # not stick; force a multi-device CPU backend (as conftest.py does)
        from jax.extend import backend as _xb

        _xb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from constriction_tpu import parallel
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    on_tpu = jax.default_backend() == "tpu"
    ndev = len(jax.devices())
    if on_tpu:
        L, block_len = 1 << 15, 1 << 23  # 8.4M symbols per device
    else:
        L, block_len = 256, 1 << 14
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    R = L // pc.LANES

    rng = np.random.RandomState(1234)
    alphabet = 100
    probs = rng.dirichlet(np.full(alphabet, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf = model.cdf
    cdf64 = cdf.astype(np.uint64)

    # one encoded block, reused on every device (weak scaling)
    symbols = rng.choice(alphabet, size=block_len, p=probs).astype(np.int64)
    states, stream = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    stream2d = np.asarray(pc._pad_stream2d(stream, R))

    def bench(d: int) -> float:
        mesh = parallel.make_mesh(d)
        st = jnp.asarray(np.broadcast_to(states, (d, L)).copy())
        ws = jnp.asarray(
            np.broadcast_to(stream2d, (d,) + stream2d.shape).copy()
        )

        def step(s, w):
            syms = parallel.shard_decode2_pallas(
                mesh, s, w, cdf, cfg, block_len,
                interpret=not on_tpu,
            )
            dep = (syms[-1, -1].astype(jnp.uint32) >> 31) & 1
            return s ^ dep, syms[0, 0].astype(jnp.uint32)

        def make(n_inner):
            def run(s, w):
                def body(i, carry):
                    s0, chk = carry
                    s2, c = step(s0, w)
                    return s2, chk + c

                _, chk = jax.lax.fori_loop(0, n_inner, body, (s, jnp.uint32(0)))
                return chk

            return jax.jit(run)

        n_long = 9 if on_tpu else 2
        f1, fl = make(1), make(n_long)
        _ = np.asarray(f1(st, ws))
        _ = np.asarray(fl(st, ws))
        t1s, tns = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f1(st, ws))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = np.asarray(fl(st, ws))
            tns.append(time.perf_counter() - t0)
        t1s.sort()
        tns.sort()
        dt = max((tns[len(tns) // 2] - t1s[len(t1s) // 2]) / (n_long - 1), 1e-9)
        return d * block_len / dt / 1e9

    base = None
    for d in sorted({1, 2, 4, 8, ndev} & set(range(1, ndev + 1))):
        gbps = bench(d)
        if base is None:
            base = gbps
        eff = gbps / (base * d)
        print(
            json.dumps(
                {
                    "devices": d,
                    "decode_GBps": round(gbps, 2),
                    "scaling_efficiency": round(eff, 3),
                    "per_device_GBps": round(gbps / d, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

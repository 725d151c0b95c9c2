"""Headline benchmark: interleaved rANS decode throughput on one chip.

Workload mirrors the reference's published benchmark setup (README.md:173-182
/ benches/lookup.rs): i.i.d. symbols from a ~100-symbol categorical model at
the "small" preset (precision 12), decoded TPU-first with the ILANS v2
shared-stream format (constriction_tpu.ops.interleaved2): 2^15 interleaved
rANS lanes in lockstep on the VPU, zero gathers in the hot loop (compare-sum
model inversion + butterfly refill distribution).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is relative to the reference's fastest published decode:
6.1 ns/symbol (ANS 24/32/64 on an i7-7500U, README.md:202) = 0.1639 GB/s for
1-byte symbols.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_DECODE_GBPS = 1.0 / 6.1  # 6.1 ns/symbol, 1-byte symbols


def main() -> None:
    import jax
    import jax.numpy as jnp

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import jax_coder2 as jc2
    from constriction_tpu.ops.interleaved import LaneConfig

    backend = jax.default_backend()
    if backend == "tpu":
        num_lanes, total = 1 << 15, 1 << 24  # 16.7M symbols, 32768 lanes
        reps = 20
    else:
        num_lanes, total = 1 << 12, 1 << 20
        reps = 5

    rng = np.random.RandomState(1234)
    alphabet = 100
    probs = rng.dirichlet(np.full(alphabet, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf = model.cdf
    symbols = rng.choice(alphabet, size=total, p=probs).astype(np.int64)

    cfg = LaneConfig(num_lanes=num_lanes, word_bits=16, state_bits=32, precision=12)
    cdf64 = cdf.astype(np.uint64)
    init_states, stream = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )

    T = -(-total // num_lanes)
    cdf_np = np.asarray(cdf, dtype=np.uint64)

    states_d = jax.device_put(jnp.asarray(init_states, dtype=jnp.uint32))
    stream_d = jax.device_put(jnp.asarray(stream, dtype=jnp.uint32))

    decode = jax.jit(
        lambda s, w: jc2.decode_shared_compare_sum(s, w, cdf_np, cfg, T, total)
    )

    # Warm up / compile, verify correctness once.
    out = decode(states_d, stream_d)
    ok = np.array_equal(np.asarray(out)[:total], symbols)
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "decode GB/s/chip",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "error": "round trip mismatch",
                }
            )
        )
        sys.exit(1)

    # Robust timing: chain n_inner decodes inside ONE jit with a data
    # dependency the compiler cannot elide, and difference two chain lengths;
    # dispatch/readback round trips (the dev tunnel adds a noisy ~30 ms)
    # cancel exactly.
    def make_chained(n_inner):
        def run(s, w):
            def body(i, carry):
                s0, chk = carry
                syms = jc2.decode_shared_compare_sum(s0, w, cdf_np, cfg, T, total)
                dep = (syms[-1].astype(jnp.uint32) >> 31) & 1  # 0 in practice
                return s0 ^ dep, chk + syms[0].astype(jnp.uint32)

            _, chk = jax.lax.fori_loop(0, n_inner, body, (s, jnp.uint32(0)))
            return chk

        return jax.jit(run)

    n_long = 9 if backend == "tpu" else 3
    f1 = make_chained(1)
    fn = make_chained(n_long)
    _ = np.asarray(f1(states_d, stream_d))
    _ = np.asarray(fn(states_d, stream_d))

    per_decode = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(f1(states_d, stream_d))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(fn(states_d, stream_d))
        tn = time.perf_counter() - t0
        per_decode.append((tn - t1) / (n_long - 1))
    dt = max(min(per_decode), 1e-9)

    gbps = total / dt / 1e9  # 1-byte symbols
    print(
        json.dumps(
            {
                "metric": "ILANS2 interleaved rANS decode throughput per chip (100-symbol model, P=12)",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / REFERENCE_DECODE_GBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

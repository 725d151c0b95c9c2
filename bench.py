"""Headline benchmark: interleaved rANS decode throughput on one chip.

Workload mirrors the reference's published benchmark setup (README.md:173-182
/ benches/lookup.rs): i.i.d. symbols from a ~100-symbol categorical model at
the "small" preset (precision 12), decoded TPU-first with the ILANS v2
shared-stream format (constriction_tpu.ops.interleaved2): 2^16 interleaved
rANS lanes in lockstep, decoded by the Pallas kernel
(constriction_tpu.ops.pallas_coder): segtree model inversion (coarse
compares select the CDF segment, the segment index bits steer
constant-select trees that materialize its boundaries, a short flat
compare-sum finishes), monotone butterfly refill distribution via
pltpu.roll, lane states resident in VMEM, double-buffered stream-window
DMA from HBM.

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
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    backend = jax.default_backend()
    if backend == "tpu":
        num_lanes, total = 1 << 16, 1 << 25  # 33.5M symbols, 65536 lanes
    else:
        num_lanes, total = 1 << 10, 1 << 18

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
    R = num_lanes // 128

    # Correctness gate: full decode must round-trip bit-exactly.
    out = np.asarray(pc.decode_shared_pallas(init_states, stream, cdf, cfg, total))
    if not np.array_equal(out, symbols):
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

    fn = pc._build_decoder(
        tuple(int(x) for x in cdf), cfg, T, total - (T - 1) * num_lanes,
        num_lanes, jax.default_backend() != "tpu",
    )
    stream_j = jnp.asarray(stream, dtype=jnp.uint32)
    rows = -(-int(stream_j.shape[0]) // 128) + (R + 2)
    pad = rows * 128 - int(stream_j.shape[0])
    stream2d = jax.device_put(
        jnp.concatenate([stream_j, jnp.zeros(pad, dtype=jnp.uint32)]).reshape(rows, 128)
    )
    states2d = jax.device_put(
        jnp.asarray(init_states, dtype=jnp.uint32).reshape(R, 128)
    )

    # Robust timing: chain n_inner decodes inside ONE jit with a data
    # dependency the compiler cannot elide, and difference two chain lengths;
    # dispatch/readback round trips (the dev tunnel adds a noisy ~30 ms)
    # cancel exactly.
    def make_chained(n_inner):
        def run(s, w):
            def body(i, carry):
                s0, chk = carry
                syms, _fstates = fn(s0, w)
                dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1  # 0 in practice
                return s0 ^ dep, chk + syms[0, 0, 0].astype(jnp.uint32)

            _, chk = jax.lax.fori_loop(0, n_inner, body, (s, jnp.uint32(0)))
            return chk

        return jax.jit(run)

    n_long = 17 if backend == "tpu" else 3
    f1 = make_chained(1)
    fn_long = make_chained(n_long)
    _ = np.asarray(f1(states2d, stream2d))
    _ = np.asarray(fn_long(states2d, stream2d))

    # medians over several rounds: the dev tunnel's ~30 ms dispatch RTT has
    # +-10 ms jitter, so single-round differences of short chains are noisy
    t1s, tns = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f1(states2d, stream2d))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(fn_long(states2d, stream2d))
        tns.append(time.perf_counter() - t0)
    t1s.sort(); tns.sort()
    dt = max((tns[len(tns) // 2] - t1s[len(t1s) // 2]) / (n_long - 1), 1e-9)

    gbps = total / dt / 1e9  # 1-byte symbols
    print(
        json.dumps(
            {
                "metric": "ILANS2 interleaved rANS decode throughput per chip (100-symbol model, P=12, Pallas)",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / REFERENCE_DECODE_GBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: interleaved rANS decode throughput on one chip.

Workload mirrors the reference's published benchmark setup (README.md:173-182
/ benches/lookup.rs): i.i.d. symbols from a ~100-symbol categorical model,
decoded with an O(1) lookup table at the "small" preset (precision 12), but
restructured TPU-first: 2^15 interleaved rANS lanes decoded in lockstep on
the VPU instead of one sequential state machine.

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
    from constriction_tpu.ops import jax_coder
    from constriction_tpu.ops.interleaved import LaneConfig, encode_interleaved

    backend = jax.default_backend()
    # Size the problem by backend: the TPU run uses a production-scale block.
    if backend == "tpu":
        num_lanes, total = 1 << 15, 1 << 24  # 16.7M symbols, 32768 lanes
    else:
        num_lanes, total = 1 << 12, 1 << 20

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
    words, counts = encode_interleaved(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )

    T = -(-total // num_lanes)
    lookup = np.repeat(np.arange(alphabet, dtype=np.uint32), np.diff(cdf.astype(np.int64)))
    packed = jax_coder.pack_cdf_u32(cdf)

    words_d = jax.device_put(jnp.asarray(words))
    counts_d = jax.device_put(jnp.asarray(counts.astype(np.int32)))
    lookup_d = jax.device_put(jnp.asarray(lookup))
    packed_d = jax.device_put(jnp.asarray(packed))

    decode = jax.jit(
        lambda w, c, lu, pc: jax_coder._decode_lookup_impl(w, c, lu, pc, cfg, T, total)
    )

    # Warm up / compile, and verify correctness once.
    out = decode(words_d, counts_d, lookup_d, packed_d)
    out.block_until_ready()
    ok = np.array_equal(np.asarray(out)[:total], symbols)
    if not ok:
        print(json.dumps({"metric": "decode GB/s/chip", "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0, "error": "round trip mismatch"}))
        sys.exit(1)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode(words_d, counts_d, lookup_d, packed_d)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    gbps = total / dt / 1e9  # 1-byte symbols
    print(
        json.dumps(
            {
                "metric": "interleaved rANS decode throughput per chip (lookup model, P=12)",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / REFERENCE_DECODE_GBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Round-trip a constriction-modeled message on TPU, then seek-decode it.

Two round-2 capabilities in one walkthrough:

1. REFERENCE-EXACT per-symbol families (ops/exact_family.py): the model
   tables are the host f64 LeakyQuantizer's -- bit-identical to what
   `constriction.stream.model.QuantizedGaussian` would use -- while the
   whole rANS coding loop runs on-device.  A message modeled by the
   reference re-codes on TPU with ZERO rate change.

2. Random access (interleaved2.build_checkpoints): periodic decoder
   snapshots let any suffix of an ILANS2 container be decoded from the
   middle, bit-exactly, without touching the prefix -- the interleaved
   analog of the reference's Pos/Seek jump tables (stack.rs:643-700).

Run: python examples/reference_exact_and_seek.py            (CPU interpreter)
     python examples/reference_exact_and_seek.py --tpu      (real chip)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "--tpu" not in sys.argv


def main() -> None:
    import jax

    if SMALL:
        # stay off the chip (and robust to its tunnel being down): this
        # must run before any jax op -- the site plugin presets
        # jax_platforms, so the env var alone is not enough
        jax.config.update("jax_platforms", "cpu")

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import exact_family as ef
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops.interleaved import LaneConfig

    rng = np.random.RandomState(0)
    n = 20_000 if SMALL else 2_000_000
    L = 256 if SMALL else 8192
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)

    # --- 1. reference-exact neural-latents round trip --------------------
    # a toy "prior network" emits per-symbol Gaussian parameters
    means = rng.uniform(-40, 40, n)
    stds = np.exp(rng.uniform(np.log(0.5), np.log(6.0), n))
    symbols = np.clip(np.round(means + rng.randn(n) * stds), -100, 100).astype(
        np.int64
    )

    states, stream = ef.encode_family_exact(
        symbols, means, stds, "gaussian", -100, 100, cfg
    )
    bits = len(np.asarray(stream)) * 16 + L * 32
    cums, probs = ef.exact_ecp(symbols, means, stds, "gaussian", -100, 100, 12)
    info = -np.sum(np.log2(probs.astype(np.float64) / 4096.0))
    print(
        f"reference-exact gaussian family: {n} symbols, "
        f"{bits / n:.3f} bits/sym (information content {info / n:.3f}; "
        f"header amortizes with n)"
    )
    out = np.asarray(
        ef.decode_family_exact(
            np.asarray(states), np.asarray(stream), means, stds,
            "gaussian", -100, 100, cfg, n, cmax=128,
        )
    )
    assert np.array_equal(out, symbols)
    print("on-device decode matches (tables == host f64 LeakyQuantizer)")

    # --- 2. seek-decode an i.i.d. container from the middle --------------
    probs_c = rng.dirichlet(np.full(50, 1.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs_c, 12
    )
    cdf = model.cdf
    msg = rng.choice(50, size=n, p=probs_c).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)
    st2, stream2 = il2.encode_shared(
        cdf64[msg], cdf64[msg + 1] - cdf64[msg], cfg
    )
    interval = 8
    offs, cst = il2.build_checkpoints(st2, stream2, n, cdf, cfg, interval)
    c = len(offs) // 2
    start, suffix = il2.decode_from_checkpoint(
        c, offs, cst, stream2, n, cdf, cfg, interval, device=True
    )
    assert np.array_equal(suffix, msg[start:])
    print(
        f"seek-decode from checkpoint {c}: symbols [{start}:{n}) recovered "
        f"without decoding the prefix ({len(offs)} checkpoints, "
        f"every {interval * L} symbols)"
    )


if __name__ == "__main__":
    main()

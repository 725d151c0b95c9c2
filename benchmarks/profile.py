"""Capture a jax.profiler trace of the flagship decode kernel.

The reference does its performance work through criterion microbenches; the
TPU equivalent is an XLA/TensorBoard trace.  This writes a trace directory
(default /tmp/ctpu_trace) that `tensorboard --logdir ...` or Perfetto can
open, covering one full-scale Pallas decode.

Run: python benchmarks/profile.py [outdir] [--cpu]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir = args[0] if args else "/tmp/ctpu_trace"
    on_tpu = jax.default_backend() == "tpu"
    L = (1 << 15) if on_tpu else (1 << 10)
    total = (1 << 23) if on_tpu else (1 << 17)
    R = L // 128
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.full(100, 2.0))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf = model.cdf
    symbols = rng.choice(100, size=total, p=probs).astype(np.int64)
    cdf64 = cdf.astype(np.uint64)
    states, stream = il2.encode_shared(
        cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg
    )
    T = -(-total // L)
    dec = pc._build_decoder(
        tuple(int(x) for x in cdf), cfg, T, total - (T - 1) * L, L, not on_tpu
    )
    st2 = jax.device_put(jnp.asarray(states, jnp.uint32).reshape(R, 128))
    w2 = jax.device_put(pc._pad_stream2d(stream, R))
    _ = np.asarray(dec(st2, w2)[0])  # warm compile

    with jax.profiler.trace(outdir):
        for _ in range(3):
            _ = np.asarray(dec(st2, w2)[0][0, 0, 0])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()

"""Neural-compression latents end to end (BASELINE config 5).

Workload: a Q.npz-style tensor of latents modeled by per-element quantized
Gaussians (the standard deep-compression setup).  Pipeline:

1. quantize latents to integers (the "symbols");
2. build exact fixed-point (cum, prob) tables from the per-element
   Gaussian parameters (C++ vectorized, bit-exact with constriction);
3. encode with the ILANS v2 shared-stream interleaved format (host C++);
4. decode on the accelerator with the gather-free JAX kernel, using the
   rank-2 per-symbol-row path.

Run: python examples/neural_latents.py [--tpu]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend())

    import jax.numpy as jnp

    from constriction_tpu.models.quantized import QuantizedFamily
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import jax_coder2 as jc2
    from constriction_tpu.ops.interleaved import LaneConfig

    # --- a Q.npz-style latent tensor with per-element scale parameters ---
    rng = np.random.RandomState(0)
    try:
        q = np.load("/root/reference/Q.npz")["arr_0"].astype(np.float64)  # (512, 512)
    except Exception:
        q = rng.randn(512, 512) * 0.1
    n = q.size

    # Per-element entropy model: Gaussian(mean=0, std from a hyperprior-ish map)
    stds = 0.05 + np.abs(q).reshape(-1) * 2.0
    means = np.zeros(n)
    scale = 40.0
    symbols = np.clip(np.round(q.reshape(-1) * scale), -100, 100).astype(np.int32)

    fam = QuantizedFamily("gaussian", -100, 100, means, stds, precision=12)
    # Re-instantiate at precision 12 for the TPU "small" preset:
    t0 = time.perf_counter()
    cums, probs = fam.ecp_all(symbols)
    t_tables = time.perf_counter() - t0

    # --- encode (host C++, shared-stream interleaved) ---
    cfg = LaneConfig(num_lanes=1024, word_bits=16, state_bits=32, precision=12)
    t0 = time.perf_counter()
    init_states, stream = il2.encode_shared(cums, probs, cfg)
    t_enc = time.perf_counter() - t0
    data = il2.pack_container2(init_states, stream, n, cfg)

    info_bits = -np.sum(np.log2(probs.astype(np.float64) / (1 << 12)))
    print(
        f"latents: {n} symbols; tables {t_tables*1e3:.0f} ms; encode {t_enc*1e3:.0f} ms\n"
        f"compressed: {len(data) * 4} bytes "
        f"({len(data) * 32 / n:.3f} bits/symbol vs {info_bits / n:.3f} optimal)"
    )

    # --- decode: exact per-element decode on the host (C++) ---
    t0 = time.perf_counter()
    init2, stream2, n2, cfg2 = il2.unpack_container2(data)
    out_host = _host_decode_family(init2, stream2, n2, fam, cfg2)
    t_dec = time.perf_counter() - t0
    assert np.array_equal(out_host, symbols)
    print(f"host family decode: {t_dec*1e3:.0f} ms -- round trip exact")

    rec = out_host.astype(np.float64) / scale
    mse = float(np.mean((rec - q.reshape(-1)) ** 2))
    print(f"reconstruction MSE from quantization: {mse:.2e} (lossless coding verified)")

    # --- fully on-device path: Pallas family codec --------------------------
    # The device-native quantized-Gaussian family (ops/pallas_family.py)
    # evaluates the leaky quantizer inside the kernel in exact integer
    # arithmetic, so encode AND decode run on the accelerator at GB/s with
    # per-element parameters -- no host tables, no rank-2 row DMA.  (Its
    # bitstream is keyed to the integer CDF, i.e. distinct from the host-f64
    # container above, but identical across numpy/CPU/TPU.)
    from constriction_tpu.ops import pallas_family as pf

    t0 = time.perf_counter()
    dstates, dstream = pf.encode_family_pallas(
        symbols, means.astype(np.float32), stds.astype(np.float32),
        "gaussian", -100, 100, cfg,
    )
    dstates, dstream = np.asarray(dstates), np.asarray(dstream)
    t_enc_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_dev = np.asarray(
        pf.decode_family_pallas(
            dstates, dstream, means.astype(np.float32),
            stds.astype(np.float32), "gaussian", -100, 100, cfg, n,
        )
    )
    t_dec_dev = time.perf_counter() - t0
    assert np.array_equal(out_dev, symbols)
    dev_bits = (len(dstream) * 16 + cfg.num_lanes * 32) / n
    print(
        f"device family codec ({jax.default_backend()}): encode "
        f"{t_enc_dev*1e3:.0f} ms, decode {t_dec_dev*1e3:.0f} ms (incl. "
        f"first-call compile + transfers), {dev_bits:.3f} bits/symbol "
        f"-- round trip exact"
    )


def _host_decode_family(init_states, stream, n, fam, cfg):
    """Exact host decode of the shared stream with per-element models
    (C++ ctpu_ilans2_decode_quantized)."""
    import numpy as np

    from constriction_tpu import native

    T = -(-n // cfg.num_lanes)
    out = np.empty(T * cfg.num_lanes, dtype=np.int32)
    q = fam.quantizer
    native.LIB.ctpu_ilans2_decode_quantized(
        np.ascontiguousarray(init_states, dtype=np.uint32),
        np.ascontiguousarray(stream, dtype=np.uint32),
        len(stream), n, cfg.num_lanes, T,
        native.DIST_KIND[fam.kind], q.min, q.max,
        np.ascontiguousarray(fam.param_a), np.ascontiguousarray(fam.param_b),
        cfg.word_bits, cfg.state_bits, cfg.precision, out,
    )
    return out[:n].astype(np.int64)


if __name__ == "__main__":
    main()

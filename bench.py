"""Headline benchmark: interleaved rANS decode throughput on one chip.

Two legs, mirroring the reference's published benchmark setup
(README.md:173-182 / benches/lookup.rs): i.i.d. symbols from a ~100-symbol
categorical model, decoded TPU-first with the ILANS2 shared-stream format
(constriction_tpu.ops.interleaved2):

- DEFAULT preset (PRECISION=24 / u32 words / u64 states -- the exact sizes
  the reference's Python API pins, stream/mod.rs:184-276): the Pallas
  ILANS2-64 kernel (ops/pallas_coder64.py, u32-pair limb arithmetic).
  This is the apples-to-apples headline against the reference's published
  6.1 ns/symbol default-preset decode, and is the JSON "value".
- small preset (P=12 / u16 / u32, the reference's lookup-decoder preset):
  the Pallas ILANS2 kernel (ops/pallas_coder.py, segtree model inversion),
  reported in the same JSON line as "small_preset_GBps".

Both kernels run 2^16 interleaved rANS lanes in lockstep: lane states in
VMEM, monotone butterfly refill via pltpu.roll, double-buffered stream
windows DMA'd from HBM.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N,
     "small_preset_GBps": N, "small_preset_vs_baseline": N}

vs_baseline is relative to the reference's fastest published decode:
6.1 ns/symbol (ANS 24/32/64 on an i7-7500U, README.md:202) = 0.1639 GB/s
for 1-byte symbols.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_DECODE_GBPS = 1.0 / 6.1  # 6.1 ns/symbol, 1-byte symbols

# Last-known-good cache: each timed leg is persisted here the moment it
# finishes, so a later crash (or a dead backend on the next run) can still
# produce the round's evidence instead of rc:1 with nothing (BENCH_r04 was
# lost exactly that way -- a transient `TPU backend setup/compile error`
# before any kernel ran).
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")


def _load_cache() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_cache(update: dict) -> None:
    cache = _load_cache()
    cache.update(update)
    cache.pop("source", None)  # fresh capture supersedes any seeded record
    cache["saved_at"] = time.time()
    try:
        with open(CACHE_PATH + ".tmp", "w") as f:
            json.dump(cache, f)
        os.replace(CACHE_PATH + ".tmp", CACHE_PATH)
    except Exception:
        pass


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


def _emit_stale_and_exit(reason: str) -> None:
    """Terminal-failure path: print last-known-good numbers, marked stale.

    rc stays 0 so the driver records a parseable artifact; `stale: true`
    plus the failure reason keeps the record honest."""
    cache = _load_cache()
    if "value" in cache:
        payload = {
            "metric": cache.get(
                "metric", "ILANS2-64 interleaved rANS decode GB/s/chip"
            ),
            "value": cache["value"],
            "unit": "GB/s",
            "vs_baseline": cache.get("vs_baseline", 0.0),
            "small_preset_GBps": cache.get("small_preset_GBps"),
            "small_preset_vs_baseline": cache.get("small_preset_vs_baseline"),
            "stale": True,
            "stale_reason": reason,
            "stale_measured_at": cache.get("saved_at"),
        }
        if cache.get("source"):
            payload["stale_source"] = cache["source"]
        _emit(payload)
        sys.exit(0)
    _emit(
        {
            "metric": "ILANS2 rANS decode GB/s/chip",
            "value": 0.0,
            "unit": "GB/s",
            "vs_baseline": 0.0,
            "error": reason,
        }
    )
    sys.exit(1)


def _force_cpu_requested() -> bool:
    # The site plugin pins jax_platforms="axon,cpu", so the JAX_PLATFORMS
    # env var alone does NOT stick; honor it via jax.config instead.
    return os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def _backend_alive_probe(timeout_s: float) -> bool:
    """Check backend health in a SUBPROCESS: a dead TPU tunnel can make
    `jax.default_backend()` hang indefinitely (observed >4 min), and a
    failed in-process init poisons jax's backend cache for the retry."""
    code = "import jax; jax.default_backend(); print('OK')"
    if _force_cpu_requested():
        code = (
            "import jax; jax.config.update('jax_platforms','cpu'); "
            "jax.default_backend(); print('OK')"
        )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        return r.returncode == 0 and "OK" in r.stdout
    except Exception:
        return False


def _wait_for_backend(attempts: int = 4, probe_timeout_s: float = 120.0,
                      backoff_s: float = 45.0) -> bool:
    # worst case ~10 min (4 x 120s probes + 3 x 45s backoffs): long enough
    # to ride out a slow healthy init or a brief transient, short enough
    # that the driver's capture window still records the stale fallback
    for i in range(attempts):
        if _backend_alive_probe(probe_timeout_s):
            return True
        print(
            f"# bench: backend probe {i + 1}/{attempts} failed; "
            f"retrying in {backoff_s:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        if i < attempts - 1:
            time.sleep(backoff_s)
    return False


def _chained_time(jitted_step, args, n_long, backend):
    """Chain n decodes inside ONE jit with a data dependency the compiler
    cannot elide; difference two chain lengths; medians over rounds (the
    dev tunnel adds ~30 ms dispatch RTT with +-10 ms jitter)."""
    import jax
    import jax.numpy as jnp

    def make_chained(n_inner):
        def run(*a):
            def body(i, carry):
                s0, chk = carry
                s2, contrib = jitted_step(s0, *a[1:])
                return s2, chk + contrib

            _, chk = jax.lax.fori_loop(0, n_inner, body, (a[0], jnp.uint32(0)))
            return chk

        return jax.jit(run)

    f1 = make_chained(1)
    fn_long = make_chained(n_long)
    _ = np.asarray(f1(*args))
    _ = np.asarray(fn_long(*args))
    t1s, tns = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f1(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(fn_long(*args))
        tns.append(time.perf_counter() - t0)
    t1s.sort()
    tns.sort()
    return max((tns[len(tns) // 2] - t1s[len(t1s) // 2]) / (n_long - 1), 1e-9)


def main() -> None:
    # Gate backend init behind a subprocess health probe with bounded
    # backoff, covering the transient tunnel outages that killed BENCH_r04
    # before any kernel ran.
    if not _wait_for_backend():
        _emit_stale_and_exit("backend init failed after 4 probe attempts")

    import jax

    if _force_cpu_requested():
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # persistent kernel cache: the exact-family row alone compiles ~10
    # Mosaic segment kernels; repeat runs on the same machine should pay
    # that once, not per process (decode timings are unaffected -- the
    # suite times steady-state chains, never first calls)
    import os as _os

    _cache = _os.path.expanduser("~/.cache/ctpu_xla")
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import interleaved2 as il2
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops import pallas_coder64 as pc64
    from constriction_tpu.ops.interleaved import LaneConfig

    backend = jax.default_backend()
    if backend == "tpu":
        num_lanes, total = 1 << 16, 1 << 25  # 33.5M symbols, 65536 lanes
    else:
        num_lanes, total = 1 << 10, 1 << 16
    # the chain must amortize the dev tunnel's ~30 ms +-20 ms dispatch
    # jitter: at n_long=17 the long chain carries only ~24 ms of device
    # work and a jitter spike can collapse the difference (one observed
    # run inflated the result 14x); 65 puts ~95 ms of work behind the
    # same RTT so the differenced slope is jitter-robust
    n_long = 65 if backend == "tpu" else 3
    interpret = backend != "tpu"

    rng = np.random.RandomState(1234)
    alphabet = 100
    probs = rng.dirichlet(np.full(alphabet, 2.0))
    symbols = rng.choice(alphabet, size=total, p=probs).astype(np.int64)
    L = num_lanes
    R = num_lanes // 128
    T = -(-total // num_lanes)
    tail = total - (T - 1) * num_lanes

    def fail(msg):
        print(
            json.dumps(
                {
                    "metric": "ILANS2 rANS decode GB/s/chip",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "error": msg,
                }
            )
        )
        sys.exit(1)

    # ---- DEFAULT preset leg: P=24 / W=32 / S=64 (reference default sizes) --
    model24 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 24
    )
    cdf24 = model24.cdf
    cfg64 = LaneConfig(num_lanes=L, word_bits=32, state_bits=64, precision=24)
    cdf24_64 = cdf24.astype(np.uint64)
    st64, stream64 = il2.encode_shared(
        cdf24_64[symbols], cdf24_64[symbols + 1] - cdf24_64[symbols], cfg64
    )
    dec64 = pc64._build_decoder64(
        tuple(int(x) for x in cdf24), cfg64, T, tail, L, interpret
    )
    st64h = np.asarray(st64, np.uint64)
    hi2 = jax.device_put(
        jnp.asarray((st64h >> np.uint64(32)).astype(np.uint32)).reshape(R, 128)
    )
    lo2 = jax.device_put(
        jnp.asarray((st64h & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(R, 128)
    )
    w64 = jax.device_put(pc._pad_stream2d(np.asarray(stream64), R))

    out = np.asarray(dec64(hi2, lo2, w64)[0]).reshape(-1)[:total]
    if not np.array_equal(out, symbols):
        fail("DEFAULT-preset round trip mismatch")

    def _sdec64(h, l, w):
        syms, _h2, _l2 = dec64(h, l, w)
        dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
        return h ^ dep, syms[0, 0, 0].astype(jnp.uint32)

    dt64 = _chained_time(_sdec64, (hi2, lo2, w64), n_long, backend)
    gbps64 = total / dt64 / 1e9
    if backend == "tpu":
        # persist the leg the moment it is timed (see CACHE_PATH note)
        _save_cache(
            {
                "metric": (
                    "ILANS2-64 interleaved rANS decode GB/s/chip at the "
                    "reference DEFAULT preset (P=24/u32/u64, 100-symbol "
                    "model, Pallas)"
                ),
                "value": round(gbps64, 4),
                "vs_baseline": round(gbps64 / REFERENCE_DECODE_GBPS, 2),
            }
        )

    # ---- small preset leg: P=12 / u16 / u32 (lookup-decoder preset) --------
    model12 = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf12 = model12.cdf
    cfg12 = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    cdf12_64 = cdf12.astype(np.uint64)
    st12, stream12 = il2.encode_shared(
        cdf12_64[symbols], cdf12_64[symbols + 1] - cdf12_64[symbols], cfg12
    )
    dec12 = pc._build_decoder(
        tuple(int(x) for x in cdf12), cfg12, T, tail, L, interpret
    )
    st12_2d = jax.device_put(
        jnp.asarray(np.asarray(st12), jnp.uint32).reshape(R, 128)
    )
    w12 = jax.device_put(pc._pad_stream2d(np.asarray(stream12), R))
    out = np.asarray(dec12(st12_2d, w12)[0]).reshape(-1)[:total]
    if not np.array_equal(out, symbols):
        fail("small-preset round trip mismatch")

    def _sdec12(s, w):
        syms, _f = dec12(s, w)
        dep = (syms[-1, -1, -1].astype(jnp.uint32) >> 31) & 1
        return s ^ dep, syms[0, 0, 0].astype(jnp.uint32)

    dt12 = _chained_time(_sdec12, (st12_2d, w12), n_long, backend)
    gbps12 = total / dt12 / 1e9
    if backend == "tpu":
        _save_cache(
            {
                "small_preset_GBps": round(gbps12, 4),
                "small_preset_vs_baseline": round(
                    gbps12 / REFERENCE_DECODE_GBPS, 2
                ),
            }
        )

    _emit(
        {
            "metric": (
                "ILANS2-64 interleaved rANS decode GB/s/chip at the "
                "reference DEFAULT preset (P=24/u32/u64, 100-symbol "
                "model, Pallas)"
            ),
            "value": round(gbps64, 4),
            "unit": "GB/s",
            "vs_baseline": round(gbps64 / REFERENCE_DECODE_GBPS, 2),
            "small_preset_GBps": round(gbps12, 4),
            "small_preset_vs_baseline": round(
                gbps12 / REFERENCE_DECODE_GBPS, 2
            ),
        }
    )


def _is_infra_error(exc: BaseException) -> bool:
    """Only INFRASTRUCTURE failures may fall back to stale numbers; a
    correctness failure (round-trip mismatch, assertion) must stay rc=1 --
    cached throughput for a broken build would be fabricated evidence."""
    text = f"{type(exc).__name__}: {exc}"
    needles = (
        "UNAVAILABLE", "DEADLINE", "RESOURCE_EXHAUSTED", "INTERNAL",
        "backend", "tunnel", "socket", "connect", "XlaRuntimeError",
        "TPU", "plugin", "initialize",
    )
    return any(n.lower() in text.lower() for n in needles)


if __name__ == "__main__":
    try:
        main()
    except (SystemExit, KeyboardInterrupt):
        raise
    except Exception as exc:  # noqa: BLE001 -- evidence must survive
        print(f"# bench: run failed: {exc!r}", file=sys.stderr, flush=True)
        if _is_infra_error(exc):
            _emit_stale_and_exit(f"{type(exc).__name__}: {exc}")
        _emit(
            {
                "metric": "ILANS2 rANS decode GB/s/chip",
                "value": 0.0,
                "unit": "GB/s",
                "vs_baseline": 0.0,
                "error": f"{type(exc).__name__}: {exc}",
            }
        )
        sys.exit(1)

import time
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from constriction_tpu.models.categorical import ContiguousCategoricalEntropyModel
from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops import jax_coder2 as jc2
from constriction_tpu.ops.interleaved import LaneConfig

rng = np.random.RandomState(1234)
alphabet = 100
probs = rng.dirichlet(np.full(alphabet, 2.0))
model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 12)
cdf = model.cdf
cdf64 = cdf.astype(np.uint64)
cdf_np = cdf64


def bench(B, L, T, lbl):
    block = T * L
    total = B * block
    cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
    symbols = rng.choice(alphabet, size=total, p=probs).astype(np.int64)
    sts, streams = [], []
    cap = 0
    for b in range(B):
        blk = symbols[b * block : (b + 1) * block]
        st, sm = il2.encode_shared(cdf64[blk], cdf64[blk + 1 - 1 + 1] - cdf64[blk], cfg) if False else il2.encode_shared(cdf64[blk], cdf64[blk + 1] - cdf64[blk], cfg)
        sts.append(st)
        streams.append(sm)
        cap = max(cap, len(sm))
    streams_p = np.zeros((B, cap), dtype=np.uint32)
    for b in range(B):
        streams_p[b, : len(streams[b])] = streams[b]
    st_d = jax.device_put(jnp.asarray(np.stack(sts), dtype=jnp.uint32))
    sm_d = jax.device_put(jnp.asarray(streams_p))

    def make_chained(n_inner):
        def run(s, w):
            def body(i, carry):
                s0, chk = carry
                syms = jc2.decode_shared_batched(s0, w, cdf_np, cfg, T, block)
                dep = (syms[0, -1].astype(jnp.uint32) >> 31) & 1
                return s0 ^ dep, chk + syms[0, 0].astype(jnp.uint32)
            _, chk = jax.lax.fori_loop(0, n_inner, body, (s, jnp.uint32(0)))
            return chk
        return jax.jit(run)

    # verify
    out = jax.jit(lambda s, w: jc2.decode_shared_batched(s, w, cdf_np, cfg, T, block))(st_d, sm_d)
    out = np.asarray(out).reshape(-1)[:total]
    assert np.array_equal(out, symbols), f"mismatch {lbl}"

    f1, f9 = make_chained(1), make_chained(9)
    _ = np.asarray(f1(st_d, sm_d)); _ = np.asarray(f9(st_d, sm_d))
    per = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = np.asarray(f1(st_d, sm_d)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(f9(st_d, sm_d)); t9 = time.perf_counter() - t0
        per.append((t9 - t1) / 8)
    best = min(per)
    print(f"{lbl}: per-decode {best*1e3:.2f} ms = {total/best/1e9:.2f} GB/s  (all: {[f'{p*1e3:.1f}' for p in per]})", flush=True)


bench(1, 1 << 15, 512, "B=1 L=32K T=512 (16.7M)")
bench(4, 1 << 15, 128, "B=4 L=32K T=128 (16.7M)")
bench(8, 1 << 15, 64, "B=8 L=32K T=64  (16.7M)")
bench(8, 1 << 15, 128, "B=8 L=32K T=128 (33.5M)")
bench(4, 1 << 13, 512, "B=4 L=8K  T=512 (16.7M)")

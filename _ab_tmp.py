import time
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from constriction_tpu.models.categorical import ContiguousCategoricalEntropyModel
from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops import jax_coder2 as jc2
from constriction_tpu.ops.interleaved import LaneConfig

L, total = 1 << 15, 1 << 26  # 67M symbols
T = total // L
rng = np.random.RandomState(1234)
alphabet = 100
probs = rng.dirichlet(np.full(alphabet, 2.0))
model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(probs, 12)
cdf = model.cdf
symbols = rng.choice(alphabet, size=total, p=probs).astype(np.int64)
cfg = LaneConfig(num_lanes=L, word_bits=16, state_bits=32, precision=12)
cdf64 = cdf.astype(np.uint64)
t0 = time.perf_counter()
init_states, stream = il2.encode_shared(cdf64[symbols], cdf64[symbols + 1] - cdf64[symbols], cfg)
print(f"encode {time.perf_counter()-t0:.1f}s; stream {len(stream)} words", flush=True)

states_d = jax.device_put(jnp.asarray(init_states, dtype=jnp.uint32))
stream_d = jax.device_put(jnp.asarray(stream, dtype=jnp.uint32))
stream16_d = jax.device_put(jnp.asarray(stream.astype(np.uint16)))
cdf_np = cdf.astype(np.uint64)

shrink = jax.jit(lambda o: o.ravel()[:1])

# production kernel (u16 path active since W=16, L<=65536)
f_prod = jax.jit(lambda s, w: jc2.decode_shared_compare_sum(s, w, cdf_np, cfg, T, total))
out = f_prod(states_d, stream_d)
assert np.array_equal(np.asarray(out)[:total], symbols), "prod mismatch"
print("prod verified", flush=True)

# pre-cast u16 stream variant (avoids in-graph cast)
f_prod16 = jax.jit(lambda s, w: jc2.decode_shared_compare_sum(s, w, cdf_np, cfg, T, total))
out = f_prod16(states_d, stream16_d)
assert np.array_equal(np.asarray(out)[:total], symbols), "prod16 mismatch"
print("prod16 verified", flush=True)

def sample(f, a, b, reps=8):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(shrink(f(a, b)))
        ts.append(time.perf_counter() - t0)
    return ts

for rnd in range(3):
    ta = sample(f_prod, states_d, stream_d)
    tb = sample(f_prod16, states_d, stream16_d)
    print(f"round {rnd}: u32-in median {np.median(ta)*1e3:.2f} ms ({total/np.median(ta)/1e9:.2f} GB/s) | "
          f"u16-in median {np.median(tb)*1e3:.2f} ms ({total/np.median(tb)/1e9:.2f} GB/s) | "
          f"min {min(ta)*1e3:.2f}/{min(tb)*1e3:.2f} ms -> max {total/min(ta)/1e9:.2f}/{total/min(tb)/1e9:.2f} GB/s", flush=True)

"""Variant benchmark of ILANS2 decode components on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)  # init backend before slow host work

from constriction_tpu.models.categorical import ContiguousCategoricalEntropyModel
from constriction_tpu.ops import interleaved2 as il2
from constriction_tpu.ops import jax_coder2 as jc2
from constriction_tpu.ops.interleaved import LaneConfig

L, total = 1 << 15, 1 << 24
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
print(f"host encode: {time.perf_counter()-t0:.1f}s", flush=True)

states_d = jax.device_put(jnp.asarray(init_states, dtype=jnp.uint32))
stream_d = jax.device_put(jnp.asarray(stream, dtype=jnp.uint32))
cdf_np = cdf.astype(np.uint64)

shrink = jax.jit(lambda o: o.ravel()[:1])
noop = jax.jit(lambda s: s[:1])

def timed(decode, reps=20):
    out = decode(states_d, stream_d)
    _ = np.asarray(shrink(out))
    _ = np.asarray(noop(states_d))
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(noop(states_d))
    rtt = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = np.asarray(shrink(decode(states_d, stream_d)))
    dt = (time.perf_counter() - t0) / reps - rtt
    return max(dt, 1e-9)

# full (baseline)
f_full = jax.jit(lambda s, w: jc2.decode_shared_compare_sum(s, w, cdf_np, cfg, T, total))
dt = timed(f_full)
print(f"full decode:        {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

# u8 output
f_u8 = jax.jit(lambda s, w: jc2.decode_shared_compare_sum(s, w, cdf_np, cfg, T, total, out_dtype=jnp.uint8))
dt = timed(f_u8)
print(f"u8 output:          {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

# no output at all (sym not stacked): measure by summing syms into carry
def decode_nostack(s, w):
    import numpy as _np
    Lc = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = jc2._log2(Lc)
    lower = _np.uint32(1 << (S - W))
    qmask = _np.uint32((1 << P) - 1)
    lanes = jnp.arange(Lc, dtype=jnp.uint32)
    sp = jnp.concatenate([w, jnp.zeros(Lc, jnp.uint32)])
    def step(carry, t):
        states, base, acc = carry
        q = states & qmask
        sym, cum, prob = jc2._compare_sum_qf(q, cdf_np)
        states = (states >> P) * prob + (q - cum)
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(sp, (base,), (Lc,))
        ex = jc2._expand_monotone(chunk, lanes - ranks, log_l)
        states = jnp.where(m, (states << W) | ex, states)
        return (states, base + k.astype(jnp.int32), acc + sym), None
    (st, b, acc), _ = jax.lax.scan(step, (s, jnp.int32(0), jnp.zeros(Lc, jnp.uint32)), jnp.arange(T, dtype=jnp.int32))
    return acc
f_nostack = jax.jit(decode_nostack)
dt = timed(f_nostack)
print(f"no ys stacking:     {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

# no compare-sum (fixed fake model): isolates format machinery
def decode_nocs(s, w):
    import numpy as _np
    Lc = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = jc2._log2(Lc)
    lower = _np.uint32(1 << (S - W))
    qmask = _np.uint32((1 << P) - 1)
    lanes = jnp.arange(Lc, dtype=jnp.uint32)
    sp = jnp.concatenate([w, jnp.zeros(Lc, jnp.uint32)])
    def step(carry, t):
        states, base, acc = carry
        q = states & qmask
        prob = (q >> 4) + 1   # fake
        cum = q & ~jnp.uint32(15)
        states = (states >> P) * prob + (q - cum)
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(sp, (base,), (Lc,))
        ex = jc2._expand_monotone(chunk, lanes - ranks, log_l)
        states = jnp.where(m, (states << W) | ex, states)
        return (states, base + k.astype(jnp.int32), acc + q), None
    (st, b, acc), _ = jax.lax.scan(step, (s, jnp.int32(0), jnp.zeros(Lc, jnp.uint32)), jnp.arange(T, dtype=jnp.int32))
    return acc
dt = timed(jax.jit(decode_nocs))
print(f"no compare-sum:     {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

# no butterfly/cumsum (fake refill with static chunk): isolates compare-sum+arith
def decode_nobf(s, w):
    import numpy as _np
    Lc = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    lower = _np.uint32(1 << (S - W))
    qmask = _np.uint32((1 << P) - 1)
    sp = jnp.concatenate([w, jnp.zeros(Lc, jnp.uint32)])
    def step(carry, t):
        states, base, acc = carry
        q = states & qmask
        sym, cum, prob = jc2._compare_sum_qf(q, cdf_np)
        states = (states >> P) * prob + (q - cum)
        m = states < lower
        chunk = jax.lax.dynamic_slice(sp, (base,), (Lc,))
        states = jnp.where(m, (states << W) | chunk, states)
        return (states, base + jnp.int32(1), acc + sym), None
    (st, b, acc), _ = jax.lax.scan(step, (s, jnp.int32(0), jnp.zeros(Lc, jnp.uint32)), jnp.arange(T, dtype=jnp.int32))
    return acc
dt = timed(jax.jit(decode_nobf))
print(f"no butterfly:       {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

# unroll=2 full
def decode_unroll(s, w):
    import numpy as _np
    Lc = cfg.num_lanes
    S, W, P = cfg.state_bits, cfg.word_bits, cfg.precision
    log_l = jc2._log2(Lc)
    lower = _np.uint32(1 << (S - W))
    qmask = _np.uint32((1 << P) - 1)
    lanes = jnp.arange(Lc, dtype=jnp.uint32)
    sp = jnp.concatenate([w, jnp.zeros(Lc, jnp.uint32)])
    def step(carry, t):
        states, base = carry
        q = states & qmask
        sym, cum, prob = jc2._compare_sum_qf(q, cdf_np)
        states = (states >> P) * prob + (q - cum)
        m = states < lower
        m32 = m.astype(jnp.uint32)
        ranks = jnp.cumsum(m32) - m32
        k = ranks[-1] + m32[-1]
        chunk = jax.lax.dynamic_slice(sp, (base,), (Lc,))
        ex = jc2._expand_monotone(chunk, lanes - ranks, log_l)
        states = jnp.where(m, (states << W) | ex, states)
        return (states, base + k.astype(jnp.int32)), sym.astype(jnp.uint8)
    (st, b), syms = jax.lax.scan(step, (s, jnp.int32(0)), jnp.arange(T, dtype=jnp.int32), unroll=4)
    return syms
dt = timed(jax.jit(decode_unroll))
print(f"u8 + unroll=4:      {dt*1e3:7.2f} ms  {total/dt/1e9:6.2f} GB/s", flush=True)

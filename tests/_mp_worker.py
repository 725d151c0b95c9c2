"""Worker for the multi-process mesh test (see test_multiprocess.py).

Each process owns 4 local CPU devices; 2 processes form one 8-device global
mesh.  The sharded container decode runs as a single SPMD program whose
final `all_gather` crosses the process boundary -- the CPU analog of the
DCN/ICI hop on a real multi-host v5p slice (SURVEY section 4 implication c;
the reference has no distributed analog, its seam is the backend trait pair
backends.rs:200-269).

Usage: python tests/_mp_worker.py <coordinator> <process_id> <num_processes>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the site plugin pre-sets jax_platforms; force CPU with 4 local devices
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    n_global = len(jax.devices())
    assert n_global == 4 * nproc, n_global

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from constriction_tpu import parallel
    from constriction_tpu.models.categorical import (
        ContiguousCategoricalEntropyModel,
    )
    from constriction_tpu.ops import pallas_coder as pc
    from constriction_tpu.ops.interleaved import LaneConfig

    # identical inputs on every process (seeded)
    rng = np.random.RandomState(7)
    alphabet = 20
    probs = rng.dirichlet(np.ones(alphabet))
    model = ContiguousCategoricalEntropyModel.from_floating_point_probabilities_fast(
        probs, 12
    )
    cdf = model.cdf
    n = 3001
    symbols = rng.choice(alphabet, size=n, p=probs).astype(np.int64)
    cfg = LaneConfig(num_lanes=128, word_bits=16, state_bits=32, precision=12)
    B = n_global

    # deterministic host encode -> container bytes agree across processes
    cont = parallel.encode(symbols, cdf, cfg=cfg, num_blocks=B, device=False)
    states, streams, n_true, block_len, cfg2, _coder = parallel.unpack_sharded(cont)
    assert n_true == n

    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pc._build_decoder(
        tuple(int(x) for x in cdf), cfg, T, tail, L, True
    )
    from constriction_tpu.parallel.container import _stack_streams

    streams_arr, _ = _stack_streams(streams, R)

    mesh = Mesh(np.array(jax.devices()), (parallel.BLOCK_AXIS,))
    sh = NamedSharding(mesh, P(parallel.BLOCK_AXIS))

    def to_global(arr):
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    st_g = to_global(states.astype(np.uint32))
    streams_g = to_global(streams_arr)

    def per_device(st_b, stream_b):
        syms, _ = fn_k(st_b[0].reshape(R, pc.LANES), stream_b[0])
        # the cross-process collective: in-order gather over the global mesh
        return jax.lax.all_gather(
            syms.reshape(-1)[:block_len], parallel.BLOCK_AXIS
        )

    fn = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(parallel.BLOCK_AXIS), P(parallel.BLOCK_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = np.asarray(fn(st_g, streams_g)).reshape(-1)[:n]
    assert np.array_equal(out, symbols), "multi-process sharded decode mismatch"
    print(f"MP_OK pid={pid} devices={n_global}", flush=True)

    # same mesh + cross-process gather for the RANGE-semantics container
    # (queue coder blocks: stored states are the decoder point headers)
    cont_r = parallel.encode(
        symbols, cdf, cfg=cfg, num_blocks=B, device=False, coder="range"
    )
    pts, streams_r, n_r, block_len_r, _, coder_id = parallel.unpack_sharded(cont_r)
    assert n_r == n and coder_id == 1
    T_r = -(-block_len_r // L)
    tail_r = block_len_r - (T_r - 1) * L
    fn_rk = pc._build_range_decoder(
        tuple(int(x) for x in cdf), cfg, T_r, tail_r, L, True
    )
    streams_arr_r, _ = _stack_streams(streams_r, R)
    pts_g = to_global(pts.astype(np.uint32))
    streams_rg = to_global(streams_arr_r)

    def per_device_range(pt_b, stream_b):
        syms = fn_rk(pt_b[0].reshape(R, pc.LANES), stream_b[0])[0]
        return jax.lax.all_gather(
            syms.reshape(-1)[:block_len_r], parallel.BLOCK_AXIS
        )

    fn_r = jax.jit(
        jax.shard_map(
            per_device_range,
            mesh=mesh,
            in_specs=(P(parallel.BLOCK_AXIS), P(parallel.BLOCK_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
    )
    out_r = np.asarray(fn_r(pts_g, streams_rg)).reshape(-1)[:n]
    assert np.array_equal(out_r, symbols), "multi-process range decode mismatch"
    print(f"MP_RANGE_OK pid={pid} devices={n_global}", flush=True)


if __name__ == "__main__":
    main()

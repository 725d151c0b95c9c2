"""Data-parallel block sharding of interleaved rANS over a device mesh.

The message is split into ``D`` independent blocks (one per device along the
``"blocks"`` mesh axis); each device encodes/decodes its block's ``L`` lanes
locally with the jittable kernels from :mod:`constriction_tpu.ops.jax_coder`.
No cross-device communication happens in the hot loop -- the only collectives
are the in-order gather of per-block word counts and payloads at the end
(``jax.lax.all_gather`` rides ICI within a slice / DCN across hosts), which
replaces the reference's pluggable word-stream backend seam
(/root/reference/src/backends.rs:200-269) with a sharded device-array backend.

Bit-compatibility: a sharded container decodes to exactly the same symbols on
any mesh shape, because block boundaries are part of the container header and
each block is an ordinary ILANS unit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import jax_coder
from ..ops.interleaved import LaneConfig

BLOCK_AXIS = "blocks"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def shard_encode(
    mesh: Mesh,
    cums: jax.Array,  # [D, T, L] u32
    probs: jax.Array,  # [D, T, L] u32
    block_lens: jax.Array,  # i32[D] number of symbols per block
    cfg: LaneConfig,
    num_steps: int,
    max_words: int,
) -> Tuple[jax.Array, jax.Array]:
    """Encode D blocks in parallel; returns (words [D, L, max_words],
    counts [D, L]), both sharded along the block axis."""

    def per_block(cums_b, probs_b, len_b):
        # cums_b: [1, T, L] (this device's shard)
        words, counts = jax_coder.jax_encode_dynamic(
            cums_b[0], probs_b[0], cfg, num_steps, len_b[0], max_words
        )
        return words[None], counts[None]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(cums, probs, block_lens)


def shard_decode_lookup(
    mesh: Mesh,
    words: jax.Array,  # [D, L, M] u32
    counts: jax.Array,  # [D, L] i32
    block_lens: jax.Array,  # i32[D]
    lookup: jax.Array,
    packed_cdf: jax.Array,
    cfg: LaneConfig,
    num_steps: int,
) -> jax.Array:
    """Decode D blocks in parallel with a shared lookup model (replicated
    tables); returns [D, num_steps * L] i32, sharded along blocks."""

    def per_block(words_b, counts_b, len_b, lookup_r, packed_r):
        syms = jax_coder.jax_decode_lookup_dynamic(
            words_b[0], counts_b[0], lookup_r, packed_r, cfg, num_steps, len_b[0]
        )
        return syms[None]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P(), P()),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(words, counts, block_lens, lookup, packed_cdf)


def gather_blocks(mesh: Mesh, words: jax.Array, counts: jax.Array):
    """In-order all-gather of the per-block compressed words + length tables
    so every device (and the host) holds the full container."""

    def g(words_b, counts_b):
        return (
            jax.lax.all_gather(words_b[0], BLOCK_AXIS),
            jax.lax.all_gather(counts_b[0], BLOCK_AXIS),
        )

    fn = jax.shard_map(
        g,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(words, counts)


# ---------------------------------------------------------------------------
# ILANS v2 (shared-stream, gather-free) block sharding
# ---------------------------------------------------------------------------


def shard_encode2(
    mesh: Mesh,
    cums: jax.Array,  # [D, T, L] u32
    probs: jax.Array,  # [D, T, L] u32
    block_lens: jax.Array,  # i32[D]
    cfg: LaneConfig,
    num_steps: int,
    max_stream: int,
):
    """Encode D independent ILANS2 blocks in parallel.

    Returns (init_states [D, L], streams [D, max_stream] right-aligned,
    stream_lens [D]), sharded along the block axis.
    """
    from ..ops import jax_coder2 as jc2

    def per_block(cums_b, probs_b, len_b):
        st, stream, slen = jc2.encode_shared_tables(
            cums_b[0], probs_b[0], cfg, num_steps, len_b[0], max_stream
        )
        return st[None], stream[None], slen[None]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(cums, probs, block_lens.reshape(-1, 1))


def shard_decode2(
    mesh: Mesh,
    init_states: jax.Array,  # [D, L]
    streams: jax.Array,  # [D, stream_cap] left-aligned per block
    block_lens: jax.Array,  # i32[D]
    cdf: np.ndarray,
    cfg: LaneConfig,
    num_steps: int,
):
    """Decode D ILANS2 blocks in parallel with a shared (baked-in) CDF."""
    from ..ops import jax_coder2 as jc2

    cdf = np.asarray(cdf, dtype=np.uint64)

    def per_block(st_b, stream_b, len_b):
        syms = jc2.decode_shared_compare_sum(
            st_b[0], stream_b[0], cdf, cfg, num_steps, len_b[0, 0]
        )
        return syms[None]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(init_states, streams, block_lens.reshape(-1, 1))


# ---------------------------------------------------------------------------
# Pallas-kernel block sharding (the flagship per-chip path, data-parallel)
# ---------------------------------------------------------------------------


def shard_decode2_pallas(
    mesh: Mesh,
    init_states: jax.Array,  # [D, L] u32
    streams2d: jax.Array,  # [D, rows, 128] u32 (padded, see pallas_coder)
    cdf: np.ndarray,
    cfg: LaneConfig,
    block_len: int,
    interpret: Optional[bool] = None,
):
    """Decode D equal-length ILANS2 blocks in parallel, one Pallas kernel
    per device.  All blocks carry ``block_len`` symbols (pad the message);
    SPMD requires the same static shape on every device.  Returns
    [D, block_len] i32 sharded along blocks."""
    from ..ops import pallas_coder as pc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pc._build_decoder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )

    def per_block(st_b, stream_b):
        syms, _ = fn_k(st_b[0].reshape(R, pc.LANES), stream_b[0])
        return syms.reshape(-1)[None, :block_len]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(init_states, streams2d)


def shard_decode64_pallas(
    mesh: Mesh,
    states_hi: jax.Array,  # [D, L] u32 (lane-state high words)
    states_lo: jax.Array,  # [D, L] u32
    streams2d: jax.Array,  # [D, rows, 128] u32
    cdf: np.ndarray,
    cfg: LaneConfig,
    block_len: int,
    interpret: Optional[bool] = None,
):
    """Default-preset (W=32/S=64/P<=24) twin of :func:`shard_decode2_pallas`:
    decode D equal-length ILANS2-64 blocks in parallel, one
    ops/pallas_coder64.py kernel per device."""
    from ..ops import pallas_coder as pc
    from ..ops import pallas_coder64 as pc64

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pc64._build_decoder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )

    def per_block(hi_b, lo_b, stream_b):
        syms, _hi, _lo = fn_k(
            hi_b[0].reshape(R, pc.LANES), lo_b[0].reshape(R, pc.LANES),
            stream_b[0],
        )
        return syms.reshape(-1)[None, :block_len]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(states_hi, states_lo, streams2d)


def shard_decode_range64_pallas(
    mesh: Mesh,
    points_hi: jax.Array,  # [D, L] u32 (point high words)
    points_lo: jax.Array,  # [D, L] u32
    streams2d: jax.Array,  # [D, rows, 128] u32
    cdf: np.ndarray,
    cfg: LaneConfig,
    block_len: int,
    interpret: Optional[bool] = None,
):
    """Default-preset (ILANS2-R64) twin of :func:`shard_decode_range_pallas`:
    D equal-length range-coded blocks decoded in parallel.  Returns
    ``([D, block_len] i32, [D] i32 invalid-data flags)``."""
    from ..ops import pallas_coder as pc
    from ..ops import pallas_coder64 as pc64

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pc64._build_range_decoder64(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )

    def per_block(hi_b, lo_b, stream_b):
        syms, _phi, _plo, bad = fn_k(
            hi_b[0].reshape(R, pc.LANES), lo_b[0].reshape(R, pc.LANES),
            stream_b[0],
        )
        return syms.reshape(-1)[None, :block_len], bad[:1]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(points_hi, points_lo, streams2d)


def shard_encode2_pallas(
    mesh: Mesh,
    symbols: jax.Array,  # [D, block_len] i32
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: Optional[bool] = None,
):
    """Encode D equal-length symbol blocks in parallel with the Pallas
    encoder.  Returns (init_states [D, L], stream_bufs [D, cap_rows+R+2, 128],
    ends [D, 2]) sharded along blocks; block d's words are
    ``stream_bufs[d].reshape(-1)[ends[d, 0] : cap_rows * 128]``."""
    from ..ops import pallas_coder as pc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D, block_len = symbols.shape
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    cap_rows = T * R + 1
    fn_k = pc._build_encoder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, cap_rows,
        interpret,
    )
    pad = T * L - block_len

    def per_block(syms_b):
        s = syms_b[0]
        if pad:
            s = jnp.concatenate([s, jnp.zeros(pad, jnp.int32)])
        buf, states, end = fn_k(s.reshape(T, R, pc.LANES))
        return states.reshape(-1)[None], buf[None], end[None]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS),),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(symbols.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Host-level convenience: end-to-end sharded iid encode/decode
# ---------------------------------------------------------------------------


def prepare_blocks(
    symbols: np.ndarray, cdf: np.ndarray, num_blocks: int, cfg: LaneConfig
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split symbols into num_blocks equal blocks; build [D, T, L] tables."""
    n = len(symbols)
    D = num_blocks
    L = cfg.num_lanes
    block = -(-n // D)
    T = -(-block // L)
    cdf64 = np.asarray(cdf, dtype=np.uint64)
    symbols = np.asarray(symbols, dtype=np.int64)

    cums = np.zeros((D, T * L), dtype=np.uint32)
    probs = np.ones((D, T * L), dtype=np.uint32)
    lens = np.zeros(D, dtype=np.int32)
    for d in range(D):
        blk = symbols[d * block : (d + 1) * block]
        lens[d] = len(blk)
        cums[d, : len(blk)] = cdf64[blk]
        probs[d, : len(blk)] = (cdf64[blk + 1] - cdf64[blk]).astype(np.uint32)
    return (
        cums.reshape(D, T, L),
        probs.reshape(D, T, L),
        lens,
        T,
    )


def shard_decode_range_pallas(
    mesh: Mesh,
    points: jax.Array,  # [D, L] u32
    streams2d: jax.Array,  # [D, rows, 128] u32
    cdf: np.ndarray,
    cfg: LaneConfig,
    block_len: int,
    interpret: Optional[bool] = None,
):
    """ILANS2-R twin of :func:`shard_decode2_pallas`: D equal-length range
    blocks in parallel.  Returns (symbols [D, block_len] i32,
    invalid [D] i32)."""
    from ..ops import pallas_coder as pc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pc._build_range_decoder(
        tuple(int(x) for x in np.asarray(cdf)), cfg, T, tail, L, interpret
    )

    def per_block(pt_b, stream_b):
        syms, _pts, bad = fn_k(pt_b[0].reshape(R, pc.LANES), stream_b[0])
        return syms.reshape(-1)[None, :block_len], bad[:1]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(points, streams2d)


def shard_decode_family_pallas(
    mesh: Mesh,
    init_states: jax.Array,  # [D, L] u32
    params: jax.Array,  # [D, T, 2, R, 128] f32 (mean, scale)
    streams2d: jax.Array,  # [D, rows, 128] u32
    family: str,
    min_sym: int,
    max_sym: int,
    cfg: LaneConfig,
    block_len: int,
    interpret: Optional[bool] = None,
):
    """Per-symbol continuous-family decode, data-parallel over blocks
    (each block has its own per-symbol (mean, scale) streams)."""
    from ..ops import pallas_coder as pc
    from ..ops import pallas_family as pf

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = pf._build_family_decoder(
        family, int(min_sym), int(max_sym), cfg, T, tail, L, interpret
    )

    def per_block(st_b, params_b, stream_b):
        syms, _ = fn_k(st_b[0].reshape(R, pc.LANES), params_b[0], stream_b[0])
        return syms.reshape(-1)[None, :block_len]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(init_states, params, streams2d)


def shard_tchain_decode_pallas(
    mesh: Mesh,
    qwords: jax.Array,  # [D, T, R/2, 128] u32 packed quantiles
    cdf: np.ndarray,
    cfg: LaneConfig,
    interpret: Optional[bool] = None,
):
    """TChain-16 bits-back decode, one block per device.  Returns
    (symbols [D, T*L] i32, remainder buffers [D, cap_rows+R+2, 128] u32,
    heads [D, L] u32, ends [D, 2] i32)."""
    from ..ops import tchain as tc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    T = int(qwords.shape[1])
    fn_k = tc._build_tchain_decoder(
        tuple(int(x) for x in np.asarray(cdf)), T, L, interpret
    )

    def per_block(qw_b):
        syms, buf, heads, end = fn_k(qw_b[0])
        return (
            syms.reshape(-1)[None],
            buf[None],
            heads.reshape(-1)[None],
            end[None],
        )

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS),),
        out_specs=(P(BLOCK_AXIS),) * 4,
        check_vma=False,
    )
    return fn(qwords)


def shard_decode_exact_family_pallas(
    mesh: Mesh,
    init_states: jax.Array,  # [D, L] u32
    tabs: jax.Array,  # [D, T, CP1, R, 128] u32 exact boundary planes
    streams2d: jax.Array,  # [D, rows, 128] u32
    min_sym: int,
    max_sym: int,
    cfg: LaneConfig,
    block_len: int,
    cmax: int,
    interpret: Optional[bool] = None,
):
    """REFERENCE-EXACT family decode, data-parallel over blocks (each block
    carries its own host-precomputed exact boundary planes)."""
    from ..ops import exact_family as ef
    from ..ops import pallas_coder as pc

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = cfg.num_lanes
    R = L // pc.LANES
    T = -(-block_len // L)
    tail = block_len - (T - 1) * L
    fn_k = ef._build_exact_decoder(
        int(min_sym), int(max_sym), cfg, T, tail, L, cmax, interpret
    )

    def per_block(st_b, tabs_b, stream_b):
        syms, _ = fn_k(st_b[0].reshape(R, pc.LANES), tabs_b[0], stream_b[0])
        return syms.reshape(-1)[None, :block_len]

    fn = jax.shard_map(
        per_block,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(init_states, tabs, streams2d)

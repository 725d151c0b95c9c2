"""Multi-device parallelism: block sharding of interleaved coders over a mesh."""

from .sharding import (
    BLOCK_AXIS,
    gather_blocks,
    make_mesh,
    prepare_blocks,
    shard_decode2,
    shard_decode2_pallas,
    shard_decode_lookup,
    shard_encode,
    shard_encode2,
    shard_encode2_pallas,
)

__all__ = [
    "BLOCK_AXIS",
    "gather_blocks",
    "make_mesh",
    "prepare_blocks",
    "shard_decode2",
    "shard_decode2_pallas",
    "shard_decode_lookup",
    "shard_encode",
    "shard_encode2",
    "shard_encode2_pallas",
]

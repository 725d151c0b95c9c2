"""Multi-device parallelism: block sharding of interleaved coders over a mesh."""

from .container import (
    decode,
    encode,
    pack_sharded,
    unpack_sharded,
)
from .sharding import (
    BLOCK_AXIS,
    shard_decode_exact_family_pallas,
    shard_decode_family_pallas,
    shard_decode_range_pallas,
    shard_tchain_decode_pallas,
    gather_blocks,
    make_mesh,
    prepare_blocks,
    shard_decode2,
    shard_decode2_pallas,
    shard_decode64_pallas,
    shard_decode_range64_pallas,
    shard_decode_lookup,
    shard_encode,
    shard_encode2,
    shard_encode2_pallas,
)

__all__ = [
    "BLOCK_AXIS",
    "decode",
    "encode",
    "pack_sharded",
    "unpack_sharded",
    "gather_blocks",
    "make_mesh",
    "prepare_blocks",
    "shard_decode2",
    "shard_decode2_pallas",
    "shard_decode64_pallas",
    "shard_decode_range64_pallas",
    "shard_decode_lookup",
    "shard_encode",
    "shard_encode2",
    "shard_encode2_pallas",
    "shard_decode_exact_family_pallas",
    "shard_decode_family_pallas",
    "shard_decode_range_pallas",
    "shard_tchain_decode_pallas",
]

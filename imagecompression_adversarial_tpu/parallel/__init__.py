"""Parallelism layer: device meshes, dp batch sharding, sp row sharding,
and overlap-tile spatial scaling (SURVEY §2.7; green-field vs the
single-GPU reference)."""

from .batch_attack import make_sharded_attack_fn
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .spatial import tile_image, tiled_forward, untile_image
from .spatial_shard import (
    make_spatial_attack_fn,
    make_spatial_forward,
    row_sharding,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_sharded_attack_fn",
    "make_spatial_attack_fn",
    "make_spatial_forward",
    "replicate",
    "replicated",
    "row_sharding",
    "shard_batch",
    "tile_image",
    "tiled_forward",
    "untile_image",
]

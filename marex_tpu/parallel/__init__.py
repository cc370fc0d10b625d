"""SPMD sharding layer for multi-chip scaling."""

from .mesh import (
    constrain,
    detect_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_put,
    track_sharding,
)

__all__ = [
    "make_mesh",
    "detect_sharding",
    "track_sharding",
    "replicated",
    "constrain",
    "shard_put",
    "pad_to_multiple",
]

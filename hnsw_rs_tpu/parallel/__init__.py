"""Mesh-parallel scale-out: query DP over a replicated index and sharded
sub-index search with distributed top-k merge (SURVEY.md §2.6)."""

from .mesh import data_sharding, make_mesh, replicated, shard_sharding
from .replicated import ReplicatedHNSW
from .sharded import ShardedHNSW

__all__ = [
    "make_mesh",
    "data_sharding",
    "shard_sharding",
    "replicated",
    "ReplicatedHNSW",
    "ShardedHNSW",
]

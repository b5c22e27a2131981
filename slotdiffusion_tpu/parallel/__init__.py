from .distributed import maybe_initialize_distributed
from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "maybe_initialize_distributed",
]

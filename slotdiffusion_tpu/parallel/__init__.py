from .distributed import maybe_initialize_distributed
from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .tp import param_spec, tp_param_count, train_state_shardings

__all__ = [
    "param_spec",
    "tp_param_count",
    "train_state_shardings",
    "make_mesh",
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "maybe_initialize_distributed",
]

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    host_local_slice,
    plan_batch_placement,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "host_local_slice",
    "plan_batch_placement",
    "replicate",
]

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    host_local_slice,
    plan_batch_placement,
    replicate,
)
from .zero import shard_tree_zero, zero_spec, tree_device_bytes

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "host_local_slice",
    "plan_batch_placement",
    "replicate",
    "shard_tree_zero",
    "zero_spec",
    "tree_device_bytes",
]

"""ZeRO-style sharding of optimizer state (and optionally params) over 'data'.

The reference's only parallelism is replicate-everything nn.DataParallel
(/root/reference/model/networks.py:177-179): every GPU holds a full copy of
params AND the Adam moments. On a TPU mesh that redundancy is pure HBM waste —
the moments are only read/written by the elementwise optimizer update, so each
device only ever needs 1/N of them.

TPU-native formulation (the scaling-book recipe, annotation-only):

  * **ZeRO-1** (`shard_tree_zero` on the optax state): every Adam moment
    tensor is sharded over the 'data' axis on its largest divisible dim.
    GSPMD partitions the elementwise moment update across devices and inserts
    ONE all-gather of the parameter-update tree per step (same bytes as the
    psum it already does for grads, riding ICI). Per-device optimizer memory
    drops ~N×; the train step math is unchanged.
  * **FSDP** (`shard_tree_zero` on params too): parameters are also stored
    sharded; GSPMD all-gathers each weight just before use and reduce-scatters
    its gradient. Per-device param memory drops ~N× at the cost of per-layer
    gather traffic — the right trade when the 512² UNet + moments don't fit.

Both are config-gated (`train.optimizer.zero`, `model.param_sharding`) and
exercised on the 8-virtual-CPU mesh in tests/test_zero_fsdp.py and in
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def zero_spec(shape, axis_size: int, min_shard_elems: int = 2048,
              axis: str = "data") -> P:
    """Shard the largest dim divisible by `axis_size` over `axis`; replicate
    small leaves.

    Tiny leaves (biases, norm affines, scalars like Adam's `count`) stay
    replicated: sharding them saves nothing and adds layout churn.
    """
    if not shape or int(np.prod(shape)) < min_shard_elems:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: shape[d], reverse=True)
    for d in dims:
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def shard_tree_zero(tree, mesh: Optional[Mesh], axis: str = "data"):
    """device_put a pytree with every large leaf sharded over `axis`."""
    if mesh is None:
        return tree
    assert axis in mesh.axis_names, f"mesh needs a '{axis}' axis"
    n = mesh.shape[axis]
    if n == 1:
        from .mesh import replicate

        return replicate(tree, mesh)

    multihost = jax.process_count() > 1

    def put(leaf):
        x = np.asarray(leaf) if not isinstance(leaf, jax.Array) else leaf
        sharding = NamedSharding(mesh, zero_spec(x.shape, n, axis=axis))
        if multihost:
            # device_put can't span non-addressable devices; every process
            # holds the full (seeded/jit-replicated) value, so each can
            # materialize its local shards by slicing
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx]
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def tree_device_bytes(tree) -> int:
    """Max per-device bytes actually held for a pytree of jax.Arrays."""
    per_device: dict = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        for s in leaf.addressable_shards:
            per_device[s.device] = per_device.get(s.device, 0) + int(
                np.prod(s.data.shape) * s.data.dtype.itemsize
            )
    return max(per_device.values()) if per_device else 0

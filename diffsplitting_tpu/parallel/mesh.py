"""Device-mesh construction + sharding helpers — the framework's parallelism layer.

The reference's entire distributed story is single-process torch
nn.DataParallel (/root/reference/model/networks.py:177-179, replicate →
scatter → gather every step). The TPU-native equivalent is SPMD over a
`jax.sharding.Mesh`:

  * params live replicated on every chip (NamedSharding(mesh, P())),
  * the batch is split along the leading axis (P('data', ...)),
  * jit/GSPMD inserts the gradient `psum` over the ICI ring — there is no
    hand-written communication backend to port.

For multi-host pods, call `jax.distributed.initialize()` before `make_mesh`;
the same code paths then span hosts (each host feeds its local shard).

Axis layout: 1-D 'data' mesh is all the reference's workloads need (SURVEY.md
§2.5); `make_mesh` accepts extra axes (e.g. ('data','model')) so tensor
parallelism can be layered on without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: 1-D 'data' mesh over every visible device.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, (
        f"axis sizes {axis_sizes} must multiply to device count {n}"
    )
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; all other axes replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def plan_batch_placement(dim0: Optional[int], n_devices: int, process_count: int) -> str:
    """Decide 'shard' vs 'replicate' for one array of leading-dim `dim0`.

    `dim0` is the PER-PROCESS leading dim (each process feeds its local slice
    on multi-host runs); the global batch is dim0 * process_count and must
    divide the mesh for sharding. None (scalar arrays) always replicates.
    """
    if dim0 is None:
        return "replicate"
    global_b = dim0 * process_count
    return "shard" if global_b % n_devices == 0 else "replicate"


def host_local_slice(x, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """The contiguous per-host slice of a global host batch.

    Data-loading contract on multi-host pods (SURVEY §2.5): each process
    loads/feeds only `host_local_slice(global_batch)` — process p gets rows
    [p·B/P, (p+1)·B/P). Single-process: identity.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return x
    x = np.asarray(x)
    assert x.shape[0] % n == 0, (
        f"global batch {x.shape[0]} must divide process count {n}"
    )
    per = x.shape[0] // n
    return x[p * per : (p + 1) * per]


def shard_batch(batch, mesh: Optional[Mesh], axis: str = "data"):
    """Place a pytree of host arrays on the mesh with the batch axis sharded.

    Falls back to replication when the (global) batch size doesn't divide the
    mesh (e.g. the reference's batch=1 validation loader).

    Multi-host (`jax.process_count() > 1`): each process passes only its LOCAL
    slice of the global batch (see `host_local_slice`); global arrays are
    assembled with `jax.make_array_from_process_local_data`, so no host ever
    materializes or transfers the full batch. Single-process behavior is a
    plain device_put of the full batch (identical to before).
    """
    if mesh is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, batch)

    n = mesh.devices.size
    procs = jax.process_count()

    def put(x):
        if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
            # already on device: pass through untouched. Forcing it back
            # through np.asarray would round-trip device→host→device — and
            # through the axon TPU tunnel every host→device transfer leaks
            # its payload in host RAM (measured: ~payload+2.5KB per put, OOM
            # on long runs). jit auto-reshards if the placement differs.
            return x
        x = np.asarray(x)
        dim0 = x.shape[0] if x.ndim >= 1 else None
        if plan_batch_placement(dim0, n, procs) == "shard":
            sharding = batch_sharding(mesh, x.ndim, axis)
        else:
            sharding = replicated_sharding(mesh)
        if procs > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def init_on_host(init_fn, *args, **kwargs):
    """Run a (potentially expensive) flax init on the host CPU backend.

    Orthogonal init runs QR factorizations for every conv kernel — minutes on
    a TPU backend (and through a remote tunnel), milliseconds-to-seconds on
    host. Falls back to the default device when no CPU backend exists.

    Must be a LOCAL device: on multi-process runs `jax.devices("cpu")[0]` is
    process 0's device, and eager dispatch onto a non-addressable device
    segfaults (found by the 2-process test, tests/test_multihost.py).
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return init_fn(*args, **kwargs)
    with jax.default_device(cpu):
        return init_fn(*args, **kwargs)


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host: device_put can't target non-addressable devices, so leaves
    are assembled via `make_array_from_callback` (every process must hold
    the same host value — true for seeded init and jit outputs). Leaves that
    already carry an equivalent global sharding pass through untouched.
    """
    if mesh is None:
        return tree
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(sharding, x.ndim):
            return x
        host = np.asarray(x)  # requires fully-replicated (or host) input
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree_util.tree_map(put, tree)

"""Mesh construction + sharding helper tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffsplitting_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


def test_make_mesh_2d():
    mesh = make_mesh(("data", "model"), axis_sizes=(4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(("data",), axis_sizes=(3,))


def test_shard_batch_divisible():
    mesh = make_mesh()
    batch = {"x": np.zeros((16, 4, 4, 1), np.float32)}
    out = shard_batch(batch, mesh)
    assert len({s.device for s in out["x"].addressable_shards}) == 8
    # each shard holds 2 items
    assert out["x"].addressable_shards[0].data.shape[0] == 2


def test_shard_batch_indivisible_replicates():
    mesh = make_mesh()
    batch = {"x": np.zeros((3, 4, 4, 1), np.float32)}
    out = shard_batch(batch, mesh)
    # batch of 3 cannot split over 8 -> replicated, still usable
    assert out["x"].shape == (3, 4, 4, 1)


def test_shard_batch_scalars_and_no_mesh():
    mesh = make_mesh()
    out = shard_batch({"i": np.int64(5)}, mesh)
    assert int(out["i"]) == 5
    out2 = shard_batch({"x": np.zeros((4,))}, None)
    assert out2["x"].shape == (4,)


def test_replicate_params():
    mesh = make_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(tree, mesh)
    assert len({s.device for s in rep["w"].addressable_shards}) == 8
    for s in rep["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), tree["w"])


def test_gradient_psum_inserted():
    """A jitted sum-grad over a sharded batch equals the unsharded result
    (GSPMD must insert the cross-device reduction)."""
    mesh = make_mesh()
    w = replicate({"w": np.full((4,), 2.0, np.float32)}, mesh)["w"]
    x = shard_batch({"x": np.arange(32, dtype=np.float32).reshape(8, 4)}, mesh)["x"]

    def loss(w, x):
        return ((x * w).sum(-1) ** 2).mean()

    g = jax.jit(jax.grad(loss))(w, x)
    g_ref = jax.grad(loss)(np.full((4,), 2.0, np.float32),
                           np.arange(32, dtype=np.float32).reshape(8, 4))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)

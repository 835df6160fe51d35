"""Tensor-parallel prototype: channel-sharded UNet over a ('data','model') mesh.

Correctness bar: the sharded forward and train-step loss must equal the
replicated single-mesh result (GSPMD inserts the collectives; math unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from diffsplitting_tpu.models import UNet
from diffsplitting_tpu.parallel import make_mesh
from diffsplitting_tpu.parallel.sharding_rules import shard_params_tp


def build():
    net = UNet(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 2))
    t = jnp.ones((4,))
    params = net.init(jax.random.PRNGKey(1), x, t)["params"]
    return net, params, x, t


def test_tp_forward_matches_replicated():
    net, params, x, t = build()
    ref = np.asarray(net.apply({"params": params}, x, t))

    mesh = make_mesh(("data", "model"), axis_sizes=(2, 4))
    tp_params = shard_params_tp(params, mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = jax.jit(lambda p, x, t: net.apply({"params": p}, x, t))(tp_params, x_sh, t)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)

    # params are actually distributed over the model axis
    kern = tp_params["Conv_0"]["kernel"]
    assert len({s.device for s in kern.addressable_shards}) >= 4


def test_tp_inserts_collectives_and_shards_memory():
    """Beyond bit-equality: (a) GSPMD actually inserts cross-shard
    collectives into the compiled TP program, (b) each device holds ~1/TP of
    the shardable parameter bytes — the memory win TP exists for."""
    net, params, x, t = build()
    mesh = make_mesh(("data", "model"), axis_sizes=(2, 4))
    tp_params = shard_params_tp(params, mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))

    fwd = lambda p, x, t: net.apply({"params": p}, x, t)  # noqa: E731
    compiled = jax.jit(fwd).lower(tp_params, x_sh, t).compile()
    hlo = compiled.as_text()
    assert any(op in hlo for op in ("all-reduce", "all-gather", "reduce-scatter",
                                    "collective-permute")), (
        "TP-sharded UNet compiled without any cross-shard collective"
    )

    # per-device bytes: sharded leaves split 4-way over 'model'
    def device_bytes(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            shard = leaf.addressable_shards[0]
            total += np.prod(shard.data.shape) * leaf.dtype.itemsize
        return total

    rep_params = jax.device_put(
        params, NamedSharding(mesh, P())
    )
    full = device_bytes(rep_params)
    tp = device_bytes(tp_params)
    # most params are conv kernels with out-channel sharding → expect a
    # substantial (>2×) per-device reduction at TP=4
    assert tp < 0.55 * full, (tp, full)


def test_tp_train_step_matches_replicated():
    net, params, x, t = build()
    target = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 2))
    tx = optax.adam(1e-3)

    def loss_fn(p, x, t):
        return jnp.mean(jnp.abs(net.apply({"params": p}, x, t) - target))

    def step(p, o, x, t):
        l, g = jax.value_and_grad(loss_fn)(p, x, t)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    # reference: single-device
    p1, o1, l1 = jax.jit(step)(params, tx.init(params), x, t)

    # TP over 2x4 mesh
    mesh = make_mesh(("data", "model"), axis_sizes=(2, 4))
    tp_params = shard_params_tp(params, mesh)
    tp_opt = jax.jit(tx.init)(tp_params)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    p2, o2, l2 = jax.jit(step)(tp_params, tp_opt, x_sh, t)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)

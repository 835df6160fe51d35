"""Remat must not change the checkpoint schema.

nn.remat auto-names wrapped blocks `CheckpointResnetBlockWithAttn_*`; the
UNet pins explicit plain names so remat and non-remat models share ONE param
tree (unet.py), and `load_checkpoint` migrates pre-fix legacy checkpoints
(checkpoints.py _rename_blocks)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.models import UNet
from diffsplitting_tpu.train.checkpoints import (
    _rename_blocks,
    load_checkpoint,
    save_checkpoint,
)

KW = dict(in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
          channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16,
          cond_type="noise_level")


def _tree_paths(v):
    return {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(v)[0]
    }


def test_remat_and_plain_share_param_schema():
    x = jnp.zeros((1, 16, 16, 2))
    t = jnp.ones((1,))
    v_plain = UNet(**KW, remat=False).init(jax.random.PRNGKey(0), x, t)
    v_remat = UNet(**KW, remat=True).init(jax.random.PRNGKey(0), x, t)
    assert _tree_paths(v_plain) == _tree_paths(v_remat)
    # and the math is identical
    xx = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    a = UNet(**KW, remat=False).apply(v_plain, xx, t)
    b = UNet(**KW, remat=True).apply(v_plain, xx, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_selective_remat_same_schema_outputs_and_grads():
    """remat_min_res (selective remat: only blocks at resolution >= R are
    rematerialized) must keep the param schema, forward outputs, AND
    gradients bit-comparable to full remat / no remat — it only changes
    what the backward pass recomputes."""
    x = jnp.zeros((1, 16, 16, 2))
    t = jnp.ones((1,))
    nets = {
        "plain": UNet(**KW, remat=False),
        "full": UNet(**KW, remat=True),
        "sel": UNet(**KW, remat=True, remat_min_res=16),  # only the 16² level
        "none_eff": UNet(**KW, remat=True, remat_min_res=64),  # R > all res
    }
    v = nets["plain"].init(jax.random.PRNGKey(0), x, t)
    schemas = {k: _tree_paths(n.init(jax.random.PRNGKey(0), x, t))
               for k, n in nets.items()}
    assert all(s == schemas["plain"] for s in schemas.values())

    xx = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 2))
    tt = jnp.array([0.4, 0.7])

    def loss(params, net):
        return jnp.sum(net.apply(params, xx, tt) ** 2)

    outs = {k: np.asarray(n.apply(v, xx, tt)) for k, n in nets.items()}
    grads = {k: jax.grad(loss)(v, n) for k, n in nets.items()}
    for k in ("full", "sel", "none_eff"):
        np.testing.assert_allclose(outs[k], outs["plain"], rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(grads["plain"]),
                        jax.tree_util.tree_leaves(grads[k])):
            # remat recomputes the forward during backward, reordering f32
            # reductions — grads agree to float noise, not bit-exactly
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)


def test_name_walking_forwards_accept_remat_nets():
    """fused_forward and deepcache walk 'ResnetBlockWithAttn_*' names; the
    pinned naming makes them remat-compatible."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    t = jnp.array([0.4])
    net_r = UNet(**KW, remat=True, dtype=jnp.bfloat16)
    v = net_r.init(jax.random.PRNGKey(0), x, t)
    ref = np.asarray(net_r.apply(v, x, t))

    from diffsplitting_tpu.models.deepcache import CachedUNet

    out, _ = CachedUNet.from_unet(net_r, 1).apply(v, x, t)
    np.testing.assert_array_equal(np.asarray(out), ref)

    from diffsplitting_tpu.experimental.fused_forward import fused_unet_apply

    fused = np.asarray(fused_unet_apply(net_r, v, x, t))
    np.testing.assert_allclose(fused, ref, rtol=0.05, atol=0.05)


def test_legacy_remat_checkpoint_migrates(tmp_path):
    x = jnp.zeros((1, 16, 16, 2))
    t = jnp.ones((1,))
    params = UNet(**KW).init(jax.random.PRNGKey(0), x, t)["params"]
    # simulate a pre-fix remat checkpoint: legacy block names on disk
    legacy = _rename_blocks({"net": params}, to_legacy=True)
    assert any(k.startswith("CheckpointResnetBlockWithAttn_") for k in legacy["net"])
    save_checkpoint(str(tmp_path), "I5_E0", legacy, None, 0, 5)

    restored, _, _, _, _ = load_checkpoint(
        str(tmp_path / "I5_E0"), {"net": params}, None
    )
    assert set(restored["net"]) == set(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored["net"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

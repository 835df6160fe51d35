"""Pre-cast bf16 inference params must be BIT-identical to the f32-stored path.

flax `promote_dtype` casts Conv/Dense kernels f32→bf16 at every apply when the
module dtype is bf16; `cast_unet_params_for_inference` does the same rounding
once up front. Outputs must therefore match exactly (not approximately) — and
GroupNorm affines must be left untouched in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.models import UNet, cast_unet_params_for_inference


def _tiny_unet(cond_type):
    return UNet(
        in_channel=2,
        out_channel=1,
        inner_channel=8,
        norm_groups=4,
        channel_mults=(1, 2),
        attn_res=(8,),
        res_blocks=1,
        dropout=0.0,
        image_size=16,
        cond_type=cond_type,
        dtype=jnp.bfloat16,
    )


def test_precast_bit_exact_sr3_and_ddpm():
    for cond in ("noise_level", "time"):
        net = _tiny_unet(cond)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 2), jnp.float32)
        t = jnp.array([0.3, 0.9], jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, t)
        ref = net.apply(variables, x, t)
        cast_vars = cast_unet_params_for_inference(variables)
        out = net.apply(cast_vars, x, t)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_precast_leaves_norm_affines_f32():
    net = _tiny_unet("noise_level")
    x = jnp.zeros((1, 16, 16, 2), jnp.float32)
    t = jnp.ones((1,), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, t)
    cast_vars = cast_unet_params_for_inference(variables)

    flat = jax.tree_util.tree_flatten_with_path(cast_vars)[0]
    n_bf16 = n_gn_f32 = 0
    for path, leaf in flat:
        keys = [str(getattr(k, "key", "")) for k in path]
        if keys[-1] in ("gn_scale", "gn_bias") or any(
            k.startswith("GroupNorm") for k in keys
        ):
            assert leaf.dtype == jnp.float32, keys
            n_gn_f32 += 1
        elif keys[-1] in ("kernel", "bias") and any(
            k.startswith(("Conv", "Dense")) for k in keys
        ):
            assert leaf.dtype == jnp.bfloat16, keys
            n_bf16 += 1
    assert n_bf16 > 10 and n_gn_f32 > 4


def test_precast_noop_without_compute_dtype():
    # an f32-compute UNet (dtype=None): casting params WOULD change numerics,
    # callers must only precast when the net computes in bf16 — but the helper
    # itself is mechanical; verify it still produces a valid forward
    net = _tiny_unet("time")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2), jnp.float32)
    t = jnp.ones((1,), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, t)
    out = net.apply(cast_unet_params_for_inference(variables), x, t)
    assert np.isfinite(np.asarray(out)).all()

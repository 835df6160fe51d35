"""Pallas kernel correctness (interpret mode on CPU) + VJP checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.ops.attention import (
    _pallas_forward as attn_pallas,
    attention_reference,
    fused_attention,
)
from diffsplitting_tpu.experimental.groupnorm_pallas import (
    _pallas_forward as gn_pallas,
)
from diffsplitting_tpu.ops.groupnorm import (
    fused_group_norm_swish,
    group_norm_swish_reference,
)


def test_groupnorm_swish_reference_matches_flax(rng):
    from flax import linen as nn

    x = jax.random.normal(rng, (2, 8, 8, 16))
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (16,))
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (16,))
    ref = group_norm_swish_reference(x, scale, bias, num_groups=4)

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    h = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    expected = h * jax.nn.sigmoid(h)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_groupnorm_pallas_kernel_interpret(rng):
    x = jax.random.normal(rng, (2, 8, 8, 16))
    scale = jnp.ones((16,)) * 1.3
    bias = jnp.ones((16,)) * 0.1
    got = gn_pallas(x, scale, bias, num_groups=4, eps=1e-5, interpret=True)
    want = group_norm_swish_reference(x, scale, bias, num_groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_groupnorm_pallas_kernel_multitile_bf16(rng):
    """Row-tiled path (H > row_tile) + bf16 inputs."""
    from diffsplitting_tpu.experimental import groupnorm_pallas as gn

    x = (jax.random.normal(rng, (1, 64, 32, 32)) * 2).astype(jnp.bfloat16)
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (32,))
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (32,))
    # force multiple tiles
    orig = gn._row_tile
    gn._row_tile = lambda H, W, C, budget=0: 8
    try:
        got = gn_pallas(x, scale, bias, num_groups=8, eps=1e-5, interpret=True)
    finally:
        gn._row_tile = orig
    want = group_norm_swish_reference(x.astype(jnp.float32), scale, bias, num_groups=8)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), rtol=0.1, atol=0.05
    )


def test_groupnorm_vjp(rng):
    x = jax.random.normal(rng, (1, 4, 4, 8))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))

    def f_fused(x, s, b):
        return jnp.sum(fused_group_norm_swish(x, s, b, 2) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(group_norm_swish_reference(x, s, b, 2) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_attention_pallas_kernel_interpret(rng):
    B, N, H, D = 2, 16, 2, 8
    q = jax.random.normal(rng, (B, N, H, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, H, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, N, H, D))
    scale = 1.0 / np.sqrt(H * D)
    got = attn_pallas(q, k, v, scale, interpret=True)
    want = attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_attention_vjp(rng):
    B, N, H, D = 1, 8, 1, 4
    q = jax.random.normal(rng, (B, N, H, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, H, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, N, H, D))

    f1 = lambda q, k, v: jnp.sum(fused_attention(q, k, v, 0.5) ** 2)
    f2 = lambda q, k, v: jnp.sum(attention_reference(q, k, v, 0.5) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_fused_ops_fall_back_on_cpu(rng):
    """On the CPU test backend the public entry points use the XLA path."""
    x = jax.random.normal(rng, (1, 4, 4, 8))
    out = fused_group_norm_swish(x, jnp.ones((8,)), jnp.zeros((8,)), 2)
    assert out.shape == x.shape
    q = jax.random.normal(rng, (1, 4, 1, 8))
    out = fused_attention(q, q, q, 0.1)
    assert out.shape == q.shape

"""Fused stat-carried UNet forward ≡ the standard flax forward.

Covers all conv plans (xla fallback, aligned std kernel, pair space-to-depth)
and all conditioning flavors against net.apply on identical params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.models import UNet
from diffsplitting_tpu.experimental import fused_forward as ff


def build(seed=0, **kw):
    cfg = dict(
        in_channel=2, out_channel=2, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_size=16, cond_type="noise_level",
    )
    cfg.update(kw)
    net = UNet(**cfg)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (2, cfg["image_size"], cfg["image_size"],
                                cfg["in_channel"]))
    t = jnp.asarray([0.3, 0.8])
    variables = net.init(jax.random.PRNGKey(seed + 1), x, t)
    return net, variables, x, t


def check(net, variables, x, t, rtol=5e-4, atol=5e-4):
    ref = np.asarray(net.apply(variables, x, t))
    got = np.asarray(ff.fused_unet_apply(net, variables, x, t, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)


def test_sr3_flavor_xla_plan():
    """Small channels → every conv takes the XLA fallback plan; exercises the
    stat-carrying, FiLM absorption, attention, up/down plumbing."""
    net, v, x, t = build(cond_type="noise_level")
    check(net, v, x, t)


def test_ddpm_time_flavor():
    net, v, x, t = build(cond_type="time")
    check(net, v, x, t)


def test_no_cond():
    net, v, x, t = build(cond_type="none")
    check(net, v, x, t)


def test_affine_level_film():
    net, v, x, t = build(use_affine_level=True)
    check(net, v, x, t)


def test_aligned_std_kernel_plan():
    """inner=128 → main convs hit the Pallas kernel (interpret mode)."""
    net, v, x, t = build(inner_channel=128, norm_groups=32,
                         channel_mults=(1, 2), res_blocks=1, attn_res=(8,))
    check(net, v, x, t)


def test_pair_kernel_plan(monkeypatch):
    """inner=64 with the pair threshold lowered → level 0 runs in the pair
    space-to-depth layout incl. packed skips, mapped concat weights, and the
    projected residual."""
    monkeypatch.setattr(ff, "_PAIR_MIN_W", 8)
    net, v, x, t = build(inner_channel=64, norm_groups=32,
                         channel_mults=(1, 2), res_blocks=2, attn_res=(8,))
    check(net, v, x, t)


def test_pair_plus_time_cond(monkeypatch):
    monkeypatch.setattr(ff, "_PAIR_MIN_W", 8)
    net, v, x, t = build(inner_channel=64, norm_groups=16,
                         channel_mults=(1,), res_blocks=1, attn_res=(),
                         cond_type="time")
    check(net, v, x, t)

"""Shape/semantics tests for the Flax UNet family (NHWC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.models import TimePredictor, UNet
from diffsplitting_tpu.models.blocks import SelfAttention, TimeEmbedding, PositionalEncoding


def make_unet(**kw):
    defaults = dict(
        in_channel=2,
        out_channel=2,
        inner_channel=8,
        norm_groups=4,
        channel_mults=(1, 2),
        attn_res=(),
        res_blocks=1,
        dropout=0.0,
        image_size=16,
        cond_type="time",
    )
    defaults.update(kw)
    return UNet(**defaults)


def test_unet_ddpm_shapes(rng):
    net = make_unet()
    x = jnp.zeros((2, 16, 16, 2))
    t = jnp.ones((2,))
    params = net.init(rng, x, t)
    out = net.apply(params, x, t)
    assert out.shape == (2, 16, 16, 2)
    assert out.dtype == jnp.float32


def test_unet_with_attention(rng):
    net = make_unet(attn_res=(8,), image_size=16)
    x = jnp.zeros((1, 16, 16, 2))
    t = jnp.ones((1,))
    params = net.init(rng, x, t)
    out = net.apply(params, x, t)
    assert out.shape == (1, 16, 16, 2)


def test_unet_sr3_noise_level(rng):
    net = make_unet(cond_type="noise_level", in_channel=6, out_channel=3)
    x = jnp.zeros((2, 16, 16, 6))
    gamma = jnp.full((2,), 0.5)
    params = net.init(rng, x, gamma)
    out = net.apply(params, x, gamma)
    assert out.shape == (2, 16, 16, 3)


def test_unet_uncond_cond_none(rng):
    net = make_unet(cond_type="none")
    x = jnp.zeros((2, 16, 16, 2))
    params = net.init(rng, x, None)
    out = net.apply(params, x, None)
    assert out.shape == (2, 16, 16, 2)


def test_unet_conditioning_changes_output(rng):
    net = make_unet()
    x = jax.random.normal(rng, (1, 16, 16, 2))
    params = net.init(rng, x, jnp.ones((1,)))
    o1 = net.apply(params, x, jnp.ones((1,)))
    o2 = net.apply(params, x, jnp.full((1,), 7.0))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_time_embedding_matches_formula():
    import math

    dim = 16
    t = jnp.array([3.0, 11.0])
    emb = TimeEmbedding(dim).apply({}, t)
    inv_freq = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    args = np.asarray(t)[:, None] * inv_freq[None]
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-4, atol=1e-5)
    assert emb.shape == (2, dim)


def test_positional_encoding_matches_formula():
    import math

    dim = 16
    g = jnp.array([0.3, 0.9])
    emb = PositionalEncoding(dim).apply({}, g)
    count = dim // 2
    step = np.arange(count) / count
    args = np.asarray(g)[:, None] * np.exp(-math.log(1e4) * step[None])
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_reference_semantics(rng):
    """Cross-check the NHWC attention against an independent torch computation
    of the same math (GroupNorm → 1×1 qkv → softmax(QK/√C)V → 1×1 out + res)."""
    torch = pytest.importorskip("torch")

    B, H, W, C = 2, 8, 8, 16
    attn = SelfAttention(n_head=1, norm_groups=4)
    x = jax.random.normal(rng, (B, H, W, C))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = np.asarray(attn.apply(params, x))

    # torch replica using the flax params
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))  # NCHW
    gn = torch.nn.functional.group_norm(
        xt,
        4,
        torch.tensor(p["GroupNorm_0"]["scale"]),
        torch.tensor(p["GroupNorm_0"]["bias"]),
        eps=1e-5,
    )
    # flax conv kernel (1,1,C,3C) -> torch (3C,C,1,1)
    wq = torch.tensor(p["Conv_0"]["kernel"][0, 0].T)  # (3C, C)
    qkv = torch.einsum("oc,bchw->bohw", wq, gn)
    q, k, v = qkv.chunk(3, dim=1)
    att = torch.einsum("bchw,bcyx->bhwyx", q, k).reshape(B, H, W, H * W) / np.sqrt(C)
    att = torch.softmax(att, dim=-1).reshape(B, H, W, H, W)
    o = torch.einsum("bhwyx,bcyx->bchw", att, v)
    wo = torch.tensor(p["Conv_1"]["kernel"][0, 0].T)
    bo = torch.tensor(p["Conv_1"]["bias"])
    o = torch.einsum("oc,bchw->bohw", wo, o) + bo[None, :, None, None]
    expected = (o + xt).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_time_predictor_scalar_output(rng):
    tp = TimePredictor(
        in_channel=1,
        out_channel=1,
        inner_channel=8,
        norm_groups=4,
        channel_mults=(1, 2),
        attn_res=(),
        res_blocks=1,
        image_size=16,
    )
    x = jax.random.normal(rng, (3, 16, 16, 1))
    params = tp.init(rng, x)
    out = tp.apply(params, x)
    assert out.shape == (3,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_param_count_matches_reference_formula(rng):
    """Param count sanity vs hand-computed torch equivalent for a tiny net."""
    net = make_unet(inner_channel=8, channel_mults=(1, 2), res_blocks=1, norm_groups=4)
    x = jnp.zeros((1, 8, 8, 2))
    params = net.init(rng, x, jnp.ones((1,)))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_params > 3_000  # non-trivial

    # orthogonal init: conv kernels should have orthonormal columns
    k = params["params"]["Conv_0"]["kernel"]  # (3,3,2,16)
    mat = np.asarray(k).reshape(-1, k.shape[-1])
    gram = mat.T @ mat
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-5)

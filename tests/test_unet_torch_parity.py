"""Full-UNet forward cross-check against an independent torch implementation.

Builds the same graph (DDPM flavor: stem conv → [res,down] → mid(attn) →
[res+skip, up] → Block head, additive time MLP conditioning) with torch ops
driven by the flax parameters. Any topology/semantics divergence between
models/unet.py and the reference architecture shows up as a numeric mismatch.
Config: mults (1,2), res_blocks 1, attn at 8×8, 16×16 input.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsplitting_tpu.models import UNet

torch = pytest.importorskip("torch")


def t_conv(p, x, stride=1, padding=1):
    """x NCHW torch; p = {'kernel': (kh,kw,in,out) [, 'bias']}"""
    w = torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    b = torch.tensor(np.asarray(p["bias"])) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride, padding=padding)


def t_dense(p, x):
    w = torch.tensor(np.asarray(p["kernel"]))  # (in, out)
    b = torch.tensor(np.asarray(p["bias"]))
    return x @ w + b


def t_swish(x):
    return x * torch.sigmoid(x)


def t_block(p, x, groups):
    """gn_scale/gn_bias + Conv_0 (models/blocks.py Block)."""
    h = torch.nn.functional.group_norm(
        x, groups, torch.tensor(np.asarray(p["gn_scale"])),
        torch.tensor(np.asarray(p["gn_bias"])), eps=1e-5,
    )
    h = t_swish(h)
    return t_conv(p["Conv_0"], h)


def t_resblock(p, x, t_emb, groups):
    h = t_block(p["Block_0"], x, groups)
    emb = t_dense(p["Dense_0"], t_swish(t_emb))
    h = h + emb[:, :, None, None]
    h = t_block(p["Block_1"], h, groups)
    res = t_conv(p["Conv_0"], x, padding=0) if "Conv_0" in p else x
    return h + res


def t_attention(p, x, groups):
    B, C, H, W = x.shape
    gn = torch.nn.functional.group_norm(
        x, groups, torch.tensor(np.asarray(p["GroupNorm_0"]["scale"])),
        torch.tensor(np.asarray(p["GroupNorm_0"]["bias"])), eps=1e-5,
    )
    qkv = t_conv(p["Conv_0"], gn, padding=0)  # (B, 3C, H, W)
    q, k, v = qkv.chunk(3, dim=1)
    att = torch.einsum("bchw,bcyx->bhwyx", q, k).reshape(B, H, W, H * W) / math.sqrt(C)
    att = torch.softmax(att, dim=-1).reshape(B, H, W, H, W)
    o = torch.einsum("bhwyx,bcyx->bchw", att, v)
    o = t_conv(p["Conv_1"], o, padding=0)
    return o + x


def t_rbwa(p, x, t_emb, groups):
    x = t_resblock(p["ResnetBlock_0"], x, t_emb, groups)
    if "SelfAttention_0" in p:
        x = t_attention(p["SelfAttention_0"], x, groups)
    return x


def torch_unet_forward(params, x_nhwc, t, inner=8, groups=4):
    p = jax.tree_util.tree_map(np.asarray, params)
    x = torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))

    # time embedding (TimeEmbedding formula) + MLP
    dim = inner
    inv_freq = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    args = np.asarray(t)[:, None] * inv_freq[None]
    emb = torch.tensor(
        np.concatenate([np.sin(args), np.cos(args)], -1).astype(np.float32)
    )
    emb = t_dense(p["Dense_0"], emb)
    emb = t_swish(emb)
    emb = t_dense(p["Dense_1"], emb)

    feats = []
    h = t_conv(p["Conv_0"], x)
    feats.append(h)
    # encoder: stage0 (res 16, no attn), downsample, stage1 (res 8, attn)
    h = t_rbwa(p["ResnetBlockWithAttn_0"], h, emb, groups)
    feats.append(h)
    h = t_conv(p["Downsample_0"]["Conv_0"], h, stride=2, padding=1)
    feats.append(h)
    h = t_rbwa(p["ResnetBlockWithAttn_1"], h, emb, groups)
    feats.append(h)
    # mid
    h = t_rbwa(p["ResnetBlockWithAttn_2"], h, emb, groups)
    h = t_rbwa(p["ResnetBlockWithAttn_3"], h, emb, groups)
    # decoder stage1 (res 8, attn): 2 blocks with skips
    h = t_rbwa(p["ResnetBlockWithAttn_4"], torch.cat([h, feats.pop()], 1), emb, groups)
    h = t_rbwa(p["ResnetBlockWithAttn_5"], torch.cat([h, feats.pop()], 1), emb, groups)
    # upsample (nearest x2 + conv)
    h = torch.nn.functional.interpolate(h, scale_factor=2, mode="nearest")
    h = t_conv(p["Upsample_0"]["Conv_0"], h)
    # decoder stage0 (res 16, no attn)
    h = t_rbwa(p["ResnetBlockWithAttn_6"], torch.cat([h, feats.pop()], 1), emb, groups)
    h = t_rbwa(p["ResnetBlockWithAttn_7"], torch.cat([h, feats.pop()], 1), emb, groups)
    assert not feats
    # head
    out = t_block(p["Block_0"], h, groups)
    return out.numpy().transpose(0, 2, 3, 1)


def test_full_unet_matches_torch_replica(rng):
    net = UNet(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1, image_size=16)
    x = jax.random.normal(rng, (2, 16, 16, 2))
    t = jnp.array([3.0, 7.0])
    variables = net.init(jax.random.PRNGKey(1), x, t)
    got = np.asarray(net.apply(variables, x, t))
    with torch.no_grad():
        want = torch_unet_forward(variables["params"], x, t)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

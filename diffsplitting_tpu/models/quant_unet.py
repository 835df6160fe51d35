"""W8A8 quantized UNet inference forward (TPU serving fast path).

A pure-function re-execution of `models.unet.UNet` over the SAME flax param
tree (auto-names: `Conv_0`, `Dense_0/1`, `ResnetBlockWithAttn_{i}`,
`Downsample_{j}`, `Upsample_{k}`, head `Block_0`) with a pluggable conv hook,
used in three modes:

  * `plain_unet_apply`      — bf16/f32 convs; numerically equal to
                              `UNet.apply` (the walker's correctness anchor,
                              tested in tests/test_quant_unet.py);
  * `collect_act_absmax`    — plain convs + per-site input absmax recording
                              (ONE jitted forward over a calibration batch
                              whose rows span the reverse chain's timesteps);
  * `quant_unet_apply`      — sites selected by `quantize_unet_params` run
                              W8A8: static-scale int8 activation quant →
                              s8×s8→s32 MXU conv → per-out-channel dequant
                              (ops/quant.py). Everything else (GroupNorm,
                              swish, FiLM, attention, unquantized convs)
                              stays on the bf16/f32 path.

Default site selection quantizes the ResnetBlock `Block_{0,1}` 3×3 convs —
the FLOP carriers, and the best-conditioned sites (every one consumes a
GroupNorm→swish output, so the static per-tensor activation scale is stable
across timesteps). Stem, head, attention, conditioning Dense layers, 1×1
shortcuts and Down/Upsample convs stay high-precision by default (opt-in
flags extend coverage; they carry little FLOP share and/or see unnormalized
activations).

Topology parity: /root/reference/model/ddpm_modules/unet.py:147-243 and
sr3_modules/unet.py:161-259 — same assembler as models/unet.py. The torch
reference has no quantized path; this is a beyond-parity serving feature.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.models.blocks import GN_EPS, swish
from diffsplitting_tpu.models.forward_utils import (
    _conv_xla,
    _dense,
    _positional_encoding,
    _time_embedding,
)
from diffsplitting_tpu.ops import fused_attention, fused_group_norm_swish
from diffsplitting_tpu.ops.quant import quant_conv_apply, quantize_weight

ConvHook = Callable[..., jnp.ndarray]


def _group_norm(x, scale, bias, num_groups: int, eps: float = GN_EPS):
    """Plain NHWC GroupNorm (torch semantics), f32 stats, channel-last affine.
    The activation never leaves its (...,C) lane layout (CLAUDE.md: reshaping
    the minor dim to (G, C/G) costs 4-5× on TPU)."""
    B, H, W, C = x.shape
    cs = C // num_groups
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))
    ss = jnp.sum(xf * xf, axis=(1, 2))
    n = H * W * cs
    gmean = s.reshape(B, num_groups, cs).sum(-1) / n
    gsq = ss.reshape(B, num_groups, cs).sum(-1) / n
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)
    mean_c = jnp.repeat(gmean, cs, axis=-1)
    inv_c = jnp.repeat(1.0 / jnp.sqrt(gvar + eps), cs, axis=-1)
    norm = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    return (norm * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------- the walker
def _forward(cfg, p, x, time, conv: ConvHook, cached_deep=None,
             cache_depth=None):
    """Shared topology walk; `conv(site, node, h, strides)` implements every
    conv site. `cfg` is the UNet module instance (static config).

    With `cache_depth=d` the walk mirrors `models.deepcache.CachedUNet`'s
    shallow/deep split exactly (same stage indices, same skip bookkeeping)
    and returns `(out, deep)`: `cached_deep=None` runs the FULL forward and
    emits the deep feature; a given `cached_deep` skips the deep encoder /
    mid / deep decoder and runs only the shallow levels from the cache.
    With `cache_depth=None` (default) it is the plain full walk returning
    `out` alone — op-for-op the order of the original walker."""
    compute_dtype = cfg.dtype or x.dtype
    assert x.shape[-1] == cfg.in_channel
    x = x.astype(compute_dtype)

    M = len(cfg.channel_mults)
    if cache_depth is None:
        assert cached_deep is None, "cached_deep requires cache_depth"
        d = 1  # bookkeeping split only; full walk is d-invariant
        full = True
    else:
        d = cache_depth
        assert 1 <= d <= M - 1, f"cache_depth must be in [1,{M - 1}]"
        full = cached_deep is None

    # ------------------------------------------------------------ conditioning
    if cfg.cond_type == "time":
        t = _time_embedding(time, cfg.inner_channel)
    elif cfg.cond_type == "noise_level":
        t = _positional_encoding(time, cfg.inner_channel)
    elif cfg.cond_type == "none":
        t = None
    else:
        raise ValueError(cfg.cond_type)
    if t is not None:
        t = _dense(p["Dense_0"], t.astype(compute_dtype))
        t = swish(t)
        t = _dense(p["Dense_1"], t).astype(compute_dtype)

    def block(bp, site, h):
        hn = fused_group_norm_swish(h, bp["gn_scale"], bp["gn_bias"],
                                    cfg.norm_groups, GN_EPS)
        return conv(f"{site}/Conv_0", bp["Conv_0"], hn)

    def resnet(rp, site, h0):
        h = block(rp["Block_0"], f"{site}/Block_0", h0)
        if t is not None:
            if cfg.cond_type == "time":
                emb = _dense(rp["Dense_0"], swish(t))
                h = h + emb[:, None, None, :]
            else:  # noise_level → FeatureWiseAffine (sr3 unet.py:34-50)
                emb = _dense(rp["FeatureWiseAffine_0"]["Dense_0"], t)
                if cfg.use_affine_level:
                    gamma, beta = jnp.split(emb[:, None, None, :], 2, axis=-1)
                    h = (1.0 + gamma) * h + beta
                else:
                    h = h + emb[:, None, None, :]
        h = block(rp["Block_1"], f"{site}/Block_1", h)
        sc = (conv(f"{site}/Conv_0", rp["Conv_0"], h0)
              if "Conv_0" in rp else h0)
        return h + sc

    def attention(ap, site, h):
        B, H, W, C = h.shape
        hn = _group_norm(h, ap["GroupNorm_0"]["scale"],
                         ap["GroupNorm_0"]["bias"], cfg.norm_groups)
        qkv = conv(f"{site}/Conv_0", ap["Conv_0"], hn)  # 1×1, no bias
        qkv = qkv.reshape(B, H * W, 1, 3, C)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        out = fused_attention(q, k, v, 1.0 / math.sqrt(C)).reshape(B, H, W, C)
        out = conv(f"{site}/Conv_1", ap["Conv_1"], out)
        return out + h

    # Explicit stage/block indices matching UNet's flax auto-name creation
    # order (and CachedUNet's formulas, models/deepcache.py:137-147):
    # encoder stage s block b → s·rb+b; mid → M·rb, M·rb+1; decoder stage s
    # (processed M-1..0) block b → M·rb+2 + (M-1-s)·(rb+1) + b.
    rb_n = cfg.res_blocks
    enc_i = lambda s, b: s * rb_n + b  # noqa: E731
    dec_i = lambda s, b: M * rb_n + 2 + (M - 1 - s) * (rb_n + 1) + b  # noqa: E731
    res_of = lambda s: cfg.image_size // (2 ** s)  # noqa: E731

    def rb_at(i, h, with_attn):
        name = f"ResnetBlockWithAttn_{i}"
        rp = p[name]
        h = resnet(rp["ResnetBlock_0"], f"{name}/ResnetBlock_0", h)
        if with_attn:
            h = attention(rp["SelfAttention_0"], f"{name}/SelfAttention_0", h)
        return h

    def downsample(s, h):
        name = f"Downsample_{s}"
        return conv(f"{name}/Conv_0", p[name]["Conv_0"], h, strides=(2, 2))

    def upsample(s, h):  # decoder stage s → Upsample_{M-1-s}
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        name = f"Upsample_{M - 1 - s}"
        return conv(f"{name}/Conv_0", p[name]["Conv_0"], h)

    # -------------------------------------------------------- shallow encoder
    h = conv("Conv_0", p["Conv_0"], x)
    feats = [h]
    for s in range(d):
        use_attn = res_of(s) in cfg.attn_res
        for b in range(rb_n):
            h = rb_at(enc_i(s, b), h, use_attn)
            feats.append(h)
        # stage s's Downsample feeds stage s+1; stage d-1's is consumed ONLY
        # by the deep part (as its input and its last-popped skip). The last
        # UNet stage has no Downsample at all (unet.py `not is_last`), so a
        # single-stage net (M == 1) must skip it here too.
        if (s < d - 1 or full) and s < M - 1:
            h = downsample(s, h)
            if s < d - 1:
                feats.append(h)

    if full:
        # stage d-1's Downsample output — absent entirely when d == M
        # (single-stage net): the deep decoder loop is then empty and must
        # pop nothing.
        deep_feats = [h] if d < M else []
        # ----------------------------------------------------- deep encoder
        for s in range(d, M):
            use_attn = res_of(s) in cfg.attn_res
            for b in range(rb_n):
                h = rb_at(enc_i(s, b), h, use_attn)
                deep_feats.append(h)
            if s != M - 1:
                h = downsample(s, h)
                deep_feats.append(h)

        # --------------------------------------------------------------- mid
        h = rb_at(M * rb_n, h, True)
        h = rb_at(M * rb_n + 1, h, False)

        # ----------------------------------------------------- deep decoder
        for s in range(M - 1, d - 1, -1):
            use_attn = res_of(s) in cfg.attn_res
            for b in range(rb_n + 1):
                skip = deep_feats.pop()
                h = rb_at(dec_i(s, b), jnp.concatenate([h, skip], axis=-1),
                          use_attn)
            h = upsample(s, h)
        assert not deep_feats
        deep = h
    else:
        deep = cached_deep.astype(compute_dtype)
        h = deep

    # -------------------------------------------------------- shallow decoder
    for s in range(d - 1, -1, -1):
        use_attn = res_of(s) in cfg.attn_res
        for b in range(rb_n + 1):
            skip = feats.pop()
            h = rb_at(dec_i(s, b), jnp.concatenate([h, skip], axis=-1),
                      use_attn)
        if s >= 1:
            h = upsample(s, h)
    assert not feats

    # ------------------------------------------------------------------- head
    out = block(p["Block_0"], "Block_0", h).astype(jnp.float32)
    return out if cache_depth is None else (out, deep)


# ------------------------------------------------------------- public modes
def plain_unet_apply(net, variables, x, time=None):
    """Walker with plain XLA convs — matches `net.apply` (parity anchor)."""
    def conv(site, node, h, strides=(1, 1)):
        return _conv_xla(node, h, strides=strides)

    return _forward(net, variables["params"], x, time, conv)


def collect_act_absmax(net, variables, x, time=None
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Plain forward + per-conv-site input absmax (f32 scalars), for
    activation-scale calibration. Jit it over ONE batch whose rows span the
    chain's timesteps (GroupNorm ahead of every quantized site makes the
    absmax insensitive to the exact input distribution)."""
    stats: Dict[str, jnp.ndarray] = {}

    def conv(site, node, h, strides=(1, 1)):
        stats[site] = jnp.max(jnp.abs(h.astype(jnp.float32)))
        return _conv_xla(node, h, strides=strides)

    out = _forward(net, variables["params"], x, time, conv)
    return out, stats


def quant_unet_apply(net, variables, x, time=None):
    """Walker with W8A8 convs at quantized sites (nodes carrying kernel_i8)."""
    def conv(site, node, h, strides=(1, 1)):
        if "kernel_i8" in node:
            return quant_conv_apply(node, h, strides=strides)
        return _conv_xla(node, h, strides=strides)

    return _forward(net, variables["params"], x, time, conv)


def cached_unet_apply(net, variables, x, time=None, cached_deep=None, *,
                      cache_depth: int):
    """Cache-split walker with per-node precision dispatch — the
    DeepCache × W8A8 composition point.

    Same contract as `models.deepcache.CachedUNet.__call__`: full forward
    (`cached_deep=None`) returns `(out, deep)`; a given `cached_deep` runs
    only the shallow levels. Plain param trees run XLA convs (equal to
    `CachedUNet.apply` — tested in tests/test_quant_deepcache.py); W8A8
    trees (quantize_unet_params) run s8×s8→s32 MXU convs at quantized
    sites, so the cached samplers (diffusion/deepcache.py) serve int8
    shallow AND full passes unchanged."""
    def conv(site, node, h, strides=(1, 1)):
        if "kernel_i8" in node:
            return quant_conv_apply(node, h, strides=strides)
        return _conv_xla(node, h, strides=strides)

    return _forward(net, variables["params"], x, time, conv, cached_deep,
                    cache_depth)


# -------------------------------------------------------- tree transformation
def _classify(path: str) -> str:
    s = path.split("/")
    if "SelfAttention_0" in s:
        return "attn"
    if len(s) == 1:
        return "stem"          # root Conv_0
    if s[0] == "Block_0":
        return "head"          # root head block
    if s[-2].startswith("Block_"):
        return "block"         # ResnetBlock Block_{0,1} 3×3 convs
    if s[-2].startswith(("Downsample", "Upsample")):
        return "updown"
    if s[-2] == "ResnetBlock_0":
        return "shortcut"      # 1×1 channel-match conv
    return "other"


def quantize_unet_params(params, act_absmax: Dict[str, float], *,
                         updown: bool = False, shortcut: bool = False,
                         stem: bool = False, head: bool = False,
                         attn: bool = False, clip_ratio: float = 1.0):
    """Host-side: trained param tree + calibrated per-site absmax → a tree of
    the same shape where selected conv nodes become
    {kernel_i8, w_scale, a_scale, bias}. Runs once per serving session.

    `attn` extends coverage to the SelfAttention 1×1 QKV and output-proj
    convs (the qkv input is GroupNorm-normalized, the proj input is the
    attention-weighted V mix). The time-MLP Dense layers stay bf16 by
    design: at the flagship config they carry <0.05% of forward FLOPs
    (2·inner·C_out per block vs 2·9·C²·HW for each 3×3 conv), so int8
    there saves nothing measurable."""
    want = {"block": True, "updown": updown, "shortcut": shortcut,
            "stem": stem, "head": head, "attn": attn, "other": False}

    def walk(node, path):
        if isinstance(node, dict) and "kernel" in node and np.ndim(
                node["kernel"]) == 4:
            kind = _classify(path)
            amax = act_absmax.get(path)
            if want.get(kind, False) and amax is not None:
                k_i8, w_scale = quantize_weight(np.asarray(node["kernel"]))
                q = {
                    "kernel_i8": k_i8,
                    "w_scale": w_scale,
                    "a_scale": np.float32(
                        max(float(amax), 1e-8) * clip_ratio / 127.0),
                }
                if "bias" in node:
                    q["bias"] = np.asarray(node["bias"])
                return q
            return node
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


def iter_quant_sites(tree, path: str = ""):
    """Yield (path, node) for every W8A8 conv node in a quantized tree."""
    if isinstance(tree, dict):
        if "kernel_i8" in tree:
            yield path, tree
            return
        for k, v in tree.items():
            yield from iter_quant_sites(v, f"{path}/{k}" if path else k)


def is_quantized_tree(tree) -> bool:
    """Static (trace-safe) structural check for W8A8 param trees."""
    if isinstance(tree, dict):
        if "kernel_i8" in tree:
            return True
        return any(is_quantized_tree(v) for v in tree.values())
    return False

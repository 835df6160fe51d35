"""UNet building blocks, NHWC, Flax linen.

Architecture parity (not translation) with the reference's blocks:
  * TimeEmbedding — DDPM sinusoidal over scalar t
    (/root/reference/model/ddpm_modules/unet.py:19-34)
  * PositionalEncoding — SR3/WaveGrad encoding over continuous √ᾱ
    (/root/reference/model/sr3_modules/unet.py:18-31)
  * FeatureWiseAffine — SR3 FiLM (additive, or scale+shift when
    use_affine_level) (sr3_modules/unet.py:34-50)
  * Block — GroupNorm→Swish→Dropout→3×3 conv (ddpm unet.py:64-75)
  * ResnetBlock — two Blocks with conditioning injected after block1; DDPM
    flavor adds Swish→Linear(time_emb) as a channel bias (ddpm unet.py:78-96),
    SR3 flavor applies FeatureWiseAffine (sr3 unet.py:94-110)
  * SelfAttention — GroupNorm → 1×1 qkv (no bias) → full token attention
    scaled by 1/√C → 1×1 out conv, residual (ddpm unet.py:99-128)
  * Down/Upsample — stride-2 3×3 conv / nearest×2 + 3×3 conv (ddpm unet.py:42-58)

TPU notes: attention runs as batched matmuls over (B, HW, C) tokens (MXU);
token counts here are ≤ 256 (16×16 feature maps) so full attention is the
right shape. `diffsplitting_tpu.ops.attention` provides the fused kernel used
when shapes grow.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Matches torch's GroupNorm epsilon.
GN_EPS = 1e-5

orthogonal_init = nn.initializers.orthogonal()


def conv_kwargs(dtype=None):
    """Shared Conv/Dense init + compute-dtype kwargs.

    `dtype` is the computation dtype (bf16 on TPU for MXU throughput);
    params always stay float32 (flax default param_dtype).
    """
    return dict(kernel_init=orthogonal_init, bias_init=nn.initializers.zeros, dtype=dtype)


def swish(x):
    return x * jax.nn.sigmoid(x)


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding of a (B,) scalar time/level vector -> (B, dim)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        inv_freq = jnp.exp(
            jnp.arange(0, self.dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / self.dim)
        )
        args = t.reshape(-1, 1).astype(jnp.float32) * inv_freq[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class PositionalEncoding(nn.Module):
    """SR3 noise-level encoding: (B,) -> (B, dim)."""

    dim: int

    @nn.compact
    def __call__(self, noise_level):
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        args = noise_level.reshape(-1, 1).astype(jnp.float32) * jnp.exp(
            -math.log(1e4) * step[None, :]
        )
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class FeatureWiseAffine(nn.Module):
    """FiLM conditioning: additive bias, or (1+γ)·x + β when use_affine_level."""

    out_channels: int
    use_affine_level: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, noise_embed):
        mult = 2 if self.use_affine_level else 1
        h = nn.Dense(self.out_channels * mult, **conv_kwargs(self.dtype))(noise_embed)
        if self.use_affine_level:
            gamma, beta = jnp.split(h[:, None, None, :], 2, axis=-1)
            return (1 + gamma) * x + beta
        return x + h[:, None, None, :]


class Block(nn.Module):
    """GroupNorm → Swish → Dropout → 3×3 conv.

    The GroupNorm+Swish pair runs through the fused Pallas kernel on TPU
    (ops/groupnorm.py); elsewhere XLA fuses the jnp reference path.
    """

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        import os

        from diffsplitting_tpu.ops import fused_group_norm_swish

        scale = self.param("gn_scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("gn_bias", nn.initializers.zeros, (x.shape[-1],))
        if os.environ.get("DSP_GN_IMPL") == "flax":  # perf A/B experiment
            h = nn.GroupNorm(
                num_groups=self.groups, epsilon=GN_EPS, use_scale=False, use_bias=False
            )(x)
            h = h * scale + bias
            h = swish(h)
        else:
            h = fused_group_norm_swish(x, scale, bias, self.groups, GN_EPS)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return nn.Conv(self.dim_out, (3, 3), padding="SAME", **conv_kwargs(self.dtype))(h)


class ResnetBlock(nn.Module):
    """Residual block with optional time/noise-level conditioning.

    cond_type: 'time' (DDPM additive Swish→Linear MLP), 'noise_level'
    (SR3 FeatureWiseAffine), or 'none'.
    """

    dim_out: int
    cond_type: str = "time"
    use_affine_level: bool = False
    dropout: float = 0.0
    norm_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None, *, deterministic: bool = True):
        dim_in = x.shape[-1]
        h = Block(self.dim_out, groups=self.norm_groups, dtype=self.dtype)(
            x, deterministic=deterministic
        )
        if self.cond_type == "time" and time_emb is not None:
            emb = nn.Dense(self.dim_out, **conv_kwargs(self.dtype))(swish(time_emb))
            h = h + emb[:, None, None, :]
        elif self.cond_type == "noise_level" and time_emb is not None:
            h = FeatureWiseAffine(self.dim_out, self.use_affine_level, dtype=self.dtype)(
                h, time_emb
            )
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout,
                  dtype=self.dtype)(h, deterministic=deterministic)
        if dim_in != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), **conv_kwargs(self.dtype))(x)
        return h + x


class SelfAttention(nn.Module):
    """Full spatial self-attention over HW tokens; scale 1/√C (not 1/√head_dim),
    matching ddpm unet.py:118-120."""

    n_head: int = 1
    norm_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from diffsplitting_tpu.ops import fused_attention

        B, H, W, C = x.shape
        head_dim = C // self.n_head
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=GN_EPS)(x)
        qkv = nn.Conv(C * 3, (1, 1), use_bias=False, kernel_init=orthogonal_init,
                      dtype=self.dtype)(h)
        # channel layout per head: [q | k | v] (torch chunk on the head-channel dim)
        qkv = qkv.reshape(B, H * W, self.n_head, 3, head_dim)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

        out = fused_attention(q, k, v, 1.0 / math.sqrt(C))
        out = out.reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), **conv_kwargs(self.dtype))(out)
        return out + x


class ResnetBlockWithAttn(nn.Module):
    dim_out: int
    cond_type: str = "time"
    use_affine_level: bool = False
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None, deterministic: bool = True):
        # `deterministic` is positional so nn.remat can mark it static
        x = ResnetBlock(
            self.dim_out,
            cond_type=self.cond_type,
            use_affine_level=self.use_affine_level,
            dropout=self.dropout,
            norm_groups=self.norm_groups,
            dtype=self.dtype,
        )(x, time_emb, deterministic=deterministic)
        if self.with_attn:
            x = SelfAttention(norm_groups=self.norm_groups, dtype=self.dtype)(x)
        return x


class Downsample(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            **conv_kwargs(self.dtype)
        )(x)


class Upsample(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(x.shape[-1], (3, 3), padding="SAME", **conv_kwargs(self.dtype))(x)

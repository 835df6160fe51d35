"""Time-predictor regression head: DDPM UNet backbone + foreground-mask pooling.

Parity: /root/reference/model/ddpm_modules/time_predictor.py — the backbone is
the DDPM UNet with conditioning disabled (:25-34); a 7×7 conv + sigmoid
produces a per-pixel foreground attention over the raw input (:5-11); the
relu'd UNet output is masked and attention-weighted-mean-pooled to one scalar
t per image (:38-44).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_kwargs
from .unet import UNet


class ForegroundMask(nn.Module):
    out_channel: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channel, (7, 7), padding="SAME", **conv_kwargs())(x)
        return jax.nn.sigmoid(h)


class TimePredictor(nn.Module):
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    image_size: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        """x: (B, H, W, in_channel) -> (B,) predicted mixing fraction t."""
        out = UNet(
            in_channel=self.in_channel,
            out_channel=self.out_channel,
            inner_channel=self.inner_channel,
            norm_groups=self.norm_groups,
            channel_mults=tuple(self.channel_mults),
            attn_res=tuple(self.attn_res),
            res_blocks=self.res_blocks,
            dropout=self.dropout,
            image_size=self.image_size,
            cond_type="none",
            dtype=self.dtype,
        )(x, None, deterministic=deterministic)
        out = jax.nn.relu(out)
        attention = ForegroundMask(self.out_channel)(x)
        out = out * attention
        b = out.shape[0]
        return out.reshape(b, -1).sum(axis=1) / attention.reshape(b, -1).sum(axis=1)

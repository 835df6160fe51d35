"""DeepCache-style deep-feature caching for the diffusion UNet.

Serving accelerator for the reverse sampler (opt-in, approximate): across
adjacent reverse steps the DEEP UNet features change slowly while the shallow
levels track the quickly-changing input (Ma et al., "DeepCache: Accelerating
Diffusion Models for Free", and "Faster Diffusion" — PAPERS.md). Every
`interval` steps a FULL forward refreshes the cached deep feature; in between,
only the shallow encoder levels, the shallow decoder levels, and the head run,
reusing the cache.

`CachedUNet` is a re-assembly of `models.unet.UNet` (same blocks, same math)
with EXPLICIT flax submodule names matching the auto-names UNet generates
(`Conv_0`, `Dense_0/1`, `ResnetBlockWithAttn_{i}`, `Downsample_{j}`,
`Upsample_{k}`, `Block_0`), so it binds UNCHANGED to any trained UNet param
tree. Full-pass output is bit-identical to `UNet.apply` (tested).

Split at `cache_depth` d (1 ≤ d ≤ len(channel_mults)-1), in units of encoder
stages:
  * shallow = stem + encoder stages 0..d-1 (+ their skips, except stage d-1's
    Downsample, which only the deep part consumes) + decoder stages d-1..0 +
    head;
  * deep = encoder stages d.., mid, decoder stages ..d and stage d's
    Upsample; its output (the tensor entering decoder stage d-1) is the cache.

Reference scope note: the torch reference has no sampler acceleration at all
(its reverse loop is a per-step python loop, ddpm_modules/diffusion.py:205-237)
— this is a beyond-parity TPU serving feature, measured in BENCH_NOTES.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Block,
    PositionalEncoding,
    ResnetBlockWithAttn,
    TimeEmbedding,
    Downsample,
    Upsample,
    conv_kwargs,
    swish,
)


class CachedUNet(nn.Module):
    """UNet re-assembly with a deep-feature cache port.

    __call__(x, time, cached_deep=None):
      * cached_deep=None  → full forward; returns (out, deep_feature)
      * cached_deep given → shallow-only forward; returns (out, cached_deep)
    """

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    image_size: int = 128
    cond_type: str = "time"
    use_affine_level: bool = False
    dtype: Optional[jnp.dtype] = None
    cache_depth: int = 2

    @classmethod
    def from_unet(cls, net, cache_depth: int) -> "CachedUNet":
        return cls(
            in_channel=net.in_channel,
            out_channel=net.out_channel,
            inner_channel=net.inner_channel,
            norm_groups=net.norm_groups,
            channel_mults=tuple(net.channel_mults),
            attn_res=tuple(net.attn_res),
            res_blocks=net.res_blocks,
            dropout=0.0,  # inference only
            image_size=net.image_size,
            cond_type=net.cond_type,
            use_affine_level=net.use_affine_level,
            dtype=net.dtype,
            cache_depth=cache_depth,
        )

    def deep_shape(self, batch: int):
        """Static (B,H,W,C) of the cached tensor (decoder stage d's Upsample
        output): resolution of encoder stage d-1's blocks, channels of
        decoder stage d."""
        d = self.cache_depth
        res = self.image_size // (2 ** (d - 1))
        ch = self.inner_channel * self.channel_mults[d]
        return (batch, res, res, ch)

    @nn.compact
    def __call__(self, x, time=None, cached_deep=None, *, deterministic: bool = True):
        M = len(self.channel_mults)
        d = self.cache_depth
        assert 1 <= d <= M - 1, f"cache_depth must be in [1,{M - 1}]"
        assert x.shape[-1] == self.in_channel
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        full = cached_deep is None

        # --------------------------------------------------- conditioning MLP
        if self.cond_type == "time":
            t = TimeEmbedding(self.inner_channel)(time)
        elif self.cond_type == "noise_level":
            t = PositionalEncoding(self.inner_channel)(time)
        elif self.cond_type == "none":
            t = None
        else:
            raise ValueError(self.cond_type)
        if t is not None:
            t = nn.Dense(self.inner_channel * 4, name="Dense_0",
                         **conv_kwargs(self.dtype))(t)
            t = swish(t)
            t = nn.Dense(self.inner_channel, name="Dense_1",
                         **conv_kwargs(self.dtype))(t)
            t = t.astype(compute_dtype)

        def rb(i, dim_out, with_attn):
            return ResnetBlockWithAttn(
                dim_out,
                cond_type=self.cond_type,
                use_affine_level=self.use_affine_level,
                norm_groups=self.norm_groups,
                dropout=0.0,
                with_attn=with_attn,
                dtype=self.dtype,
                name=f"ResnetBlockWithAttn_{i}",
            )

        # rbwa index bookkeeping (must match UNet's creation order exactly):
        # encoder: stage s block b -> s*res_blocks + b
        # mid:     M*res_blocks, M*res_blocks + 1
        # decoder: stage s (processed in order M-1..0) block b ->
        #          M*res_blocks + 2 + (M-1-s)*(res_blocks+1) + b
        enc_i = lambda s, b: s * self.res_blocks + b  # noqa: E731
        dec_i = lambda s, b: (  # noqa: E731
            M * self.res_blocks + 2 + (M - 1 - s) * (self.res_blocks + 1) + b
        )

        res_of = lambda s: self.image_size // (2**s)  # noqa: E731

        # ------------------------------------------------------ shallow encoder
        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", name="Conv_0",
                    **conv_kwargs(self.dtype))(x)
        feats.append(h)
        for s in range(d):  # encoder stages [0, d) always run
            use_attn = res_of(s) in self.attn_res
            ch = self.inner_channel * self.channel_mults[s]
            for b in range(self.res_blocks):
                h = rb(enc_i(s, b), ch, use_attn)(h, t, deterministic)
                feats.append(h)
            # stage s's Downsample feeds stage s+1; for s == d-1 it is consumed
            # ONLY by the deep part (as its input and its last-popped skip)
            if s < d - 1 or full:
                h = Downsample(dtype=self.dtype, name=f"Downsample_{s}")(h)
                if s < d - 1:
                    feats.append(h)

        if full:
            deep_in = h  # stage d-1's Downsample output
            deep_feats = [deep_in]
            # -------------------------------------------------- deep encoder
            for s in range(d, M):
                use_attn = res_of(s) in self.attn_res
                ch = self.inner_channel * self.channel_mults[s]
                for b in range(self.res_blocks):
                    h = rb(enc_i(s, b), ch, use_attn)(h, t, deterministic)
                    deep_feats.append(h)
                if s != M - 1:
                    h = Downsample(dtype=self.dtype, name=f"Downsample_{s}")(h)
                    deep_feats.append(h)

            # ----------------------------------------------------------- mid
            pre = h.shape[-1]
            h = rb(M * self.res_blocks, pre, True)(h, t, deterministic)
            h = rb(M * self.res_blocks + 1, pre, False)(h, t, deterministic)

            # -------------------------------------------------- deep decoder
            for s in range(M - 1, d - 1, -1):
                use_attn = res_of(s) in self.attn_res
                ch = self.inner_channel * self.channel_mults[s]
                for b in range(self.res_blocks + 1):
                    skip = deep_feats.pop()
                    h = rb(dec_i(s, b), ch, use_attn)(
                        jnp.concatenate([h, skip], axis=-1), t, deterministic
                    )
                h = Upsample(dtype=self.dtype, name=f"Upsample_{M - 1 - s}")(h)
            assert not deep_feats
            deep = h
        else:
            deep = cached_deep.astype(compute_dtype)

        # ------------------------------------------------------ shallow decoder
        h = deep
        for s in range(d - 1, -1, -1):
            use_attn = res_of(s) in self.attn_res
            ch = self.inner_channel * self.channel_mults[s]
            for b in range(self.res_blocks + 1):
                skip = feats.pop()
                h = rb(dec_i(s, b), ch, use_attn)(
                    jnp.concatenate([h, skip], axis=-1), t, deterministic
                )
            if s >= 1:
                h = Upsample(dtype=self.dtype, name=f"Upsample_{M - 1 - s}")(h)
        assert not feats

        out = Block(self.out_channel, groups=self.norm_groups, name="Block_0",
                    dtype=self.dtype)(h, deterministic=deterministic)
        return out.astype(jnp.float32), deep

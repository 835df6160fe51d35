"""The diffusion UNet (DDPM and SR3 flavors in one assembler), NHWC.

Topology parity with /root/reference/model/ddpm_modules/unet.py:147-243 and
/root/reference/model/sr3_modules/unet.py:161-259 (identical skeletons; only
the conditioning pathway differs):

  * encoder: initial 3×3 conv, then per channel-mult stage `res_blocks`
    ResnetBlock(+attn when the current feature resolution ∈ attn_res),
    followed by a stride-2 Downsample except after the last stage. EVERY
    layer's output (incl. the stem conv and each Downsample) is pushed onto
    the skip stack.
  * mid: ResnetBlock(attn=True) + ResnetBlock(attn=False).
  * decoder: per reversed stage `res_blocks + 1` ResnetBlocks, each consuming
    one skip (channel-concat), then Upsample except for the outermost stage
    (`is_last = ind < 1`). The attn check reuses the running resolution the
    same (slightly asymmetric) way the reference does: it is evaluated at
    stage entry, and the resolution doubles only after each non-last stage.
  * head: Block(GroupNorm→Swish→conv) to out_channel.

Conditioning:
  * cond_type='time'  — DDPM: sinusoidal TimeEmbedding → Linear(4×) → Swish →
    Linear, injected additively per ResnetBlock (ddpm unet.py:163-170).
  * cond_type='noise_level' — SR3: PositionalEncoding of continuous √ᾱ with
    the same MLP, injected via FeatureWiseAffine (sr3 unet.py:177-184).
  * cond_type='none' — no embedding (time-predictor backbone,
    ddpm unet.py:171-173 with_time_emb=False).

Compute dtype: pass `dtype=jnp.bfloat16` to run the matmul/conv path in bf16
on the MXU while keeping f32 params.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


class UNet(nn.Module):
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    image_size: int = 128
    cond_type: str = "time"  # 'time' | 'noise_level' | 'none'
    use_affine_level: bool = False
    dtype: Optional[jnp.dtype] = None
    # rematerialize each residual block in backward (jax.checkpoint): trades
    # recompute FLOPs for HBM — enables 512×512 training (sr_sr3_64_512)
    remat: bool = False
    # selective remat: only blocks running at resolution >= remat_min_res are
    # rematerialized (0 = all, the round-3 behavior). In the reference-style
    # UNet every level carries EQUAL conv FLOPs (C doubles as H·W quarters ⇒
    # H·W·C² constant) but activation memory HALVES per level down (H·W·C),
    # so skipping remat below e.g. 128 keeps ~95% of the memory saving while
    # cutting ~half the backward recompute FLOPs. Param names are pinned, so
    # checkpoints are interchangeable across remat settings.
    remat_min_res: int = 0

    @nn.compact
    def __call__(self, x, time=None, *, deterministic: bool = True):
        """x: (B, H, W, in_channel); time: (B,) scalar step / noise level."""
        assert x.shape[-1] == self.in_channel, (
            f"expected {self.in_channel} input channels, got {x.shape[-1]}"
        )
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)

        if self.cond_type == "time":
            t = TimeEmbedding(self.inner_channel)(time)
        elif self.cond_type == "noise_level":
            t = PositionalEncoding(self.inner_channel)(time)
        elif self.cond_type == "none":
            t = None
        else:
            raise ValueError(self.cond_type)

        if t is not None:
            t = nn.Dense(self.inner_channel * 4, **conv_kwargs(self.dtype))(t)
            t = swish(t)
            t = nn.Dense(self.inner_channel, **conv_kwargs(self.dtype))(t)
            t = t.astype(compute_dtype)

        remat_cls = nn.remat(ResnetBlockWithAttn, static_argnums=(3,))  # (self, x, t, det)
        # explicit names: nn.remat's auto-naming prefixes "Checkpoint", which
        # would make remat and non-remat checkpoints structurally incompatible
        # (and break every name-walking forward: fused_forward, deepcache,
        # torch_import). Pinning the plain name keeps ONE param-tree schema.
        rb_count = iter(range(10_000))

        def rb(dim_out, with_attn, res):
            # selective remat: blocks below remat_min_res run plain (their
            # activations are small; their recompute FLOPs are not)
            cls = (remat_cls if self.remat and res >= self.remat_min_res
                   else ResnetBlockWithAttn)
            return cls(
                dim_out,
                cond_type=self.cond_type,
                use_affine_level=self.use_affine_level,
                norm_groups=self.norm_groups,
                dropout=self.dropout,
                with_attn=with_attn,
                dtype=self.dtype,
                name=f"ResnetBlockWithAttn_{next(rb_count)}",
            )

        num_mults = len(self.channel_mults)
        now_res = self.image_size

        # ------------------------------------------------------------ encoder
        feats = []
        h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", **conv_kwargs(self.dtype))(x)
        feats.append(h)
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                h = rb(channel_mult, use_attn, now_res)(h, t, deterministic)
                feats.append(h)
            if not is_last:
                h = Downsample(dtype=self.dtype)(h)
                feats.append(h)
                now_res //= 2

        # ------------------------------------------------------------ mid
        pre_channel = h.shape[-1]
        h = rb(pre_channel, True, now_res)(h, t, deterministic)
        h = rb(pre_channel, False, now_res)(h, t, deterministic)

        # ------------------------------------------------------------ decoder
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                h = rb(channel_mult, use_attn, now_res)(
                    jnp.concatenate([h, skip], axis=-1), t, deterministic
                )
            if not is_last:
                h = Upsample(dtype=self.dtype)(h)
                now_res *= 2
        assert not feats

        # ------------------------------------------------------------ head
        out = Block(self.out_channel, groups=self.norm_groups, dtype=self.dtype)(
            h, deterministic=deterministic
        )
        return out.astype(jnp.float32)

"""Fused GroupNorm(+affine)+Swish — Pallas TPU kernel with XLA fallback.

Every Block in the UNet starts GroupNorm→Swish→Conv (reference
ddpm_modules/unet.py:64-75). XLA already fuses most of this chain; the Pallas
kernel keeps the whole normalize-activate in VMEM with a single HBM
round-trip per (batch, spatial-tile) — one read of x, one write of y — and
fp32 statistics regardless of the compute dtype.

Forward runs the kernel (TPU only, and only when the per-sample activation
fits VMEM); backward is a custom VJP that recomputes through the reference
jnp path (rematerialization: trade FLOPs for HBM, the right TPU default).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# per-sample VMEM budget for the kernel (bytes); larger activations fall back
_VMEM_LIMIT = 8 * 1024 * 1024


def group_norm_swish_reference(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """jnp reference: NHWC GroupNorm (torch semantics: contiguous channel
    groups, stats over (H,W,C/G) per sample) followed by swish.

    Layout note: the big activation tensor NEVER leaves its native (...,C)
    layout — reshaping the minor (lane) dim to (G, C/G) pads tiny C/G up to
    the 128-lane tile and costs ~C/G× memory traffic on TPU. Only the (B, C)
    per-channel statistics get reshaped (negligible).
    """
    B, H, W, C = x.shape
    G = num_groups
    cs = C // G
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2))  # (B, C)
    ss = jnp.sum(xf * xf, axis=(1, 2))
    n = H * W * cs
    gmean = s.reshape(B, G, cs).sum(-1) / n  # (B, G)
    gsq = ss.reshape(B, G, cs).sum(-1) / n
    gvar = gsq - gmean * gmean
    mean_c = jnp.repeat(gmean, cs, axis=-1)  # (B, C)
    inv_c = jnp.repeat(jax.lax.rsqrt(gvar + eps), cs, axis=-1)
    norm = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    norm = norm * scale + bias
    out = norm * jax.nn.sigmoid(norm)
    return out.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, num_groups: int, eps: float):
    """One sample per grid step. Group statistics via a (C, G) one-hot
    group-membership matmul — Mosaic has no vector reshape that splits the
    channel (lane) dim, so E[x], E[x²] reduce to per-channel sums first and
    then contract channels→groups on the MXU."""
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    H, W, C = x.shape
    G = num_groups
    cs = C // G

    x2 = x.reshape(H * W, C)  # collapse majors only (lane dim untouched)
    s = jnp.sum(x2, axis=0, keepdims=True)  # (1, C)
    ss = jnp.sum(x2 * x2, axis=0, keepdims=True)

    chan = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    member = (chan // cs == grp).astype(jnp.float32)  # (C, G) one-hot

    n = jnp.float32(H * W * cs)
    gsum = jax.lax.dot_general(s, member, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (1, G)
    gsumsq = jax.lax.dot_general(ss, member, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gmean = gsum / n
    gvar = gsumsq / n - gmean * gmean

    mean_c = jax.lax.dot_general(gmean, member, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, C)
    var_c = jax.lax.dot_general(gvar, member, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    norm = (x2 - mean_c) * jax.lax.rsqrt(var_c + eps)
    norm = norm * scale_ref[0] + bias_ref[0]
    out = norm * jax.nn.sigmoid(norm)
    out_ref[0] = out.reshape(H, W, C).astype(out_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    kern = functools.partial(_kernel, num_groups=num_groups, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1))


def _should_use_pallas(x) -> bool:
    # Opt-in: measured end-to-end, XLA's conv+GN+swish fusion beats the
    # standalone kernel (the pallas_call is a fusion barrier — an extra HBM
    # round-trip per block). Set DSP_USE_PALLAS=1 to enable for experiments.
    import os

    if os.environ.get("DSP_USE_PALLAS", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, H, W, C = x.shape
    # Mosaic's measured stack footprint is ~24 B/element (several f32 temps);
    # larger activations fall back to XLA's own GN+swish fusion.
    bytes_needed = H * W * C * 24
    return bytes_needed <= _VMEM_LIMIT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_swish(x, scale, bias, num_groups: int, eps: float = 1e-5):
    if _should_use_pallas(x):
        try:
            return _pallas_forward(x, scale, bias, num_groups, eps)
        except Exception:
            pass
    return group_norm_swish_reference(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    return fused_group_norm_swish(x, scale, bias, num_groups, eps), (x, scale, bias)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_swish_reference(x_, s_, b_, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_swish.defvjp(_fwd, _bwd)

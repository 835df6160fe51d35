"""Fused GroupNorm(+affine)+Swish — XLA production path (+ experimental Pallas opt-in).

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


def group_norm_swish_reference(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """jnp reference: NHWC GroupNorm (torch semantics: contiguous channel
    groups, stats over (H,W,C/G) per sample) followed by swish.

    Layout note: the big activation tensor NEVER leaves its native (...,C)
    layout — reshaping the minor (lane) dim to (G, C/G) pads tiny C/G up to
    the 128-lane tile and costs ~C/G× memory traffic on TPU. Only the (B, C)
    per-channel statistics get reshaped (negligible).
    """
    import os

    B, H, W, C = x.shape
    G = num_groups
    cs = C // G
    xf = x.astype(jnp.float32)
    if os.environ.get("DSP_GN_STATS") == "matmul":
        # express the spatial reductions as ones-vector contractions so XLA
        # schedules them on the MXU (trace showed the VPU convert+reduce
        # fusions dominating sampler time)
        x2d = xf.reshape(B, H * W, C)
        ones = jnp.ones((H * W,), jnp.float32)
        s = jnp.einsum("bnc,n->bc", x2d, ones)
        ss = jnp.einsum("bnc,n->bc", x2d * x2d, ones)
    else:
        s = jnp.sum(xf, axis=(1, 2))  # (B, C)
        ss = jnp.sum(xf * xf, axis=(1, 2))
    n = H * W * cs
    gmean = s.reshape(B, G, cs).sum(-1) / n  # (B, G)
    gsq = ss.reshape(B, G, cs).sum(-1) / n
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)  # fp cancellation guard
    mean_c = jnp.repeat(gmean, cs, axis=-1)  # (B, C)
    inv_c = jnp.repeat(jax.lax.rsqrt(gvar + eps), cs, axis=-1)
    norm = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    norm = norm * scale + bias
    out = norm * jax.nn.sigmoid(norm)
    return out.astype(x.dtype)


def _should_use_pallas(x) -> bool:
    # Opt-in: measured end-to-end, XLA's conv+GN+swish fusion beats the
    # standalone kernel (the pallas_call is a fusion barrier — an extra HBM
    # round-trip per block). Set DSP_USE_PALLAS=1 to enable for experiments.
    import os

    if os.environ.get("DSP_USE_PALLAS", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from diffsplitting_tpu.experimental.groupnorm_pallas import _VMEM_LIMIT

    _, H, W, C = x.shape
    # in/out blocks live in VMEM in the native dtype; normalize temps are
    # row-tiled so only the block size matters
    bytes_needed = H * W * C * x.dtype.itemsize * 2
    return bytes_needed <= _VMEM_LIMIT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_swish(x, scale, bias, num_groups: int, eps: float = 1e-5):
    if _should_use_pallas(x):
        from diffsplitting_tpu.experimental.groupnorm_pallas import _pallas_forward

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

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
from jax.experimental import pallas as pl

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


def _stats_kernel(x_ref, sums_ref, acc_s, acc_ss):
    """Grid (B, H-tiles): accumulate per-channel \u03a3x, \u03a3x\u00b2 into VMEM scratch
    (persists across the sequential TPU grid), emit on the last tile.

    Sums computed as MXU matmuls against a ones vector with f32 accumulation
    \u2014 profiling showed XLA's convert+reduce GroupNorm statistics were >50% of
    sampler time.
    """
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        acc_ss[...] = jnp.zeros_like(acc_ss)

    tile = x_ref[0]  # (th, W, C)
    th, W, C = tile.shape
    # f32 BEFORE squaring: a bf16 x² loses ~8 mantissa bits and can push
    # E[x²]−E[x]² negative for near-constant activations (NaN via rsqrt).
    # The tile is row-sized, so the f32 copy stays within the VMEM budget.
    rows = tile.reshape(th * W, C).astype(jnp.float32)
    ones_t = jnp.ones((8, th * W), jnp.float32)
    acc_s[...] += jax.lax.dot_general(
        ones_t, rows, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ss[...] += jax.lax.dot_general(
        ones_t, rows * rows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == n_tiles - 1)
    def _():
        sums_ref[0, 0:1] = acc_s[0:1]
        sums_ref[0, 1:2] = acc_ss[0:1]


def _normalize_kernel(x_ref, sums_ref, scale_ref, bias_ref, out_ref, *,
                      num_groups: int, eps: float, hw: int):
    """Grid (B, H-tiles): y = swish(x·a + b) with a,b folded from the group
    stats (channels\u2192groups via a one-hot matmul; Mosaic cannot split the
    lane dim with a vector reshape)."""
    tile = x_ref[0]  # (th, W, C)
    th, W, C = tile.shape
    G = num_groups
    cs = C // G

    s = sums_ref[0, 0:1]   # (1, C) f32
    ss = sums_ref[0, 1:2]

    chan = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    member = (chan // cs == grp).astype(jnp.float32)

    n = jnp.float32(hw * cs)
    gmean = jax.lax.dot_general(s, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / n
    gsq = jax.lax.dot_general(ss, member, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / n
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)  # fp cancellation guard
    mean_c = jax.lax.dot_general(gmean, member, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(
        jax.lax.rsqrt(gvar + eps), member, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = inv_c * scale_ref[0]
    b = bias_ref[0] - mean_c * a

    rows = tile.reshape(th * W, C).astype(jnp.float32)
    norm = rows * a + b
    out = (norm * jax.nn.sigmoid(norm)).astype(out_ref.dtype)
    out_ref[0] = out.reshape(th, W, C)


def _row_tile(H: int, W: int, C: int, budget: int = 512 * 1024) -> int:
    """Largest divisor-of-H row tile with ~budget bytes of f32 working set."""
    th = max(1, budget // (W * C * 4))
    while th > 1 and H % th:
        th -= 1
    return min(th, H)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float, interpret: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    th = _row_tile(H, W, C)
    T = H // th

    x_spec = pl.BlockSpec((1, th, W, C), lambda b, t: (b, t, 0, 0),
                          memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        _stats_kernel,
        grid=(B, T),
        in_specs=[x_spec],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, C), jnp.float32),
            pltpu.VMEM((8, C), jnp.float32),
        ],
        interpret=interpret,
    )(x)

    kern = functools.partial(_normalize_kernel, num_groups=num_groups, eps=eps,
                             hw=H * W)
    return pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, sums, scale.reshape(1, -1), bias.reshape(1, -1))


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
    # in/out blocks live in VMEM in the native dtype; normalize temps are
    # row-tiled so only the block size matters
    bytes_needed = H * W * C * x.dtype.itemsize * 2
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

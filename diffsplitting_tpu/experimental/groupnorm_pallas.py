"""Standalone Pallas GroupNorm+Swish kernel — experimental (measured NEGATIVE).

Opt-in via DSP_USE_PALLAS=1 through `ops.groupnorm.fused_group_norm_swish`.
Measured on v5e (BENCH_NOTES round 1-2): the pallas_call is a fusion barrier
(an extra HBM round-trip per block), so XLA's in-graph conv+GN+swish fusion
beats it end-to-end (31%% vs 47%% MFU). Kept as tested infrastructure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# per-sample VMEM budget for the kernel (bytes); larger activations fall back
_VMEM_LIMIT = 8 * 1024 * 1024


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


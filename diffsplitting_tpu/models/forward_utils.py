"""Shared raw-pytree UNet forward helpers + the central `apply_unet` dispatch.

These mirror the flax modules numerically (blocks.py TimeEmbedding /
PositionalEncoding / Dense / Conv semantics; reference
ddpm_modules/unet.py:12-37, sr3_modules/unet.py:12-31) for forwards that walk
the param tree directly instead of re-entering flax — the W8A8 quant walker
(models/quant_unet.py) and the experimental fused Pallas chain
(experimental/fused_forward.py).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _conv_xla(p, x, strides=(1, 1), dtype=None):
    k = p["kernel"].astype(dtype or x.dtype)
    ph, pw = k.shape[0] // 2, k.shape[1] // 2
    y = jax.lax.conv_general_dilated(
        x.astype(k.dtype), k, strides, [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _time_embedding(t, dim):
    half = dim // 2  # noqa: F841 — kept for parity with blocks.TimeEmbedding
    inv = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    args = t.reshape(-1, 1).astype(jnp.float32) * inv[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _positional_encoding(level, dim):
    count = dim // 2
    step = jnp.arange(count, dtype=jnp.float32) / count
    args = level.reshape(-1, 1).astype(jnp.float32) * jnp.exp(
        -math.log(1e4) * step[None, :]
    )
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def fused_enabled() -> bool:
    """Experimental fused inference path — OPT-IN (DSP_FUSED=1).

    Measured on v5e (BENCH_NOTES round 2): the Pallas chain runs its convs at
    122-147 TF/s, but XLA's in-graph conv emitter fuses GN statistics into
    conv epilogues natively and averages ~the same effective rate with less
    glue, so the fused path LOSES end-to-end at every batch size tried
    (b32: 26.2-28.5 vs 31.7 steps/s; b8: 82-86 vs 92.5). The implementation
    lives in diffsplitting_tpu/experimental/."""
    return os.environ.get("DSP_FUSED") == "1"


def apply_unet(net, variables, x, time=None, *, train: bool = False,
               rngs=None, deterministic: bool = True):
    """Central UNet apply: standard flax path everywhere; the experimental
    fused stat-carried inference chain only behind DSP_FUSED=1."""
    if not train and deterministic and fused_enabled():
        from diffsplitting_tpu.experimental.fused_forward import fused_unet_apply

        return fused_unet_apply(net, variables, x, time)
    kw = {}
    if rngs is not None:
        kw["rngs"] = rngs
    return net.apply(variables, x, time, deterministic=deterministic, **kw)

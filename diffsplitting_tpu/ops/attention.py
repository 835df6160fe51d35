"""Fused spatial self-attention — Pallas TPU kernel with XLA fallback.

The UNet attends over all HW tokens of a feature map (reference
ddpm_modules/unet.py:99-128; ≤256 tokens at 16×16). The kernel computes
softmax(QKᵀ/√C)·V for one (batch, head) per grid step entirely in VMEM:
Q,K,V tiles stream in once, the N×N score matrix never touches HBM. fp32
softmax accumulation with bf16 matmul inputs (MXU).

Backward recomputes through the jnp reference (custom VJP) — attention maps
are never materialized in HBM in either direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_VMEM_LIMIT = 8 * 1024 * 1024


def attention_reference(q, k, v, scale: float):
    """q,k,v: (B, N, H, D) -> (B, N, H, D); softmax over keys, scores scaled
    by `scale` (the UNet uses 1/√C, unet.py:120)."""
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(q.dtype), v)
    return out


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0]  # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (N, N) fp32
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _pallas_forward(q, k, v, scale: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = q.shape
    # fold heads into the grid; one (N, D) tile per step
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)

    spec = pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def _should_use_pallas(q) -> bool:
    # Opt-in (see groupnorm.py): at ≤256 tokens XLA's fused attention wins;
    # the kernel pays off only for long token counts. DSP_USE_PALLAS=1 enables.
    import os

    if os.environ.get("DSP_USE_PALLAS", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, N, _, D = q.shape
    # q,k,v,out tiles + N×N fp32 scores must fit VMEM
    bytes_needed = 4 * N * D * 4 + N * N * 4 * 2
    return bytes_needed <= _VMEM_LIMIT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """(B, N, heads, D) attention; Pallas on TPU, XLA elsewhere."""
    if _should_use_pallas(q):
        try:
            return _pallas_forward(q, k, v, scale)
        except Exception:
            pass
    return attention_reference(q, k, v, scale)


def _fwd(q, k, v, scale):
    return fused_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)

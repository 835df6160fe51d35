"""W8A8 quantization primitives for the serving path.

v5e's MXU runs s8×s8→s32 at 394 TOP/s — 2× the 197 TFLOP/s bf16 peak — and
XLA lowers `lax.conv_general_dilated` with int8 operands and
`preferred_element_type=int32` straight onto it (measured 1.66–2.33× over
bf16 at the SR3 UNet's four conv shapes, 409 TOP/s at the 8192³ matmul
ceiling; scripts/probe_int8_conv.py, results/probe_int8.json).

Scheme (Q-Diffusion-style post-training quantization, serving only):
  * weights: per-output-channel symmetric int8 — scale[c] = max|K[...,c]|/127,
    computed once from the trained f32 params;
  * activations: per-tensor symmetric int8 with a STATIC calibrated scale
    (absmax over a small grid of (x_t, t) forwards). Static scales keep the
    quantize step a single fused elementwise pass (dynamic per-call absmax
    would re-read the activation for the reduction);
  * accumulation: int32 (|acc| ≤ 9·512·127² ≈ 7.4e7 ≪ 2³¹ at the UNet's
    widest 3×3 conv), dequantized by a_scale·w_scale[c] in f32, bias added,
    then cast back to the compute dtype.

Reference scope note: the torch reference has no quantized path at all —
this is a beyond-parity TPU serving feature (like DeepCache/DDIM), opt-in
via `model.quant` (train/trainer.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

INT8_MAX = 127.0


def quantize_weight(kernel: np.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO conv kernel
    (or IO dense kernel): returns (kernel_i8, w_scale) with
    kernel ≈ kernel_i8 · w_scale (w_scale shape (Cout,), f32).
    Host-side (numpy): runs once per serving session."""
    k = np.asarray(kernel, dtype=np.float32)
    absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)))  # (Cout,)
    w_scale = np.maximum(absmax, 1e-12) / INT8_MAX
    k_i8 = np.clip(np.rint(k / w_scale), -INT8_MAX, INT8_MAX).astype(np.int8)
    return k_i8, w_scale.astype(np.float32)


def quantize_act(x: jnp.ndarray, a_scale) -> jnp.ndarray:
    """Per-tensor symmetric int8 quantization with a static (traced scalar)
    scale. One fused elementwise pass — XLA fuses it into the producer."""
    inv = (1.0 / a_scale).astype(jnp.float32)
    xi = jnp.round(x.astype(jnp.float32) * inv)
    return jnp.clip(xi, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def int8_conv(x_i8: jnp.ndarray, k_i8: jnp.ndarray, strides=(1, 1),
              padding="SAME") -> jnp.ndarray:
    """NHWC int8 conv with int32 accumulation on the MXU."""
    if padding == "SAME":
        ph, pw = k_i8.shape[0] // 2, k_i8.shape[1] // 2
        padding = [(ph, ph), (pw, pw)]
    return lax.conv_general_dilated(
        x_i8, k_i8, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quant_conv_apply(node: dict, x: jnp.ndarray, strides=(1, 1),
                     padding="SAME", out_dtype=None) -> jnp.ndarray:
    """Full W8A8 conv site: quantize activation (static a_scale) → int8 conv
    → dequantize per-channel → bias. `node` is a quantized param node
    ({kernel_i8, w_scale, a_scale[, bias]}, see quantize_unet_params)."""
    x_i8 = quantize_act(x, node["a_scale"])
    y = int8_conv(x_i8, node["kernel_i8"], strides, padding)
    scale = (node["a_scale"].astype(jnp.float32) * node["w_scale"])
    y = y.astype(jnp.float32) * scale
    if "bias" in node:
        y = y + node["bias"].astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)

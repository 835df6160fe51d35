"""LPIPS (AlexNet backbone) — pure-JAX perceptual distance.

Parity target: the reference's notebook evaluation reports LPIPS(alex)
alongside PSNR (/root/reference/notebooks/EvaluateJointIndi.ipynb cells
30-34, via the `lpips` pip package: AlexNet features → unit-normalize over
channels → squared diff → learned 1×1 "lin" head → spatial mean → sum over
the 5 feature layers, with the fixed input shift/scale of `ScalingLayer`).

This image is zero-egress (no lpips wheel, no AlexNet weights), so the metric
is shipped as a fully-functional scaffold: the math is complete and jitted;
weights load from a local `.npz` (our layout) or a torch checkpoint holding
the torchvision-AlexNet + lpips-lin state dicts — one file-drop away from the
published metric. `random_lpips_params` exists so the pipeline stays testable
without weights.

Inputs are NHWC RGB in [-1, 1] (same convention as the lpips package).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (input normalization in [-1,1] space)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature extractor: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_CFG = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)
FEATURE_CHANNELS = tuple(c[0] for c in _ALEX_CFG)


def random_lpips_params(rng, dtype=jnp.float32) -> Dict:
    """Random-weight parameter pytree with the exact production structure —
    for tests and pipeline dry-runs while real weights are absent."""
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_ALEX_CFG):
        rng, k1, k2 = jax.random.split(rng, 3)
        params[f"conv{i}"] = {
            "kernel": jax.random.normal(k1, (k, k, in_ch, out_ch), dtype)
            * (1.0 / np.sqrt(k * k * in_ch)),
            "bias": jnp.zeros((out_ch,), dtype),
        }
        rng, k3 = jax.random.split(rng)
        # lpips lin heads are trained non-negative; mirror that
        params[f"lin{i}"] = {
            "weight": jnp.abs(jax.random.normal(k3, (out_ch,), dtype)) * 0.01
        }
        in_ch = out_ch
    return params


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_features(params, x):
    """x: (B,H,W,3) in [-1,1] → list of 5 post-ReLU feature maps (NHWC)."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, _, stride, pad, pool_before) in enumerate(_ALEX_CFG):
        if pool_before:
            x = _maxpool_3x3_s2(x)
        p = params[f"conv{i}"]
        x = jax.lax.conv_general_dilated(
            x,
            p["kernel"],
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _unit_normalize(f, eps=1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips(params, img1, img2):
    """LPIPS distance per batch element: (B,H,W,3)×2 in [-1,1] → (B,)."""
    f1 = _alex_features(params, img1)
    f2 = _alex_features(params, img2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{i}"]["weight"]  # (C,) == 1x1 conv to a scalar map
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def lpips_grayscale(params, img1, img2):
    """Single-channel convenience: replicate to RGB (the notebook feeds the
    microscopy channels through lpips the same way)."""
    return lpips(params, jnp.repeat(img1, 3, -1), jnp.repeat(img2, 3, -1))


# --------------------------------------------------------------- weight IO
def save_lpips_weights(params, path: str) -> None:
    flat = {}
    for name, leaf in params.items():
        for k, v in leaf.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def _params_from_flat(flat) -> Dict:
    params: Dict = {}
    for key in flat:
        name, k = key.split("/")
        params.setdefault(name, {})[k] = jnp.asarray(flat[key])
    _validate(params)
    return params


def _validate(params: Dict) -> None:
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_ALEX_CFG):
        kern = params[f"conv{i}"]["kernel"]
        assert kern.shape == (k, k, in_ch, out_ch), (
            f"conv{i} kernel {kern.shape} != {(k, k, in_ch, out_ch)}"
        )
        assert params[f"lin{i}"]["weight"].shape == (out_ch,)
        in_ch = out_ch


def params_from_torch_state_dicts(alexnet_sd, lpips_sd) -> Dict:
    """Convert torchvision-AlexNet `features.*` + lpips `lin*.model.1.weight`
    state dicts (torch tensors or numpy) to our pytree.

    torchvision layout: features.{0,3,6,8,10}.{weight,bias}, OIHW.
    lpips layout: lin{i}.model.1.weight, (1, C, 1, 1).
    """
    conv_idx = (0, 3, 6, 8, 10)
    params: Dict = {}
    for i, j in enumerate(conv_idx):
        w = np.asarray(alexnet_sd[f"features.{j}.weight"])  # (O,I,H,W)
        b = np.asarray(alexnet_sd[f"features.{j}.bias"])
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(b),
        }
        lw = np.asarray(lpips_sd[f"lin{i}.model.1.weight"]).reshape(-1)
        params[f"lin{i}"] = {"weight": jnp.asarray(lw)}
    _validate(params)
    return params


def load_lpips_weights(path: str) -> Dict:
    """Load from `.npz` (our layout) or a torch `.pth`/`.pt` file containing
    {'alexnet': <torchvision features sd>, 'lpips': <lin sd>} (or a flat dict
    holding both naming schemes)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npz"):
        with np.load(path) as flat:
            return _params_from_flat(flat)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "alexnet" in sd and "lpips" in sd:
        return params_from_torch_state_dicts(sd["alexnet"], sd["lpips"])
    return params_from_torch_state_dicts(sd, sd)

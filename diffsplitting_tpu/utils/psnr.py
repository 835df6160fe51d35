"""Batch PSNR and range-invariant PSNR (jax-accelerated, numpy-friendly).

Math parity with /root/reference/core/psnr.py (itself duplicating the external
`disentangle.core.psnr` the notebooks import):
  * PSNR: per-image range = max-min of the GT unless given (:44-49).
  * RangeInvariantPsnr (:70-82): zero-mean/std-normalized GT, least-squares
    scale fit of the prediction (fix_range), range = (max-min)/std.
The reference computes in torch; here the math runs through jnp so it can be
jitted on device, and numpy inputs are accepted transparently.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _as_batch2d(x):
    x = jnp.asarray(x)
    assert x.ndim == 3, "Images must be in shape: (batch, H, W)"
    return x.reshape(x.shape[0], -1)


def zero_mean(x):
    return x - jnp.mean(x, axis=1, keepdims=True)


def fix_range(gt, x):
    a = jnp.sum(gt * x, axis=1, keepdims=True) / jnp.sum(x * x, axis=1, keepdims=True)
    return x * a


def fix(gt, x):
    gt_ = zero_mean(gt)
    return fix_range(gt_, zero_mean(x))


def _psnr_internal(gt, pred, range_=None):
    if range_ is None:
        range_ = jnp.max(gt, axis=1) - jnp.min(gt, axis=1)
    mse = jnp.mean((gt - pred) ** 2, axis=1)
    return 20 * jnp.log10(range_ / jnp.sqrt(mse))


def PSNR(gt, pred, range_=None) -> np.ndarray:
    gt = _as_batch2d(gt)
    pred = _as_batch2d(pred)
    return np.asarray(_psnr_internal(gt, pred, range_=range_))


def RangeInvariantPsnr(gt, pred) -> np.ndarray:
    """Scale-invariant PSNR for grayscale stacks (batch, H, W)."""
    gt = _as_batch2d(gt)
    pred = _as_batch2d(pred)
    std = jnp.std(gt, axis=1)
    ra = (jnp.max(gt, axis=1) - jnp.min(gt, axis=1)) / std
    gt_ = zero_mean(gt) / std[:, None]
    return np.asarray(_psnr_internal(zero_mean(gt_), fix(gt_, pred), ra))

"""Inference-time mixing-fraction (t) estimation for joint-InDI splitting.

Parity with /root/reference/core/psnr_based_t_refinement.py:
  1. the TimePredictor classifier predicts t from the mixed input (:14-17);
     indi_1's start time is 1 - t, indi_2's is t (:20-26),
  2. both InDI directions run ONE bridge step from those times (:28-39),
  3. a grid search over t ∈ [0, 1) in 0.05 steps picks the remix
     t·ch1 + (1-t)·ch2 that maximizes RangeInvariantPSNR against the input;
     returns per-sample argmax t and the consensus (mean-PSNR argmax) t
     (:41-57).

TPU-native: the whole batch runs at once (the reference loops per sample with
a host sync each, :28-35) and the remix grid is one vectorized PSNR batch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .psnr import RangeInvariantPsnr


def get_channel_estimates(
    inp: jnp.ndarray,
    indi_1,
    indi_2,
    denoise_1: Callable,
    denoise_2: Callable,
    time_classifier: Callable,
    rng,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-step bridge inversions of both channels at the classifier's t.

    inp: (B, H, W, 1) normalized input. Returns (pred1, pred2, pred_t_2).
    For the classifier input = t·c1 + (1-t)·c2, so indi_1 (recovering c1)
    needs start time 1-t (reference :20-26).
    """
    pred_t_2 = np.asarray(time_classifier(inp))
    pred_t_1 = 1.0 - pred_t_2

    r1, r2 = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
    pred1, pred2 = [], []
    for b in range(inp.shape[0]):
        x = inp[b : b + 1]
        ch1 = indi_1.inference(
            denoise_1, r1, x, continuous=False, num_timesteps=1,
            t_float_start=float(pred_t_1[b]),
        )
        ch2 = indi_2.inference(
            denoise_2, r2, x, continuous=False, num_timesteps=1,
            t_float_start=float(pred_t_2[b]),
        )
        pred1.append(np.asarray(ch1))
        pred2.append(np.asarray(ch2))
    return np.concatenate(pred1, 0), np.concatenate(pred2, 0), pred_t_2


def estimate_time_using_PSNR(
    inp,
    indi_1,
    indi_2,
    denoise_1: Callable,
    denoise_2: Callable,
    time_classifier: Callable,
    rng=None,
    t_step: float = 0.05,
) -> Tuple[np.ndarray, float]:
    """Returns (per_sample_t, consensus_t).

    inp: (B, H, W, 1) normalized mixed input.
    """
    pred1, pred2, _ = get_channel_estimates(
        inp, indi_1, indi_2, denoise_1, denoise_2, time_classifier, rng
    )
    gt = np.asarray(inp)[..., 0]  # (B, H, W)
    p1 = pred1[..., 0]
    p2 = pred2[..., 0]

    t_list = np.arange(0, 1.0, t_step)
    psnr_rows = []
    for t in t_list:
        remix = p1 * t + p2 * (1 - t)
        psnr_rows.append(RangeInvariantPsnr(gt, remix))
    psnr_matrix = np.stack(psnr_rows)  # (T, B)

    per_sample_t = t_list[psnr_matrix.argmax(axis=0)]
    consensus_t = float(t_list[psnr_matrix.mean(axis=1).argmax()])
    return per_sample_t, consensus_t

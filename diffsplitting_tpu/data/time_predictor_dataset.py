"""Dataset for the time-predictor regressor.

Parity: /root/reference/data/time_predictor_dataset.py — per-t min/max over
the whole dataset is precomputed for t ∈ {0..T}/T (T=100, :36); __getitem__
samples t, mixes the *normalized* channel patches as t·ch0 + (1-t)·ch1,
min-max rescales to [-1,1] with the precomputed stats for that t, optionally
adds gaussian noise scaled by the patch std, and returns (input, t).

The reference's O(T·N·HW) python loop precompute (:6-21) is replaced by a
vectorized two-pass: per-frame (min, max) of ch0 and ch1 plus per-frame
extremal mixtures — t·a + (1-t)·b is linear in t, so the per-t extrema over a
frame are attained at per-pixel extremes; we still scan frames but vectorize
over t.
"""

from __future__ import annotations

import numpy as np

from .split_dataset import SplitDataset


def compute_input_normalization_dict(data_dict, n_timesteps, mean_target, std_target):
    """{t_int: [min, max]} of the t-mixture over all frames (normalized)."""
    mean = np.asarray(mean_target).reshape(-1)
    std = np.asarray(std_target).reshape(-1)
    ch0 = [(np.asarray(x) - mean[0]) / std[0] for x in data_dict[0]]
    ch1 = [(np.asarray(x) - mean[1]) / std[1] for x in data_dict[1]]

    ts = np.arange(0, n_timesteps + 1) / n_timesteps  # (T+1,)
    mins = np.full(len(ts), 1e10)
    maxs = np.full(len(ts), -1e10)
    for a, b in zip(ch0, ch1):
        # exact per-t extrema require the pixelwise mixture; vectorize over t
        # in chunks to bound memory
        flat_a = a.reshape(-1)
        flat_b = b.reshape(-1)
        for i in range(0, len(ts), 8):
            sub = ts[i : i + 8, None]
            mix = sub * flat_a[None, :] + (1 - sub) * flat_b[None, :]
            mins[i : i + 8] = np.minimum(mins[i : i + 8], mix.min(axis=1))
            maxs[i : i + 8] = np.maximum(maxs[i : i + 8], mix.max(axis=1))
    return {t_int: [mins[t_int], maxs[t_int]] for t_int in range(n_timesteps + 1)}


class TimePredictorDataset(SplitDataset):
    def __init__(self, *args, step_size=0.05, gaussian_noise_std_factor=None,
                 raw_mixture_inputs=False, **kwargs):
        """raw_mixture_inputs=True drops the reference's per-t min-max rescale
        (:50-89) and trains directly on t·ch0n + (1-t)·ch1n — the EXACT input
        the t-refinement workflow serves at inference
        (core/psnr_based_t_refinement.py feeds the plain normalized mixture).
        The reference's min-max path creates a train/serve mismatch that
        makes the classifier systematically underestimate t (measured:
        BENCH_NOTES round 3, t̂ ≈ 0.6·t_true); keep it for parity, opt into
        raw inputs via `datasets.train.raw_mixture_inputs`."""
        self._gaussian_noise_std_factor = gaussian_noise_std_factor
        self._raw_mixture_inputs = bool(raw_mixture_inputs)
        super().__init__(*args, **kwargs)
        self._num_timesteps = 100
        self.input_normalization_dict = compute_input_normalization_dict(
            self._data_dict, self._num_timesteps, self._mean_target, self._std_target
        )

    def sample_t(self):
        t_int = int(self._rng.integers(0, self._num_timesteps))
        return t_int / self._num_timesteps, t_int

    def min_max_normalize(self, img, t_int):
        t_min, t_max = self.input_normalization_dict[t_int]
        return 2 * (img - t_min) / (t_max - t_min) - 1

    def item_at_t(self, index, t: float, t_int: int):
        """Mixture at a FIXED t (the evaluation notebook's per-t grid loop).

        Assumes `compute_input_normalization_dict` stats for the same grid
        were passed via `fixed_t_norm_dict` (else uses the T=100 stats).
        """
        fidx, h_idx, w_idx = self._get_location(index)
        P = self._patch_size
        patch1 = np.asarray(self._data_dict[0][fidx][h_idx : h_idx + P, w_idx : w_idx + P])
        patch2 = np.asarray(self._data_dict[1][fidx][h_idx : h_idx + P, w_idx : w_idx + P])
        if patch1.ndim == 2:
            patch1 = patch1[..., None]
            patch2 = patch2[..., None]
        target = self.normalize_target(
            np.concatenate([patch1, patch2], axis=-1).astype(np.float32)
        )
        nC = patch1.shape[-1]
        inp = t * target[..., 0:nC] + (1 - t) * target[..., nC : 2 * nC]
        norm = getattr(self, "fixed_t_norm_dict", self.input_normalization_dict)
        t_min, t_max = norm[t_int]
        return (2 * (inp - t_min) / (t_max - t_min) - 1).astype(np.float32)

    def __getitem__(self, index):
        fidx, h_idx, w_idx = self._get_location(index)
        img1 = self._data_dict[0][fidx]
        if self._uncorrelated_channels:
            fidx = int(self._rng.integers(0, self._frameN))
        img2 = self._data_dict[1][fidx]
        assert img1.shape == img2.shape

        P = self._patch_size
        patch1 = np.asarray(img1[h_idx : h_idx + P, w_idx : w_idx + P]).astype(np.float32)
        patch2 = np.asarray(img2[h_idx : h_idx + P, w_idx : w_idx + P]).astype(np.float32)
        if self._enable_transforms:
            patch1, patch2 = self._augment(patch1, patch2)
        if patch1.ndim == 2:
            patch1 = patch1[..., None]
            patch2 = patch2[..., None]

        target = np.concatenate([patch1, patch2], axis=-1)
        target = self.normalize_target(target)
        nC = patch1.shape[-1]
        patch1, patch2 = target[..., 0:nC], target[..., nC : 2 * nC]

        t, t_int = self.sample_t()
        inp = t * patch1 + (1 - t) * patch2
        if not self._raw_mixture_inputs:
            inp = self.min_max_normalize(inp, t_int)

        if self._gaussian_noise_std_factor is not None:
            inp = inp + self._rng.normal(
                0, self._gaussian_noise_std_factor * inp.std(), inp.shape
            ).astype(np.float32)

        return inp.astype(np.float32), np.float32(t)

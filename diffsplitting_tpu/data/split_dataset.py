"""SplitDataset — the fluorescence-splitting task dataset (host-side numpy, HWC).

Behavior parity with /root/reference/data/split_dataset.py:
  * DataLocation: exactly one of fpath / channelwise_fpath / directory (:10-18).
  * TIFF channel loaders with the Hagen hardcoded upper clip of 1993.0
    (:76-83) — exposed here as `hagen_upper_clip` instead of a hardcoded
    constant, defaulting to the reference's value.
  * compute_normalization_dict (:29-74): quantile-max based mean/std per
    channel and for the weighted-sum input; uint8 (CIFAR) fast path where
    max = 255·Σw.
  * patching: grid (`patch_location`, :215-224) or random (:227-235);
    `uncorrelated_channels` draws channel 2 from a random frame (:242-243);
    paired horizontal flip augmentation (:134-140, albumentations there,
    plain numpy here).
  * __getitem__ (:237-278): target = concat(ch-patches) normalized by the
    target stats; input = weighted raw sum normalized by the input stats, or
    computed from the normalized target when `input_from_normalized_target`
    (the joint-InDI path, split.py:49).

Layout difference: everything is channel-LAST (HWC) for the NHWC TPU models.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .cifar10 import load_train_val_data
from .io import load_tiff_stack

# The reference hardcodes this clip for the Hagen TIFFs (split_dataset.py:80-82)
HAGEN_UPPER_CLIP_DEFAULT = 1993.0

# CIFAR splitting classes: 1=automobile, 7=horse (split_dataset.py:22)
CIFAR_SPLIT_LABELS = [1, 7]


@dataclass
class DataLocation:
    fpath: str = ""
    channelwise_fpath: Tuple[str, ...] = ()
    directory: str = ""

    def __post_init__(self):
        provided = [bool(self.fpath), bool(len(self.channelwise_fpath)), bool(self.directory)]
        assert sum(provided) == 1, (
            "Exactly one of fpath, channelwise_fpath, directory must be provided"
        )


def _load_channelwise(fpaths, upper_clip_value: Optional[float]):
    assert len(fpaths) == 2, "Only two channelwise fpaths are supported"
    data_ch0 = load_tiff_stack(fpaths[0]).astype(np.float32)
    data_ch1 = load_tiff_stack(fpaths[1]).astype(np.float32)
    if upper_clip_value is not None:
        data_ch0 = np.minimum(data_ch0, upper_clip_value)
        data_ch1 = np.minimum(data_ch1, upper_clip_value)
    return {0: [x for x in data_ch0], 1: [x for x in data_ch1]}


def _load_single_fpath(fpath: str):
    assert os.path.exists(fpath), f"Path {fpath} does not exist"
    data = load_tiff_stack(fpath)
    return {0: [x for x in data[..., 0]], 1: [x for x in data[..., 1]]}


def load_data(
    data_type: str,
    dataloc: DataLocation,
    upper_clip_value: Optional[float] = HAGEN_UPPER_CLIP_DEFAULT,
) -> Dict[int, List[np.ndarray]]:
    if data_type == "cifar10":
        return load_train_val_data(dataloc.directory, CIFAR_SPLIT_LABELS)
    if dataloc.fpath:
        return _load_single_fpath(dataloc.fpath)
    if len(dataloc.channelwise_fpath) > 0:
        return _load_channelwise(dataloc.channelwise_fpath, upper_clip_value)
    raise ValueError("unsupported data location")


def compute_normalization_dict(data_dict, channel_weights, q_val=1.0, uint8_data=False):
    """Quantile-max normalization stats: x -> (x - max/2)/(max/2) ∈ [-1,1]."""
    if uint8_data:
        tar_max = 255.0
        inp_max = tar_max * float(np.sum(channel_weights))
        img_shape = data_dict[0][0].shape
        nC = 1 if len(img_shape) == 2 else img_shape[-1]  # HWC
        return {
            "mean_input": inp_max / 2,
            "std_input": inp_max / 2,
            "mean_target": np.array([tar_max / 2] * nC + [tar_max / 2] * nC),
            "std_target": np.array([tar_max / 2] * nC + [tar_max / 2] * nC),
            "target0_max": tar_max,
            "target1_max": tar_max,
            "input_max": inp_max,
        }

    tar1 = np.concatenate([np.asarray(x).reshape(-1) for x in data_dict[0]])
    tar2 = np.concatenate([np.asarray(x).reshape(-1) for x in data_dict[1]])
    tar1_max = np.quantile(tar1, q_val)
    tar2_max = np.quantile(tar2, q_val)
    inp_max = np.quantile(tar1 * channel_weights[0] + tar2 * channel_weights[1], q_val)
    return {
        "mean_input": inp_max / 2,
        "std_input": inp_max / 2,
        "mean_target": np.array([tar1_max / 2, tar2_max / 2]),
        "std_target": np.array([tar1_max / 2, tar2_max / 2]),
        "target0_max": tar1_max,
        "target1_max": tar2_max,
        "input_max": inp_max,
    }


class SplitDataset:
    """Map-style dataset yielding {'input': HWC, 'target': HWC} float32."""

    def __init__(
        self,
        data_type: str,
        data_location: DataLocation,
        patch_size: int,
        target_channel_idx: Optional[int] = None,
        random_patching: bool = False,
        enable_transforms: bool = False,
        max_qval: float = 0.98,
        normalization_dict: Optional[dict] = None,
        uncorrelated_channels: bool = False,
        channel_weights: Optional[List[float]] = None,
        input_from_normalized_target: bool = False,
        upper_clip: bool = False,
        hagen_upper_clip: Optional[float] = HAGEN_UPPER_CLIP_DEFAULT,
        seed: int = 0,
    ):
        assert data_type in ("cifar10", "Hagen"), "data_type must be cifar10 or Hagen"

        self._patch_size = patch_size
        self._data_location = data_location
        self._channel_weights = channel_weights if channel_weights is not None else [1, 1]
        self._input_from_normalized_target = input_from_normalized_target
        self._data_dict = load_data(
            data_type, data_location,
            upper_clip_value=hagen_upper_clip if data_type == "Hagen" else None,
        )
        self._frameN = min(len(self._data_dict[0]), len(self._data_dict[1]))
        self._target_channel_idx = target_channel_idx
        self._random_patching = random_patching
        self._uncorrelated_channels = uncorrelated_channels
        self._max_qval = max_qval
        self._enable_transforms = enable_transforms
        self._rng = np.random.default_rng(seed)

        if normalization_dict is None:
            normalization_dict = compute_normalization_dict(
                self._data_dict,
                self._channel_weights,
                q_val=self._max_qval,
                uint8_data=data_type == "cifar10",
            )

        if upper_clip:
            self._data_dict[0] = [
                np.clip(x, 0, normalization_dict["target0_max"]) for x in self._data_dict[0]
            ]
            self._data_dict[1] = [
                np.clip(x, 0, normalization_dict["target1_max"]) for x in self._data_dict[1]
            ]

        for key in ("mean_input", "std_input", "mean_target", "std_target"):
            assert key in normalization_dict, f"{key} must be provided"

        self._mean_inp = normalization_dict["mean_input"]
        self._std_inp = normalization_dict["std_input"]
        mean_target = np.asarray(normalization_dict["mean_target"])
        std_target = np.asarray(normalization_dict["std_target"])
        # HWC: stats broadcast on the trailing channel axis
        self._mean_target = mean_target.reshape(1, 1, -1)
        self._std_target = std_target.reshape(1, 1, -1)
        self._target0_max = normalization_dict.get("target0_max")
        self._target1_max = normalization_dict.get("target1_max")
        self._input_max = normalization_dict.get("input_max")

    # ------------------------------------------------------------------ stats
    def get_normalization_dict(self):
        return {
            "mean_input": self._mean_inp,
            "std_input": self._std_inp,
            "mean_target": self._mean_target,
            "std_target": self._std_target,
            "target0_max": self._target0_max,
            "target1_max": self._target1_max,
            "input_max": self._input_max,
        }

    def normalize_inp(self, inp):
        return ((inp - self._mean_inp) / self._std_inp).astype(np.float32)

    def normalize_target(self, target):
        return ((target - self._mean_target) / self._std_target).astype(np.float32)

    # --------------------------------------------------------------- indexing
    def frame_shape(self):
        return self._data_dict[0][0].shape[:2]

    def patch_count_per_frame(self):
        h, w = self.frame_shape()
        return (h // self._patch_size) * (w // self._patch_size)

    def __len__(self):
        return self._frameN * self.patch_count_per_frame()

    def frame_idx(self, index):
        return index // self.patch_count_per_frame()

    def patch_location(self, index):
        """(frame_idx, h_start, w_start) for grid patching."""
        fidx = self.frame_idx(index)
        index = index % self.patch_count_per_frame()
        h, w = self.frame_shape()
        h_idx = index // (h // self._patch_size)
        w_idx = index % (w // self._patch_size)
        return fidx, h_idx * self._patch_size, w_idx * self._patch_size

    def _get_location(self, index):
        if self._random_patching:
            fidx = int(self._rng.integers(0, self._frameN))
            h, w = self.frame_shape()
            h_idx = int(self._rng.integers(0, h - self._patch_size)) if h > self._patch_size else 0
            w_idx = int(self._rng.integers(0, w - self._patch_size)) if w > self._patch_size else 0
            return fidx, h_idx, w_idx
        return self.patch_location(index)

    # ------------------------------------------------------------------ items
    def _augment(self, patch1, patch2):
        """Paired horizontal flip with p=0.5 (reference uses albumentations
        HorizontalFlip with an `image2` mirror target)."""
        if self._rng.random() < 0.5:
            patch1 = patch1[:, ::-1].copy()
            patch2 = patch2[:, ::-1].copy()
        return patch1, patch2

    def __getitem__(self, index):
        fidx, h_idx, w_idx = self._get_location(index)
        img1 = self._data_dict[0][fidx]
        if self._uncorrelated_channels:
            fidx = int(self._rng.integers(0, self._frameN))
        img2 = self._data_dict[1][fidx]
        assert img1.shape == img2.shape, "Images must have the same shape"

        P = self._patch_size
        patch1 = np.asarray(img1[h_idx : h_idx + P, w_idx : w_idx + P]).astype(np.float32)
        patch2 = np.asarray(img2[h_idx : h_idx + P, w_idx : w_idx + P]).astype(np.float32)

        if self._enable_transforms:
            patch1, patch2 = self._augment(patch1, patch2)

        if patch1.ndim == 2:  # grayscale -> HWC
            patch1 = patch1[..., None]
            patch2 = patch2[..., None]

        target = np.concatenate([patch1, patch2], axis=-1)
        target = self.normalize_target(target)

        nC = patch1.shape[-1]
        if self._input_from_normalized_target:
            inp = (
                self._channel_weights[0] * target[..., 0:nC]
                + self._channel_weights[1] * target[..., nC : 2 * nC]
            )
        else:
            inp = self._channel_weights[0] * patch1 + self._channel_weights[1] * patch2
            inp = self.normalize_inp(inp)

        if self._target_channel_idx is None:
            return {"input": inp, "target": target}
        c = self._target_channel_idx
        return {"input": inp, "target": target[..., c : c + 1]}

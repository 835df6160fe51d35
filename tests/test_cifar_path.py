"""CIFAR-10 synthetic-splitting data path (pickle loader + uint8 normalization)."""

import os
import pickle

import numpy as np
import pytest

from diffsplitting_tpu.data import SplitDataset
from diffsplitting_tpu.data.cifar10 import load_train_val_data
from diffsplitting_tpu.data.split_dataset import DataLocation


@pytest.fixture
def cifar_dir(tmp_path):
    """Two synthetic CIFAR pickle batches with classes 1 and 7 present."""
    rng = np.random.default_rng(0)
    d = tmp_path / "cifar"
    d.mkdir()
    for b in range(2):
        n = 40
        data = rng.integers(0, 255, (n, 3072), dtype=np.uint8)
        labels = list(rng.choice([0, 1, 2, 7], size=n))
        labels[0], labels[1] = 1, 7  # guarantee presence
        with open(d / f"data_batch_{b+1}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    return str(d)


def test_cifar_loader(cifar_dir):
    data = load_train_val_data(cifar_dir, [1, 7])
    assert set(data.keys()) == {0, 1}
    assert data[0].shape[1:] == (32, 32, 3)  # HWC
    assert data[0].dtype == np.uint8


def test_split_dataset_cifar(cifar_dir):
    ds = SplitDataset(
        "cifar10",
        DataLocation(directory=cifar_dir),
        patch_size=32,
        max_qval=1.0,
        enable_transforms=True,
        random_patching=False,
        uncorrelated_channels=True,
    )
    s = ds[0]
    # 3-channel images: input 3ch, target 6ch (two stacked class images)
    assert s["input"].shape == (32, 32, 3)
    assert s["target"].shape == (32, 32, 6)
    # uint8 path: mean=std=127.5 -> values in [-1, 1]
    assert -1.001 <= s["target"].min() and s["target"].max() <= 1.001
    nd = ds.get_normalization_dict()
    assert nd["input_max"] == pytest.approx(255 * 2)


def test_split_dataset_cifar_weighted(cifar_dir):
    ds = SplitDataset(
        "cifar10", DataLocation(directory=cifar_dir), 32,
        max_qval=1.0, channel_weights=[1, 0.3],
    )
    nd = ds.get_normalization_dict()
    assert nd["input_max"] == pytest.approx(255 * 1.3)
    s = ds[0]
    assert np.isfinite(s["input"]).all()

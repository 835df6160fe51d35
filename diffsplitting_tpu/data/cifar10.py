"""CIFAR-10 pickle loading for the synthetic splitting task.

Parity: /root/reference/data/cifar10.py — each pickle batch holds
data[b'data'] (N, 3072) uint8 and b'labels'; the splitting task selects two
label classes (1=automobile, 7=horse via split_dataset) into a channel dict.
Layout difference: we return HWC images (TPU-native), not CHW.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Dict, List

import numpy as np


def unpickle(file):
    with open(file, "rb") as fo:
        return pickle.load(fo, encoding="bytes")


def load_cifar10_file(fpath: str):
    data = unpickle(fpath)
    imgs = data[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # HWC
    labels = np.array(data[b"labels"])
    return imgs, labels


def load_train_val_data(datadir: str, label_idx_list: List[int]) -> Dict[int, np.ndarray]:
    """Channel dict {0: imgs_of_class_a, 1: imgs_of_class_b} (HWC uint8)."""
    fpaths = [os.path.join(datadir, f) for f in sorted(os.listdir(datadir))]
    data = defaultdict(list)
    for fpath in fpaths:
        imgs, labels = load_cifar10_file(fpath)
        for i, label in enumerate(label_idx_list):
            idx = np.where(labels == label)[0]
            data[i].append(imgs[idx])
    return {i: np.concatenate(data[i], axis=0) for i in range(len(label_idx_list))}

"""Data layer: datasets are plain-python/numpy (host side), channel-LAST (HWC).

The reference's datasets emit CHW torch tensors through torch DataLoader
(/root/reference/data/__init__.py:7-21); here everything is NHWC numpy fed to
the device through `diffsplitting_tpu.data.loader.NumpyLoader` — no torch
dependency on the input path.
"""

from .split_dataset import (
    DataLocation,
    SplitDataset,
    compute_normalization_dict,
    load_data,
)
from .tiling import TileIndexManager, TilingMode
from .stitcher import stitch_predictions
from .tiled_dataset import SplitDatasetTiledPred
from .time_predictor_dataset import TimePredictorDataset
from .loader import NumpyLoader


def create_dataloader(dataset, dataset_opt, phase):
    """Parity with reference data/__init__.py:7-21: train honors
    batch_size/shuffle; val is batch=1, unshuffled."""
    if phase == "train":
        return NumpyLoader(
            dataset,
            batch_size=dataset_opt["batch_size"],
            shuffle=bool(dataset_opt.get("use_shuffle", True)),
        )
    if phase == "val":
        return NumpyLoader(dataset, batch_size=1, shuffle=False)
    raise NotImplementedError(f"Dataloader [{phase}] is not found.")


def create_dataset(dataset_opt, phase):
    """SR dataset factory (parity: reference data/__init__.py:24-39)."""
    from .lrhr_dataset import LRHRDataset

    mode = dataset_opt["mode"]
    return LRHRDataset(
        dataroot=dataset_opt["dataroot"],
        datatype=dataset_opt["datatype"],
        l_resolution=dataset_opt["l_resolution"],
        r_resolution=dataset_opt["r_resolution"],
        split=phase,
        data_len=dataset_opt["data_len"],
        need_LR=(mode == "LRHR"),
    )

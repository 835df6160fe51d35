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
    batch_size/shuffle; val is batch=1, unshuffled. `data_len` (debug-mode
    shrink, config loader) caps the epoch length for map-style datasets that
    don't consume it themselves."""
    data_len = dataset_opt.get("data_len") if hasattr(dataset_opt, "get") else None
    if data_len is not None and int(data_len) <= 0:
        data_len = None
    if phase == "train":
        return NumpyLoader(
            dataset,
            batch_size=dataset_opt["batch_size"],
            shuffle=bool(dataset_opt.get("use_shuffle", True)),
            data_len=data_len,
        )
    if phase == "val":
        return NumpyLoader(dataset, batch_size=1, shuffle=False, data_len=data_len)
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

"""time_prediction_training.start_training smoke on synthetic TIFF data."""

import json
import os
import sys

import numpy as np
import pytest


def test_start_training_smoke(tmp_path, monkeypatch):
    from tests.test_cli_e2e import write_tiff

    data = tmp_path / "data"
    data.mkdir()
    for split_name, seed in [("train", 0), ("val", 1)]:
        write_tiff(str(data / f"{split_name}_ch0.tif"), n=2, h=48, w=48, seed=seed)
        write_tiff(str(data / f"{split_name}_ch1.tif"), n=2, h=48, w=48, seed=seed + 5)

    from diffsplitting_tpu.config import dict_to_nonedict
    import time_prediction_training as tpt

    opt = dict_to_nonedict({
        "name": "tp_smoke",
        "path": {"experiment_root": str(tmp_path / "exp")},
        "enable_wandb": False,
        "datasets": {
            "upper_clip": False, "patch_size": 16, "max_qval": 1.0,
            "channel_weights": [1.0, 1.0],
            "train": {"name": "Hagen",
                      "datapath": {"ch0": str(data / "train_ch0.tif"),
                                   "ch1": str(data / "train_ch1.tif")},
                      "batch_size": 4, "use_shuffle": True,
                      "uncorrelated_channels": False,
                      "gaussian_noise_std_factor": 0.02},
            "val": {"name": "Hagen",
                    "datapath": {"ch0": str(data / "val_ch0.tif"),
                                 "ch1": str(data / "val_ch1.tif")}},
        },
        "model": {"loss_type": "l2", "lr_reduction": "mean", "finetune_norm": False,
                  "which_model_G": "UnetClassifier",
                  "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                           "norm_groups": 4, "channel_multiplier": [1, 2],
                           "attn_res": [], "res_blocks": 1, "dropout": 0.1}},
        "train": {"num_epochs": 2, "optimizer": {"type": "adam", "lr": 1e-3},
                  "lr_scheduler_patience": 1},
    })
    os.makedirs(opt["path"]["experiment_root"], exist_ok=True)
    params, best_val = tpt.start_training(opt, max_epochs=2, steps_per_epoch=2)
    assert np.isfinite(best_val)
    # best checkpoint written
    assert os.path.isdir(os.path.join(opt["path"]["experiment_root"],
                                      "best_time_predictor_gen"))


def test_reduce_lr_on_plateau():
    from time_prediction_training import ReduceLROnPlateau

    s = ReduceLROnPlateau(lr=1.0, patience=1, factor=0.5, min_lr=0.1)
    assert s.step(1.0) == 1.0   # first = best
    assert s.step(1.0) == 1.0   # bad 1 (== patience, not yet > patience)
    assert s.step(1.0) == 0.5   # bad 2 -> halve
    assert s.step(0.5) == 0.5   # improvement resets
    for _ in range(10):
        s.step(0.5)
    assert s.lr >= 0.1          # floor

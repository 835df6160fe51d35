"""One-step supervised UNet regressor (train_unet.ipynb counterpart) e2e:
trains a tiny UNet as a direct splitter on synthetic Hagen TIFFs and checks
loss goes down, PSNR is computed, and the best checkpoint is written."""

import json
import os

import numpy as np


def _write_cfg(tmp_path):
    from tests.test_cli_e2e import write_tiff

    data = tmp_path / "data"
    data.mkdir()
    for split_name, seed in [("train", 0), ("val", 1)]:
        write_tiff(str(data / f"{split_name}_ch0.tif"), n=2, h=48, w=48, seed=seed)
        write_tiff(str(data / f"{split_name}_ch1.tif"), n=2, h=48, w=48, seed=seed + 5)

    cfg = {
        "name": "regressor_smoke",
        "phase": "train",
        "path": {"root": str(tmp_path / "exp")},
        "datasets": {
            "upper_clip": False, "patch_size": 16, "max_qval": 1.0,
            "channel_weights": [1, 1],
            "train": {"name": "Hagen",
                      "datapath": {"ch0": str(data / "train_ch0.tif"),
                                   "ch1": str(data / "train_ch1.tif")},
                      "batch_size": 4, "use_shuffle": True,
                      "uncorrelated_channels": False},
            "val": {"name": "Hagen",
                    "datapath": {"ch0": str(data / "val_ch0.tif"),
                                 "ch1": str(data / "val_ch1.tif")}},
        },
        "model": {
            "which_model_G": "indi", "loss_type": "l1", "lr_reduction": "mean",
            "finetune_norm": False,
            "unet": {"in_channel": 2, "out_channel": 2, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": 2, "conditional": False},
        },
        "train": {"n_iter": 4, "optimizer": {"type": "adam", "lr": 1e-3}},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return p


def test_unet_regressor_e2e(tmp_path):
    from scripts.train_unet_regressor import main

    cfg = _write_cfg(tmp_path)
    out = tmp_path / "out"
    work = tmp_path / "work"
    best, history = main([
        "--config", str(cfg), "--epochs", "3", "--steps_per_epoch", "4",
        "--eval_batches", "1", "--out", str(out), "--workdir", str(work),
    ])
    assert len(history) == 3
    losses = [h["l1"] for h in history]
    assert all(np.isfinite(losses))
    # a one-step regressor on 2 frames should make clear progress in 12 steps
    assert min(losses[1:]) < losses[0]
    # channel-wise val PSNR computed and finite
    assert set(history[-1]["val_psnr"].keys()) == {0, 1}
    assert all(np.isfinite(v) for v in history[-1]["val_psnr"].values())
    # best checkpoint + history artifact written
    assert os.path.isdir(os.path.join(str(work), "best_unet_regressor_gen"))
    blob = json.loads((out / "history.json").read_text())
    assert blob["t_mode"] == "one" and blob["batch"] == 4


def test_unet_regressor_batch_index_t_mode(tmp_path):
    """--t_mode batch_index replicates the notebook's literal (rotted)
    batch-position conditioning; it must still run and record t_mode."""
    from scripts.train_unet_regressor import main

    cfg = _write_cfg(tmp_path)
    out = tmp_path / "out_bi"
    best, history = main([
        "--config", str(cfg), "--epochs", "1", "--steps_per_epoch", "2",
        "--eval_batches", "1", "--t_mode", "batch_index",
        "--out", str(out), "--workdir", str(tmp_path / "work_bi"),
    ])
    blob = json.loads((out / "history.json").read_text())
    assert blob["t_mode"] == "batch_index"
    assert np.isfinite(history[0]["l1"])

"""CLI smoke for the SR path: LRHR dataset + infer.py + eval over PNG dirs."""

import json
import os
import sys

import numpy as np
import pytest

from tests.test_cli_e2e import run_cli


@pytest.fixture
def lrhr_root(tmp_path):
    """Synthetic PNG LR/HR/SR dirs at 8->16 resolution."""
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "celeba"
    for sub in ["lr_8", "hr_16", "sr_8_16"]:
        (root / sub).mkdir(parents=True)
    for i in range(3):
        hr = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        lr = hr[::2, ::2]
        Image.fromarray(hr).save(root / "hr_16" / f"{i:05d}.png")
        Image.fromarray(lr).save(root / "lr_8" / f"{i:05d}.png")
        Image.fromarray(np.repeat(np.repeat(lr, 2, 0), 2, 1)).save(
            root / "sr_8_16" / f"{i:05d}.png"
        )
    return root


def test_lrhr_dataset(lrhr_root):
    from diffsplitting_tpu.data.lrhr_dataset import LRHRDataset

    ds = LRHRDataset(str(lrhr_root), "img", l_resolution=8, r_resolution=16,
                     split="val", data_len=-1, need_LR=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["HR"].shape == (16, 16, 3)
    assert s["SR"].shape == (16, 16, 3)
    assert s["LR"].shape == (8, 8, 3)
    assert -1.001 <= s["HR"].min() and s["HR"].max() <= 1.001


def test_infer_cli(lrhr_root, tmp_path):
    cfg = {
        "name": "sr_smoke",
        "phase": "val",
        "gpu_ids": [0],
        "path": {"root": str(tmp_path / "exp"), "log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "datasets": {
            "train": {"name": "FFHQ", "mode": "HR", "dataroot": str(lrhr_root),
                      "datatype": "img", "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 2, "use_shuffle": True, "data_len": -1},
            "val": {"name": "CelebaHQ", "mode": "LRHR", "dataroot": str(lrhr_root),
                    "datatype": "img", "l_resolution": 8, "r_resolution": 16,
                    "data_len": 2},
        },
        "model": {
            "which_model_G": "sr3",
            "loss_type": "l1",
            "finetune_norm": False,
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [],
                     "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 4,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 4,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": 3, "conditional": True},
        },
        "train": {"n_iter": 2, "val_freq": 10, "save_checkpoint_freq": 10,
                  "print_freq": 1, "optimizer": {"type": "adam", "lr": 1e-4}},
        "wandb": {"project": "smoke"},
    }
    cfg_path = tmp_path / "sr_cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli("infer.py", ["-c", str(cfg_path), "-rootdir", str(tmp_path / "exp")], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]

    root = tmp_path / "exp"
    results = list(root.rglob("results/*.png"))
    names = {p.name.split("_", 2)[-1] for p in results}
    assert any("sr.png" in n for n in names)
    assert any("hr.png" in n for n in names)
    assert any("inf.png" in n for n in names)
    assert any("sr_process" in n for n in names)

    # sliding-window serving mode: final frames only, no trajectory grid
    sw_root = tmp_path / "exp_sw"
    res = run_cli("infer.py", ["-c", str(cfg_path), "-rootdir", str(sw_root),
                               "--sliding_window", "4,0.0"], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    sw_results = list(sw_root.rglob("results/*.png"))
    sw_names = {p.name.split("_", 2)[-1] for p in sw_results}
    assert any("sr.png" in n for n in sw_names)
    assert not any("sr_process" in n for n in sw_names)

    # respaced DDIM serving mode: S=2 of the 4-step chain, final frames only
    dd_root = tmp_path / "exp_ddim"
    res = run_cli("infer.py", ["-c", str(cfg_path), "-rootdir", str(dd_root),
                               "--ddim", "2"], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    dd_results = list(dd_root.rglob("results/*.png"))
    dd_names = {p.name.split("_", 2)[-1] for p in dd_results}
    assert any("sr.png" in n for n in dd_names)
    assert not any("sr_process" in n for n in dd_names)

"""sample.py CLI (unconditional generation) + evaluate_joint_indi script smoke."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_cli_e2e import run_cli, write_tiff
from tests.test_cli_sr import lrhr_root  # fixture


def test_sample_cli_train_and_generate(lrhr_root, tmp_path):
    cfg = {
        "name": "gen_smoke",
        "phase": "train",
        "gpu_ids": [0],
        "path": {"root": str(tmp_path / "exp"), "log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "datasets": {
            "train": {"name": "FFHQ", "mode": "HR", "dataroot": str(lrhr_root),
                      "datatype": "img", "l_resolution": 8, "r_resolution": 16,
                      "batch_size": 2, "use_shuffle": True, "data_len": -1},
            "val": {"name": "CelebaHQ", "mode": "HR", "dataroot": str(lrhr_root),
                    "datatype": "img", "l_resolution": 8, "r_resolution": 16,
                    "data_len": 1},
        },
        "model": {
            "which_model_G": "ddpm",
            "loss_type": "l1",
            "lr_reduction": "sum",
            "finetune_norm": False,
            "unet": {"in_channel": 3, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [],
                     "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 4,
                          "linear_start": 1e-4, "linear_end": 2e-2},
                "val": {"schedule": "linear", "n_timestep": 4,
                        "linear_start": 1e-4, "linear_end": 2e-2},
            },
            "diffusion": {"image_size": 16, "channels": 3, "conditional": False},
        },
        "train": {"n_iter": 2, "val_freq": 2, "save_checkpoint_freq": 2,
                  "print_freq": 1, "optimizer": {"type": "adam", "lr": 1e-4}},
        "wandb": {"project": "smoke"},
    }
    cfg_path = tmp_path / "gen_cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli("sample.py", ["-p", "train", "-c", str(cfg_path),
                                "-rootdir", str(tmp_path / "exp")], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    pngs = list((tmp_path / "exp").rglob("results/**/*.png"))
    assert pngs, "sampling validation must dump generated pngs"

    # val phase through the sliding-window serving mode: final frames only
    cfg["phase"] = "val"
    cfg_path.write_text(json.dumps(cfg))
    val_root = tmp_path / "exp_sw"
    res = run_cli("sample.py", ["-p", "val", "-c", str(cfg_path),
                                "-rootdir", str(val_root),
                                "--sliding_window", "4,0.0"], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    finals = list(val_root.rglob("results/**/*_sample.png"))
    assert finals, "windowed val sampling must dump final pngs"
    assert not list(val_root.rglob("results/**/*_sample_process.png"))


def test_evaluate_joint_indi_script(tmp_path):
    """The tiled joint-InDI eval script runs end-to-end on synthetic data."""
    data = tmp_path / "data"
    data.mkdir()
    write_tiff(str(data / "val_ch0.tif"), n=2, h=64, w=64, seed=1)
    write_tiff(str(data / "val_ch1.tif"), n=2, h=64, w=64, seed=2)

    cfg = {
        "name": "jeval", "phase": "val", "gpu_ids": [0],
        "path": {"root": str(tmp_path / "exp"), "log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "datasets": {
            "upper_clip": False, "patch_size": 32, "max_qval": 1.0,
            "train": {"name": "Hagen",
                      "datapath": {"ch0": str(data / "val_ch0.tif"),
                                   "ch1": str(data / "val_ch1.tif")},
                      "batch_size": 2, "use_shuffle": False,
                      "uncorrelated_channels": False},
            "val": {"name": "Hagen",
                    "datapath": {"ch0": str(data / "val_ch0.tif"),
                                 "ch1": str(data / "val_ch1.tif")}},
        },
        "model": {
            "which_model_G": "joint_indi", "loss_type": "l1", "lr_reduction": "mean",
            "finetune_norm": False, "w_input_loss": 0.0, "allow_full_translation": False,
            "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [],
                     "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 1, "conditional": False},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
        "wandb": {"project": "smoke"},
    }
    cfg_path = tmp_path / "jeval.json"
    cfg_path.write_text(json.dumps(cfg))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = tmp_path / "metrics.json"
    res = run_cli(
        "scripts/evaluate_joint_indi.py",
        ["-c", str(cfg_path), "--num_steps", "1", "--batch_size", "4",
         "--out", str(out_json)],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(out_json.read_text())
    assert "1" in metrics or 1 in metrics
    vals = list(metrics.values())[0]
    assert np.isfinite(vals["psnr_ch0"]) and np.isfinite(vals["psnr_ch1"])


def test_predict_cli(tmp_path):
    """predict.py: checkpoint-free smoke via a fresh-trained tiny checkpoint."""
    from diffsplitting_tpu.config import dict_to_nonedict
    from diffsplitting_tpu.train import DiffusionModel

    # train a tiny indi model for 1 step and save a checkpoint
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    opt = dict_to_nonedict({
        "name": "p", "phase": "train",
        "path": {"checkpoint": str(ckpt_dir), "resume_state": None},
        "model": {
            "which_model_G": "indi", "loss_type": "l1", "lr_reduction": "mean",
            "finetune_norm": False,
            "unet": {"in_channel": 2, "out_channel": 2, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [],
                     "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 2, "conditional": False}},
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    })
    m = DiffusionModel(opt)
    rng = np.random.default_rng(0)
    m.feed_data({"input": rng.normal(size=(2, 32, 32, 1)).astype(np.float32),
                 "target": rng.normal(size=(2, 32, 32, 2)).astype(np.float32)})
    m.optimize_parameters()
    m.save_network(epoch=1, iter_step=1)

    # config file + mixed input TIFF for the CLI
    cfg = {
        "name": "p", "phase": "val", "gpu_ids": [0],
        "path": {"root": str(tmp_path), "log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": None},
        "datasets": {"patch_size": 32, "max_qval": 1.0, "channel_weights": [1, 1],
                     "train": {"name": "Hagen", "uncorrelated_channels": False,
                               "batch_size": 2, "use_shuffle": False,
                               "datapath": {"ch0": "x", "ch1": "y"}},
                     "val": {"name": "Hagen",
                             "datapath": {"ch0": "x", "ch1": "y"}}},
        "model": dict(opt["model"]),
        "train": dict(opt["train"]),
        "wandb": {"project": "p"},
    }
    cfg_path = tmp_path / "pred_cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from tests.test_cli_e2e import write_tiff

    write_tiff(str(tmp_path / "mixed.tif"), n=1, h=64, w=64, seed=3)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli(
        "predict.py",
        ["-c", str(cfg_path), "--resume", str(ckpt_dir / "I1_E1"),
         "--input", str(tmp_path / "mixed.tif"), "--out", str(tmp_path / "pred"),
         "--num_steps", "2", "--batch_size", "4", "--png_preview"],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    from diffsplitting_tpu.data.io import load_tiff_stack

    ch0 = load_tiff_stack(str(tmp_path / "pred" / "pred_ch0.tif"))
    assert ch0.shape == (1, 64, 64)
    assert (tmp_path / "pred" / "preview_ch0.png").exists()

    # composed accelerators through the same CLI: W8A8 × DeepCache (the
    # int8 cache-split walker, models/quant_unet.py cached_unet_apply)
    res = run_cli(
        "predict.py",
        ["-c", str(cfg_path), "--resume", str(ckpt_dir / "I1_E1"),
         "--input", str(tmp_path / "mixed.tif"),
         "--out", str(tmp_path / "pred_q"),
         "--num_steps", "2", "--batch_size", "4",
         "--w8a8", "--deepcache", "1,1"],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    q0 = load_tiff_stack(str(tmp_path / "pred_q" / "pred_ch0.tif"))
    assert q0.shape == (1, 64, 64) and np.isfinite(q0).all()

    # widened int8 coverage (--w8a8_sites all → set_quant updown+shortcut);
    # --w8a8 itself is intentionally omitted — the sites flag must imply it
    # (round-3 advisor: sites-without-w8a8 silently served the bf16 chain)
    res = run_cli(
        "predict.py",
        ["-c", str(cfg_path), "--resume", str(ckpt_dir / "I1_E1"),
         "--input", str(tmp_path / "mixed.tif"),
         "--out", str(tmp_path / "pred_qa"),
         "--num_steps", "2", "--batch_size", "4",
         "--w8a8_sites", "all"],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    qa0 = load_tiff_stack(str(tmp_path / "pred_qa" / "pred_ch0.tif"))
    assert qa0.shape == (1, 64, 64) and np.isfinite(qa0).all()

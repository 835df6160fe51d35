"""End-to-end CLI smoke: train split.py for a few debug steps on synthetic
Hagen-style TIFFs, validate, checkpoint — the whole reference workflow
(SURVEY.md §3.1) through our CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def write_tiff(path, n=3, h=64, w=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    frames = (rng.uniform(0, 800, (n, h, w))).astype(np.uint16)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:])
    return frames


@pytest.fixture
def hagen_cfg(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    for split_name, seed in [("train", 0), ("val", 1)]:
        write_tiff(str(data / f"{split_name}_ch0.tif"), seed=seed)
        write_tiff(str(data / f"{split_name}_ch1.tif"), seed=seed + 10)

    cfg = {
        "name": "smoke",
        "phase": "train",
        "gpu_ids": [0],
        "path": {
            "root": str(tmp_path / "exp"),
            "log": "logs",
            "results": "results",
            "checkpoint": "checkpoint",
            "resume_state": None,
        },
        "datasets": {
            "upper_clip": False,
            "patch_size": 32,
            "max_qval": 1.0,
            "channel_weights": [1, 1],
            "train": {
                "name": "Hagen",
                "datapath": {"ch0": str(data / "train_ch0.tif"), "ch1": str(data / "train_ch1.tif")},
                "datatype": "img",
                "batch_size": 4,
                "num_workers": 0,
                "use_shuffle": True,
                "uncorrelated_channels": False,
            },
            "val": {
                "name": "Hagen",
                "datapath": {"ch0": str(data / "val_ch0.tif"), "ch1": str(data / "val_ch1.tif")},
                "patch_size": 32,
                "datatype": "img",
            },
        },
        "model": {
            "which_model_G": "indi",
            "loss_type": "l1",
            "lr_reduction": "mean",
            "finetune_norm": False,
            "unet": {
                "in_channel": 2, "out_channel": 2, "inner_channel": 8,
                "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [],
                "res_blocks": 1, "dropout": 0,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 32, "channels": 2, "conditional": False},
        },
        "train": {
            "n_iter": 4, "val_freq": 4, "save_checkpoint_freq": 4, "print_freq": 2,
            "optimizer": {"type": "adam", "lr": 1e-3},
        },
        "wandb": {"project": "smoke"},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return p, tmp_path


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = cwd
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    return subprocess.run(
        [sys.executable, script, *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )


def test_split_train_cli(hagen_cfg):
    cfg_path, tmp = hagen_cfg
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli(
        "split.py",
        ["-p", "train", "-c", str(cfg_path), "-rootdir", str(tmp / "exp")],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    # experiment dir structure: <root>/<YYMM>/Hagen-indi-l1/0/
    root = tmp / "exp"
    month = next(root.iterdir())
    model_dir = month / "Hagen-indi-l1" / "0"
    assert model_dir.is_dir()
    # training log exists and mentions the final iter
    log = (model_dir / "logs" / "train.log").read_text()
    assert "l_pix" in log
    assert "Validation # PSNR" in log
    # checkpoint written at iter 4
    assert (model_dir / "checkpoint" / "I4_E1_gen").is_dir() or (
        model_dir / "checkpoint" / "I4_E2_gen"
    ).is_dir()
    # validation pngs dumped
    results = list((model_dir / "results").rglob("*.png"))
    assert results, "validation must dump pngs"

    # ---- val phase: resume the checkpoint and run the eval branch
    ckpts = list((model_dir / "checkpoint").glob("I4_E*_gen"))
    assert ckpts
    prefix = str(ckpts[0])[: -len("_gen")]
    cfg = json.loads(cfg_path.read_text())
    cfg["path"]["resume_state"] = prefix
    val_cfg = cfg_path.parent / "cfg_val.json"
    val_cfg.write_text(json.dumps(cfg))
    res = run_cli(
        "split.py",
        ["-p", "val", "-c", str(val_cfg), "-rootdir", str(tmp / "exp")],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    val_dirs = [d for d in (tmp / "exp").rglob("Hagen-indi-l1/*") if d.name == "1"]
    assert val_dirs
    val_log = (val_dirs[0] / "logs" / "train.log").read_text()
    assert "PSNR" in val_log and "SSIM" in val_log


def test_eval_cli(tmp_path):
    """eval.py pairs *_hr/*_sr pngs and prints averages."""
    import cv2

    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"{i}_hr.png"), img)
        noisy = np.clip(img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255)
        cv2.imwrite(str(tmp_path / f"{i}_sr.png"), noisy.astype(np.uint8))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli("eval.py", ["-p", str(tmp_path)], cwd=repo)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PSNR" in res.stdout and "SSIM" in res.stdout

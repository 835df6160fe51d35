"""--check_data fail-fast layout validation (VERDICT r4 ask #8): against a
synthetic Hagen-layout stack it must pass and print the parity-run commands;
against broken layouts it must exit nonzero naming the problem. Matches the
contract of /root/reference/notebooks/EvaluateJointIndi.ipynb cell 34 (the
real-data parity rows this validator keeps one command away)."""

import json
import os

import pytest

from tests.test_cli_e2e import run_cli, write_tiff

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(tmp_path, train_ch1=None, name="Hagen", patch=32):
    data = tmp_path / "data"
    data.mkdir(exist_ok=True)
    paths = {}
    for sp, seed in [("train", 0), ("val", 1)]:
        for ch, off in [("ch0", 0), ("ch1", 7)]:
            p = str(data / f"{sp}_{ch}.tif")
            write_tiff(p, seed=seed + off)
            paths[(sp, ch)] = p
    if train_ch1 is not None:
        paths[("train", "ch1")] = train_ch1
    cfg = {
        "name": "checksmoke", "phase": "train",
        "path": {"root": str(tmp_path / "exp"), "log": "logs",
                 "results": "results", "checkpoint": "checkpoint",
                 "resume_state": None},
        "datasets": {
            "patch_size": patch, "max_qval": 1.0, "channel_weights": [1, 1],
            "train": {"name": name,
                      "datapath": {"ch0": paths[("train", "ch0")],
                                   "ch1": paths[("train", "ch1")]},
                      "batch_size": 4, "uncorrelated_channels": False},
            "val": {"name": name,
                    "datapath": {"ch0": paths[("val", "ch0")],
                                 "ch1": paths[("val", "ch1")]}},
        },
        "model": {
            "which_model_G": "joint_indi",
            "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {"train": {"schedule": "linear", "n_timestep": 10,
                                        "linear_start": 1e-6,
                                        "linear_end": 1e-2},
                              "val": {"schedule": "linear", "n_timestep": 2,
                                      "linear_start": 1e-6,
                                      "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 1,
                          "conditional": False},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_check_data_ok(tmp_path):
    cfg = _cfg(tmp_path)
    res = run_cli("split.py", ["-c", cfg, "--check_data"], cwd=REPO)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "dataset layout check: OK" in res.stdout
    assert "parity-run commands" in res.stdout
    assert "evaluate_joint_indi.py" in res.stdout  # joint config → cell-34 row
    assert "3 frames" in res.stdout  # per-channel stack summary


def test_check_data_missing_file(tmp_path):
    cfg = _cfg(tmp_path, train_ch1=str(tmp_path / "nope.tif"))
    res = run_cli("split.py", ["-c", cfg, "--check_data"], cwd=REPO)
    assert res.returncode == 1
    assert "FAILED" in res.stdout and "nope.tif" in res.stdout


def test_check_data_shape_mismatch(tmp_path):
    bad = str(tmp_path / "small.tif")
    write_tiff(bad, n=3, h=16, w=16, seed=5)
    cfg = _cfg(tmp_path, train_ch1=bad)
    res = run_cli("split.py", ["-c", cfg, "--check_data"], cwd=REPO)
    assert res.returncode == 1
    assert "disagree" in res.stdout or "smaller than" in res.stdout


def test_check_data_eval_script(tmp_path):
    cfg = _cfg(tmp_path)
    res = run_cli("scripts/evaluate_joint_indi.py",
                  ["-c", cfg, "--check_data"], cwd=REPO)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "dataset layout check: OK" in res.stdout


def test_check_data_non_hagen_noop(tmp_path):
    cfg = _cfg(tmp_path, name="cifar10")
    res = run_cli("split.py", ["-c", cfg, "--check_data"], cwd=REPO)
    assert res.returncode == 0
    assert "nothing to check" in res.stdout

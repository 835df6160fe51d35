"""Config loader tests: //-comment JSON, NoneDict, debug shrink, workdir layout."""

import json
import os

from diffsplitting_tpu.config import (
    NoneDict,
    dict_to_nonedict,
    load_json,
    parse_config,
)

MINI_CFG = """{
    "name": "unittest", // experiment name
    "phase": "train",
    "gpu_ids": [0],
    "path": {
        "root": "ROOT",
        "log": "logs", // comment
        "results": "results",
        "checkpoint": "checkpoint",
        "resume_state": null
    },
    "datasets": {
        "patch_size": 32,
        "max_qval": 1.0,
        "train": {"name": "cifar10", "batch_size": 16, "use_shuffle": true,
                  "uncorrelated_channels": true, "datapath": "x"},
        "val": {"name": "cifar10", "datapath": "y"}
    },
    "model": {
        "which_model_G": "indi",
        "loss_type": "l1",
        "beta_schedule": {
            "train": {"schedule": "linear", "n_timestep": 100, "linear_start": 1e-6, "linear_end": 1e-2},
            "val": {"schedule": "linear", "n_timestep": 5, "linear_start": 1e-6, "linear_end": 1e-2}
        }
    },
    "train": {"n_iter": 100, "val_freq": 50, "print_freq": 10, "save_checkpoint_freq": 50,
              "optimizer": {"type": "adam", "lr": 1e-3}}
}
"""


def write_cfg(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(MINI_CFG)
    return str(p)


def test_load_json_strips_comments(tmp_path):
    opt = load_json(write_cfg(tmp_path))
    assert opt["name"] == "unittest"
    assert opt["path"]["log"] == "logs"


def test_nonedict_missing_keys():
    d = dict_to_nonedict({"a": {"b": 1}, "l": [{"c": 2}]})
    assert d["missing"] is None
    assert d["a"]["nope"] is None
    assert d["l"][0]["c"] == 2
    assert isinstance(d["a"], NoneDict)


def test_parse_config_dirs_and_val_cap(tmp_path):
    cfg = write_cfg(tmp_path)
    opt = parse_config(cfg, phase="train", rootdir=str(tmp_path / "exp"))
    # versioned workdir <root>/<YYMM>/<data>-<model>-<loss>/0
    assert opt["path"]["experiment_root"].endswith("/0")
    assert "cifar10-indi-l1" in opt["path"]["experiment_root"]
    assert os.path.isdir(opt["path"]["log"])
    assert os.path.isdir(opt["path"]["checkpoint"])
    # val data_len capped to 3 during training (reference logger.py:83-84)
    assert opt["datasets"]["val"]["data_len"] == 3
    # missing keys read None
    assert opt["model"]["lr_reduction"] is None

    # second parse gets version 1
    opt2 = parse_config(cfg, phase="train", rootdir=str(tmp_path / "exp"))
    assert opt2["path"]["experiment_root"].endswith("/1")


def test_debug_overrides(tmp_path):
    cfg = write_cfg(tmp_path)
    opt = parse_config(cfg, phase="train", rootdir=str(tmp_path / "exp"), debug=True)
    assert opt["name"].startswith("debug_")
    assert opt["train"]["val_freq"] == 2
    assert opt["train"]["print_freq"] == 2
    assert opt["train"]["save_checkpoint_freq"] == 3
    assert opt["datasets"]["train"]["batch_size"] == 2
    assert opt["model"]["beta_schedule"]["train"]["n_timestep"] == 10
    assert opt["datasets"]["train"]["data_len"] == 6
    assert opt["datasets"]["val"]["data_len"] == 3


def test_reference_configs_load():
    """The shipped configs (mirroring the reference's schema) must parse."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(here, "configs")
    names = os.listdir(cfg_dir)
    assert names, "configs/ must ship config JSONs"
    for n in names:
        if n.endswith(".json"):
            opt = load_json(os.path.join(cfg_dir, n))
            assert "model" in opt and "datasets" in opt

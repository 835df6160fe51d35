"""Config subsystem: JSON-with-`//`-comments, debug-mode shrink, NoneDict defaults.

Behavior-parity notes (reference: /root/reference/core/logger.py):
  * `load_json` strips everything after `//` on each line before parsing
    (logger.py:20-27), so the reference's config/*.json files load unchanged.
  * `parse` layers CLI args over the file config, creates a versioned workdir,
    and applies "debug" shrink rules when the experiment name contains 'debug'
    (logger.py:72-80): val/print freq -> 2, ckpt freq -> 3, batch -> 2,
    train/val n_timestep -> 10, train data_len -> 6, val data_len -> 3.
  * During training the val dataset length is capped at 3 (logger.py:83-84).
  * `NoneDict` returns None for missing keys (logger.py:107-122) so downstream
    code can probe optional keys without try/except.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Any, Dict, Optional

from diffsplitting_tpu.utils.experiment import get_workdir


class NoneDict(dict):
    """dict whose missing keys read as None."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert dicts to NoneDict (missing key -> None)."""
    if isinstance(opt, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, list):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def dict2str(opt: Dict, indent_l: int = 1) -> str:
    """Pretty-print nested config dict for logging."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg


def _strip_line_comments(text: str) -> str:
    return "\n".join(line.split("//")[0] for line in text.splitlines())


def load_json(opt_path: str) -> OrderedDict:
    """Load a JSON config, tolerating `//` line comments."""
    with open(opt_path, "r") as f:
        json_str = _strip_line_comments(f.read())
    return json.loads(json_str, object_pairs_hook=OrderedDict)


def apply_debug_overrides(opt: Dict) -> Dict:
    """Shrink frequencies/timesteps/data lengths for smoke-test runs."""
    opt["train"]["val_freq"] = 2
    opt["train"]["print_freq"] = 2
    opt["train"]["save_checkpoint_freq"] = 3
    opt["datasets"]["train"]["batch_size"] = 2
    opt["model"]["beta_schedule"]["train"]["n_timestep"] = 10
    opt["model"]["beta_schedule"]["val"]["n_timestep"] = 10
    opt["datasets"]["train"]["data_len"] = 6
    opt["datasets"]["val"]["data_len"] = 3
    return opt


def parse_config(
    config_path: str,
    phase: str = "train",
    rootdir: Optional[str] = None,
    debug: bool = False,
    enable_wandb: bool = False,
    make_dirs: bool = True,
) -> NoneDict:
    """Programmatic equivalent of the CLI `parse` (reference logger.py:29-104).

    Returns a NoneDict config with `path` entries resolved under a fresh
    versioned experiment directory `<rootdir>/<YYMM>/<data>-<model>-<loss>/<N>/`.
    """
    opt = load_json(config_path)
    if debug:
        opt["name"] = "debug_{}".format(opt["name"])

    if rootdir is None:
        rootdir = opt["path"].get("root", os.path.join(os.getcwd(), "experiments"))

    if make_dirs:
        experiment_root, expname = get_workdir(opt, rootdir, use_max_version=False)
    else:
        experiment_root, expname = rootdir, opt["name"]

    opt["path"]["experiment_root"] = experiment_root
    opt["experiment_name"] = expname

    for key, path in list(opt["path"].items()):
        if "resume" not in key and "experiments" not in key and key != "experiment_root" and key != "root":
            opt["path"][key] = os.path.join(experiment_root, path)
            if make_dirs:
                os.makedirs(opt["path"][key], exist_ok=True)

    opt["phase"] = phase

    if "debug" in opt["name"]:
        apply_debug_overrides(opt)

    if phase == "train" and "val" in opt.get("datasets", {}):
        opt["datasets"]["val"]["data_len"] = 3

    opt["enable_wandb"] = enable_wandb
    return dict_to_nonedict(opt)


def parse(args) -> NoneDict:
    """CLI-facing parse: mirrors the reference argparse contract."""
    opt = parse_config(
        config_path=args.config,
        phase=args.phase,
        rootdir=getattr(args, "rootdir", None),
        debug=getattr(args, "debug", False),
        enable_wandb=getattr(args, "enable_wandb", False),
    )
    for key in ("log_wandb_ckpt", "log_eval", "log_infer"):
        if hasattr(args, key):
            opt[key] = getattr(args, key)
    return opt

"""Versioned experiment-directory management.

Parity: /root/reference/core/experiment_directory_setup.py — workdirs are laid
out `<root>/<YYMM>/<dataset>-<model>-<loss>/<version>/` with auto-incrementing
integer versions and mkdir-race retry.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from pathlib import Path


def get_new_model_version(model_dir: str) -> str:
    """Next integer version under model_dir (subdirs must be integers)."""
    versions = []
    for version_dir in os.listdir(model_dir):
        try:
            versions.append(int(version_dir))
        except ValueError:
            raise ValueError(
                f"Invalid subdirectory:{model_dir}/{version_dir}. "
                "Only integer versions are allowed"
            )
    if not versions:
        return "0"
    return str(max(versions) + 1)


def get_model_name(config) -> str:
    mtype = config["model"]["which_model_G"]
    dtype = config["datasets"]["train"]["name"]
    # sr_* configs omit loss_type (the reference crashes here on them —
    # get_workdir was added by the fork and never exercised on the SR path)
    ltype = config["model"].get("loss_type") or "l1"
    return f"{dtype}-{mtype}-{ltype}"


def get_month() -> str:
    return datetime.now().strftime("%y%m")


def get_workdir(config, root_dir: str, use_max_version: bool, nested_call: int = 0):
    """Create `<root>/<YYMM>/<data>-<model>-<loss>/<N>/`; retry on mkdir races."""
    rel_path = get_month()
    Path(os.path.join(root_dir, rel_path)).mkdir(parents=True, exist_ok=True)

    rel_path = os.path.join(rel_path, get_model_name(config))
    cur_workdir = os.path.join(root_dir, rel_path)
    Path(cur_workdir).mkdir(exist_ok=True)

    if use_max_version:
        version = int(get_new_model_version(cur_workdir))
        if version > 0:
            version -= 1
        rel_path = os.path.join(rel_path, str(version))
    else:
        rel_path = os.path.join(rel_path, get_new_model_version(cur_workdir))

    cur_workdir = os.path.join(root_dir, rel_path)
    try:
        Path(cur_workdir).mkdir(exist_ok=False)
    except FileExistsError:
        if nested_call > 10:
            raise ValueError(f"Cannot create a new directory. {cur_workdir} already exists.")
        time.sleep(0.5)
        return get_workdir(config, root_dir, use_max_version, nested_call + 1)

    return cur_workdir, rel_path

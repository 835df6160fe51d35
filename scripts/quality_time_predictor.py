"""Quality evidence (c): TimePredictor training + evaluation end-to-end on
synthetic Hagen-like frames through the production CLIs.

Drives `time_prediction_training.py` (the reference entry point, SURVEY §3.5)
on the same synthetic two-channel stacks as the joint-InDI quality run, then
`scripts/evaluate_time_predictor.py` on the best-val checkpoint: mixing-
fraction regression MAE over t ∈ {1..T}/T. The reference publishes no
numeric target for this model; the evidence is convergence + the full
workflow on-chip.

Usage: python scripts/quality_time_predictor.py [--epochs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--workdir", default="/tmp/quality_tp")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from scripts.quality_joint_indi_synthetic import make_stacks

    data = f"{args.workdir}/data"
    if not os.path.isdir(f"{data}/train"):
        print("synthesizing frames ...", flush=True)
        make_stacks(data, frames=12, size=512)

    from diffsplitting_tpu.config.loader import load_json

    opt = load_json(os.path.join(REPO,
                                 "configs/splitting_hagen_time_predictor.json"))
    for split in ("train", "val"):
        opt["datasets"][split]["datapath"] = {
            "ch0": f"{data}/{split}/{split}_actin.tif",
            "ch1": f"{data}/{split}/{split}_mito.tif",
        }
    opt["train"]["num_epochs"] = args.epochs
    # the reference's Hagen config uses patch 512 on 2048d frames; our
    # synthetic frames are 512d, so patch 256 keeps a 4-patch grid per frame
    # (and the 2-frame val split yields a full batch instead of zero batches)
    opt["datasets"]["patch_size"] = 256
    cfg = f"{args.workdir}/cfg_tp.json"
    with open(cfg, "w") as f:
        json.dump(opt, f, indent=1)

    print("training via time_prediction_training.py ...", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "time_prediction_training.py"),
         "--config", cfg, "--rootdir", f"{args.workdir}/experiments"],
        cwd=REPO, capture_output=True, text=True,
    )
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(r.returncode)

    ckpts = []
    for root, dirs, _ in os.walk(f"{args.workdir}/experiments"):
        for d in dirs:
            # orbax writes `<prefix>_gen`/`<prefix>_opt`; the eval script
            # takes the bare prefix
            if d == "best_time_predictor_gen":
                ckpts.append(os.path.join(root, "best_time_predictor"))
    assert ckpts, "no best checkpoint"
    ckpt = max(ckpts, key=lambda p: os.path.getmtime(f"{p}_gen"))
    print("evaluating", ckpt, flush=True)
    out_json = f"{args.workdir}/metrics.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/evaluate_time_predictor.py"),
         "-c", cfg, "--resume", ckpt, "--out", out_json],
        cwd=REPO, capture_output=True, text=True,
    )
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(r.returncode)
    print("metrics written to", out_json)


if __name__ == "__main__":
    main()

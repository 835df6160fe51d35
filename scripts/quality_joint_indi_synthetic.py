"""Quality-parity evidence (a): joint-InDI convergence on structured
synthetic Hagen-like data, end-to-end through the production CLI.

Real Hagen TIFFs are absent from this image, so this synthesizes
morphologically distinct two-channel microscopy frames (filamentous
"actin-like" + blobby "mito-like"), trains joint-InDI through `split.py`
(the reference's training entry point, config shapes from
configs/splitting_hagen_indi_joint.json), and evaluates stitched full-frame
RangeInvariantPSNR via scripts/evaluate_joint_indi.py — the same workflow the
reference's EvaluateJointIndi.ipynb runs on real Hagen (BASELINE.md rows:
33.8 / 36.0 dB at N=1). Numbers here position the FRAMEWORK's convergence,
not biological parity (stated caveat in BENCH_NOTES).

Usage: python scripts/quality_joint_indi_synthetic.py [--iters 4000]
       [--patch 256] [--frames 16] [--size 1024] [--workdir /tmp/quality_ji]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np
from scipy.ndimage import gaussian_filter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffsplitting_tpu.data.io import save_tiff_stack  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_actin(rng, size):
    """Filamentous structure: smooth random-walk curves."""
    img = np.zeros((size, size), np.float32)
    for _ in range(max(8, size // 32)):
        n = rng.integers(200, 600)
        pos = rng.uniform(0, size, 2)
        vel = rng.normal(0, 1, 2)
        for _ in range(n):
            vel = 0.95 * vel + rng.normal(0, 0.45, 2)
            vel /= max(np.linalg.norm(vel), 1e-6)
            pos = pos + vel * 1.5
            y, x = int(pos[0]) % size, int(pos[1]) % size
            img[y, x] += 1.0
    img = gaussian_filter(img, 1.6)
    return img / max(img.max(), 1e-6)


def synth_mito(rng, size):
    """Blobby structure: anisotropic gaussian spots."""
    img = np.zeros((size, size), np.float32)
    for _ in range(max(30, size // 8)):
        y, x = rng.uniform(0, size, 2)
        amp = rng.uniform(0.4, 1.0)
        yy = int(y) % size
        xx = int(x) % size
        img[yy, xx] += amp * 50
    img = gaussian_filter(img, rng.uniform(2.5, 4.0))
    img += 0.25 * gaussian_filter(img, 8.0)
    return img / max(img.max(), 1e-6)


def make_stacks(workdir, frames, size, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(f"{workdir}/train", exist_ok=True)
    os.makedirs(f"{workdir}/val", exist_ok=True)
    for split, n in [("train", frames), ("val", max(2, frames // 8))]:
        actin = np.stack([synth_actin(rng, size) for _ in range(n)])
        mito = np.stack([synth_mito(rng, size) for _ in range(n)])
        # uint16 microscopy-like counts with offset noise (Hagen-style)
        a16 = (100 + actin * 1500 + rng.normal(0, 6, actin.shape)).clip(0, 65535)
        m16 = (100 + mito * 1800 + rng.normal(0, 6, mito.shape)).clip(0, 65535)
        save_tiff_stack(f"{workdir}/{split}/{split}_actin.tif",
                        a16.astype(np.uint16))
        save_tiff_stack(f"{workdir}/{split}/{split}_mito.tif",
                        m16.astype(np.uint16))


def write_config(workdir, iters, patch):
    from diffsplitting_tpu.config.loader import load_json

    opt = load_json(os.path.join(REPO, "configs/splitting_hagen_indi_joint.json"))
    ds = opt["datasets"]
    ds["patch_size"] = patch
    for split in ("train", "val"):
        ds[split]["datapath"] = {
            "ch0": f"{workdir}/{split}/{split}_actin.tif",
            "ch1": f"{workdir}/{split}/{split}_mito.tif",
        }
        ds[split]["patch_size"] = patch
    ds["train"]["batch_size"] = 8
    opt["path"]["root"] = f"{workdir}/experiments/"
    opt["train"]["n_iter"] = iters
    opt["train"]["val_freq"] = max(iters // 4, 1)
    opt["train"]["save_checkpoint_freq"] = iters
    opt["train"]["print_freq"] = 100
    opt["enable_wandb"] = False
    cfg_path = f"{workdir}/cfg_joint_indi.json"
    with open(cfg_path, "w") as f:
        json.dump(opt, f, indent=1)
    return cfg_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--workdir", default="/tmp/quality_ji")
    ap.add_argument("--num_steps", type=int, nargs="+", default=[1, 5, 10])
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    print("synthesizing frames ...", flush=True)
    make_stacks(args.workdir, args.frames, args.size)
    cfg = write_config(args.workdir, args.iters, args.patch)

    print("training via split.py ...", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "split.py"), "-c", cfg],
        cwd=REPO, capture_output=True, text=True,
    )
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        sys.exit(r.returncode)

    # newest checkpoint prefix
    ckpts = []
    for root, dirs, files in os.walk(f"{args.workdir}/experiments"):
        for f in list(dirs) + list(files):  # orbax ckpts are directories
            if f.endswith("_gen"):
                ckpts.append(os.path.join(root, f[: -len("_gen")]))
    assert ckpts, "no checkpoint saved"
    ckpt = max(ckpts, key=lambda p: os.path.getmtime(f"{p}_gen"))
    print("evaluating", ckpt, flush=True)

    out_json = f"{args.workdir}/metrics.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/evaluate_joint_indi.py"),
         "-c", cfg, "--resume", ckpt,
         "--num_steps", *[str(n) for n in args.num_steps],
         "--out", out_json],
        cwd=REPO, capture_output=True, text=True,
    )
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        sys.exit(r.returncode)
    print("metrics written to", out_json)


if __name__ == "__main__":
    main()

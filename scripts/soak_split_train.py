"""Sustained-training soak: a 40k-iteration run through split.py ITSELF on
synthetic Hagen-scale data, with host-RSS monitoring.

The reference's main entry point is split.py's train loop
(/root/reference/split.py:141-270). Unlike scripts/quality_sr3_overfit.py
(which keeps the whole set device-resident), split.py feeds a FRESH random
patch batch every iteration — exactly the host->device transfer pattern the
axon tunnel leaks host RAM on (CLAUDE.md; a 40k-iter 2.8MB/iter loop once
OOM-killed the 125GB host). This soak runs the production loop at Hagen
scale (two 50x512x512 uint16 channel stacks, patch 128, batch 8, EMA,
val PSNR every 2k, checkpoints every 5k) and records the RSS curve so the
leak rate is a measured number, not folklore.

Usage (TPU, detached):
  python scripts/soak_split_train.py --iters 40000 --out results/soak_split
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_hagen(path, frames, size, kind, seed):
    """Two distinguishable structures: blobs (actin-ish) vs waves (mito-ish),
    so the splitting task is learnable, at uint16 microscopy intensities."""
    from diffsplitting_tpu.data.io import save_tiff_stack

    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    out = np.empty((frames, size, size), np.uint16)
    for f in range(frames):
        if kind == "blobs":
            img = np.zeros((size, size), np.float32)
            for _ in range(60):
                cy, cx = rng.uniform(0, size, 2)
                s = rng.uniform(4, 20)
                img += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))).astype(np.float32)
            img /= max(img.max(), 1e-6)
        else:
            k1, k2, ph = rng.uniform(0.01, 0.06, 2), rng.uniform(0.01, 0.06, 2), rng.uniform(0, 6.28)
            img = (np.sin(k1[0] * xx + k1[1] * yy + ph)
                   * np.cos(k2[0] * xx - k2[1] * yy)).astype(np.float32) ** 2
        out[f] = (img * 1200 + rng.normal(0, 6, img.shape)).clip(0, 65535).astype(np.uint16)
    save_tiff_stack(path, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40000)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--val_freq", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/soak_split")
    ap.add_argument("--out", default=os.path.join(REPO, "results/soak_split"))
    ap.add_argument("--device_pool", action="store_true",
                    help="datasets.train.device_pool: draw batches on device "
                         "from one resident stack upload (the leak-free "
                         "TPU-native data path) instead of per-iter feeds")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, "data")
    os.makedirs(data, exist_ok=True)
    for split_name, seed in [("train", 0), ("val", 100)]:
        frames = 50 if split_name == "train" else 6
        for ch, kind in [("ch0", "blobs"), ("ch1", "waves")]:
            p = os.path.join(data, f"{split_name}_{ch}.tif")
            if not os.path.exists(p):
                synth_hagen(p, frames, 512, kind, seed + (0 if ch == "ch0" else 7))
    print("synthetic Hagen stacks ready", flush=True)

    from diffsplitting_tpu.config.loader import load_json

    opt = load_json(os.path.join(REPO, "configs/splitting_hagen_indi.json"))
    opt["name"] = "soak"
    opt["path"]["root"] = os.path.join(args.workdir, "exp")
    opt["datasets"]["patch_size"] = args.patch
    opt["datasets"]["channel_weights"] = [1, 1]
    for sp in ("train", "val"):
        opt["datasets"][sp]["datapath"] = {
            "ch0": os.path.join(data, f"{sp}_ch0.tif"),
            "ch1": os.path.join(data, f"{sp}_ch1.tif"),
        }
    opt["datasets"]["train"]["batch_size"] = args.batch
    opt["datasets"]["train"]["num_workers"] = 0
    opt["train"]["n_iter"] = args.iters
    opt["train"]["val_freq"] = args.val_freq
    opt["train"]["save_checkpoint_freq"] = 5000
    opt["train"]["print_freq"] = 200
    if args.device_pool:
        opt["datasets"]["train"]["device_pool"] = True
    cfg_path = os.path.join(args.workdir, "soak_cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(opt, f, indent=1)

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser("~/.cache/dsp_jax_cache")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "split.py", "-c", cfg_path], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    rss_curve = []  # (wall_s, rss_mb)
    losses = []     # (iter, l_pix)
    val_psnr = []   # (iter, psnr values)
    import threading

    def poll_rss():
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            rss_curve.append((round(time.perf_counter() - t0, 1),
                                              int(line.split()[1]) // 1024))
            except OSError:
                pass
            time.sleep(10)

    th = threading.Thread(target=poll_rss, daemon=True)
    th.start()
    it_re = re.compile(r"iter:\s*([\d,]+).*?l_pix:\s*([\deE.+-]+)")
    psnr_re = re.compile(r"psnr", re.IGNORECASE)
    tail = []
    os.makedirs(args.out, exist_ok=True)

    def flush_curves():
        # Incremental flush so a host recycle / window-end SIGTERM still
        # leaves the measured curves on disk (this host reboots; round 4).
        with open(os.path.join(args.out, "rss_curve.json"), "w") as f:
            json.dump(rss_curve, f)
        with open(os.path.join(args.out, "loss_curve.json"), "w") as f:
            json.dump(losses, f)

    with open(os.path.join(args.out, "split_pid"), "w") as f:
        f.write(str(proc.pid))
    for line in proc.stdout:
        tail.append(line)
        tail = tail[-60:]
        m = it_re.search(line)
        if m:
            it = int(m.group(1).replace(",", ""))
            # split.py emits each training line twice (logger + stdout echo);
            # dedupe by iteration so the curve has one point per iter
            if not losses or it != losses[-1][0]:
                losses.append((it, float(m.group(2))))
                if len(losses) % 10 == 0:
                    flush_curves()
        if psnr_re.search(line):
            val_psnr.append(line.strip())
            print(line.strip(), flush=True)
    rc = proc.wait()
    th.join(timeout=15)
    wall = time.perf_counter() - t0

    os.makedirs(args.out, exist_ok=True)
    leak_note = None
    if len(rss_curve) > 10:
        # linear leak-rate fit over the post-warmup tail
        pts = np.asarray(rss_curve[len(rss_curve) // 4:], np.float64)
        slope = np.polyfit(pts[:, 0], pts[:, 1], 1)[0]  # MB/s
        leak_note = {"rss_mb_per_hour": round(slope * 3600, 1),
                     "rss_start_mb": rss_curve[0][1],
                     "rss_end_mb": rss_curve[-1][1]}
    iters_reached = losses[-1][0] if losses else 0
    # rc == -15 (SIGTERM) is the expected end of a time-bounded window;
    # anything else nonzero is a genuine crash (OOM SIGKILL, traceback)
    crashed = rc not in (0, -15)
    summary = {
        "rc": rc, "crashed": crashed,
        "wall_s": round(wall, 1), "iters_requested": args.iters,
        "iters_reached": iters_reached,
        "iters_per_s": round(iters_reached / wall, 2) if iters_reached else None,
        "patch": args.patch, "batch": args.batch,
        "device_pool": bool(args.device_pool),
        "loss_first": losses[:3], "loss_last": losses[-3:],
        "val_psnr_lines": val_psnr[-12:],
        "rss": leak_note, "log_tail": tail[-15:] if rc != 0 else None,
    }
    with open(os.path.join(args.out, "soak.json"), "w") as f:
        json.dump(summary, f, indent=1)
    flush_curves()
    print(json.dumps(summary)[:800], flush=True)
    if rc == -15:
        print(f"split.py ended via SIGTERM at iter {iters_reached} "
              f"(expected for time-bounded windows; curves above are valid)",
              flush=True)
    elif crashed:
        print(f"ERROR: split.py CRASHED rc={rc} at iter {iters_reached} "
              f"(see log_tail in soak.json)", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Full-frame microscopy serving at reference scale: 2048x2048 stack through
predict.py (tiled extract -> batched inference -> device stitch).

The reference's real eval path runs per-tile inference over 2048^2 Hagen
frames and stitches (/root/reference/notebooks/EvaluateJointIndi.ipynb cell
23, /root/reference/data/tile_stitcher.py:10-81). This drives OUR production
CLI (predict.py) end-to-end on a synthetic 2048x2048xF uint16 stack with the
shipped joint-InDI config, at sampling budgets N=1 and N=5, and records
frames/s, tiles/s and the child's peak host RSS (the axon tunnel leaks host
RAM per host->device transfer — CLAUDE.md — so the RSS profile is the point,
not just the wall time).

Each leg runs twice: cold (includes jit compiles; persistent cache shared via
JAX_COMPILATION_CACHE_DIR) and warm (steady-state serving cost: model init +
checkpoint load + tiled inference + stitch + TIFF write).

Usage (TPU, detached):
  python scripts/bench_2048_serving.py --frames 10 --batch 32 \
      --out results/serving_2048.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_stack(path, frames, size, seed=0):
    """Hagen-like two-structure mixture: smooth blobs + filament-ish waves,
    mixed 50/50, uint16 at microscopy-ish intensity."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    out = np.empty((frames, size, size), np.uint16)
    for f in range(frames):
        ch0 = np.zeros((size, size), np.float32)
        for _ in range(40):  # blobs
            cy, cx = rng.uniform(0, size, 2)
            s = rng.uniform(8, 40)
            ch0 += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))).astype(np.float32)
        k1, k2, ph = rng.uniform(0.002, 0.02, 2), rng.uniform(0.002, 0.02, 2), rng.uniform(0, 6.28)
        ch1 = (np.sin(k1[0] * xx + k1[1] * yy + ph) *
               np.cos(k2[0] * xx - k2[1] * yy)).astype(np.float32) ** 2
        mix = 0.5 * ch0 / max(ch0.max(), 1e-6) + 0.5 * ch1
        out[f] = (mix * 1400 + rng.normal(0, 8, mix.shape)).clip(0, 65535).astype(np.uint16)
    from diffsplitting_tpu.data.io import save_tiff_stack

    save_tiff_stack(path, out)
    return out


from scripts._bench_util import rss_watch_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/splitting_hagen_indi_joint.json")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps_legs", default="1,5",
                    help="comma list of InDI sampling budgets (reference eval "
                         "uses N=1 and N=5)")
    ap.add_argument("--deepcache", default="",
                    help="optional K[,D] leg on the largest N")
    ap.add_argument("--workdir", default="/tmp/bench2048")
    ap.add_argument("--out", default=os.path.join(REPO, "results/serving_2048.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    tif = os.path.join(args.workdir, "mixed.tif")
    if not os.path.exists(tif):
        print("synthesizing input stack ...", flush=True)
        synth_stack(tif, args.frames, args.size)

    # random-init checkpoint (throughput does not depend on the weights;
    # quality evidence lives in results/quality_joint_indi*)
    ckpt_prefix = os.path.join(args.workdir, "ckpt", "I1_E1")
    if not os.path.isdir(ckpt_prefix + "_gen"):
        from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
        from diffsplitting_tpu.train import DiffusionModel

        opt = load_json(os.path.join(REPO, args.config))
        opt["phase"] = "train"
        opt["path"]["checkpoint"] = os.path.join(args.workdir, "ckpt")
        opt["path"]["resume_state"] = None
        model = DiffusionModel(dict_to_nonedict(opt))
        model.save_network(epoch=1, iter_step=1)
        del model
        print("wrote random-init checkpoint", flush=True)

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser("~/.cache/dsp_jax_cache")

    n_tiles_dim = args.size // 256  # inner tile = patch//2 = 256
    tiles_per_frame = n_tiles_dim * n_tiles_dim
    results = {"frames": args.frames, "size": args.size, "batch": args.batch,
               "tiles_per_frame": tiles_per_frame, "config": args.config,
               "legs": {}}

    def leg(name, extra):
        cmd = [sys.executable, "predict.py", "-c", args.config,
               "--resume", ckpt_prefix, "--input", tif,
               "--out", os.path.join(args.workdir, f"pred_{name}"),
               "--batch_size", str(args.batch)] + extra
        row = {}
        for phase in ("cold", "warm"):
            wall, rss, rc, tail = rss_watch_run(cmd, env=env, cwd=REPO)
            assert rc == 0, f"{name} {phase} failed:\n{tail}"
            row[phase] = {"wall_s": round(wall, 1),
                          "frames_per_s": round(args.frames / wall, 4),
                          "tiles_per_s": round(args.frames * tiles_per_frame / wall, 2),
                          "peak_rss_mb": round(rss, 1)}
            print(name, phase, json.dumps(row[phase]), flush=True)
        results["legs"][name] = row
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    steps_legs = [int(s) for s in args.steps_legs.split(",") if s]
    for N in steps_legs:
        leg(f"N{N}", ["--num_steps", str(N)])
    if args.deepcache and steps_legs:
        leg(f"N{max(steps_legs)}_dc{args.deepcache.replace(',', '_')}",
            ["--num_steps", str(max(steps_legs)), "--deepcache", args.deepcache])
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

"""Unconditional face-generation artifact: sample.py train -> val for the
DDPM and SR3 128^2 generation configs.

The reference ships trajectory grids (misc/sample_process_128_*.png) from
sample.py's val phase (/root/reference/sample.py:132-162). This drives OUR
sample.py end-to-end on the reference's shipped face images (the full FFHQ
set is absent from this image — bounded-overfit caveat, same protocol note
as results/quality_sr3): short training run per family, then the val phase
generates `*_sample.png` finals and `*_sample_process.png` trajectory grids
into results/sample_128/{ddpm,sr3}/.

Usage (TPU, detached):
  python scripts/quality_unconditional.py --iters 10000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_SETS = [
    "/root/reference/dataset/celebahq_16_128/hr_128",
    "/root/reference/dataset/celebahq_64_512/hr_512",
    "/root/reference/dataset/ffhq_64_512/hr_512",
]


def prepare_faces(workdir):
    from PIL import Image

    from diffsplitting_tpu.data.prepare_data import prepare

    src = os.path.join(workdir, "src")
    os.makedirs(src, exist_ok=True)
    n = 0
    for d in REF_SETS:
        for f in sorted(glob.glob(os.path.join(d, "*.png"))):
            if min(Image.open(f).size) < 128:
                continue
            shutil.copy(f, os.path.join(src, f"{n}.png"))
            n += 1
    root = os.path.join(workdir, "data_16_128")
    if not os.path.isdir(root):
        prepare(src, root, n_worker=1, sizes=(16, 128))
    print(f"{n} face images prepared", flush=True)
    return root


def run(cmd, cwd=REPO, env=None):
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=cwd, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        print(r.stdout[-4000:], flush=True)
        raise SystemExit(f"{' '.join(cmd[:3])} failed rc={r.returncode}")
    return dt, r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--families", default="sr3,ddpm")
    ap.add_argument("--n_samples", type=int, default=4)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/quality_uncond")
    ap.add_argument("--out", default=os.path.join(REPO, "results/sample_128"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny UNet + 8-step schedules (CPU plumbing check)")
    args = ap.parse_args()

    from diffsplitting_tpu.config.loader import load_json

    os.makedirs(args.workdir, exist_ok=True)
    dataroot = prepare_faces(args.workdir)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser("~/.cache/dsp_jax_cache")

    summary = {}
    for fam in args.families.split(","):
        cfg = load_json(os.path.join(REPO, f"configs/sample_{fam}_128.json"))
        wd = os.path.join(args.workdir, fam)
        cfg["name"] = f"uncond_{fam}"
        cfg["path"]["root"] = os.path.join(wd, "exp")
        for sp in ("train", "val"):
            cfg["datasets"][sp]["dataroot"] = dataroot
        cfg["datasets"]["train"]["batch_size"] = args.batch
        cfg["datasets"]["train"]["num_workers"] = 0
        cfg["datasets"]["val"]["data_len"] = args.n_samples
        cfg["train"]["n_iter"] = args.iters
        cfg["train"]["val_freq"] = args.iters + 1  # sample via val phase below
        cfg["train"]["save_checkpoint_freq"] = args.iters
        cfg["train"]["print_freq"] = 500
        cfg["train"]["ema_scheduler"]["step_start_ema"] = 1000
        if args.smoke:
            cfg["model"]["unet"].update(
                inner_channel=8, norm_groups=4, channel_multiplier=[1, 2],
                attn_res=[], res_blocks=1, dropout=0)
            cfg["model"]["diffusion"]["image_size"] = 16
            for ph in ("train", "val"):
                cfg["model"]["beta_schedule"][ph]["n_timestep"] = 8
        cfg_train = os.path.join(wd, "train_cfg.json")
        os.makedirs(wd, exist_ok=True)
        with open(cfg_train, "w") as f:
            json.dump(cfg, f, indent=1)

        print(f"[{fam}] training {args.iters} iters ...", flush=True)
        dt_train, out = run([sys.executable, "sample.py", "-c", cfg_train,
                             "-p", "train"], env=env)
        print(f"[{fam}] train done in {dt_train:.0f}s", flush=True)

        # find the checkpoint the run saved (I{iters}_E{epoch})
        exp_ckpts = glob.glob(os.path.join(wd, "exp", "**", "checkpoint",
                                           f"I{args.iters}_E*_gen"),
                              recursive=True)
        assert exp_ckpts, f"no checkpoint found under {wd}/exp"
        prefix = exp_ckpts[0][: -len("_gen")]

        cfg_val = dict(cfg)
        cfg_val["path"] = dict(cfg["path"])
        cfg_val["path"]["resume_state"] = prefix
        cfg_val_p = os.path.join(wd, "val_cfg.json")
        with open(cfg_val_p, "w") as f:
            json.dump(cfg_val, f, indent=1)
        print(f"[{fam}] sampling {args.n_samples} trajectories ...", flush=True)
        dt_val, out = run([sys.executable, "sample.py", "-c", cfg_val_p,
                           "-p", "val"], env=env)
        print(f"[{fam}] sampling done in {dt_val:.0f}s", flush=True)

        dst = os.path.join(args.out, fam)
        os.makedirs(dst, exist_ok=True)
        pngs = glob.glob(os.path.join(wd, "exp", "**", "results", "*.png"),
                         recursive=True)
        for p in pngs:
            shutil.copy(p, dst)
        summary[fam] = {"train_s": round(dt_train, 1),
                        "sample_s": round(dt_val, 1),
                        "iters": args.iters, "n_png": len(pngs),
                        "ckpt": prefix}
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

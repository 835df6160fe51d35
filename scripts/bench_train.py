"""Training-throughput microbench: jitted train step/s + MFU on the current backend.

Usage: python scripts/bench_train.py [--which joint_indi] [--batch 8] [--patch 128]
Prints one JSON line. Complements bench.py (which measures reverse sampling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel
from diffsplitting_tpu.utils.flops import unet_forward_flops
from diffsplitting_tpu.utils.profiling import peak_flops_per_chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="joint_indi",
                    choices=["ddpm", "sr3", "indi", "joint_indi"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    out_ch = 1 if args.which == "joint_indi" else 2
    in_ch = out_ch if args.which in ("indi", "joint_indi") else out_ch + 1
    if args.which == "indi":
        in_ch = out_ch
    cond = args.which in ("ddpm", "sr3")

    opt = dict_to_nonedict({
        "name": "bench", "phase": "train",
        "path": {"checkpoint": "/tmp/bench_ckpt", "resume_state": None},
        "model": {
            "which_model_G": args.which, "loss_type": "l1", "lr_reduction": "mean",
            "finetune_norm": False, "w_input_loss": 0.0, "allow_full_translation": True,
            **({"compute_dtype": "bfloat16"} if args.bf16 else {}),
            "unet": {"in_channel": in_ch, "out_channel": out_ch,
                     "inner_channel": args.inner, "norm_groups": min(16, args.inner),
                     "channel_multiplier": [1, 2, 4, 8], "attn_res": [],
                     "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 2000,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 3,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": out_ch * (2 if args.which == "joint_indi" else 1),
                          "conditional": cond},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    })
    # joint_indi channels semantics: diffusion.channels is per-net (1)
    if args.which == "joint_indi":
        opt["model"]["diffusion"]["channels"] = 1

    model = DiffusionModel(opt)
    rng = np.random.default_rng(0)
    tgt_ch = 2 if args.which == "joint_indi" else out_ch
    batch = {
        "target": rng.normal(size=(args.batch, args.patch, args.patch, tgt_ch)).astype(np.float32),
    }
    if args.which != "joint_indi":
        inp_ch = 1 if args.which in ("indi",) else in_ch - out_ch
        batch["input"] = rng.normal(size=(args.batch, args.patch, args.patch, inp_ch)).astype(np.float32)

    model.feed_data(batch)
    model.optimize_parameters()  # compile

    t0 = time.perf_counter()
    for _ in range(args.reps):
        model.optimize_parameters()
    dt = (time.perf_counter() - t0) / args.reps

    n_nets = 2 if args.which == "joint_indi" else 1
    fwd = unet_forward_flops(
        args.patch, in_ch, out_ch, args.inner, (1, 2, 4, 8), (), 1, batch=args.batch
    )
    flops = 3.0 * fwd * n_nets
    mfu = flops / dt / peak_flops_per_chip()
    print(json.dumps({
        "metric": f"train_steps_per_sec_{args.which}_{args.patch}px_b{args.batch}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "extra": {"step_time_ms": round(dt * 1e3, 2), "mfu": round(mfu, 4)},
    }))


if __name__ == "__main__":
    main()

"""Training-throughput microbench: jitted train step/s + MFU on the current backend.

Usage: python scripts/bench_train.py [--which joint_indi] [--batch 8] [--patch 128]
   or: python scripts/bench_train.py --config configs/sr_sr3_16_128.json --batch 32 --bf16
Prints one JSON line. Complements bench.py (which measures reverse sampling).

`--config` benches the REAL shipped config (full UNet + optimizer + EMA as
configured) — the training-side counterpart of bench.py's sampler headline,
matching the reference's hot loop (/root/reference/split.py:141-270:
feed_data + optimize_parameters per iteration).
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


def bench_config(args):
    """Train step/s + MFU for a shipped config's full DiffusionModel step
    (fwd+bwd+adam+EMA as configured), synthetic data at the config's
    resolution. The reference's training entry is split.py's
    feed_data/optimize_parameters loop (/root/reference/split.py:141-270)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_json(os.path.join(repo, args.config))
    opt["phase"] = "train"
    opt["path"]["checkpoint"] = "/tmp/bench_ckpt"
    opt["path"]["resume_state"] = None
    if args.bf16:
        opt["model"]["compute_dtype"] = "bfloat16"
    if args.remat:
        opt["model"]["remat"] = True
    if args.no_remat:
        opt["model"]["remat"] = False
        opt["model"].pop("remat_min_res", None)
    if args.remat_min_res:
        opt["model"]["remat"] = True
        opt["model"]["remat_min_res"] = args.remat_min_res
    if args.dropout >= 0:
        opt["model"]["unet"]["dropout"] = args.dropout
    if args.no_ema:
        opt.get("train", {}).pop("ema_scheduler", None)
    opt = dict_to_nonedict(opt)
    u = opt["model"]["unet"]
    dif = opt["model"]["diffusion"]
    which = opt["model"]["which_model_G"]
    out_ch = int(u["out_channel"])
    in_ch = int(u["in_channel"])
    size = int(dif["image_size"])
    cond = bool(dif["conditional"])

    model = DiffusionModel(opt)
    rng = np.random.default_rng(0)
    tgt_ch = out_ch * (2 if which == "joint_indi" else 1)
    batch = {"target": rng.normal(
        size=(args.batch, size, size, tgt_ch)).astype(np.float32)}
    inp_ch = in_ch if which in ("indi", "joint_indi") else in_ch - out_ch
    if which != "joint_indi":
        batch["input"] = rng.normal(
            size=(args.batch, size, size, inp_ch)).astype(np.float32)

    model.feed_data(batch)
    model.optimize_parameters()  # compile
    model.optimize_parameters()  # deferred first-use transfer (CLAUDE.md)
    import jax

    jax.block_until_ready(model.params)

    if args.trace:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_summary import capture, summarize

        with capture(args.trace):
            model.optimize_parameters()
            jax.block_until_ready(model.params)
        try:
            rows = summarize(args.trace, top=20)
            for pl, d in rows.items():
                print(f"[trace {pl}] total {d['total_ms']}ms "
                      f"top5: {d['ops'][:5]}", flush=True)
            with open(os.path.join(args.trace, "summary.json"), "w") as f:
                json.dump(rows, f, indent=1)
        except Exception as e:
            print("trace parse failed:", repr(e), flush=True)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        model.optimize_parameters()
    jax.block_until_ready(model.params)
    dt = (time.perf_counter() - t0) / args.reps

    n_nets = 2 if which == "joint_indi" else 1
    fwd = unet_forward_flops(
        size, in_ch, out_ch, int(u["inner_channel"]),
        tuple(u["channel_multiplier"]), tuple(u["attn_res"] or ()),
        int(u["res_blocks"]), cond=cond, batch=args.batch)
    flops = 3.0 * fwd * n_nets  # bwd ≈ 2× fwd
    mfu = flops / dt / peak_flops_per_chip()
    name = os.path.splitext(os.path.basename(args.config))[0]
    row = {
        "metric": f"train_steps_per_sec_{name}_b{args.batch}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "extra": {"step_time_ms": round(dt * 1e3, 2), "mfu": round(mfu, 4),
                  "imgs_per_sec": round(args.batch / dt, 2),
                  "flops_per_step": flops, "bf16": args.bf16,
                  "remat": bool(opt["model"].get("remat")),  # resolved value
                  "batch": args.batch,
                  "remat_min_res": int(opt["model"].get("remat_min_res") or 0),
                  "dropout": float(u["dropout"] or 0.0),
                  "ema": bool((opt.get("train") or {}).get("ema_scheduler")),
                  "image_size": size, "backend": jax.devices()[0].platform},
    }
    line = json.dumps(row)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="joint_indi",
                    choices=["ddpm", "sr3", "indi", "joint_indi"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--config", default=None,
                    help="bench a shipped config's real train step instead "
                         "of the toy UNet (e.g. configs/sr_sr3_16_128.json)")
    ap.add_argument("--remat", action="store_true",
                    help="per-block rematerialization (config mode)")
    ap.add_argument("--remat_min_res", type=int, default=0,
                    help="selective remat: only blocks at resolution >= R "
                         "are rematerialized (model.remat_min_res; equal "
                         "FLOPs but halving activation memory per UNet "
                         "level means R=128 keeps ~95%% of the memory win "
                         "at ~half the recompute)")
    ap.add_argument("--dropout", type=float, default=-1.0,
                    help="override the config's UNet dropout (config mode "
                         "probe: isolate the dropout-mask RNG cost)")
    ap.add_argument("--no_ema", action="store_true",
                    help="strip the config's ema_scheduler (config mode probe)")
    ap.add_argument("--prng", choices=["threefry", "rbg"], default=None,
                    help="jax_default_prng_impl for the run (config mode "
                         "probe: threefry per-element dropout-mask bits are "
                         "VPU-bound; rbg uses the hardware RNG)")
    ap.add_argument("--out", default=None, help="also append JSON to file")
    ap.add_argument("--no_remat", action="store_true",
                    help="force remat OFF even if the config ships it on "
                         "(512² HBM-fit probe)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a device trace of ONE train step into DIR "
                         "and print the top fusions (trace_summary.py)")
    args = ap.parse_args()

    if args.config:
        return bench_config(args)

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

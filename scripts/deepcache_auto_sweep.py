"""DeepCache interval sweep on the trained 16->128 checkpoint: does the
'auto' rule (clamp(round(0.4*T),1,5), trainer._dc_interval) pick the
speed/fidelity frontier END-TO-END?

The round-3 schedule study (scripts/deepcache_schedule_study.py) derived the
rule on joint-InDI fidelity-vs-exact; this validates it on TASK quality
(PSNR/SSIM vs HR) through the production DiffusionModel.test() route, on the
40k+EMA SR3 16->128 checkpoint, sweeping interval in {2,3,5,8,12,'auto'}
against the exact chain at the full 2000-step schedule.

Usage (TPU):
  python scripts/deepcache_auto_sweep.py --workdir /tmp/q_w8a8_40k \
      --resume_iter 40000 --out results/quality_deepcache/auto_sweep.json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/q_w8a8_40k",
                    help="quality_sr3_overfit workdir holding ckpt/ + face data")
    ap.add_argument("--resume_iter", type=int, default=40000)
    ap.add_argument("--config", default="configs/sr_sr3_16_128.json")
    ap.add_argument("--intervals", default="2,3,5,8,12")
    ap.add_argument("--ema", type=float, default=0.9999)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results/quality_deepcache/auto_sweep.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from scripts.quality_sr3_overfit import build_opt, prepare_face_batch

    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.metrics import (
        calculate_psnr, calculate_ssim, tensor2img,
    )

    batch_np = prepare_face_batch(args.workdir, 16, 128)
    opt = build_opt(f"{args.workdir}/ckpt", args.config, ema=args.ema)
    opt["phase"] = "val"
    opt["path"]["resume_state"] = os.path.join(
        f"{args.workdir}/ckpt", f"I{args.resume_iter}_E0")
    model = DiffusionModel(opt)
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    T = model.current_sched.num_timesteps

    def leg(tag):
        model._rng_counter = 7
        t0 = time.perf_counter()
        model.feed_data({"input": batch_np["input"]})
        sr = np.asarray(model.test(continuous=False, use_ema=True))
        dt = time.perf_counter() - t0
        ps, ss = [], []
        for i in range(sr.shape[0]):
            sr_img = tensor2img(sr[i])
            hr_img = tensor2img(batch_np["target"][i])
            ps.append(calculate_psnr(sr_img, hr_img))
            ss.append(calculate_ssim(sr_img, hr_img))
        row = {"wall_s": round(dt, 2), "steps_per_s": round(T / dt, 1),
               "psnr": round(float(np.mean(ps)), 3),
               "ssim": round(float(np.mean(ss)), 4)}
        print(tag, json.dumps(row), flush=True)
        return row

    results = {"T": T, "iters": args.resume_iter, "legs": {}}
    # warm up compile once on the exact chain, then time it
    leg("warmup")
    results["legs"]["exact"] = leg("exact")
    for iv in args.intervals.split(","):
        model.set_deepcache(int(iv), 1)
        leg(f"warmup_dc{iv}")
        results["legs"][f"dc_{iv}"] = leg(f"dc_{iv}")
    model.set_deepcache("auto", 1)
    resolved = model._dc_interval(T)
    leg("warmup_auto")
    results["legs"]["dc_auto"] = leg("dc_auto")
    results["auto_resolved_interval"] = resolved

    # frontier check: auto must match the best interval's PSNR within
    # 0.15 dB AND be at least ~as fast as that interval (both halves of the
    # frontier definition)
    best_psnr, best_k = max(
        (v["psnr"], k) for k, v in results["legs"].items()
        if k.startswith("dc_") and k != "dc_auto")
    auto = results["legs"]["dc_auto"]
    results["frontier_ok"] = bool(
        auto["psnr"] >= best_psnr - 0.15
        and auto["steps_per_s"] >= 0.95 * results["legs"][best_k]["steps_per_s"])
    results["best_interval_by_psnr"] = best_k

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

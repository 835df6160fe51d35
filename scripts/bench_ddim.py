"""On-chip measurement: respaced DDIM serving vs the full ancestral chain.

The reference's README numbers use the full 2000-step SR3 chain
(/root/reference/config/sr_sr3_16_128.json:61); DDIM (diffusion/ddim.py)
serves the same trained net in S ≪ T steps. This script measures, on a
TRAINED 16→128 checkpoint: wall-clock per batch, steps/s-equivalent
speedup vs the exact chunked chain, task PSNR/SSIM vs HR for the exact
chain and each (S, η), and PSNR of the DDIM output vs the exact chain's
output (similarity, not an error — the dynamics differ by construction).

Usage (TPU, detached):
  python scripts/bench_ddim.py \
      --ckpt /tmp/quality_deepcache/ckpt/I4000_E0 \
      --batch 8 --steps 50,100,250 --etas 0.0 \
      --out results/ddim/b8.json
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
    ap.add_argument("--ckpt", default="/tmp/quality_deepcache/ckpt/I4000_E0")
    ap.add_argument("--config", default="configs/sr_sr3_16_128.json")
    ap.add_argument("--workdir", default="/tmp/quality_deepcache")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--l_res", type=int, default=16)
    ap.add_argument("--r_res", type=int, default=128)
    ap.add_argument("--steps", default="50,100,250")
    ap.add_argument("--etas", default="0.0")
    ap.add_argument("--timesteps", type=int, default=0,
                    help="override val n_timestep (0 = config value)")
    ap.add_argument("--ema", action="store_true",
                    help="serve the EMA weights (test(use_ema=True))")
    ap.add_argument("--deepcache", type=str, default=None, metavar="K[,D]",
                    help="also measure each (S, eta) with DeepCache composed "
                         "(cached respaced chain, interval K over the S "
                         "respaced steps, split depth D)")
    ap.add_argument("--out", default=os.path.join(REPO, "results/ddim/run.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.metrics import (
        calculate_psnr, calculate_ssim, tensor2img,
    )
    from scripts.quality_sr3_overfit import prepare_face_batch

    opt = load_json(os.path.join(REPO, args.config))
    opt["phase"] = "val"
    opt["path"]["checkpoint"] = os.path.dirname(args.ckpt)
    opt["path"]["resume_state"] = args.ckpt
    if args.timesteps:
        opt["model"]["beta_schedule"]["val"]["n_timestep"] = args.timesteps
    opt["model"]["compute_dtype"] = "bfloat16"
    opt = dict_to_nonedict(opt)

    batch_np = prepare_face_batch(args.workdir, args.l_res, args.r_res)
    b = args.batch
    cond_np = batch_np["input"][:b]
    hr_np = batch_np["target"][:b]

    model = DiffusionModel(opt)
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    T = model.current_sched.num_timesteps
    model.feed_data({"input": cond_np})

    def task_metrics(img):
        ps = float(np.mean([
            calculate_psnr(tensor2img(img[i]), tensor2img(hr_np[i]))
            for i in range(b)
        ]))
        ss = float(np.mean([
            calculate_ssim(tensor2img(img[i]), tensor2img(hr_np[i]))
            for i in range(b)
        ]))
        return ps, ss

    # exact chunked chain baseline (the production default for long chains)
    model.sampler_chunk = 100
    model._rng_counter = 7
    np.asarray(model.test(continuous=False, use_ema=args.ema))  # compile
    model._rng_counter = 7
    t0 = time.perf_counter()
    exact_img = np.asarray(model.test(continuous=False, use_ema=args.ema))
    exact_s = time.perf_counter() - t0
    exact_psnr, exact_ssim = task_metrics(exact_img)
    print(f"exact {T}-step chain: {exact_s:.1f}s ({T/exact_s:.1f} steps/s), "
          f"task {exact_psnr:.2f} dB / {exact_ssim:.3f}", flush=True)

    results = {"batch": b, "T": T, "ema": bool(args.ema), "exact_s": exact_s,
               "exact_task_psnr": exact_psnr, "exact_task_ssim": exact_ssim,
               "rows": []}

    dc_variants = [None]
    if args.deepcache:
        from diffsplitting_tpu.utils.cli import parse_accel_flag

        dc_variants.append(parse_accel_flag(args.deepcache, 1, second_cast=int))

    for S in [int(s) for s in args.steps.split(",")]:
        for eta in [float(e) for e in args.etas.split(",")]:
            for dc in dc_variants:
                model.set_ddim(S, eta)
                model.set_deepcache(*(dc or (None,)))
                model._rng_counter = 7
                np.asarray(model.test(continuous=False, use_ema=args.ema))  # compile
                model._rng_counter = 7
                t0 = time.perf_counter()
                img = np.asarray(model.test(continuous=False, use_ema=args.ema))
                dt = time.perf_counter() - t0
                ps, ss = task_metrics(img)
                sim = float(np.mean([
                    calculate_psnr(tensor2img(img[i]), tensor2img(exact_img[i]))
                    for i in range(b)
                ]))
                row = {"steps": S, "eta": eta, "deepcache": dc, "s": dt,
                       "speedup_vs_exact": exact_s / dt,
                       "task_psnr": ps, "task_ssim": ss,
                       "psnr_vs_exact_output": sim}
                results["rows"].append(row)
                print(json.dumps(row), flush=True)
    model.set_ddim(None)
    model.set_deepcache(None)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

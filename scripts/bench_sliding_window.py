"""On-chip measurement: sliding-window ParaDiGMS sampling vs the sequential
chain for LOW-BATCH serving (roadmap item 6 — "sliding-window ParaDiGMS
scheduling if low-batch serving matters").

Regime: at b1–b4 a single 128² forward under-fills the v5e MXU (38% MFU at
b8 vs 49% at b64, BENCH_NOTES); the windowed sweep batches W consecutive
timesteps into one (W·B)-image forward and advances past converged leading
steps (tau·sigma_t² per-pixel criterion, Shih et al. 2023). Wall-clock wins
iff avg_advance_per_sweep > W · t(W·B fwd)/ (W · t(B fwd)) — this script
measures exactly that frontier on a TRAINED 16→128 SR3 checkpoint, plus
fidelity (PSNR of the tau>0 chain vs the tau=0 exact chain with identical
frozen noises, and task PSNR vs HR).

Usage (TPU, detached):
  python scripts/bench_sliding_window.py \
      --ckpt /tmp/quality_deepcache/ckpt/I4000_E0 \
      --batch 1 --windows 32,64,128 --taus 0.02,0.1,0.5 \
      --out results/sliding_window/b1.json
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--windows", default="32,64,128")
    ap.add_argument("--taus", default="0.02,0.1,0.5")
    ap.add_argument("--timesteps", type=int, default=0,
                    help="override val n_timestep (0 = config value)")
    ap.add_argument("--out", default=os.path.join(REPO, "results/sliding_window/run.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.diffusion.parallel_sampling import (
        ddpm_sample_sliding_window,
    )
    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.metrics import calculate_psnr, tensor2img
    from scripts.quality_sr3_overfit import prepare_face_batch

    opt = load_json(os.path.join(REPO, args.config))
    opt["phase"] = "val"
    opt["path"]["checkpoint"] = os.path.dirname(args.ckpt)
    opt["path"]["resume_state"] = args.ckpt
    if args.timesteps:
        opt["model"]["beta_schedule"]["val"]["n_timestep"] = args.timesteps
    opt["model"]["compute_dtype"] = "bfloat16"
    opt = dict_to_nonedict(opt)

    batch_np = prepare_face_batch(args.workdir, 16, 128)
    b = args.batch
    cond_np = batch_np["input"][:b]
    hr_np = batch_np["target"][:b]

    model = DiffusionModel(opt)
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    sched, process, net = model.current_sched, model.process, model.nets["net"]
    params = {"params": model.params["net"]}
    T = sched.num_timesteps
    cond = jnp.asarray(cond_np)
    rng = jax.random.PRNGKey(7)

    def dn(p, x, t):
        return net.apply(p, x, t)

    # ---- sequential baseline: the production chunked scan (b-image forwards)
    model.sampler_chunk = 100
    model.feed_data({"input": cond_np})
    t0 = time.perf_counter()
    seq_img = np.asarray(model.test(continuous=False))
    seq_s = time.perf_counter() - t0
    # warm second run (first pays compile)
    t0 = time.perf_counter()
    seq_img = np.asarray(model.test(continuous=False))
    seq_s = time.perf_counter() - t0
    print(f"sequential chunked: {seq_s:.1f}s ({T/seq_s:.1f} steps/s)", flush=True)

    results = {"batch": b, "T": T, "sequential_s": seq_s,
               "sequential_steps_per_s": T / seq_s, "rows": []}

    # SR3 nets condition on the noise level, not raw t (sr3.py:60)
    t_cond = (
        (lambda t: sched.sqrt_alphas_cumprod_prev[t + 1])
        if opt["model"]["which_model_G"] == "sr3" else None
    )
    sw = jax.jit(
        lambda p, r, c, W, tau: ddpm_sample_sliding_window(
            process, lambda x, t: dn(p, x, t), sched, r, c, window=W, tau=tau,
            t_cond=t_cond,
        ),
        static_argnums=(3,),
    )

    exact_cache = {}
    for W in [int(w) for w in args.windows.split(",")]:
        # exact frozen-noise chain for fidelity reference (W=1, tau=0 —
        # same noises as every (W, tau) variant by fold_in construction)
        if "exact" not in exact_cache:
            img, sweeps = sw(params, rng, cond, 1, 0.0)
            img.block_until_ready()
            t0 = time.perf_counter()
            img, sweeps = sw(params, rng, cond, 1, 0.0)
            img = np.asarray(img)
            exact_s = time.perf_counter() - t0
            exact_cache["exact"] = img
            print(f"W=1 tau=0 (in-graph sequential): {exact_s:.1f}s "
                  f"({int(sweeps)} sweeps)", flush=True)
            results["w1_exact_s"] = exact_s
        exact_img = exact_cache["exact"]
        for tau in [float(t) for t in args.taus.split(",")]:
            img, sweeps = sw(params, rng, cond, W, tau)
            img.block_until_ready()
            t0 = time.perf_counter()
            img, sweeps = sw(params, rng, cond, W, tau)
            img = np.asarray(img)
            dt = time.perf_counter() - t0
            sweeps = int(sweeps)
            psnr_vs_exact = float(np.mean([
                calculate_psnr(tensor2img(img[i]), tensor2img(exact_img[i]))
                for i in range(b)
            ]))
            psnr_task = float(np.mean([
                calculate_psnr(tensor2img(img[i]), tensor2img(hr_np[i]))
                for i in range(b)
            ]))
            psnr_task_exact = float(np.mean([
                calculate_psnr(tensor2img(exact_img[i]), tensor2img(hr_np[i]))
                for i in range(b)
            ]))
            row = {
                "window": W, "tau": tau, "s": dt, "sweeps": sweeps,
                "avg_advance": T / max(sweeps, 1),
                "speedup_vs_sequential": seq_s / dt,
                "psnr_vs_exact_chain": psnr_vs_exact,
                "psnr_task": psnr_task, "psnr_task_exact": psnr_task_exact,
            }
            results["rows"].append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

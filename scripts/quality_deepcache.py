"""DeepCache fidelity + speed evaluation on a trained SR3 face-SR model.

Trains the full sr_sr3_16_128 UNet on the reference's shipped faces (EMA
tracked), then runs the 2000-step reverse chain (a) full, (b) deep-feature-
cached at several (interval, depth) settings with the SAME rng, reporting:
  * PSNR(cached, full-sampled) — fidelity of the acceleration itself
  * PSNR(cached, HR) vs PSNR(full, HR) — task quality retained
  * wall-clock per chain — the speedup

Usage: python scripts/quality_deepcache.py [--iters 4000]
       [--variants 3:2,5:2,5:1] [--out results/quality_deepcache]
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
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--workdir", default="/tmp/quality_deepcache")
    ap.add_argument("--out", default=os.path.join(REPO, "results/quality_deepcache"))
    ap.add_argument("--variants", default="2:2,3:2,5:2,5:1",
                    help="comma list of interval:depth")
    ap.add_argument("--ema", type=float, default=0.9999)
    ap.add_argument("--train_only", action="store_true",
                    help="train + save the checkpoint, skip the sampling sweep "
                         "(producer for bench_ddim/bench_sliding_window)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from scripts.quality_sr3_overfit import build_opt, prepare_face_batch

    from diffsplitting_tpu.diffusion import build_ddpm_schedule
    from diffsplitting_tpu.diffusion.deepcache import (
        cached_p_sample_loop,
        make_cached_denoisers,
    )
    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.metrics import calculate_psnr, save_img, tensor2img

    batch_np = prepare_face_batch(args.workdir, 16, 128)

    opt = build_opt(f"{args.workdir}/ckpt", "configs/sr_sr3_16_128.json",
                    ema=args.ema)
    ckpt_prefix = os.path.join(f"{args.workdir}/ckpt", f"I{args.iters}_E0")
    if os.path.isdir(f"{ckpt_prefix}_gen"):
        print("resuming trained model from", ckpt_prefix, flush=True)
        opt["path"]["resume_state"] = ckpt_prefix
        model = DiffusionModel(opt)
    else:
        model = DiffusionModel(opt)
        t0 = time.perf_counter()
        for it in range(1, args.iters + 1):
            model.feed_data(batch_np)  # identity-cached: one transfer total
            model.optimize_parameters()
            if it % 500 == 0 or it == 1:
                print(f"iter {it}: l_pix={float(model.get_current_log()['l_pix']):.1f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
        model.save_network(epoch=0, iter_step=args.iters)

    if args.train_only:
        print("train_only: checkpoint at", ckpt_prefix, flush=True)
        return

    # ------------------------------------------------------------- sampling
    import jax.numpy as jnp

    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    sched = model.current_sched
    process = model.process
    net = model.nets["net"]
    params = {"params": (model.ema_params or model.params)["net"]}
    cond = jnp.asarray(batch_np["input"])
    b = cond.shape[0]
    rng = jax.random.PRNGKey(1234)

    # params MUST be jit arguments, not closure constants: captured constants
    # are inlined into the compile payload, and a 370MB-weights program blows
    # the axon tunnel's remote_compile HTTP body limit (observed 413)
    def _full(p, r, c):
        return process.p_sample_loop(
            lambda xx, tt: net.apply(p, xx, tt), sched, r, c, continuous=False
        )

    full_fn = jax.jit(_full)
    t0 = time.perf_counter()
    sr_full = np.asarray(full_fn(params, rng, cond))
    full_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sr_full = np.asarray(full_fn(params, rng, cond))
    full_s = time.perf_counter() - t0
    print(f"full chain: {full_s:.1f}s (compile {full_compile_s:.0f}s)", flush=True)

    hr = [tensor2img(batch_np["target"][i]) for i in range(b)]
    img_full = [tensor2img(sr_full[i]) for i in range(b)]
    psnr_full_hr = float(np.mean([calculate_psnr(img_full[i], hr[i]) for i in range(b)]))

    os.makedirs(args.out, exist_ok=True)
    save_img(img_full[0][..., ::-1], f"{args.out}/0_full.png")
    results = {"full": {"seconds_per_chain": full_s, "psnr_vs_hr": psnr_full_hr,
                        "iters": args.iters}}

    T = sched.num_timesteps
    jitted_by_depth = {}
    for spec in args.variants.split(","):
        interval, depth = (int(v) for v in spec.split(":"))
        if depth not in jitted_by_depth:
            from diffsplitting_tpu.models.deepcache import CachedUNet

            cnet = CachedUNet.from_unet(net, depth)

            # params as jit args (see _full above); refresh flags are a traced
            # scan input: ONE compile per depth, intervals swept for free
            def _cached(p, r, c, rf, _c=cnet):
                return cached_p_sample_loop(
                    process, sched, r, c,
                    lambda xin, lvl: _c.apply(p, xin, lvl),
                    lambda xin, lvl, deep: _c.apply(p, xin, lvl, deep),
                    interval=1, refresh_override=rf,
                )

            jitted_by_depth[depth] = jax.jit(_cached)
        f = jitted_by_depth[depth]
        rf = np.zeros(T, np.int32)
        rf[::interval] = 1
        rf = jnp.asarray(rf)
        out = np.asarray(f(params, rng, cond, rf))  # compile (1st per depth) + run
        t0 = time.perf_counter()
        out = np.asarray(f(params, rng, cond, rf))
        dt = time.perf_counter() - t0
        img_dc = [tensor2img(out[i]) for i in range(b)]
        res = {
            "seconds_per_chain": dt,
            "speedup_vs_full": full_s / dt,
            "psnr_vs_full_sampling": float(
                np.mean([calculate_psnr(img_dc[i], img_full[i]) for i in range(b)])
            ),
            "psnr_vs_hr": float(
                np.mean([calculate_psnr(img_dc[i], hr[i]) for i in range(b)])
            ),
        }
        results[f"interval{interval}_depth{depth}"] = res
        save_img(img_dc[0][..., ::-1], f"{args.out}/0_dc_{interval}_{depth}.png")
        print(spec, json.dumps(res), flush=True)

    with open(f"{args.out}/metrics.json", "w") as fp:
        json.dump(results, fp, indent=1)
    print("done ->", args.out, flush=True)


if __name__ == "__main__":
    main()

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

    model = DiffusionModel(
        build_opt(f"{args.workdir}/ckpt", "configs/sr_sr3_16_128.json",
                  ema=args.ema)
    )
    t0 = time.perf_counter()
    for it in range(1, args.iters + 1):
        model.feed_data(batch_np)  # identity-cached: one transfer total
        model.optimize_parameters()
        if it % 500 == 0 or it == 1:
            print(f"iter {it}: l_pix={float(model.get_current_log()['l_pix']):.1f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

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

    denoise = lambda xx, tt: net.apply(params, xx, tt)  # noqa: E731
    full_fn = jax.jit(
        lambda r, c: process.p_sample_loop(denoise, sched, r, c, continuous=False)
    )
    t0 = time.perf_counter()
    sr_full = np.asarray(full_fn(rng, cond))
    full_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sr_full = np.asarray(full_fn(rng, cond))
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
            full_a, shallow_a, cnet = make_cached_denoisers(net, params, depth)
            # refresh flags are a traced scan input: ONE compile per depth,
            # intervals swept for free
            jitted_by_depth[depth] = jax.jit(
                lambda r, c, rf, _f=full_a, _s=shallow_a, _c=cnet:
                cached_p_sample_loop(
                    process, sched, r, c, _f, _s, _c.deep_shape(b),
                    interval=1, deep_dtype=jnp.bfloat16, refresh_override=rf,
                )
            )
        f = jitted_by_depth[depth]
        rf = np.zeros(T, np.int32)
        rf[::interval] = 1
        rf = jnp.asarray(rf)
        out = np.asarray(f(rng, cond, rf))  # compile (first per depth) + run
        t0 = time.perf_counter()
        out = np.asarray(f(rng, cond, rf))
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

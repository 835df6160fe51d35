"""512² 2000-step serving throughput through the production surfaces —
post-ChunkRunner steady state.

Round 3's first 512² measurement (BENCH_NOTES "512² chunked-scan sampling")
ran BEFORE the ChunkRunner fix, when every chunked chain paid a full
re-trace: it concluded "stepwise ≈ chunked (7.1–7.5 vs 7.4 steps/s)". This
re-measures the same three production routes with the per-request re-trace
gone. Throughput does not depend on the weights, so the model is randomly
initialized (quality/bit-identity of these routes is covered by
tests/test_chunked_sampler.py and the trained-checkpoint runs in
results/quality_sr3_64_512*).

Routes (all through DiffusionModel, i.e. what predict/infer serve):
  * chunked exact — model.sampler_chunk K (runner-cached chunk programs)
  * chunked + DeepCache(interval, 1) — the 512-class serving default
  * stepwise — jitted single step + host loop (the last-resort fallback)

Usage (TPU, detached):
  python scripts/bench_512_serving.py --batch 4 --chunk 100 --out results/serving_512.json
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
    ap.add_argument("--config", default="configs/sr_sr3_64_512.json")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--deepcache", default="5,1")
    ap.add_argument("--ddim", type=int, default=0,
                    help="also measure respaced DDIM at S steps (eta=1) and "
                         "its DeepCache composition (0 = skip)")
    ap.add_argument("--timesteps", type=int, default=0,
                    help="override val n_timestep (0 = config value)")
    ap.add_argument("--w8a8", action="store_true",
                    help="also measure the int8 walker on each route "
                         "(chunked exact / +DeepCache / +DDIM)")
    ap.add_argument("--w8a8_sites", choices=["default", "all"],
                    default="default",
                    help="'all' extends int8 coverage to Down/Upsample and "
                         "1×1 shortcut convs (set_quant updown+shortcut)")
    ap.add_argument("--skip_stepwise", action="store_true")
    ap.add_argument("--skip_bf16", action="store_true",
                    help="skip the bf16 routes (already measured in "
                         "results/serving_512*.json); time only the "
                         "--w8a8 legs")
    ap.add_argument("--out", default=os.path.join(REPO, "results/serving_512.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from scripts.quality_sr3_overfit import build_opt

    opt = build_opt("/tmp/bench512_ckpt", args.config, bf16=True)
    opt["phase"] = "val"
    if args.timesteps:
        opt["model"]["beta_schedule"]["val"]["n_timestep"] = args.timesteps

    from diffsplitting_tpu.train import DiffusionModel

    model = DiffusionModel(opt)
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    T = model.current_sched.num_timesteps
    size = opt["model"]["diffusion"]["image_size"]
    in_ch = opt["model"]["unet"]["in_channel"] - opt["model"]["diffusion"]["channels"]
    rng = np.random.default_rng(0)
    cond = rng.normal(size=(args.batch, size, size, in_ch)).astype(np.float32)
    model.feed_data({"input": cond})

    results = {"batch": args.batch, "T": T, "size": size, "chunk": args.chunk,
               "routes": {}}

    def timed(name, calls=2):
        """First call compiles; each later call is timed separately to show
        steady state AND expose any per-call re-trace regression."""
        model._rng_counter = 7
        t0 = time.perf_counter()
        np.asarray(model.test(continuous=False))
        compile_s = time.perf_counter() - t0
        per_call = []
        for _ in range(calls):
            model._rng_counter = 7
            t0 = time.perf_counter()
            np.asarray(model.test(continuous=False))
            per_call.append(time.perf_counter() - t0)
        row = {"compile_s": compile_s, "calls_s": per_call,
               "steps_per_s": T / min(per_call)}
        results["routes"][name] = row
        print(name, json.dumps(row), flush=True)

    k, d = (int(v) for v in args.deepcache.split(","))
    if not args.skip_bf16:
        # chunked exact (the production default for 512-class chains)
        model.sampler_chunk = args.chunk
        timed("chunked_exact")

        # chunked + DeepCache
        model.set_deepcache(k, d)
        timed(f"chunked_deepcache_{k}_{d}")
        model.set_deepcache(None)

        # respaced DDIM (eta=1, the quality-preserving setting) and the
        # DDIM x DeepCache composition — the 512-class latency frontier
        if args.ddim:
            S = int(args.ddim)
            model.set_ddim(S, 1.0)
            timed(f"ddim_{S}_eta1")
            model.set_deepcache(k, d)
            timed(f"ddim_{S}_eta1_deepcache_{k}_{d}")
            model.set_deepcache(None)
            model.set_ddim(None)

    if args.w8a8:
        # int8 walker over the same production routes (calibration happens
        # once inside the first test(); steady-state calls are what we time)
        wide = args.w8a8_sites == "all"
        model.set_quant(8, updown=wide, shortcut=wide)
        model.sampler_chunk = args.chunk
        timed("w8a8_chunked_exact")
        model.set_deepcache(k, d)
        timed(f"w8a8_chunked_deepcache_{k}_{d}")
        model.set_deepcache(None)
        if args.ddim:
            S = int(args.ddim)
            model.set_ddim(S, 1.0)
            timed(f"w8a8_ddim_{S}_eta1")
            model.set_deepcache(k, d)
            timed(f"w8a8_ddim_{S}_eta1_deepcache_{k}_{d}")
            model.set_deepcache(None)
            model.set_ddim(None)
        model.set_quant(None)

    if not args.skip_stepwise:
        # stepwise fallback: jitted single step + host loop
        model.sampler_chunk = 0
        from diffsplitting_tpu.diffusion.sr3 import SR3Process  # noqa: F401

        import jax.numpy as jnp

        process, sched = model.process, model.current_sched
        net = model.nets["net"]
        params = model.params
        x = jnp.asarray(rng.normal(
            size=(args.batch, size, size,
                  opt["model"]["diffusion"]["channels"])).astype(np.float32))
        condj = jnp.asarray(cond)

        def one_step(p, key, xx, i):
            dn = lambda a, b: net.apply({"params": p["net"]}, a, b)  # noqa: E731
            return process.p_sample(dn, sched, key, xx, i, condition_x=condj)

        step = jax.jit(one_step)
        key = jax.random.PRNGKey(7)
        t0 = time.perf_counter()
        step(params, key, x, T - 1).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        xx = x
        for i in range(T - 1, -1, -1):
            key = jax.random.fold_in(key, i)
            xx = step(params, key, xx, i)
        np.asarray(xx)
        dt = time.perf_counter() - t0
        row = {"compile_s": compile_s, "calls_s": [dt], "steps_per_s": T / dt}
        results["routes"]["stepwise"] = row
        print("stepwise", json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()

"""On-chip W8A8 serving bench: bf16 vs int8 SR3 reverse chain.

Times the headline protocol (128² SR3 UNet, T-step exact reverse scan,
bench.py's config) through the plain bf16 walker and the W8A8 quantized
walker (models/quant_unet.py), at the same batch. The quantized path runs
the ResnetBlock 3×3 convs as s8×s8→s32 MXU ops with static calibrated
activation scales (v5e peak 394 TOP/s int8 vs 197 TFLOP/s bf16 —
results/probe_int8.json). Also reports the one-forward rel-L2 error of the
quantized net vs bf16 (random-init weights; task-quality numbers on trained
checkpoints live in the quality scripts).

Each sampler returns an in-graph scalar so the timing fetch moves 4 bytes
(block_until_ready is unreliable through the tunnel; CLAUDE.md).

Usage (TPU): python scripts/bench_w8a8.py --batch 32 [--updown] [--ddim S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMG = 128


def timed(fn, *args, reps=2):
    np.asarray(fn(*args))  # compile + warm
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        outs.append(time.perf_counter() - t0)
    return min(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--updown", action="store_true",
                    help="also quantize Down/Upsample convs")
    ap.add_argument("--shortcut", action="store_true",
                    help="also quantize 1×1 shortcut convs")
    ap.add_argument("--attn", action="store_true",
                    help="also quantize the SelfAttention QKV/proj 1×1 convs "
                         "(additive — does NOT imply --updown/--shortcut, "
                         "unlike the CLIs' --w8a8_sites attn superset)")
    ap.add_argument("--ddim", type=int, default=0,
                    help="also bench the S-step respaced DDIM chain both ways")
    ap.add_argument("--deepcache", type=str, default=None, metavar="K,D",
                    help="also bench W8A8 x DeepCache (cached int8 chain, "
                         "refresh interval K, split depth D) vs the bf16 "
                         "cached chain")
    ap.add_argument("--no_walker", action="store_true",
                    help="skip the bf16-walker chain leg (one fewer tunnel "
                         "compile; the production flax baseline is what the "
                         "speedup is quoted against anyway)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny net + T=4 (CPU correctness smoke)")
    ap.add_argument("--out", default=os.path.join(REPO, "results/bench_w8a8.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from diffsplitting_tpu.diffusion import SR3Process, build_ddpm_schedule
    from diffsplitting_tpu.models import UNet
    from diffsplitting_tpu.models.quant_unet import (
        cached_unet_apply,
        collect_act_absmax,
        plain_unet_apply,
        quant_unet_apply,
        quantize_unet_params,
    )
    from diffsplitting_tpu.parallel.mesh import init_on_host
    from diffsplitting_tpu.utils.flops import unet_forward_flops

    if args.smoke:
        img, inner, mults, attn, rb, T = 16, 8, (1, 2), (8,), 1, 4
        groups = 4
    else:
        img, inner, mults, attn, rb, T = IMG, 64, (1, 2, 4, 8, 8), (16,), 2, args.steps
        groups = 32

    net = UNet(in_channel=6, out_channel=3, inner_channel=inner,
               norm_groups=groups, channel_mults=mults, attn_res=attn,
               res_blocks=rb, image_size=img, cond_type="noise_level",
               dtype=jnp.bfloat16)
    process = SR3Process(image_size=img, channels=3, conditional=True)
    sched = build_ddpm_schedule({"schedule": "linear", "n_timestep": T,
                                 "linear_start": 1e-6, "linear_end": 1e-2})

    B = args.batch
    rng = np.random.default_rng(0)
    cond = jax.device_put(rng.normal(size=(B, img, img, 3)).astype(np.float32))
    params = init_on_host(net.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, img, img, 6)), jnp.ones((1,)))["params"]
    # init_on_host leaves the tree on the CPU backend — device_put MUST name
    # the accelerator or the arrays stay CPU-committed and every chain call
    # re-feeds ~360MB of f32 params through the tunnel (~9s/call, measured:
    # the bf16 legs read 12.1s instead of 3.2s until this was explicit)
    params = jax.device_put(params, jax.devices()[0])

    # ---------------------------------------------------------- calibration
    t0 = time.perf_counter()
    K = 8
    ts = np.unique(np.linspace(0, T - 1, K).astype(np.int64))
    gam = np.asarray(sched.sqrt_alphas_cumprod_prev)[ts + 1]
    g = jnp.asarray(gam, jnp.float32)[:, None, None, None]
    eps = jax.random.normal(jax.random.PRNGKey(7), (len(ts), img, img, 3))
    x_t = g * cond[:1] + jnp.sqrt(1 - g * g) * eps
    calib_in = jnp.concatenate([jnp.tile(cond[:1], (len(ts), 1, 1, 1)), x_t], -1)
    calib_t = jnp.asarray(gam, jnp.float32)

    stats_fn = jax.jit(lambda p, x, t: collect_act_absmax(
        net, {"params": p}, x, t)[1])
    stats = {k: float(v) for k, v in
             jax.device_get(stats_fn(params, calib_in, calib_t)).items()}
    qparams = jax.device_put(quantize_unet_params(
        jax.device_get(params), stats,
        updown=args.updown, shortcut=args.shortcut, attn=args.attn))
    calib_s = time.perf_counter() - t0

    # one-forward rel error (random init; trained-ckpt quality is separate)
    fwd_b = jax.jit(lambda p, x, t: plain_unet_apply(net, {"params": p}, x, t))
    fwd_q = jax.jit(lambda p, x, t: quant_unet_apply(net, {"params": p}, x, t))
    yb = np.asarray(fwd_b(params, calib_in, calib_t))
    yq = np.asarray(fwd_q(qparams, calib_in, calib_t))
    rel = float(np.linalg.norm(yq - yb) / max(np.linalg.norm(yb), 1e-9))

    # ------------------------------------------------------------- samplers
    def chain(apply_fn):
        def f(p, c, r):
            d = lambda xx, tt: apply_fn(net, {"params": p}, xx, tt)  # noqa: E731
            img_out = process.p_sample_loop(d, sched, r, c, continuous=False)
            return jnp.sum(img_out.astype(jnp.float32))
        return jax.jit(f)

    key = jax.random.PRNGKey(3)
    rows = {}
    # the PRODUCTION bf16 baseline is the flax forward (what test() serves
    # when model.quant is unset) — time it alongside the walker so the
    # speedup is honest even if the walker and flax compile differently
    flax_apply = lambda n, v, x, t: n.apply(v, x, t)  # noqa: E731
    dt_f = timed(chain(flax_apply), params, cond, key)
    dt_b = dt_f if args.no_walker else timed(
        chain(plain_unet_apply), params, cond, key)
    dt_q = timed(chain(quant_unet_apply), qparams, cond, key)
    fps = unet_forward_flops(image_size=img, in_channel=6, out_channel=3,
                             inner_channel=inner, channel_mults=mults,
                             attn_res=attn, res_blocks=rb, cond=True, batch=B)
    peak = 197e12
    rows["exact"] = {
        "bf16_flax_s": round(dt_f, 3),
        "w8a8_s": round(dt_q, 3),
        "speedup_vs_flax": round(dt_f / dt_q, 3),
        **({} if args.no_walker else {
            "bf16_walker_s": round(dt_b, 3),
            "speedup_vs_walker": round(dt_b / dt_q, 3)}),
        "bf16_steps_per_s": round(T / dt_f, 2),
        "w8a8_steps_per_s": round(T / dt_q, 2),
        "bf16_mfu": round(fps * T / dt_f / peak, 4),
        "w8a8_effective_mfu": round(fps * T / dt_q / peak, 4),
    }
    print("exact:", rows["exact"], flush=True)

    if args.deepcache:
        from diffsplitting_tpu.diffusion.deepcache import cached_p_sample_loop
        from diffsplitting_tpu.models.deepcache import CachedUNet

        iv, depth = (int(v) for v in args.deepcache.split(","))
        cnet = CachedUNet.from_unet(net, depth)

        def dc_chain(quant):
            def f(p, c, r):
                if quant:
                    full = lambda ni, lvl: cached_unet_apply(  # noqa: E731
                        net, {"params": p}, ni, lvl, cache_depth=depth)
                    shal = lambda ni, lvl, deep: cached_unet_apply(  # noqa: E731
                        net, {"params": p}, ni, lvl, deep, cache_depth=depth)
                else:
                    full = lambda ni, lvl: cnet.apply({"params": p}, ni, lvl)  # noqa: E731
                    shal = lambda ni, lvl, deep: cnet.apply(  # noqa: E731
                        {"params": p}, ni, lvl, deep)
                img_out = cached_p_sample_loop(
                    process, sched, r, c, full, shal, interval=iv)
                return jnp.sum(img_out.astype(jnp.float32))
            return jax.jit(f)

        cb = timed(dc_chain(False), params, cond, key)
        cq = timed(dc_chain(True), qparams, cond, key)
        rows[f"deepcache{iv},{depth}"] = {
            "bf16_s": round(cb, 3), "w8a8_s": round(cq, 3),
            "speedup": round(cb / cq, 3),
            "w8a8_vs_bf16_exact": round(dt_f / cq, 3),
            "w8a8_steps_per_s": round(T / cq, 2),
        }
        print(f"deepcache{iv},{depth}:", rows[f"deepcache{iv},{depth}"],
              flush=True)

    if args.ddim:
        from diffsplitting_tpu.diffusion.ddim import ddim_sample_loop

        _lvls = np.asarray(sched.sqrt_alphas_cumprod_prev)
        t_cond = lambda t: _lvls[t + 1]  # noqa: E731

        def dchain(apply_fn):
            def f(p, c, r):
                d = lambda xx, tt: apply_fn(net, {"params": p}, xx, tt)  # noqa: E731
                img_out = ddim_sample_loop(process, d, sched, r, c,
                                           steps=args.ddim, eta=1.0,
                                           t_cond=t_cond)
                return jnp.sum(img_out.astype(jnp.float32))
            return jax.jit(f)

        db = timed(dchain(plain_unet_apply), params, cond, key)
        dq = timed(dchain(quant_unet_apply), qparams, cond, key)
        rows[f"ddim{args.ddim}"] = {
            "bf16_s": round(db, 3), "w8a8_s": round(dq, 3),
            "speedup": round(db / dq, 3),
        }
        print(f"ddim{args.ddim}:", rows[f"ddim{args.ddim}"], flush=True)

    out = {
        "device": str(jax.devices()[0]), "batch": B, "steps": T, "img": img,
        "updown": args.updown, "shortcut": args.shortcut, "attn": args.attn,
        "calib_quantize_s": round(calib_s, 2),
        "one_forward_rel_l2_vs_bf16": round(rel, 5),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()

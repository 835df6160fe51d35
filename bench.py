"""Headline benchmark: reverse-diffusion steps/sec/chip on the 128×128 SR3 UNet.

BASELINE.json's metric: "reverse-diffusion steps/sec/chip at 128×128 UNet";
north star 100-step reverse sampling ≥40% MFU on v5e. The reference never
publishes throughput (its reverse loop is a per-step python loop with host
round-trips, ddpm/diffusion.py:205-237); here the whole 100-step trajectory is
one compiled lax.scan on device.

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec/chip, "unit": ..., "vs_baseline": MFU/0.40}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import os

# persistent compile cache: repeated bench invocations skip the ~5 min
# scan-of-UNet compile
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/dsp_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("DSP_BENCH_BATCH", 32))
STEPS = int(os.environ.get("DSP_BENCH_STEPS", 100))
IMG = 128
# 'bf16' threads explicit bf16 through every conv; 'f32' keeps f32
# params/activations (XLA DEFAULT precision still multiplies in bf16 with f32
# accumulate). Measured on v5e: bf16 102 vs f32 88 steps/s at batch 8.
BENCH_DTYPE = os.environ.get("DSP_BENCH_DTYPE", "bf16")
# v5e (TPU v5 lite) peak bf16 matmul throughput per chip
V5E_PEAK_FLOPS = 197e12
PEAK_BY_GEN = {"v5e": 197e12, "v4": 275e12, "v6e": 918e12}


def detect_peak_flops() -> float:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    for k, v in PEAK_BY_GEN.items():
        if k in gen:
            return v
    return V5E_PEAK_FLOPS


def build():
    from diffsplitting_tpu.diffusion import SR3Process, build_ddpm_schedule
    from diffsplitting_tpu.models import UNet

    net = UNet(
        in_channel=6,
        out_channel=3,
        inner_channel=64,
        norm_groups=32,
        channel_mults=(1, 2, 4, 8, 8),
        attn_res=(16,),
        res_blocks=2,
        dropout=0.0,
        image_size=IMG,
        cond_type="noise_level",
        dtype=jnp.bfloat16 if BENCH_DTYPE == "bf16" else None,
    )
    process = SR3Process(image_size=IMG, channels=3, conditional=True)
    sched = build_ddpm_schedule(
        {"schedule": "linear", "n_timestep": STEPS, "linear_start": 1e-6, "linear_end": 1e-2}
    )

    from diffsplitting_tpu.parallel.mesh import init_on_host

    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    gamma = jnp.full((BATCH,), 0.5, jnp.float32)
    params = init_on_host(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 6)), gamma[:1]
    )
    if BENCH_DTYPE == "bf16" and os.environ.get("DSP_PRECAST") == "1":
        # MEASURED NEGATIVE on v5e (BENCH_NOTES round 2): pre-casting weights
        # to bf16 outside the scan loses 1% (b32) to 8% (b8) — XLA already
        # hoists the loop-invariant converts, and bf16 loop-carried weights
        # get worse layouts. Kept opt-in for other hardware/XLA versions.
        from diffsplitting_tpu.models import cast_unet_params_for_inference

        params = cast_unet_params_for_inference(params)
    params = jax.device_put(params, jax.devices()[0])

    # DSP_W8A8="1"|"all": serve the chain through the int8 MXU walker
    # (models/quant_unet.py; "all" extends coverage to Down/Upsample and 1×1
    # shortcut convs). Measured serving mode (BENCH_NOTES round 3: 1.18×
    # default sites, 1.27× all-sites over the bf16 exact chain at b32, task
    # quality holding on trained checkpoints) — NOT the default headline path.
    w8 = os.environ.get("DSP_W8A8")
    qparams = None
    if w8:
        import numpy as np

        from diffsplitting_tpu.models.quant_unet import (
            collect_act_absmax,
            quantize_unet_params,
        )

        wide = w8.lower() == "all"
        K = 8
        ts = np.unique(np.linspace(0, STEPS - 1, K).astype(np.int64))
        gam = np.asarray(sched.sqrt_alphas_cumprod_prev)[ts + 1]
        g = jnp.asarray(gam, jnp.float32)[:, None, None, None]
        eps = jax.random.normal(jax.random.PRNGKey(7), (len(ts), IMG, IMG, 3))
        x_t = jnp.sqrt(1 - g * g) * eps  # zero-image x0 proxy (random-init net)
        calib_in = jnp.concatenate([jnp.zeros_like(x_t), x_t], -1)
        stats_fn = jax.jit(
            lambda p, xx, tt: collect_act_absmax(net, p, xx, tt)[1]
        )
        stats = {
            k: float(v)
            for k, v in jax.device_get(
                stats_fn(params, calib_in, jnp.asarray(gam, jnp.float32))
            ).items()
        }
        qparams = jax.device_put(
            {
                "params": quantize_unet_params(
                    jax.device_get(params)["params"], stats,
                    updown=wide, shortcut=wide,
                )
            },
            jax.devices()[0],
        )

    # DSP_DEEPCACHE="k[,d]": deep-feature-cached sampling (full refresh every
    # k steps, split at encoder stage d). Approximate serving mode — measured
    # speed + fidelity in BENCH_NOTES; NOT the default headline path.
    dc = os.environ.get("DSP_DEEPCACHE")
    if dc:
        parts = [int(p) for p in dc.split(",")]
        interval, depth = parts[0], (parts[1] if len(parts) > 1 else 2)
        from diffsplitting_tpu.diffusion.deepcache import (
            cached_p_sample_loop,
            make_cached_denoisers,
        )

        if qparams is not None:
            from diffsplitting_tpu.models.quant_unet import cached_unet_apply

            def sample_dc_q(params, cond, rng):
                full = lambda ni, lvl: cached_unet_apply(  # noqa: E731
                    net, params, ni, lvl, cache_depth=depth)
                shallow = lambda ni, lvl, deep: cached_unet_apply(  # noqa: E731
                    net, params, ni, lvl, deep, cache_depth=depth)
                return cached_p_sample_loop(
                    process, sched, rng, cond, full, shallow, interval=interval,
                )

            return jax.jit(sample_dc_q), qparams, x

        def sample_dc(params, cond, rng):
            full, shallow, cnet = make_cached_denoisers(net, params, depth)
            return cached_p_sample_loop(
                process, sched, rng, cond, full, shallow, interval=interval,
            )

        return jax.jit(sample_dc), params, x

    if qparams is not None:
        from diffsplitting_tpu.models.quant_unet import quant_unet_apply

        def sample_q(params, cond, rng):
            denoise = lambda xx, tt: quant_unet_apply(net, params, xx, tt)  # noqa: E731
            return process.p_sample_loop(denoise, sched, rng, cond, continuous=False)

        return jax.jit(sample_q), qparams, x

    def sample(params, cond, rng):
        from diffsplitting_tpu.models import apply_unet

        denoise = lambda xx, tt: apply_unet(net, params, xx, tt)  # noqa: E731
        return process.p_sample_loop(denoise, sched, rng, cond, continuous=False)

    return jax.jit(sample), params, x


def flops_per_step() -> float:
    """Analytic UNet-forward FLOPs per reverse step (batch included).

    XLA cost_analysis() badly under-reports through the remote-compile path,
    so MFU uses the structural count (utils/flops.py).
    """
    from diffsplitting_tpu.utils.flops import unet_forward_flops

    return unet_forward_flops(
        image_size=IMG,
        in_channel=6,
        out_channel=3,
        inner_channel=64,
        channel_mults=(1, 2, 4, 8, 8),
        attn_res=(16,),
        res_blocks=2,
        cond=True,
        batch=BATCH,
    )


def main():
    jfn, params, x = build()
    rng = jax.random.PRNGKey(1)

    # warmup/compile — TWO calls: the first compiles, the second (new key)
    # pays any deferred one-time cost before timing starts (measured: the
    # int8 param tree's first post-compile use costs ~13s through the
    # tunnel — a lazy transfer — which poisoned a 3-rep average to 16.8
    # steps/s when steady-state is 43.9)
    out = jfn(params, x, rng)
    out.block_until_ready()
    out = jfn(params, x, jax.random.fold_in(rng, 999))
    out.block_until_ready()

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = jfn(params, x, jax.random.fold_in(rng, i))
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = STEPS * reps / elapsed
    fps = flops_per_step()
    mfu = (fps * steps_per_sec) / detect_peak_flops() if fps else 0.0

    dc = os.environ.get("DSP_DEEPCACHE")
    dc_tag = f"_deepcache{dc.replace(',', 'x')}" if dc else ""
    w8 = os.environ.get("DSP_W8A8")
    if w8:
        # MFU is then EFFECTIVE MFU: bf16-equivalent FLOPs over the int8 chain
        dc_tag += "_w8a8all" if w8.lower() == "all" else "_w8a8"
    print(
        json.dumps(
            {
                "metric": f"reverse_diffusion_steps_per_sec_chip_{IMG}px_sr3unet_b{BATCH}{dc_tag}",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s/chip",
                "vs_baseline": round(mfu / 0.40, 4) if mfu else None,
                "extra": {
                    "batch": BATCH,
                    "steps": STEPS,
                    "mfu": round(mfu, 4),
                    "flops_per_step": fps,
                    "imgs_per_sec": round(steps_per_sec * BATCH / STEPS, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

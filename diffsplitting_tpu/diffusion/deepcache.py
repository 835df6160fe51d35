"""Deep-feature-cached reverse sampling (DeepCache) — opt-in serving mode.

Wraps the SR3/DDPM conditional reverse chain in one `lax.scan` whose carry
holds, besides x_t, the UNet's deep feature produced by
`models.deepcache.CachedUNet`. Every `interval`-th step runs the FULL UNet
and refreshes the cache; the steps in between run only the shallow levels.
With interval=1 the chain reproduces `process.p_sample_loop` exactly — the
rng splitting mirrors it; equality is bit-level for the clipped SR3/DDPM
chains (tested) and up to compile-fusion rounding in general (two
separately-compiled scans need not round identically in low precision).
Larger intervals trade output fidelity for throughput (BENCH_NOTES).

The reference has no sampler acceleration (per-step python loop,
/root/reference/model/ddpm_modules/diffusion.py:205-237); this is a
beyond-parity TPU feature, following PAPERS.md ("DeepCache", "Faster
Diffusion").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import DDPMProcess
from .indi import InDIProcess
from .sr3 import SR3Process


def make_cached_denoisers(net, variables, cache_depth: int):
    """(apply_full, apply_shallow, cached_net) bound to a trained UNet's
    params. apply_full(net_in, lvl) -> (eps, deep);
    apply_shallow(net_in, lvl, deep) -> (eps, deep)."""
    from diffsplitting_tpu.models.deepcache import CachedUNet

    cnet = CachedUNet.from_unet(net, cache_depth)

    def apply_full(net_in, lvl):
        return cnet.apply(variables, net_in, lvl)

    def apply_shallow(net_in, lvl, deep):
        return cnet.apply(variables, net_in, lvl, deep)

    return apply_full, apply_shallow, cnet


def cached_p_sample_loop(
    process,
    sched,
    rng,
    x_in,
    apply_full,
    apply_shallow,
    interval: int = 1,
    clip_denoised: bool = True,
    refresh_override=None,
):
    """Conditional reverse chain with a deep-feature cache in the scan carry.

    process: SR3Process or DDPMProcess (conditional mode). x_in: condition
    image (NHWC) when the process is conditional, else a static shape tuple
    (B,H,W,C) for unconditional generation (matching p_sample_loop's x_in
    contract). The cache's shape AND dtype are derived from the full forward
    via eval_shape (scan carries must be type-stable; hard-coding a cache
    dtype broke f32 nets). Returns the final image, like
    p_sample_loop(continuous=False).
    """
    assert isinstance(process, (SR3Process, DDPMProcess))
    is_sr3 = isinstance(process, SR3Process)
    T = sched.num_timesteps

    # mirror p_sample_loop's rng discipline exactly (bit-equal at interval=1)
    rng, init_rng = jax.random.split(rng)
    if process.conditional:
        cond = x_in
        shape = cond.shape[:-1] + (process.channels,)
        img = jax.random.normal(init_rng, shape, dtype=cond.dtype)
    else:
        cond = None
        shape = tuple(x_in)
        img = jax.random.normal(init_rng, shape, dtype=jnp.float32)
    b = shape[0]
    step_keys = jax.random.split(rng, T)
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    if refresh_override is not None:
        # traced (T,) int32 refresh flags: lets callers jit ONE program and
        # sweep intervals without recompiling (the flags are scan inputs)
        refresh = refresh_override
    else:
        refresh = np.zeros(T, np.int32)
        refresh[::interval] = 1  # loop iteration 0 always refreshes
        refresh = jnp.asarray(refresh)

    # derive the cache's exact shape AND dtype from the full forward itself
    # (the net's compute dtype decides it — hard-coding bf16 broke f32 nets:
    # scan carries must be type-stable)
    in_ch = shape[-1] + (cond.shape[-1] if cond is not None else 0)
    net_in_sds = jax.ShapeDtypeStruct(shape[:-1] + (in_ch,), img.dtype)
    lvl_sds = jax.ShapeDtypeStruct((b,), img.dtype if is_sr3 else jnp.float32)
    deep_sds = jax.eval_shape(apply_full, net_in_sds, lvl_sds)[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def body(carry, inp):
        x, deep = carry
        key, i, rf = inp
        net_in = x if cond is None else jnp.concatenate([cond, x], axis=-1)
        if is_sr3:
            lvl = jnp.full((b,), sched.sqrt_alphas_cumprod_prev[i + 1], dtype=x.dtype)
            t_arg = i
        else:
            t_full = jnp.full((b,), i, dtype=jnp.int32)
            lvl = t_full.astype(jnp.float32)
            t_arg = t_full
        eps, deep = jax.lax.cond(
            rf > 0,
            lambda op: apply_full(op[0], op[1]),
            lambda op: apply_shallow(op[0], op[1], op[2]),
            (net_in, lvl, deep),
        )
        # reuse the process's exact posterior-step math with the precomputed eps
        x = process.p_sample(
            lambda *_: eps, sched, key, x, t_arg,
            clip_denoised=clip_denoised, condition_x=cond,
        )
        return (x, deep), None

    (final_img, _), _ = jax.lax.scan(body, (img, deep0), (step_keys, ts, refresh))
    return final_img


def cached_ddim_sample_loop(
    process,
    sched,
    rng,
    x_in,
    apply_full,
    apply_shallow,
    steps: int,
    eta: float = 0.0,
    interval: int = 1,
    clip_denoised: bool = True,
    t_cond=None,
    refresh_override=None,
):
    """Respaced DDIM chain (diffusion/ddim.py) with the deep-feature cache
    in the scan carry — the two serving levers composed: S ≪ T steps AND
    shallow-only forwards between refreshes.

    Same x_in/t_cond contract as ddim_sample_loop; same cache/refresh
    semantics as cached_p_sample_loop (interval over the S RESPACED steps;
    interval=1 reproduces ddim_sample_loop up to compile-fusion rounding,
    tested). Returns the final image.
    """
    assert isinstance(process, (SR3Process, DDPMProcess))
    from .ddim import _ddim_setup, _ddim_update

    img, cond, xs = _ddim_setup(process, sched, rng, x_in, steps, eta, t_cond)
    S = int(xs[0].shape[0])
    b = img.shape[0]
    refresh = _refresh_flags(S, interval, refresh_override)

    in_ch = img.shape[-1] + (cond.shape[-1] if cond is not None else 0)
    net_in_sds = jax.ShapeDtypeStruct(img.shape[:-1] + (in_ch,), img.dtype)
    lvl_sds = jax.ShapeDtypeStruct((b,), img.dtype)
    deep_sds = jax.eval_shape(apply_full, net_in_sds, lvl_sds)[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def body(carry, inp):
        x, deep = carry
        key, tc, sr, srm1, sq_ab_prev, sig, dirc, rf = inp
        net_in = x if cond is None else jnp.concatenate([cond, x], axis=-1)
        lvl = jnp.full((b,), tc, x.dtype)
        eps, deep = jax.lax.cond(
            rf > 0,
            lambda op: apply_full(op[0], op[1]),
            lambda op: apply_shallow(op[0], op[1], op[2]),
            (net_in, lvl, deep),
        )
        x = _ddim_update(key, x, eps, sr, srm1, sq_ab_prev, sig, dirc,
                         clip_denoised)
        return (x, deep), None

    (final, _), _ = jax.lax.scan(body, (img, deep0), xs + (refresh,))
    return final


def cached_ddim_sample_loop_chunked(
    process,
    sched,
    rng,
    x_in,
    apply_full_p,
    apply_shallow_p,
    consts,
    steps: int,
    chunk_size: int,
    eta: float = 0.0,
    interval: int = 1,
    clip_denoised: bool = True,
    t_cond=None,
    runner=None,
):
    """`cached_ddim_sample_loop` as ⌈S/K⌉ jitted K-step scans + a host loop
    (the 512²-class shapes whose full program breaks the compiler). The deep
    cache rides the chunk carry; params stay jit ARGUMENTS via
    apply_full_p(consts, net_in, lvl) / apply_shallow_p(consts, net_in, lvl,
    deep) (remote-compile payload limit). Pass a common.ChunkRunner to keep
    the chunk compiles across serving calls."""
    assert isinstance(process, (SR3Process, DDPMProcess))
    from .ddim import _ddim_setup, _ddim_update

    img, cond, xs = _ddim_setup(process, sched, rng, x_in, steps, eta, t_cond)
    S = int(xs[0].shape[0])
    b = img.shape[0]
    refresh = _refresh_flags(S, interval, None)

    in_ch = img.shape[-1] + (cond.shape[-1] if cond is not None else 0)
    net_in_sds = jax.ShapeDtypeStruct(img.shape[:-1] + (in_ch,), img.dtype)
    lvl_sds = jax.ShapeDtypeStruct((b,), img.dtype)
    deep_sds = jax.eval_shape(
        lambda c, ni, lvl: apply_full_p(c, ni, lvl), consts, net_in_sds, lvl_sds
    )[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def step_fn(cc, carry, inp):
        p, c = cc
        x, deep = carry
        key, tc, sr, srm1, sq_ab_prev, sig, dirc, rf = inp
        net_in = x if c is None else jnp.concatenate([c, x], axis=-1)
        lvl = jnp.full((b,), tc, x.dtype)
        eps, deep = jax.lax.cond(
            rf > 0,
            lambda op: apply_full_p(p, op[0], op[1]),
            lambda op: apply_shallow_p(p, op[0], op[1], op[2]),
            (net_in, lvl, deep),
        )
        x = _ddim_update(key, x, eps, sr, srm1, sq_ab_prev, sig, dirc,
                         clip_denoised)
        return (x, deep)

    from .common import chunked_reverse_scan

    (final, _) = chunked_reverse_scan(
        step_fn, (consts, cond), (img, deep0), xs + (refresh,),
        chunk_size, runner=runner,
    )
    return final


def cached_p_sample_loop_chunked(
    process,
    sched,
    rng,
    x_in,
    apply_full_p,
    apply_shallow_p,
    consts,
    interval: int = 1,
    clip_denoised: bool = True,
    chunk_size: int = 100,
    runner=None,
):
    """`cached_p_sample_loop` as ⌈T/K⌉ jitted K-step scans + a host loop.

    Composes the two round-3 serving features: the deep-feature cache rides
    the chunk carry, so chains whose full-T program breaks the compiler (the
    512²×2000 SR3 chain, CLAUDE.md) still get DeepCache. Identical rng
    discipline → bit-identical math to the single-scan cached loop.

    apply_full_p(consts, net_in, lvl) / apply_shallow_p(consts, net_in, lvl,
    deep): params-as-argument appliers — `consts` (the param tree) is a jit
    ARGUMENT of every chunk, never a closure capture (remote-compile payload
    limit, chunked_reverse_scan docstring).
    """
    assert isinstance(process, (SR3Process, DDPMProcess))
    assert process.conditional
    is_sr3 = isinstance(process, SR3Process)
    T = sched.num_timesteps
    b = x_in.shape[0]

    rng, init_rng = jax.random.split(rng)
    cond = x_in
    shape = cond.shape[:-1] + (process.channels,)
    img = jax.random.normal(init_rng, shape, dtype=cond.dtype)
    step_keys = jax.random.split(rng, T)
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    refresh = _refresh_flags(T, interval, None)

    net_in_sds = jax.ShapeDtypeStruct(
        cond.shape[:-1] + (cond.shape[-1] + process.channels,), img.dtype
    )
    lvl_sds = jax.ShapeDtypeStruct((b,), img.dtype if is_sr3 else jnp.float32)
    deep_sds = jax.eval_shape(
        lambda c, ni, lvl: apply_full_p(c, ni, lvl), consts, net_in_sds, lvl_sds
    )[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def step_fn(cc, carry, inp):
        p, c = cc
        x, deep = carry
        key, i, rf = inp
        net_in = jnp.concatenate([c, x], axis=-1)
        if is_sr3:
            lvl = jnp.full((b,), sched.sqrt_alphas_cumprod_prev[i + 1], dtype=x.dtype)
            t_arg = i
        else:
            t_full = jnp.full((b,), i, dtype=jnp.int32)
            lvl = t_full.astype(jnp.float32)
            t_arg = t_full
        eps, deep = jax.lax.cond(
            rf > 0,
            lambda op: apply_full_p(p, op[0], op[1]),
            lambda op: apply_shallow_p(p, op[0], op[1], op[2]),
            (net_in, lvl, deep),
        )
        x = process.p_sample(
            lambda *_: eps, sched, key, x, t_arg,
            clip_denoised=clip_denoised, condition_x=c,
        )
        return (x, deep)

    from .common import chunked_reverse_scan

    final_img, _ = chunked_reverse_scan(
        step_fn, (consts, cond), (img, deep0), (step_keys, ts, refresh),
        chunk_size, runner=runner,
    )
    return final_img


def _refresh_flags(N: int, interval: int, refresh_override):
    if refresh_override is not None:
        return refresh_override
    refresh = np.zeros(N, np.int32)
    refresh[::interval] = 1
    return jnp.asarray(refresh)


def cached_indi_inference(
    process: InDIProcess,
    rng,
    x_in,
    apply_full,
    apply_shallow,
    interval: int = 1,
    num_timesteps=None,
    t_float_start: float = 1.0,
    refresh_override=None,
):
    """InDI bridge inversion with a deep-feature cache in the scan carry.

    Mirrors `InDIProcess.inference(continuous=False)` (indi.py:152-198) —
    identical rng discipline, so interval=1 matches the exact chain. The
    fork's iterative protocol runs N up to 50 reverse steps
    (EvaluateJointIndiIterative.ipynb), where caching pays; at N=1 there is
    nothing to cache.
    """
    N = int(num_timesteps if num_timesteps is not None else process.num_timesteps)
    assert not process.conditional

    x_in = jnp.tile(x_in, (1, 1, 1, process.out_channel))
    rng, init_rng = jax.random.split(rng)
    x_t = x_in + jax.random.normal(init_rng, x_in.shape, x_in.dtype) * (
        process.get_t_times_e(jnp.float32(t_float_start))
    )

    delta = t_float_start / N
    b = x_in.shape[0]
    step_keys = jax.random.split(rng, N)
    cur_ts = t_float_start - delta * jnp.arange(N, dtype=jnp.float32)
    refresh = _refresh_flags(N, interval, refresh_override)

    deep_sds = jax.eval_shape(
        apply_full,
        jax.ShapeDtypeStruct(x_t.shape, x_t.dtype),
        jax.ShapeDtypeStruct((b,), x_t.dtype),
    )[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def body(carry, inp):
        x, deep = carry
        key, t_cur, rf = inp
        t_vec = jnp.full((b,), t_cur, dtype=x.dtype)
        x0, deep = jax.lax.cond(
            rf > 0,
            lambda op: apply_full(op[0], op[1]),
            lambda op: apply_shallow(op[0], op[1], op[2]),
            (x, t_vec, deep),
        )
        noise = jax.random.normal(key, x.shape, x.dtype) * process.get_t_times_e(
            t_cur - delta
        )
        x = (delta / t_cur) * x0 + (1 - delta / t_cur) * x + noise
        return (x, deep), None

    (final_x, _), _ = jax.lax.scan(body, (x_t, deep0), (step_keys, cur_ts, refresh))
    return final_x


def cached_joint_indi_inference(
    joint_process,
    rng,
    x_in,
    ch1_appliers,
    ch2_appliers,
    interval: int = 1,
    num_timesteps=None,
    t_float_start: float = 0.5,
):
    """JointInDI inference with per-channel deep-feature caches.

    ch*_appliers: (apply_full, apply_shallow) pairs from
    `make_cached_denoisers` bound to each channel's UNet. Mirrors
    `JointInDIProcess.inference` (joint_indi.py:112-131) rng splitting.
    """
    rng1, rng2 = jax.random.split(rng)
    ch1 = cached_indi_inference(
        joint_process.indi1, rng1, x_in, *ch1_appliers, interval=interval,
        num_timesteps=num_timesteps, t_float_start=t_float_start,
    )
    ch2 = cached_indi_inference(
        joint_process.indi2, rng2, x_in, *ch2_appliers, interval=interval,
        num_timesteps=num_timesteps, t_float_start=1 - t_float_start,
    )
    return jnp.concatenate([ch1, ch2], axis=-1)

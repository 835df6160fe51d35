"""Deep-feature-cached reverse sampling (DeepCache) — opt-in serving mode.

Wraps the SR3/DDPM conditional reverse chain in one `lax.scan` whose carry
holds, besides x_t, the UNet's deep feature produced by
`models.deepcache.CachedUNet`. Every `interval`-th step runs the FULL UNet
and refreshes the cache; the steps in between run only the shallow levels.
With interval=1 the chain is BIT-IDENTICAL to `process.p_sample_loop`
(tested) — the rng splitting mirrors it exactly; larger intervals trade
output fidelity for throughput (measured in BENCH_NOTES).

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
    deep_shape=None,  # unused (kept for call-site compat); derived by eval_shape
    interval: int = 1,
    clip_denoised: bool = True,
    deep_dtype=None,  # unused (kept for call-site compat)
    refresh_override=None,
):
    """Conditional reverse chain with a deep-feature cache in the scan carry.

    process: SR3Process or DDPMProcess (conditional mode). x_in: condition
    image (NHWC). deep_shape: CachedUNet.deep_shape(batch). Returns the final
    image, like p_sample_loop(continuous=False).
    """
    assert isinstance(process, (SR3Process, DDPMProcess))
    assert process.conditional, "deepcache sampling is for the conditional path"
    is_sr3 = isinstance(process, SR3Process)
    T = sched.num_timesteps
    b = x_in.shape[0]

    # mirror p_sample_loop's rng discipline exactly (bit-equal at interval=1)
    rng, init_rng = jax.random.split(rng)
    cond = x_in
    shape = cond.shape[:-1] + (process.channels,)
    img = jax.random.normal(init_rng, shape, dtype=cond.dtype)
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
    net_in_sds = jax.ShapeDtypeStruct(
        cond.shape[:-1] + (cond.shape[-1] + process.channels,), img.dtype
    )
    lvl_sds = jax.ShapeDtypeStruct((b,), img.dtype if is_sr3 else jnp.float32)
    deep_sds = jax.eval_shape(apply_full, net_in_sds, lvl_sds)[1]
    deep0 = jnp.zeros(deep_sds.shape, deep_sds.dtype)

    def body(carry, inp):
        x, deep = carry
        key, i, rf = inp
        net_in = jnp.concatenate([cond, x], axis=-1)
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

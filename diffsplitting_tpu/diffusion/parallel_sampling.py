"""Parallel-in-time (Picard) sampling for the InDI bridge.

Sequential InDI inference applies N dependent steps
    x_{i+1} = (δ/t_i)·D(x_i, t_i) + (1 - δ/t_i)·x_i + ε_i·e·(t_i - δ)
(reference indi.py:62-95). Following the Picard-iteration idea of
"Parallel Sampling of Diffusion Models" (Shih et al., 2023) / "Accelerating
Parallel Sampling" (PAPERS.md), the whole trajectory is instead treated as a
fixed point of the sweep operator

    X'_{i+1} = F_i(X_i)   for all i simultaneously,

where each sweep evaluates the denoiser on ALL N timesteps as one batched
(N·B) forward — MXU-friendly — and the per-step noises ε_i are drawn once
and frozen so the fixed point equals the sequential trajectory exactly.
After sweep k, entries 0..k are exact, so ≤N sweeps reproduce the sequential
sampler bit-for-bit; in practice the iteration converges in K ≪ N sweeps
(wall-clock speedup ≈ N/K when N·B fills the chip).

TPU framing: trades sequential latency for batch parallelism — the same
throughput-for-latency exchange the hardware favors.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddpm import DDPMProcess
from .indi import InDIProcess
from .schedules import DDPMSchedule


def indi_inference_parallel(
    process: InDIProcess,
    denoise_fn: Callable,
    rng,
    x_in: jnp.ndarray,
    num_timesteps: int,
    t_float_start: float = 1.0,
    num_sweeps: Optional[int] = None,
    tol: float = 1e-4,
):
    """Parallel-in-time InDI inference.

    Args:
      num_sweeps: fixed sweep count (None → iterate until max|ΔX| < tol,
        capped at N sweeps — the exact-convergence bound).
      Returns the final image (B, H, W, C·out_channel), matching
      `InDIProcess.inference(..., continuous=False)` for the same rng.
    """
    N = int(num_timesteps)
    x_in = jnp.tile(x_in, (1, 1, 1, process.out_channel))
    rng, init_rng = jax.random.split(rng)
    x_t = x_in + jax.random.normal(init_rng, x_in.shape, x_in.dtype) * process.get_t_times_e(
        jnp.float32(t_float_start)
    )

    delta = t_float_start / N
    b = x_in.shape[0]
    ts = t_float_start - delta * jnp.arange(N, dtype=jnp.float32)  # (N,)

    # frozen per-step noises (matching the sequential sampler's RNG layout
    # would require the identical split sequence; parallel mode draws its own)
    step_keys = jax.random.split(rng, N)
    noises = jax.vmap(
        lambda k, t: jax.random.normal(k, x_t.shape, x_t.dtype)
        * process.get_t_times_e(t - delta)
    )(step_keys, ts)  # (N, B, H, W, C)

    def sweep(X):
        """X: (N+1, B, H, W, C) current trajectory estimate -> next estimate."""
        xs = X[:-1]  # (N, ...) inputs to each step
        flat = xs.reshape((N * b,) + xs.shape[2:])
        t_vec = jnp.repeat(ts, b).astype(flat.dtype)
        x0 = denoise_fn(flat, t_vec).reshape(xs.shape)
        coef = (delta / ts).reshape(N, 1, 1, 1, 1)
        nxt = coef * x0 + (1 - coef) * xs + noises
        return jnp.concatenate([X[0:1], nxt], axis=0)

    X0 = jnp.broadcast_to(x_t[None], (N + 1,) + x_t.shape)

    if num_sweeps is not None:
        def body(_, X):
            return sweep(X)

        X = jax.lax.fori_loop(0, int(num_sweeps), body, X0)
        return X[-1]

    def cond(state):
        X, prev_delta, k = state
        return jnp.logical_and(k < N, prev_delta > tol)

    def body(state):
        X, _, k = state
        Xn = sweep(X)
        d = jnp.max(jnp.abs(Xn - X))
        return (Xn, d, k + 1)

    X, _, _ = jax.lax.while_loop(cond, body, (X0, jnp.float32(jnp.inf), 0))
    return X[-1]


def ddpm_sample_parallel(
    process: DDPMProcess,
    denoise_fn: Callable,
    sched: DDPMSchedule,
    rng,
    x_in,
    clip_denoised: bool = True,
    condition_x=None,
    num_sweeps: Optional[int] = None,
    tol: float = 1e-3,
    t_cond: Optional[Callable] = None,
):
    """Parallel-in-time DDPM/SR3-style ancestral sampling.

    `t_cond` maps the (K,) int32 timestep vector to the per-step conditioning
    the denoiser expects — default raw t as float32 (DDPM nets,
    ddpm.py:91); SR3 nets need the noise level
    `sched.sqrt_alphas_cumprod_prev[t + 1]` (sr3.py:60).

    The ancestral chain x_{t-1} = μθ(x_t, t) + σ_t·ε_t with FROZEN per-step
    noises ε_t is a deterministic map once the ε are drawn, so the Picard
    fixed point equals a sequential chain using the same noises. Each sweep
    batches all T denoiser evaluations (T·B images) — best suited to
    low-batch serving where the chip is under-utilized per step.

    x_in: the conditioning image when `condition_x is None and
    process.conditional` (it is then used as the condition), else the initial
    noise shape source. Returns the final image (B, H, W, C).
    """
    T = sched.num_timesteps
    if t_cond is None:
        t_cond = lambda t: t.astype(jnp.float32)  # noqa: E731
    rng, init_rng = jax.random.split(rng)
    if process.conditional:
        cond = x_in if condition_x is None else condition_x
        shape = cond.shape[:-1] + (process.channels,)
        img0 = jax.random.normal(init_rng, shape, dtype=cond.dtype)
    else:
        cond = None
        shape = tuple(x_in) if isinstance(x_in, (tuple, list)) else x_in.shape
        img0 = jax.random.normal(init_rng, shape, dtype=jnp.float32)
    b = shape[0]

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)  # loop order T-1..0
    step_keys = jax.random.split(rng, T)
    noises = jax.vmap(lambda k: jax.random.normal(k, shape, img0.dtype))(step_keys)
    nonzero = (ts > 0).astype(img0.dtype).reshape(T, 1, 1, 1, 1)

    logvar = sched.posterior_log_variance_clipped[ts].reshape(T, 1, 1, 1, 1)
    sigma = jnp.exp(0.5 * logvar) * nonzero

    def sweep(X):
        xs = X[:-1]  # (T, B, H, W, C)
        flat = xs.reshape((T * b,) + xs.shape[2:])
        tc_flat = jnp.repeat(t_cond(ts), b)
        if cond is not None:
            cond_flat = jnp.tile(cond, (T, 1, 1, 1))
            net_in = jnp.concatenate([cond_flat, flat], axis=-1)
        else:
            net_in = flat
        eps = denoise_fn(net_in, tc_flat).reshape(xs.shape)
        x0 = (
            sched.sqrt_recip_alphas_cumprod[ts].reshape(T, 1, 1, 1, 1) * xs
            - sched.sqrt_recipm1_alphas_cumprod[ts].reshape(T, 1, 1, 1, 1) * eps
        )
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            sched.posterior_mean_coef1[ts].reshape(T, 1, 1, 1, 1) * x0
            + sched.posterior_mean_coef2[ts].reshape(T, 1, 1, 1, 1) * xs
        )
        nxt = mean + sigma * noises
        return jnp.concatenate([X[0:1], nxt], axis=0)

    X0 = jnp.broadcast_to(img0[None], (T + 1,) + img0.shape)

    if num_sweeps is not None:
        X = jax.lax.fori_loop(0, int(num_sweeps), lambda _, X: sweep(X), X0)
        return X[-1]

    def cond_fn(state):
        X, prev_delta, k = state
        return jnp.logical_and(k < T, prev_delta > tol)

    def body(state):
        X, _, k = state
        Xn = sweep(X)
        return (Xn, jnp.max(jnp.abs(Xn - X)), k + 1)

    X, _, _ = jax.lax.while_loop(cond_fn, body, (X0, jnp.float32(jnp.inf), 0))
    return X[-1]


# --------------------------------------------------------------------------
# Sliding-window Picard (ParaDiGMS): the practical variant for long chains.
#
# Full-trajectory Picard above carries (T+1, B, ...) state and sweeps all T
# steps every iteration — at T=2000 that is ~3 GB of carry and each sweep
# costs a T·B forward, so it only fits short InDI chains. The sliding-window
# form of Shih et al. 2023 keeps a W-step window anchored at pointer p:
# every sweep batches the W steps as one (W·B) forward (MXU-sized even at
# B=1), then the window start advances past the leading positions whose
# update moved less than tau·sigma_t^2 per pixel (the paper's criterion;
# position p+1 is always exact after a sweep, so progress >= 1/sweep and
# tau=0 degenerates to the bit-exact sequential chain). Per-step noises are
# regenerated inside the sweep from fold_in(key, step) so the fixed point is
# well-defined without materializing a (T, B, H, W, C) noise buffer.
# --------------------------------------------------------------------------


def _sliding_window_loop(step_window, noise_var, T, W, x0, tau, trailing=None):
    """Generic windowed-Picard driver.

    Args:
      step_window: (xs (W,B,...), gidx (W,) int32 global step indices) ->
        new states (W,B,...): applies step k to xs[j] for k = gidx[j]
        (vectorized; indices arrive clamped to T-1).
      noise_var: (W,) -> per-pixel noise variance sigma_k^2 of each step —
        the convergence tolerance scale.
      x0: (B, ...) initial state (x at step 0).
      tau: relative tolerance; 0 -> exact sequential behavior.
      trailing: unused hook for API symmetry (kept None).

    Returns (final state (B, ...), sweeps run).
    """
    B = x0.shape[0]
    Xw0 = jnp.broadcast_to(x0[None], (W + 1,) + x0.shape)
    j = jnp.arange(W, dtype=jnp.int32)

    def cond(state):
        _, p, _ = state
        return p < T

    def body(state):
        Xw, p, sweeps = state
        gidx = jnp.minimum(p + j, T - 1)  # (W,)
        new = step_window(Xw[:W], gidx)  # (W, B, ...)
        # per-sample mean-squared update distance vs the current estimate
        err = jnp.max(
            jnp.mean(
                (new - Xw[1:]).reshape(W, B, -1).astype(jnp.float32) ** 2,
                axis=-1,
            ),
            axis=-1,
        )  # (W,)
        tol = tau * noise_var(gidx).astype(jnp.float32)  # (W,)
        conv = err <= tol
        conv = conv.at[0].set(True)  # leading step is exact after the sweep
        a = jnp.sum(jnp.cumprod(conv.astype(jnp.int32)))
        a = jnp.minimum(a, T - p)
        U = jnp.concatenate([Xw[0:1], new], axis=0)  # (W+1, B, ...)
        take = jnp.minimum(jnp.arange(W + 1, dtype=jnp.int32) + a, W)
        Xw2 = U[take]  # slide; tail replicates the last estimate
        return (Xw2, p + a, sweeps + 1)

    Xw, _, sweeps = jax.lax.while_loop(cond, body, (Xw0, jnp.int32(0), jnp.int32(0)))
    return Xw[0], sweeps


def ddpm_sample_sliding_window(
    process: DDPMProcess,
    denoise_fn: Callable,
    sched: DDPMSchedule,
    rng,
    x_in,
    window: int = 64,
    tau: float = 0.1,
    clip_denoised: bool = True,
    condition_x=None,
    t_cond: Optional[Callable] = None,
):
    """Sliding-window parallel ancestral sampling (DDPM/SR3 reverse chain).

    Same chain semantics as `DDPMProcess.p_sample_loop` (reference
    ddpm_modules/diffusion.py:204-218 / sr3_modules/diffusion.py:198-218)
    with frozen fold_in noises; tau=0 reproduces that frozen-noise sequential
    chain exactly (tested), tau>0 trades bounded per-step drift for fewer
    sweeps. Intended regime: low-batch serving, where a B-image forward
    leaves the chip idle and the (W·B)-image sweep fills it.

    `t_cond` maps the (W,) int32 timestep vector to the denoiser's per-step
    conditioning — default raw t as float32 (DDPM nets, ddpm.py:91); SR3
    nets need the noise level `sched.sqrt_alphas_cumprod_prev[t + 1]`
    (sr3.py:60).

    Returns (img (B, H, W, C), sweeps).
    """
    T = sched.num_timesteps
    if t_cond is None:
        t_cond = lambda t: t.astype(jnp.float32)  # noqa: E731
    rng, init_rng = jax.random.split(rng)
    if process.conditional:
        cond = x_in if condition_x is None else condition_x
        shape = cond.shape[:-1] + (process.channels,)
        img0 = jax.random.normal(init_rng, shape, dtype=cond.dtype)
    else:
        cond = None
        shape = tuple(x_in) if isinstance(x_in, (tuple, list)) else x_in.shape
        img0 = jax.random.normal(init_rng, shape, dtype=jnp.float32)
    b = shape[0]
    W = int(window)

    # step k of the loop applies timestep t = T-1-k
    ts_all = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    logvar = sched.posterior_log_variance_clipped
    if cond is not None:
        cond_w = jnp.tile(cond, (W, 1, 1, 1))

    def step_window(xs, gidx):
        t = ts_all[gidx]  # (W,)
        flat = xs.reshape((W * b,) + xs.shape[2:])
        tc_flat = jnp.repeat(t_cond(t), b)
        net_in = flat if cond is None else jnp.concatenate([cond_w, flat], axis=-1)
        eps = denoise_fn(net_in, tc_flat).reshape(xs.shape)
        r = lambda v: v[t].reshape(W, 1, 1, 1, 1)  # noqa: E731
        x0 = r(sched.sqrt_recip_alphas_cumprod) * xs - r(sched.sqrt_recipm1_alphas_cumprod) * eps
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = r(sched.posterior_mean_coef1) * x0 + r(sched.posterior_mean_coef2) * xs
        sigma = jnp.exp(0.5 * r(logvar)) * (t > 0).reshape(W, 1, 1, 1, 1)
        noise = jax.vmap(
            lambda g: jax.random.normal(jax.random.fold_in(rng, g), xs.shape[1:], img0.dtype)
        )(gidx)
        return mean + sigma * noise

    def noise_var(gidx):
        t = ts_all[gidx]
        return jnp.exp(logvar[t]) * (t > 0)

    return _sliding_window_loop(step_window, noise_var, T, W, img0, tau)


def indi_inference_sliding_window(
    process: InDIProcess,
    denoise_fn: Callable,
    rng,
    x_in: jnp.ndarray,
    num_timesteps: int,
    t_float_start: float = 1.0,
    window: int = 16,
    tau: float = 0.1,
):
    """Sliding-window parallel InDI bridge inference (reference indi.py:62-95
    chain semantics, frozen fold_in noises; tau=0 == that sequential chain).

    Returns (img (B, H, W, C·out_channel), sweeps).
    """
    N = int(num_timesteps)
    W = int(window)
    x_in = jnp.tile(x_in, (1, 1, 1, process.out_channel))
    rng, init_rng = jax.random.split(rng)
    x0 = x_in + jax.random.normal(init_rng, x_in.shape, x_in.dtype) * process.get_t_times_e(
        jnp.float32(t_float_start)
    )
    delta = t_float_start / N
    b = x_in.shape[0]
    ts_all = t_float_start - delta * jnp.arange(N, dtype=jnp.float32)  # (N,)

    def step_window(xs, gidx):
        t = ts_all[gidx]  # (W,)
        flat = xs.reshape((W * b,) + xs.shape[2:])
        t_flat = jnp.repeat(t, b).astype(flat.dtype)
        pred = denoise_fn(flat, t_flat).reshape(xs.shape)
        coef = (delta / t).reshape(W, 1, 1, 1, 1)
        scale = jax.vmap(lambda tt: process.get_t_times_e(tt - delta))(t).reshape(W, 1, 1, 1, 1)
        noise = jax.vmap(
            lambda g: jax.random.normal(jax.random.fold_in(rng, g), xs.shape[1:], xs.dtype)
        )(gidx)
        return coef * pred + (1 - coef) * xs + scale * noise

    def noise_var(gidx):
        t = ts_all[gidx]
        return jax.vmap(lambda tt: process.get_t_times_e(tt - delta) ** 2)(t)

    return _sliding_window_loop(step_window, noise_var, N, W, x0, tau)

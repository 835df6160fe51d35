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
):
    """Parallel-in-time DDPM/SR3-style ancestral sampling.

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
        t_flat = jnp.repeat(ts, b)
        if cond is not None:
            cond_flat = jnp.tile(cond, (T, 1, 1, 1))
            net_in = jnp.concatenate([cond_flat, flat], axis=-1)
        else:
            net_in = flat
        eps = denoise_fn(net_in, t_flat.astype(jnp.float32)).reshape(xs.shape)
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

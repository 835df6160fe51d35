"""SR3-style Gaussian diffusion (continuous √ᾱ noise-level conditioning).

Behavior parity with /root/reference/model/sr3_modules/diffusion.py:
  * training (:224-249): one scalar t ~ U[1,T] per batch, then per-sample
    γ ~ U(√ᾱ_{t-1}, √ᾱ_t); x_noisy = γ·x0 + √(1-γ²)·ε; the net is conditioned
    on γ (not the integer step); loss vs ε with reduction='sum' (:84-90).
  * reverse (:151-175): one scalar t for the whole batch; the net sees
    noise_level = √ᾱ_{t+1} (note the +1: sqrt_alphas_cumprod_prev has length
    T+1 with leading 1.0); x0-clip, posterior step, no noise at t=0.
  * trajectory frames every `1 | (T//10)` steps (:177-203).

TPU-native: NHWC, lax.scan reverse loop, explicit PRNG.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import capture_plan, make_loss_fn, scan_with_trajectory
from .schedules import DDPMSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class SR3Process:
    def __init__(
        self,
        image_size: int,
        channels: int = 3,
        loss_type: str = "l1",
        lr_reduction: Optional[str] = None,  # accepted for factory-parity; SR3 always sums
        conditional: bool = True,
    ):
        self.image_size = image_size
        self.channels = channels
        self.conditional = conditional
        self.loss_type = loss_type
        self.loss_fn = make_loss_fn(loss_type, "sum")

    # ---------------------------------------------------------------- forward
    def q_sample(self, x_start, continuous_sqrt_alpha_cumprod, noise):
        gamma = continuous_sqrt_alpha_cumprod
        return gamma * x_start + jnp.sqrt(1.0 - gamma**2) * noise

    # ---------------------------------------------------------------- reverse
    def predict_start_from_noise(self, sched: DDPMSchedule, x_t, t, noise):
        # scalar-t indexing (sr3 diffusion.py:141-143)
        return sched.sqrt_recip_alphas_cumprod[t] * x_t - sched.sqrt_recipm1_alphas_cumprod[t] * noise

    def q_posterior(self, sched: DDPMSchedule, x_start, x_t, t):
        posterior_mean = sched.posterior_mean_coef1[t] * x_start + sched.posterior_mean_coef2[t] * x_t
        posterior_log_variance = sched.posterior_log_variance_clipped[t]
        return posterior_mean, posterior_log_variance

    def p_mean_variance(self, denoise_fn, sched, x, t, clip_denoised: bool, condition_x=None):
        b = x.shape[0]
        noise_level = jnp.full((b,), sched.sqrt_alphas_cumprod_prev[t + 1], dtype=x.dtype)
        if condition_x is not None:
            net_in = jnp.concatenate([condition_x, x], axis=-1)
        else:
            net_in = x
        x_recon = self.predict_start_from_noise(sched, x, t=t, noise=denoise_fn(net_in, noise_level))
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior(sched, x_start=x_recon, x_t=x, t=t)

    def p_sample(self, denoise_fn, sched, rng, x, t, clip_denoised=True, condition_x=None):
        model_mean, model_log_variance = self.p_mean_variance(
            denoise_fn, sched, x=x, t=t, clip_denoised=clip_denoised, condition_x=condition_x
        )
        noise = jnp.where(t > 0, jax.random.normal(rng, x.shape, x.dtype), jnp.zeros(x.shape, x.dtype))
        return model_mean + noise * jnp.exp(0.5 * model_log_variance)

    def p_sample_loop(self, denoise_fn, sched, rng, x_in, clip_denoised=True, continuous=False):
        """Reverse trajectory as one lax.scan (reference: python loop :177-203)."""
        T = sched.num_timesteps
        sample_inter = 1 | (T // 10)

        rng, init_rng = jax.random.split(rng)
        if self.conditional:
            x = x_in
            shape = x.shape[:-1] + (self.channels,)
            img = jax.random.normal(init_rng, shape, dtype=x.dtype)
            init_frame = jnp.tile(x, (1, 1, 1, self.channels // x.shape[-1]))
            cond = x
        else:
            shape = tuple(x_in)
            img = jax.random.normal(init_rng, shape, dtype=jnp.float32)
            init_frame = img
            cond = None

        markers = list(range(T - 1, -1, -1))
        step_keys = jax.random.split(rng, T)
        ts = jnp.asarray(markers, dtype=jnp.int32)

        def step(x, _, inp):
            key, i = inp
            x = self.p_sample(denoise_fn, sched, key, x, i, clip_denoised=clip_denoised, condition_x=cond)
            return x, None

        if not continuous:
            def body(x, inp):
                x, _ = step(x, None, inp)
                return x, None

            final_img, _ = jax.lax.scan(body, img, (step_keys, ts))
            return final_img

        flags, slots = capture_plan(markers, sample_inter, include_last=False)
        _, _, frames = scan_with_trajectory(step, img, init_frame, (step_keys, ts), flags, slots)
        return frames

    def p_sample_loop_chunked(
        self, denoise_apply, params, sched, rng, x_in, chunk_size: int,
        clip_denoised: bool = True, runner=None,
    ):
        """`p_sample_loop(continuous=False)` as ⌈T/K⌉ jitted K-step scans.

        Bit-identical to the single scan (same pre-split step keys, same step
        body); for shapes whose full-T program breaks the compiler — the
        512²×2000 chain (CLAUDE.md). `denoise_apply(params, x, t)` keeps
        params/condition as jit arguments (chunked_reverse_scan docstring).
        """
        T = sched.num_timesteps
        rng, init_rng = jax.random.split(rng)
        if self.conditional:
            shape = x_in.shape[:-1] + (self.channels,)
            img = jax.random.normal(init_rng, shape, dtype=x_in.dtype)
            cond = x_in
        else:
            shape = tuple(x_in)
            img = jax.random.normal(init_rng, shape, dtype=jnp.float32)
            cond = None
        step_keys = jax.random.split(rng, T)
        ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

        def step_fn(consts, x, inp):
            p, c = consts
            key, i = inp
            dn = lambda xx, tt: denoise_apply(p, xx, tt)  # noqa: E731
            return self.p_sample(
                dn, sched, key, x, i, clip_denoised=clip_denoised, condition_x=c
            )

        from .common import chunked_reverse_scan

        return chunked_reverse_scan(step_fn, (params, cond), img, (step_keys, ts),
                                    chunk_size, runner=runner)

    def sample(self, denoise_fn, sched, rng, batch_size=1, continuous=False):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        return self.p_sample_loop(denoise_fn, sched, rng, shape, continuous=continuous)

    def super_resolution(self, denoise_fn, sched, rng, x_in, clip_denoised=True, continuous=False):
        return self.p_sample_loop(denoise_fn, sched, rng, x_in, clip_denoised, continuous)

    # ---------------------------------------------------------------- training
    def p_losses(self, denoise_fn, sched: DDPMSchedule, rng, batch):
        x_start = batch["target"]
        b = x_start.shape[0]
        t_rng, g_rng, n_rng = jax.random.split(rng, 3)
        # one scalar step per batch, then per-sample gamma in [√ᾱ_{t-1}, √ᾱ_t]
        t = jax.random.randint(t_rng, (), 1, sched.num_timesteps + 1)
        lo = sched.sqrt_alphas_cumprod_prev[t - 1]
        hi = sched.sqrt_alphas_cumprod_prev[t]
        gamma = jax.random.uniform(g_rng, (b,), dtype=x_start.dtype, minval=0.0, maxval=1.0)
        gamma = lo + gamma * (hi - lo)

        noise = jax.random.normal(n_rng, x_start.shape, dtype=x_start.dtype)
        x_noisy = self.q_sample(x_start, gamma.reshape(-1, 1, 1, 1), noise)

        if self.conditional:
            net_in = jnp.concatenate([batch["input"], x_noisy], axis=-1)
        else:
            net_in = x_noisy
        x_recon = denoise_fn(net_in, gamma)
        return self.loss_fn(noise, x_recon)

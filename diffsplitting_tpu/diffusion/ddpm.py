"""Vanilla DDPM Gaussian diffusion (noise prediction, integer-timestep conditioning).

Behavior parity with /root/reference/model/ddpm_modules/diffusion.py:
  * training loss: t ~ U[0,T), eps-prediction, L1/L2 against the injected noise
    (:285-300); conditional nets see concat(input, x_noisy) on channels.
  * reverse: predict_start_from_noise (:163), q_posterior (:169), optional
    clip of x0 to [-1,1] (:187), ancestral step with no noise at t=0 (:194-203).
  * p_sample_loop keeps a trajectory frame every `1 | (T//10)` steps (:205-237).

TPU-native differences:
  * NHWC layout; channel concatenation on axis -1.
  * the whole reverse loop is one `jax.lax.scan` over a jitted step — no
    per-step host round-trips; the trajectory buffer lives on device.
  * explicit PRNG keys instead of global torch RNG state.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import capture_plan, make_loss_fn, scan_with_trajectory
from .schedules import DDPMSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x_nhwc, t_vec) -> eps/x0


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample schedule values and broadcast to image rank."""
    return a[t].reshape(t.shape[0], *([1] * (ndim - 1)))


class DDPMProcess:
    """Pure-function DDPM over a `DDPMSchedule`; the denoiser is a closure."""

    def __init__(
        self,
        image_size: int,
        channels: int = 3,
        loss_type: str = "l1",
        lr_reduction: Optional[str] = None,
        conditional: bool = True,
    ):
        self.image_size = image_size
        self.channels = channels
        self.conditional = conditional
        self.loss_type = loss_type
        # reference defaults lr_reduction to 'sum' when unset (diffusion.py:96-98)
        self.lr_reduction = lr_reduction if lr_reduction is not None else "sum"
        self.loss_fn = make_loss_fn(self.loss_type, self.lr_reduction)

    # ---------------------------------------------------------------- forward
    def q_mean_variance(self, sched: DDPMSchedule, x_start, t):
        mean = extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = extract(1.0 - sched.alphas_cumprod, t, x_start.ndim)
        log_variance = extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, sched: DDPMSchedule, x_start, t, noise):
        return (
            extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    # ---------------------------------------------------------------- reverse
    def predict_start_from_noise(self, sched: DDPMSchedule, x_t, t, noise):
        return (
            extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def q_posterior(self, sched: DDPMSchedule, x_start, x_t, t):
        posterior_mean = (
            extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        posterior_variance = extract(sched.posterior_variance, t, x_t.ndim)
        posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
        return posterior_mean, posterior_variance, posterior_log_variance

    def p_mean_variance(
        self, denoise_fn: DenoiseFn, sched: DDPMSchedule, x, t, clip_denoised: bool, condition_x=None
    ):
        if condition_x is not None:
            net_in = jnp.concatenate([condition_x, x], axis=-1)
        else:
            net_in = x
        x_recon = self.predict_start_from_noise(
            sched, x, t=t, noise=denoise_fn(net_in, t.astype(jnp.float32))
        )
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return self.q_posterior(sched, x_start=x_recon, x_t=x, t=t)

    def p_sample(
        self,
        denoise_fn: DenoiseFn,
        sched: DDPMSchedule,
        rng,
        x,
        t,
        clip_denoised: bool = True,
        condition_x=None,
    ):
        model_mean, _, model_log_variance = self.p_mean_variance(
            denoise_fn, sched, x=x, t=t, clip_denoised=clip_denoised, condition_x=condition_x
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero_mask = (1.0 - (t == 0).astype(x.dtype)).reshape(-1, *([1] * (x.ndim - 1)))
        return model_mean + nonzero_mask * jnp.exp(0.5 * model_log_variance) * noise

    def p_sample_loop(
        self,
        denoise_fn: DenoiseFn,
        sched: DDPMSchedule,
        rng,
        x_in,
        clip_denoised: bool = True,
        continuous: bool = False,
    ):
        """Full reverse trajectory as one lax.scan.

        x_in: conditioning image (NHWC) when self.conditional, else a shape
        tuple (B,H,W,C) for unconditional generation.

        Returns frames of shape (n_frames, B, H, W, C) when continuous else the
        final image (B, H, W, C). Frame 0 is the pre-loop seed — the condition
        tiled to `channels` (conditional, diffusion.py:228) or the initial
        noise (unconditional, :212-214).
        """
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
        b = shape[0]

        def step(x, _, inp):
            key, i = inp
            t_vec = jnp.full((b,), i, dtype=jnp.int32)
            x = self.p_sample(
                denoise_fn, sched, key, x, t_vec, clip_denoised=clip_denoised, condition_x=cond
            )
            return x, None

        if not continuous:
            # no trajectory buffer: plain scan, final image only
            def body(x, inp):
                x, _ = step(x, None, inp)
                return x, None

            final_img, _ = jax.lax.scan(body, img, (step_keys, ts))
            return final_img

        flags, slots = capture_plan(markers, sample_inter, include_last=False)
        _, _, frames = scan_with_trajectory(
            step, img, init_frame, (step_keys, ts), flags, slots
        )
        return frames

    def p_sample_loop_chunked(
        self, denoise_apply, params, sched, rng, x_in, chunk_size: int,
        clip_denoised: bool = True, runner=None,
    ):
        """`p_sample_loop(continuous=False)` as ⌈T/K⌉ jitted K-step scans —
        bit-identical math, bounded compile units (see SR3Process's twin and
        common.chunked_reverse_scan). Pass a common.ChunkRunner to reuse the
        chunk compiles across calls (serving)."""
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
        b = shape[0]

        def step_fn(consts, x, inp):
            p, c = consts
            key, i = inp
            t_vec = jnp.full((b,), i, dtype=jnp.int32)
            dn = lambda xx, tt: denoise_apply(p, xx, tt)  # noqa: E731
            return self.p_sample(
                dn, sched, key, x, t_vec, clip_denoised=clip_denoised, condition_x=c
            )

        from .common import chunked_reverse_scan

        return chunked_reverse_scan(step_fn, (params, cond), img, (step_keys, ts),
                                    chunk_size, runner=runner)

    def sample(self, denoise_fn, sched, rng, batch_size=1, continuous=False):
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        return self.p_sample_loop(denoise_fn, sched, rng, shape, continuous=continuous)

    def interpolate(self, denoise_fn, sched, rng, x1, x2, t: Optional[int] = None, lam: float = 0.5):
        """Noise two images to level t, mix, and denoise back (diffusion.py:249-264)."""
        assert x1.shape == x2.shape
        T = sched.num_timesteps
        t = T - 1 if t is None else t
        b = x1.shape[0]
        rng, n1, n2 = jax.random.split(rng, 3)
        t_vec = jnp.full((b,), t, dtype=jnp.int32)
        xt1 = self.q_sample(sched, x1, t_vec, jax.random.normal(n1, x1.shape, x1.dtype))
        xt2 = self.q_sample(sched, x2, t_vec, jax.random.normal(n2, x2.shape, x2.dtype))
        img = (1 - lam) * xt1 + lam * xt2

        step_keys = jax.random.split(rng, t)
        ts = jnp.arange(t - 1, -1, -1, dtype=jnp.int32)

        def body(x, inp):
            key, i = inp
            t_vec = jnp.full((b,), i, dtype=jnp.int32)
            return self.p_sample(denoise_fn, sched, key, x, t_vec), None

        img, _ = jax.lax.scan(body, img, (step_keys, ts))
        return img

    # ---------------------------------------------------------------- training
    def p_losses(self, denoise_fn: DenoiseFn, sched: DDPMSchedule, rng, batch):
        """Training loss. batch = {'target': NHWC, 'input': NHWC (if conditional)}."""
        x_start = batch["target"]
        b = x_start.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(n_rng, x_start.shape, dtype=x_start.dtype)
        x_noisy = self.q_sample(sched, x_start, t, noise)
        if self.conditional:
            net_in = jnp.concatenate([batch["input"], x_noisy], axis=-1)
        else:
            net_in = x_noisy
        x_recon = denoise_fn(net_in, t.astype(jnp.float32))
        return self.loss_fn(noise, x_recon)

"""InDI — Inversion by Direct Iteration: deterministic-bridge diffusion.

Behavior parity with /root/reference/model/ddpm_modules/indi.py:
  * forward bridge (:116-124): x_t = (1-t)·x_start + t·x_end + ε·(t·e), with
    t ∈ (0,1] continuous per-sample and perturbation magnitude
    `get_t_times_e` (:106-110): gaussian/none → e·t, brownian → e·√t.
  * t-sampling strategies (:126-150): uniform / uniform_in_range
    (t ∈ {(2T)//3..T}/T, :139-140) / linear_ramp / quadratic_ramp /
    linear_indi (uniform over {1..T-1}/T then snap to max with prob
    1-1/(a+1)); the joint-InDI variants (joint_indi.py:10-36) restrict the
    range and snap to T/2.
  * training target is x0-prediction (:152-172): loss(x_start, net(x_t, t)).
  * inference (:62-95): x_{t-δ} = (δ/t)·x̂0 + (1-δ/t)·x_t + ε·e·(t-δ), N
    uniform steps down from t_float_start; frames every `1 | (N//20)` steps
    plus the final step.

The reference hardcodes e / t_sampling_mode / linear_indi_a / noise_mode in
__init__ (:32-39); here they are constructor args surfaced in the config
schema (SURVEY.md §2.7).

TPU-native: NHWC, lax.scan inference loop, explicit PRNG.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .common import capture_plan, make_loss_fn, scan_with_trajectory

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

T_VARIANTS = ("base", "custom_t", "full_translation")


class InDIProcess:
    def __init__(
        self,
        image_size: int,
        channels: int = 3,
        loss_type: str = "l1",
        out_channel: int = 2,
        lr_reduction: Optional[str] = None,
        conditional: bool = True,
        e: float = 0.01,
        t_sampling_mode: str = "linear_indi",
        linear_indi_a: float = 1.0,
        noise_mode: str = "gaussian",
        t_variant: str = "base",
        num_timesteps: Optional[int] = None,
        val_num_timesteps: Optional[int] = None,
    ):
        assert t_sampling_mode in (
            "uniform", "uniform_in_range", "linear_ramp", "quadratic_ramp", "linear_indi"
        )
        assert noise_mode in ("gaussian", "brownian", "none")
        assert t_variant in T_VARIANTS
        self.image_size = image_size
        self.channels = channels
        self.out_channel = out_channel
        self.conditional = conditional
        self.loss_type = loss_type
        self.lr_reduction = lr_reduction if lr_reduction is not None else "sum"
        self.loss_fn = make_loss_fn(self.loss_type, self.lr_reduction)
        self.e = 0.0 if noise_mode == "none" else e
        self.t_sampling_mode = t_sampling_mode
        self.linear_indi_a = linear_indi_a
        self.noise_mode = noise_mode
        self.t_variant = t_variant
        self.num_timesteps = num_timesteps
        self.val_num_timesteps = val_num_timesteps

    # ------------------------------------------------------------- noise scale
    def get_t_times_e(self, t):
        if self.noise_mode in ("gaussian", "none"):
            return self.e * t
        # brownian
        return self.e * jnp.sqrt(t)

    # ------------------------------------------------------------- forward
    def q_sample(self, x_start, x_end, t, noise):
        """Bridge mixture; t is (B,) or broadcastable, in (0, 1]."""
        t = jnp.asarray(t)
        if t.ndim == 1:
            t = t.reshape(-1, 1, 1, 1)
        return (1 - t) * x_start + t * x_end + noise * self.get_t_times_e(t)

    def sample_t(self, rng, batch_size: int, num_timesteps: int):
        """Draw per-sample t_float per the configured strategy + variant."""
        T = num_timesteps
        mode = self.t_sampling_mode
        if self.t_variant == "custom_t":
            # joint_indi.py:10-22 — t ∈ {1..T/2}/T with snap to 0.5
            assert mode == "linear_indi"
            assert T % 2 == 0, "num_timesteps must be even for the custom-T variant"
            maxv = T // 2
            t = jax.random.randint(rng, (batch_size,), 1, maxv)
            t = self._snap_to_max(rng, t, maxv)
        elif self.t_variant == "full_translation":
            # joint_indi.py:24-36 — t ∈ {1..T-1}/T with snap to 0.5
            assert mode == "linear_indi"
            assert T % 2 == 0
            maxv = T // 2
            t = jax.random.randint(rng, (batch_size,), 1, T)
            t = self._snap_to_max(rng, t, maxv)
        elif mode == "linear_indi":
            maxv = T
            t = jax.random.randint(rng, (batch_size,), 1, maxv)
            t = self._snap_to_max(rng, t, maxv)
        elif mode == "uniform":
            t = jax.random.randint(rng, (batch_size,), 1, T + 1)
        elif mode == "uniform_in_range":
            # indi.py:139-140 — t ∈ {(2T)//3 .. T}
            t = jax.random.randint(rng, (batch_size,), (2 * T) // 3, T + 1)
        elif mode == "linear_ramp":
            p = jnp.arange(T, dtype=jnp.float32)
            t = jax.random.choice(rng, T, (batch_size,), p=p / p.sum())
        elif mode == "quadratic_ramp":
            p = jnp.arange(T, dtype=jnp.float32) ** 2
            t = jax.random.choice(rng, T, (batch_size,), p=p / p.sum())
        else:  # pragma: no cover
            raise NotImplementedError(mode)
        return t.astype(jnp.float32) / num_timesteps

    def _snap_to_max(self, rng, t, maxv):
        """With prob 1 - 1/(a+1), replace t by maxv (indi.py:141-147)."""
        alpha = 1.0 / (self.linear_indi_a + 1.0)
        snap_rng = jax.random.fold_in(rng, 1)
        probab = jax.random.uniform(snap_rng, t.shape)
        return jnp.where(probab > alpha, maxv, t)

    # ------------------------------------------------------------- training
    def get_prediction_during_training(self, denoise_fn, rng, batch, num_timesteps: int):
        x_start = batch["target"]
        x_end = jnp.tile(batch["input"], (1, 1, 1, self.out_channel))
        b = x_start.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        t_float = self.sample_t(t_rng, b, num_timesteps)
        noise = jax.random.normal(n_rng, x_start.shape, dtype=x_start.dtype)
        x_noisy = self.q_sample(x_start, x_end, t_float, noise)
        assert not self.conditional, "InDI is an unconditional bridge (indi.py:163)"
        return denoise_fn(x_noisy, t_float)

    def p_losses(self, denoise_fn, rng, batch, num_timesteps: Optional[int] = None):
        T = num_timesteps if num_timesteps is not None else self.num_timesteps
        x_recon = self.get_prediction_during_training(denoise_fn, rng, batch, T)
        return self.loss_fn(batch["target"], x_recon)

    # ------------------------------------------------------------- inference
    def inference(
        self,
        denoise_fn: DenoiseFn,
        rng,
        x_in,
        continuous: bool = False,
        num_timesteps: Optional[int] = None,
        t_float_start: float = 1.0,
    ):
        """Bridge inversion from t_float_start down to 0 in N uniform steps.

        Returns (n_frames, B, H, W, C) when continuous else (B, H, W, C).
        Frame 0 is the noised input at t_start (indi.py:82-85).
        """
        N = int(num_timesteps if num_timesteps is not None else self.num_timesteps)
        sample_inter = 1 | (N // 20)
        assert not self.conditional

        x_in = jnp.tile(x_in, (1, 1, 1, self.out_channel))
        rng, init_rng = jax.random.split(rng)
        x_t = x_in + jax.random.normal(init_rng, x_in.shape, x_in.dtype) * self.get_t_times_e(
            jnp.float32(t_float_start)
        )

        delta = t_float_start / N
        b = x_in.shape[0]

        markers = list(range(N))
        step_keys = jax.random.split(rng, N)
        # cur_t at entry of step idx: t_start - idx*delta (float32 to match device math)
        cur_ts = t_float_start - delta * jnp.arange(N, dtype=jnp.float32)

        def step(x, _, inp):
            key, t_cur = inp
            t_vec = jnp.full((b,), t_cur, dtype=x.dtype)
            x0 = denoise_fn(x, t_vec)
            noise = jax.random.normal(key, x.shape, x.dtype) * self.get_t_times_e(t_cur - delta)
            x = (delta / t_cur) * x0 + (1 - delta / t_cur) * x + noise
            return x, None

        if not continuous:
            def body(x, inp):
                x, _ = step(x, None, inp)
                return x, None

            final_x, _ = jax.lax.scan(body, x_t, (step_keys, cur_ts))
            return final_x

        flags, slots = capture_plan(markers, sample_inter, include_last=True)
        _, _, frames = scan_with_trajectory(step, x_t, x_t, (step_keys, cur_ts), flags, slots)
        return frames

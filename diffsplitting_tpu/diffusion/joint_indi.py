"""Joint InDI — two bridge models, one per fluorescence channel, trained jointly.

Behavior parity with /root/reference/model/ddpm_modules/joint_indi.py:
  * training (:103-120): model 1 sees {target: ch0, input: ch1}, model 2 the
    swap; each learns to recover its channel from a (1-t)·self + t·other
    mixture; the loss is the mean of the two per-channel losses.
  * t-sampling uses the custom-T variant (t ∈ (0,0.5], snap to 0.5) or the
    full-translation variant (t ∈ (0,1), snap to 0.5) when
    `allow_full_translation` (:61, networks.py:111).
  * inference (:131-135): model 1 inverts from t_float_start (default 0.5),
    model 2 from 1 - t_float_start; outputs concat on channels.
  * the reference also carries learnable-but-unused alpha/offset/scale scalars
    that it logs each step (:82-84,117-119); `init_extra_params` reproduces
    them so checkpoints and log dicts stay shape-compatible.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .indi import InDIProcess

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class JointInDIProcess:
    def __init__(
        self,
        image_size: int,
        channels: int = 3,
        loss_type: str = "l1",
        out_channel: int = 2,
        lr_reduction: Optional[str] = None,
        conditional: bool = True,
        e: float = 0.01,
        w_input_loss: float = 0.0,
        allow_full_translation: bool = False,
        num_timesteps: Optional[int] = None,
        val_num_timesteps: Optional[int] = None,
        t_sampling_mode: str = "linear_indi",
        linear_indi_a: float = 1.0,
        noise_mode: str = "gaussian",
    ):
        variant = "full_translation" if allow_full_translation else "custom_t"
        kwargs = dict(
            image_size=image_size,
            channels=channels,
            loss_type=loss_type,
            out_channel=out_channel,
            lr_reduction=lr_reduction,
            conditional=conditional,
            e=e,
            t_sampling_mode=t_sampling_mode,
            linear_indi_a=linear_indi_a,
            noise_mode=noise_mode,
            t_variant=variant,
            num_timesteps=num_timesteps,
            val_num_timesteps=val_num_timesteps,
        )
        self.indi1 = InDIProcess(**kwargs)
        self.indi2 = InDIProcess(**kwargs)
        self.w_input_loss = w_input_loss
        self.num_timesteps = num_timesteps
        self.val_num_timesteps = val_num_timesteps
        self.out_channel = out_channel

    @staticmethod
    def init_extra_params():
        """alpha/offset/scale scalars (logged but unused in the loss)."""
        return {
            "alpha_param": jnp.zeros(()),
            "offset_param": jnp.zeros(()),
            "scale_param": jnp.ones(()),
        }

    @staticmethod
    def extra_param_logs(extra_params):
        return {
            "alpha": jax.nn.sigmoid(extra_params["alpha_param"]),
            "offset": extra_params["offset_param"],
            "scale": extra_params["scale_param"],
        }

    def p_losses(
        self,
        denoise_fn_ch1: DenoiseFn,
        denoise_fn_ch2: DenoiseFn,
        rng,
        batch,
        num_timesteps: Optional[int] = None,
    ):
        """Returns (loss, aux_logs). batch['target'] is NHWC with 2 channels."""
        T = num_timesteps if num_timesteps is not None else self.num_timesteps
        target = batch["target"]
        x_in_ch1 = {"target": target[..., 0:1], "input": target[..., 1:2]}
        x_in_ch2 = {"target": target[..., 1:2], "input": target[..., 0:1]}

        rng1, rng2 = jax.random.split(rng)
        recon1 = self.indi1.get_prediction_during_training(denoise_fn_ch1, rng1, x_in_ch1, T)
        recon2 = self.indi2.get_prediction_during_training(denoise_fn_ch2, rng2, x_in_ch2, T)

        loss_ch1 = self.indi1.loss_fn(x_in_ch1["target"], recon1)
        loss_ch2 = self.indi2.loss_fn(x_in_ch2["target"], recon2)
        loss_splitting = (loss_ch1 + loss_ch2) / 2
        # w_input_loss multiplies a constant 0.0 in the reference (:113,120)
        loss = loss_splitting + self.w_input_loss * 0.0
        return loss, {"loss_splitting": loss_splitting}

    def inference(
        self,
        denoise_fn_ch1: DenoiseFn,
        denoise_fn_ch2: DenoiseFn,
        rng,
        x_in,
        continuous: bool = False,
        num_timesteps: Optional[int] = None,
        t_float_start: float = 0.5,
    ):
        rng1, rng2 = jax.random.split(rng)
        ch1 = self.indi1.inference(
            denoise_fn_ch1, rng1, x_in, continuous=continuous,
            num_timesteps=num_timesteps, t_float_start=t_float_start,
        )
        ch2 = self.indi2.inference(
            denoise_fn_ch2, rng2, x_in, continuous=continuous,
            num_timesteps=num_timesteps, t_float_start=1 - t_float_start,
        )
        return jnp.concatenate([ch1, ch2], axis=-1)

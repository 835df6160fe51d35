"""Generator factory: config -> (diffusion process, Flax net(s)).

Parity with /root/reference/model/networks.py:91-180 (`define_G`):
`model.which_model_G` ∈ {ddpm, sr3, indi, joint_indi} selects the
(process, UNet-flavor) pair; joint_indi builds two UNets. norm_groups
defaults to 32 when unset (:95-96). The reference initializes orthogonally at
train start (:174-176) — here orthogonal init is baked into the modules
(models/blocks.py), so no post-init pass is needed.

Reference rot fixed here (SURVEY.md §2.7): define_G passes out_channel /
lr_reduction / val_schedule_opt to the ddpm & sr3 classes whose __init__ does
not accept them (TypeError on those paths upstream); our processes accept the
full uniform signature. InDI's hardcoded e / t-sampling knobs (indi.py:32-39)
are exposed under `model.indi.*`.
"""

from __future__ import annotations

from typing import Dict, Tuple

from diffsplitting_tpu.diffusion import (
    DDPMProcess,
    InDIProcess,
    JointInDIProcess,
    SR3Process,
)
from diffsplitting_tpu.models import UNet


def _unet_kwargs(model_opt, cond_type: str, dtype=None) -> dict:
    unet = model_opt["unet"]
    norm_groups = unet.get("norm_groups") or 32
    if dtype is None and model_opt.get("compute_dtype") == "bfloat16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    return dict(
        remat=bool(model_opt.get("remat", False)),
        remat_min_res=int(model_opt.get("remat_min_res") or 0),
        in_channel=unet["in_channel"],
        out_channel=unet["out_channel"],
        inner_channel=unet["inner_channel"],
        norm_groups=norm_groups,
        channel_mults=tuple(unet["channel_multiplier"]),
        attn_res=tuple(unet["attn_res"] or ()),
        res_blocks=unet["res_blocks"],
        dropout=unet["dropout"] or 0.0,
        image_size=model_opt["diffusion"]["image_size"],
        cond_type=cond_type,
        dtype=dtype,
    )


def define_generator(opt, dtype=None) -> Tuple[object, Dict[str, UNet]]:
    """Returns (process, nets) where nets maps role -> flax Module."""
    model_opt = opt["model"]
    which = model_opt["which_model_G"]
    diffusion_opt = model_opt["diffusion"]
    sched_opt = model_opt["beta_schedule"]

    common = dict(
        image_size=diffusion_opt["image_size"],
        channels=diffusion_opt["channels"],
        # the reference's sr_* configs omit loss_type; its diffusion classes
        # default to 'l1' (ddpm diffusion.py:84, sr3 diffusion.py:70)
        loss_type=model_opt.get("loss_type") or "l1",
        lr_reduction=model_opt.get("lr_reduction"),
        conditional=diffusion_opt["conditional"],
    )
    indi_opt = model_opt.get("indi") or {}
    indi_extra = dict(
        e=indi_opt.get("e", 0.01),
        t_sampling_mode=indi_opt.get("t_sampling_mode", "linear_indi"),
        linear_indi_a=indi_opt.get("linear_indi_a", 1.0),
        noise_mode=indi_opt.get("noise_mode", "gaussian"),
        num_timesteps=int(sched_opt["train"]["n_timestep"]),
        val_num_timesteps=int(sched_opt["val"]["n_timestep"]),
    )

    if which == "ddpm":
        process = DDPMProcess(**common)
        nets = {"net": UNet(**_unet_kwargs(model_opt, "time", dtype))}
    elif which == "sr3":
        process = SR3Process(**common)
        nets = {"net": UNet(**_unet_kwargs(model_opt, "noise_level", dtype))}
    elif which == "indi":
        process = InDIProcess(
            out_channel=model_opt["unet"]["out_channel"], **common, **indi_extra
        )
        nets = {"net": UNet(**_unet_kwargs(model_opt, "time", dtype))}
    elif which == "joint_indi":
        process = JointInDIProcess(
            out_channel=model_opt["unet"]["out_channel"],
            w_input_loss=model_opt.get("w_input_loss") or 0.0,
            allow_full_translation=bool(model_opt.get("allow_full_translation", False)),
            **common,
            **indi_extra,
        )
        kw = _unet_kwargs(model_opt, "time", dtype)
        nets = {"net_ch1": UNet(**kw), "net_ch2": UNet(**kw)}
    else:
        raise NotImplementedError(f"Generator model [{which}] not recognized")

    return process, nets

"""Reference torch `.pth` checkpoint → flax params import shim.

The reference saves `netG.state_dict()` as `I{iter}_E{epoch}_gen.pth`
(/root/reference/model/model.py:130-152), where netG is the DIFFUSION
WRAPPER, so the on-disk roots per `which_model_G` are:

  * ddpm / sr3 — 12 schedule buffers (`betas`, `alphas_cumprod`, …;
    sr3_modules/diffusion.py:111-154) + `denoise_fn.<unet keys>`,
  * indi — `denoise_fn.<unet keys>` (InDI registers no schedule buffers),
  * joint_indi — `indi1.denoise_fn.*` / `indi2.denoise_fn.*` +
    `alpha_param`/`offset_param`/`scale_param` scalars
    (joint_indi.py:62-84).

`_strip_root` normalizes the first two (schedule buffers are recomputed
from config on load, never read from checkpoints); raw-UNet state dicts
(e.g. `best_time_predictor.pth`-style saves) pass through unchanged.
The UNet walker follows the reference naming scheme — `downs.*` / `mid.*` /
`ups.*` lists with `res_block.block{1,2}.block.{0,3}`,
`noise_func.noise_func.0` (SR3) or `mlp.1` (DDPM), `attn.{norm,qkv,out}`,
`final_conv.block.{0,3}` (sr3_modules/unet.py:161-259,
ddpm_modules/unet.py:147-243) — and emits the matching
`models.unet.UNet` flax params pytree, so users can resume or evaluate
reference-trained checkpoints on TPU without retraining.

Layout conversions: torch Conv2d OIHW → flax HWIO; torch Linear (out,in) →
flax (in,out); GroupNorm weight/bias → gn_scale/gn_bias.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


# registered by set_new_noise_schedule (sr3_modules/diffusion.py:111-154 /
# ddpm_modules/diffusion.py:111-154); recomputed from config, never imported
SCHEDULE_BUFFERS = frozenset(
    {
        "betas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    }
)


def _strip_root(sd) -> Dict:
    """Normalize a state dict to raw-UNet keys: strip DataParallel's
    `module.` and the diffusion wrapper's `denoise_fn.` roots, drop schedule
    buffers."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    if any(k.startswith("denoise_fn.") for k in sd):
        return {
            k[len("denoise_fn."):]: v
            for k, v in sd.items()
            if k.startswith("denoise_fn.")
        }
    return {k: v for k, v in sd.items() if k not in SCHEDULE_BUFFERS}


def _conv(sd, name, bias=True) -> Dict:
    w = np.asarray(sd[f"{name}.weight"])  # (O, I, kh, kw)
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return out


def _dense(sd, name) -> Dict:
    w = np.asarray(sd[f"{name}.weight"])  # (out, in)
    return {
        "kernel": jnp.asarray(w.T),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
    }


def _block(sd, name) -> Dict:
    return {
        "gn_scale": jnp.asarray(np.asarray(sd[f"{name}.block.0.weight"])),
        "gn_bias": jnp.asarray(np.asarray(sd[f"{name}.block.0.bias"])),
        "Conv_0": _conv(sd, f"{name}.block.3"),
    }


def _resblock(sd, name, cond_type, has_res_conv) -> Dict:
    out = {"Block_0": _block(sd, f"{name}.block1"),
           "Block_1": _block(sd, f"{name}.block2")}
    if cond_type == "time":
        out["Dense_0"] = _dense(sd, f"{name}.mlp.1")
    elif cond_type == "noise_level":
        out["FeatureWiseAffine_0"] = {
            "Dense_0": _dense(sd, f"{name}.noise_func.noise_func.0")
        }
    if has_res_conv:
        out["Conv_0"] = _conv(sd, f"{name}.res_conv")
    return out


def _attention(sd, name) -> Dict:
    return {
        "GroupNorm_0": {
            "scale": jnp.asarray(np.asarray(sd[f"{name}.norm.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.norm.bias"])),
        },
        "Conv_0": _conv(sd, f"{name}.qkv", bias=False),
        "Conv_1": _conv(sd, f"{name}.out"),
    }


def torch_state_dict_to_flax(sd, net) -> Dict:
    """Reference `*_gen.pth` state dict → {'params': ...} for models.unet.UNet.

    `net` supplies the static config (must match the checkpoint's
    architecture; shape mismatches raise). Accepts raw-UNet,
    `denoise_fn.`-rooted (the reference's actual ddpm/sr3/indi `*_gen.pth`
    layout) and DataParallel `module.`-prefixed state dicts."""
    sd = _strip_root(sd)
    params: Dict = {}
    cond = net.cond_type

    if cond == "time":
        mlp = "time_mlp"
    elif cond == "noise_level":
        mlp = "noise_level_mlp"
    else:
        mlp = None
    if mlp is not None:
        params["Dense_0"] = _dense(sd, f"{mlp}.1")
        params["Dense_1"] = _dense(sd, f"{mlp}.3")

    def rbwa(tname, dim_in, dim_out, with_attn) -> Dict:
        out = {"ResnetBlock_0": _resblock(sd, f"{tname}.res_block", cond,
                                          dim_in != dim_out)}
        if with_attn:
            out["SelfAttention_0"] = _attention(sd, f"{tname}.attn")
        return out

    num_mults = len(net.channel_mults)
    now_res = net.image_size
    pre = net.inner_channel
    feat_channels = [pre]
    rbwa_i = 0
    down_i = 0
    up_i = 0

    params["Conv_0"] = _conv(sd, "downs.0")  # stem
    t_i = 1
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        use_attn = now_res in net.attn_res
        cm = net.inner_channel * net.channel_mults[ind]
        for _ in range(net.res_blocks):
            params[f"ResnetBlockWithAttn_{rbwa_i}"] = rbwa(
                f"downs.{t_i}", pre, cm, use_attn)
            rbwa_i += 1
            t_i += 1
            pre = cm
            feat_channels.append(cm)
        if not is_last:
            params[f"Downsample_{down_i}"] = {
                "Conv_0": _conv(sd, f"downs.{t_i}.conv")
            }
            down_i += 1
            t_i += 1
            feat_channels.append(pre)
            now_res //= 2

    params[f"ResnetBlockWithAttn_{rbwa_i}"] = rbwa("mid.0", pre, pre, True)
    params[f"ResnetBlockWithAttn_{rbwa_i + 1}"] = rbwa("mid.1", pre, pre, False)
    rbwa_i += 2

    t_i = 0
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        use_attn = now_res in net.attn_res
        cm = net.inner_channel * net.channel_mults[ind]
        for _ in range(net.res_blocks + 1):
            skip = feat_channels.pop()
            params[f"ResnetBlockWithAttn_{rbwa_i}"] = rbwa(
                f"ups.{t_i}", pre + skip, cm, use_attn)
            rbwa_i += 1
            t_i += 1
            pre = cm
        if not is_last:
            params[f"Upsample_{up_i}"] = {"Conv_0": _conv(sd, f"ups.{t_i}.conv")}
            up_i += 1
            t_i += 1
            now_res *= 2
    assert not feat_channels

    params["Block_0"] = _block(sd, "final_conv")
    return {"params": params}


def is_joint_indi_state_dict(sd) -> bool:
    """Whether a state dict uses JointIndi's `indi1./indi2.` root
    (joint_indi.py:62-84)."""
    return any(
        k.removeprefix("module.").startswith("indi1.denoise_fn.") for k in sd
    )


def joint_indi_state_dict_to_flax(sd, net_ch1, net_ch2) -> Dict:
    """Reference JointIndi `*_gen.pth` → flax params for both channel UNets
    plus the alpha/offset/scale extra scalars.

    The result's top level matches DiffusionModel's joint param tree:
    {'net_ch1': ..., 'net_ch2': ..., 'extra': {alpha_param, offset_param,
    scale_param}} (the reference trains-but-never-uses the scalars,
    joint_indi.py:82-84,117-119; importing them keeps log-dict parity)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    sub1 = {k[len("indi1."):]: v for k, v in sd.items() if k.startswith("indi1.")}
    sub2 = {k[len("indi2."):]: v for k, v in sd.items() if k.startswith("indi2.")}
    if not sub1 or not sub2:
        raise ValueError(
            "not a JointIndi state dict (missing indi1./indi2. roots); "
            f"got roots {sorted({k.split('.')[0] for k in sd})}"
        )
    params = {
        "net_ch1": torch_state_dict_to_flax(sub1, net_ch1)["params"],
        "net_ch2": torch_state_dict_to_flax(sub2, net_ch2)["params"],
        "extra": {
            k: jnp.asarray(np.asarray(sd[k]))
            for k in ("alpha_param", "offset_param", "scale_param")
        },
    }
    return {"params": params}


def _resolve_pth(path: str) -> str:
    import os

    if not os.path.exists(path) and os.path.exists(path + "_gen.pth"):
        path = path + "_gen.pth"
    return path


def load_reference_checkpoint(path: str, net) -> Dict:
    """Load an `I*_E*_gen.pth` (or `<prefix>` → `<prefix>_gen.pth`) into flax
    variables for `net` (single-UNet models: ddpm/sr3/indi)."""
    import torch

    sd = torch.load(_resolve_pth(path), map_location="cpu", weights_only=True)
    if is_joint_indi_state_dict(sd):
        raise ValueError(
            f"{path} is a joint_indi checkpoint; load it with "
            "load_reference_joint_checkpoint (needs both channel nets)"
        )
    return torch_state_dict_to_flax(sd, net)


def load_reference_joint_checkpoint(path: str, net_ch1, net_ch2) -> Dict:
    """Load a reference JointIndi `*_gen.pth` — the checkpoint family behind
    every published Hagen number (BASELINE.md, ckpt `2410/Hagen-joint_indi-l1`)."""
    import torch

    sd = torch.load(_resolve_pth(path), map_location="cpu", weights_only=True)
    return joint_indi_state_dict_to_flax(sd, net_ch1, net_ch2)

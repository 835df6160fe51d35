"""Reference torch `.pth` checkpoint → flax params import shim.

The reference saves `netG.state_dict()` as `I{iter}_E{epoch}_gen.pth`
(/root/reference/model/model.py:130-152, DataParallel `module.` prefix
stripped at save). This walks the reference UNet naming scheme —
`downs.*` / `mid.*` / `ups.*` lists with `res_block.block{1,2}.block.{0,3}`,
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
    architecture; shape mismatches raise)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
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


def load_reference_checkpoint(path: str, net) -> Dict:
    """Load an `I*_E*_gen.pth` (or `<prefix>` → `<prefix>_gen.pth`) into flax
    variables for `net`."""
    import os

    import torch

    if not os.path.exists(path) and os.path.exists(path + "_gen.pth"):
        path = path + "_gen.pth"
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd, net)

"""Flax params → reference torch `.pth` checkpoint export shim (the inverse
of utils/torch_import.py).

A user switching from the reference to this framework can already resume
reference `*_gen.pth` checkpoints on TPU; this module closes the other
direction: models trained HERE export to state dicts the unmodified
reference loads with `strict=True` (/root/reference/model/model.py:153-173
loads `netG.state_dict()` saved at :130-142). Per `which_model_G` the
on-disk layout is the diffusion WRAPPER's state dict:

  * ddpm / sr3 — 12 registered schedule buffers (`betas` …
    `posterior_mean_coef2`; sr3_modules/diffusion.py:110-139,
    ddpm_modules/diffusion.py:125-154) + `denoise_fn.<unet keys>`,
  * indi — `denoise_fn.<unet keys>` (InDI registers no buffers),
  * joint_indi — `indi1.denoise_fn.*` / `indi2.denoise_fn.*` +
    `alpha_param`/`offset_param`/`scale_param` (joint_indi.py:62-84).

The UNet walker mirrors torch_state_dict_to_flax exactly (same
architecture loop), emitting the reference naming scheme — `downs.*` /
`mid.*` / `ups.*` with `res_block.block{1,2}.block.{0,3}`,
`noise_func.noise_func.0` (SR3) / `mlp.1` (DDPM), `attn.{norm,qkv,out}`,
`final_conv.block.{0,3}` (sr3_modules/unet.py:161-259,
ddpm_modules/unet.py:147-243).

Layout conversions (inverse of import): flax Conv HWIO → torch OIHW; flax
Dense (in,out) → torch (out,in); gn_scale/gn_bias → GroupNorm weight/bias.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv_t(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _dense_t(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).T  # (in,out)→(out,in)
    out[f"{name}.bias"] = _np(p["bias"])


def _block_t(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.block.0.weight"] = _np(p["gn_scale"])
    out[f"{name}.block.0.bias"] = _np(p["gn_bias"])
    _conv_t(out, f"{name}.block.3", p["Conv_0"])


def _resblock_t(out: Dict, name: str, p: Dict, cond_type: str) -> None:
    _block_t(out, f"{name}.block1", p["Block_0"])
    _block_t(out, f"{name}.block2", p["Block_1"])
    if cond_type == "time":
        _dense_t(out, f"{name}.mlp.1", p["Dense_0"])
    elif cond_type == "noise_level":
        _dense_t(out, f"{name}.noise_func.noise_func.0",
                 p["FeatureWiseAffine_0"]["Dense_0"])
    if "Conv_0" in p:  # dim_in != dim_out → res_conv
        _conv_t(out, f"{name}.res_conv", p["Conv_0"])


def _attention_t(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.norm.weight"] = _np(p["GroupNorm_0"]["scale"])
    out[f"{name}.norm.bias"] = _np(p["GroupNorm_0"]["bias"])
    _conv_t(out, f"{name}.qkv", p["Conv_0"])  # no bias in flax → none emitted
    _conv_t(out, f"{name}.out", p["Conv_1"])


def flax_unet_to_torch_state_dict(params, net) -> Dict[str, np.ndarray]:
    """models.unet.UNet params → raw-UNet torch-naming state dict (numpy
    values; wrap with `to_torch_tensors` / `save_reference_checkpoint` for
    torch use). `net` supplies the static architecture, exactly as in
    torch_state_dict_to_flax."""
    if set(params.keys()) == {"params"}:
        params = params["params"]
    out: Dict[str, np.ndarray] = {}
    cond = net.cond_type

    mlp = {"time": "time_mlp", "noise_level": "noise_level_mlp"}.get(cond)
    if mlp is not None:
        _dense_t(out, f"{mlp}.1", params["Dense_0"])
        _dense_t(out, f"{mlp}.3", params["Dense_1"])
    if cond == "time":
        # ddpm TimeEmbedding registers its sinusoid frequencies as a buffer
        # (ddpm_modules/unet.py:23-27); a deterministic constant, but strict
        # load requires the key (sr3's PositionalEncoding computes on the fly)
        dim = net.inner_channel
        out[f"{mlp}.0.inv_freq"] = np.exp(
            np.arange(0, dim, 2, dtype=np.float32) * (-np.log(10000.0) / dim)
        ).astype(np.float32)

    def rbwa(tname: str, p: Dict) -> None:
        _resblock_t(out, f"{tname}.res_block", p["ResnetBlock_0"], cond)
        if "SelfAttention_0" in p:
            _attention_t(out, f"{tname}.attn", p["SelfAttention_0"])

    num_mults = len(net.channel_mults)
    now_res = net.image_size
    rbwa_i = 0
    down_i = 0
    up_i = 0

    _conv_t(out, "downs.0", params["Conv_0"])  # stem
    t_i = 1
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        for _ in range(net.res_blocks):
            rbwa(f"downs.{t_i}", params[f"ResnetBlockWithAttn_{rbwa_i}"])
            rbwa_i += 1
            t_i += 1
        if not is_last:
            _conv_t(out, f"downs.{t_i}.conv",
                    params[f"Downsample_{down_i}"]["Conv_0"])
            down_i += 1
            t_i += 1
            now_res //= 2

    rbwa("mid.0", params[f"ResnetBlockWithAttn_{rbwa_i}"])
    rbwa("mid.1", params[f"ResnetBlockWithAttn_{rbwa_i + 1}"])
    rbwa_i += 2

    t_i = 0
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        for _ in range(net.res_blocks + 1):
            rbwa(f"ups.{t_i}", params[f"ResnetBlockWithAttn_{rbwa_i}"])
            rbwa_i += 1
            t_i += 1
        if not is_last:
            _conv_t(out, f"ups.{t_i}.conv", params[f"Upsample_{up_i}"]["Conv_0"])
            up_i += 1
            t_i += 1
            now_res *= 2

    _block_t(out, "final_conv", params["Block_0"])
    return out


def _schedule_buffers(sched) -> Dict[str, np.ndarray]:
    """DDPMSchedule pytree → the reference's 12 registered float32 buffers."""
    from diffsplitting_tpu.utils.torch_import import SCHEDULE_BUFFERS

    return {name: _np(getattr(sched, name)) for name in sorted(SCHEDULE_BUFFERS)}


def flax_to_reference_state_dict(which: str, params: Dict, nets: Dict,
                                 sched=None) -> Dict[str, np.ndarray]:
    """Assemble the full diffusion-wrapper state dict the reference saves.

    `params`/`nets` use DiffusionModel's role layout ({'net': ...} or
    {'net_ch1','net_ch2','extra'}). For ddpm/sr3 pass the DDPMSchedule so the
    registered buffers strict-load (their values are recomputed by the
    reference's own set_new_noise_schedule anyway; ours are golden-matched)."""
    if which in ("ddpm", "sr3"):
        if sched is None:
            raise ValueError(f"{which} export needs the schedule pytree "
                             "(its buffers are part of the state dict)")
        sd = _schedule_buffers(sched)
        for k, v in flax_unet_to_torch_state_dict(
                params["net"], nets["net"]).items():
            sd[f"denoise_fn.{k}"] = v
        return sd
    if which == "indi":
        return {
            f"denoise_fn.{k}": v
            for k, v in flax_unet_to_torch_state_dict(
                params["net"], nets["net"]).items()
        }
    if which == "joint_indi":
        sd = {
            k: _np(params["extra"][k])
            for k in ("alpha_param", "offset_param", "scale_param")
        }
        for role, root in (("net_ch1", "indi1"), ("net_ch2", "indi2")):
            for k, v in flax_unet_to_torch_state_dict(
                    params[role], nets[role]).items():
                sd[f"{root}.denoise_fn.{k}"] = v
        return sd
    raise NotImplementedError(f"export for which_model_G={which!r}")


def save_reference_checkpoint(path: str, which: str, params: Dict, nets: Dict,
                              sched=None) -> str:
    """Write `<path>` (append `_gen.pth` when missing) as a torch `.pth` the
    unmodified reference resumes from (model.py:153-173, strict=True)."""
    import torch

    if not path.endswith(".pth"):
        path = path + "_gen.pth"
    sd = flax_to_reference_state_dict(which, params, nets, sched)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return path

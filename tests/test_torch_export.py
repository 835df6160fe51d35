"""Torch `.pth` EXPORT shim: checkpoints trained here load into the
UNMODIFIED reference with strict=True and reproduce our forward exactly.

The reference modules are EXECUTED (not copied) as ground truth, mirroring
tests/test_torch_import.py in the opposite direction."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

from diffsplitting_tpu.models import UNet  # noqa: E402
from diffsplitting_tpu.utils.torch_export import (  # noqa: E402
    flax_to_reference_state_dict,
    flax_unet_to_torch_state_dict,
)
from diffsplitting_tpu.utils.torch_import import (  # noqa: E402
    torch_state_dict_to_flax,
)

KW = dict(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
          channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
          image_size=16)


def _ref_module(flavor):
    if REF not in sys.path:
        sys.path.append(REF)
    if flavor == "sr3":
        from model.sr3_modules.unet import UNet as RefUNet
    else:
        from model.ddpm_modules.unet import UNet as RefUNet
    return RefUNet


def _flax_net_and_params(flavor, kw=KW, seed=0):
    net = UNet(cond_type="noise_level" if flavor == "sr3" else "time", **kw)
    variables = net.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, kw["image_size"], kw["image_size"], kw["in_channel"])),
        jnp.zeros((1,)),
    )
    return net, variables


def _to_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


@pytest.mark.parametrize("flavor", ["sr3", "ddpm"])
def test_export_reimport_is_identity(flavor):
    """export → import returns the original params tree exactly (covers
    attention, res_conv, both conditioning flavors)."""
    net, variables = _flax_net_and_params(flavor)
    sd = flax_unet_to_torch_state_dict(variables, net)
    back = torch_state_dict_to_flax(sd, net)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], back["params"],
    )


@pytest.mark.parametrize("flavor", ["sr3", "ddpm"])
def test_reference_strict_loads_exported_unet(flavor):
    """The reference UNet strict-loads our export and matches our forward."""
    net, variables = _flax_net_and_params(flavor, seed=1)
    sd = flax_unet_to_torch_state_dict(variables, net)

    ref = _ref_module(flavor)(**KW).eval()
    ref.load_state_dict(_to_torch(sd), strict=True)

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([0.4, 0.9], np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(t))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


def test_reference_wrapper_strict_loads_sr3_export():
    """Full family export: the reference GaussianDiffusion WRAPPER (schedule
    buffers + denoise_fn.*) strict-loads it, and our exported buffers match
    the values the reference itself registers (schedule numeric parity)."""
    if REF not in sys.path:
        sys.path.append(REF)
    from model.sr3_modules.diffusion import GaussianDiffusion as RefDiffusion

    from diffsplitting_tpu.diffusion import build_ddpm_schedule

    sched_opt = {"schedule": "linear", "n_timestep": 10,
                 "linear_start": 1e-6, "linear_end": 1e-2}
    net, variables = _flax_net_and_params("sr3", seed=2)
    sd = flax_to_reference_state_dict(
        "sr3", {"net": variables["params"]}, {"net": net},
        sched=build_ddpm_schedule(sched_opt),
    )

    ref_unet = _ref_module("sr3")(**KW).eval()
    wrapper = RefDiffusion(ref_unet, 16, channels=2, loss_type="l1",
                           conditional=True)
    wrapper.set_new_noise_schedule(sched_opt, torch.device("cpu"))
    ref_buffers = {k: v.clone() for k, v in wrapper.state_dict().items()
                   if "." not in k}
    wrapper.load_state_dict(_to_torch(sd), strict=True)
    for name, want in ref_buffers.items():
        np.testing.assert_allclose(np.asarray(sd[name]), want.numpy(),
                                   rtol=1e-5, atol=1e-7, err_msg=name)


def test_missing_schedule_raises():
    net, variables = _flax_net_and_params("ddpm")
    with pytest.raises(ValueError, match="schedule"):
        flax_to_reference_state_dict("ddpm", {"net": variables["params"]},
                                     {"net": net})


JOINT_KW = dict(in_channel=1, out_channel=1, inner_channel=8, norm_groups=4,
                channel_mults=(1, 2), attn_res=(), res_blocks=1, dropout=0,
                image_size=16)


def test_reference_joint_indi_strict_loads_export():
    """JointIndi family export: indi1./indi2. roots + the three scalars
    strict-load into the executed reference, which then reproduces our
    deterministic (e=0) inference on both channels."""
    from tests.test_torch_import import _ref_joint

    from diffsplitting_tpu.diffusion import JointInDIProcess

    net1 = UNet(cond_type="time", **JOINT_KW)
    net2 = UNet(cond_type="time", **JOINT_KW)
    x0 = jnp.zeros((1, 16, 16, 1))
    t0 = jnp.zeros((1,))
    p1 = net1.init(jax.random.PRNGKey(3), x0, t0)["params"]
    p2 = net2.init(jax.random.PRNGKey(4), x0, t0)["params"]
    params = {"net_ch1": p1, "net_ch2": p2,
              "extra": {"alpha_param": np.float32(0.0),
                        "offset_param": np.float32(0.0),
                        "scale_param": np.float32(1.0)}}
    sd = flax_to_reference_state_dict(
        "joint_indi", params, {"net_ch1": net1, "net_ch2": net2})

    ref = _ref_joint()
    ref.load_state_dict(_to_torch(sd), strict=True)

    proc = JointInDIProcess(image_size=16, channels=1, out_channel=1,
                            conditional=False, e=0.0, num_timesteps=4,
                            val_num_timesteps=4)
    x = np.random.default_rng(5).normal(size=(1, 16, 16, 1)).astype(np.float32)
    d1 = lambda xx, tt: net1.apply({"params": p1}, xx, tt)
    d2 = lambda xx, tt: net2.apply({"params": p2}, xx, tt)
    ours = np.asarray(proc.inference(
        d1, d2, jax.random.PRNGKey(0), jnp.asarray(x),
        continuous=False, num_timesteps=4, t_float_start=0.5,
    ))
    with torch.no_grad():
        want = ref.inference(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             continuous=False, num_timesteps=4,
                             t_float_start=0.5)
    np.testing.assert_allclose(ours, want.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=5e-4)


def test_trainer_export_and_cli(tmp_path):
    """DiffusionModel.export_torch + the CLI script: save an orbax
    checkpoint, export via the CLI, and re-import through the existing torch
    fallback — train-here → run-on-reference → come-back roundtrip."""
    from scripts.export_torch_checkpoint import main as export_main
    from tests.test_trainer import synth_batch, tiny_opt

    from diffsplitting_tpu.train import DiffusionModel

    m = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2))
    m.feed_data(synth_batch(in_ch=1, out_ch=2))
    m.optimize_parameters()
    m.save_network(epoch=1, iter_step=2)

    out_prefix = str(tmp_path / "exported" / "I2_E1")
    cfg = tmp_path / "cfg.json"
    import json

    raw = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    cfg.write_text(json.dumps(raw))
    export_main(["-c", str(cfg), "--resume", str(tmp_path / "I2_E1"),
                 "-o", out_prefix])
    assert os.path.exists(out_prefix + "_gen.pth")

    # the exported file round-trips through the IMPORT path bit-exactly
    from diffsplitting_tpu.utils.torch_import import load_reference_checkpoint

    back = load_reference_checkpoint(out_prefix, m.nets["net"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(m.params["net"]), back["params"],
    )

"""Torch `.pth` import shim: converted reference checkpoints reproduce the
reference network's forward exactly (both UNet flavors).

The reference modules themselves are EXECUTED (not copied) to produce ground
truth: a randomly-initialized /root/reference UNet's state_dict is converted
to flax params and both forwards are compared on the same input.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)

from diffsplitting_tpu.models import UNet  # noqa: E402
from diffsplitting_tpu.utils.torch_import import (  # noqa: E402
    load_reference_checkpoint,
    torch_state_dict_to_flax,
)


def _ref_module(flavor):
    if REF not in sys.path:
        sys.path.append(REF)
    if flavor == "sr3":
        from model.sr3_modules.unet import UNet as RefUNet
    else:
        from model.ddpm_modules.unet import UNet as RefUNet
    return RefUNet


@pytest.mark.parametrize("flavor", ["sr3", "ddpm"])
def test_reference_checkpoint_roundtrip(flavor, tmp_path):
    torch.manual_seed(0)
    kw = dict(in_channel=2, out_channel=2, inner_channel=8, norm_groups=4,
              channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
              image_size=16)
    ref = _ref_module(flavor)(**kw).eval()

    # save exactly like the reference (model.py:130-142)
    sd = {k: v.cpu() for k, v in ref.state_dict().items()}
    path = str(tmp_path / "I100_E2_gen.pth")
    torch.save(sd, path)

    net = UNet(cond_type="noise_level" if flavor == "sr3" else "time", **kw)
    variables = load_reference_checkpoint(str(tmp_path / "I100_E2"), net)

    x = np.random.default_rng(0).normal(size=(2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([0.4, 0.9], np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(t))
    want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_trainer_resumes_from_torch_pth(tmp_path):
    """DiffusionModel.load_network imports a reference *_gen.pth when the
    resume prefix has no orbax artifact — reference checkpoints drive every
    CLI unchanged."""
    from diffsplitting_tpu.config import dict_to_nonedict
    from diffsplitting_tpu.train import DiffusionModel

    kw = dict(in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
              channel_mults=(1,), attn_res=(), res_blocks=1, dropout=0,
              image_size=8)
    torch.manual_seed(1)
    ref = _ref_module("sr3")(**kw).eval()
    prefix = str(tmp_path / "I500_E3")
    torch.save({k: v.cpu() for k, v in ref.state_dict().items()},
               prefix + "_gen.pth")

    opt = dict_to_nonedict({
        "name": "t", "phase": "val",
        "path": {"checkpoint": str(tmp_path), "resume_state": prefix},
        "model": {
            "which_model_G": "sr3", "loss_type": "l1", "finetune_norm": False,
            "unet": {"in_channel": 2, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 4,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 8, "channels": 1, "conditional": True},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    })
    model = DiffusionModel(opt)
    # imported weights == converted reference weights
    got = model.params["net"]
    want = torch_state_dict_to_flax(ref.state_dict(),
                                    model.nets["net"])["params"]
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(got),
        __import__("jax").tree_util.tree_leaves(want),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the sampler runs on them
    model.feed_data({"input": np.zeros((1, 8, 8, 1), np.float32)})
    out = model.test(continuous=False)
    assert np.isfinite(np.asarray(out)).all()


def test_wrapper_root_checkpoint_imports():
    """Real reference `*_gen.pth` files root at the DIFFUSION wrapper
    (model.py:137-142 saves netG.state_dict()), so keys carry a
    `denoise_fn.` prefix plus 12 schedule buffers — both must be handled."""
    if REF not in sys.path:
        sys.path.append(REF)
    from model.sr3_modules.diffusion import GaussianDiffusion as RefDiffusion

    torch.manual_seed(2)
    kw = dict(in_channel=2, out_channel=1, inner_channel=8, norm_groups=4,
              channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
              image_size=16)
    ref_unet = _ref_module("sr3")(**kw).eval()
    wrapper = RefDiffusion(ref_unet, 16, channels=1, loss_type="l1",
                           conditional=True)
    wrapper.set_new_noise_schedule(
        {"schedule": "linear", "n_timestep": 10, "linear_start": 1e-6,
         "linear_end": 1e-2}, torch.device("cpu"))
    sd = wrapper.state_dict()
    assert "betas" in sd and any(k.startswith("denoise_fn.") for k in sd)

    net = UNet(cond_type="noise_level", **kw)
    variables = torch_state_dict_to_flax(sd, net)
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 2)).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    with torch.no_grad():
        want = ref_unet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(t))
    got = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-4)


JOINT_KW = dict(in_channel=1, out_channel=1, inner_channel=8, norm_groups=4,
                channel_mults=(1, 2), attn_res=(), res_blocks=1, dropout=0,
                image_size=16)


def _ref_joint(kw=JOINT_KW, n_timestep=4, e=0.0):
    """EXECUTE the reference JointIndi (e=0 → deterministic inference)."""
    if REF not in sys.path:
        sys.path.append(REF)
    from model.ddpm_modules.joint_indi import JointIndi
    from model.ddpm_modules.unet import UNet as RefUNet

    return JointIndi(
        None, kw["image_size"], channels=1, loss_type="l1",
        out_channel=kw["out_channel"], denoise_fn_ch1=RefUNet(**kw),
        denoise_fn_ch2=RefUNet(**kw), conditional=False,
        schedule_opt={"n_timestep": n_timestep},
        val_schedule_opt={"n_timestep": n_timestep}, e=e,
    ).eval()


def test_joint_indi_checkpoint_roundtrip(tmp_path):
    """A reference JointIndi checkpoint — the model behind every published
    Hagen number (BASELINE.md) — imports and reproduces BOTH channels'
    deterministic (e=0) inference."""
    from diffsplitting_tpu.diffusion import JointInDIProcess
    from diffsplitting_tpu.utils.torch_import import (
        is_joint_indi_state_dict,
        load_reference_joint_checkpoint,
    )

    torch.manual_seed(3)
    ref = _ref_joint()
    # save exactly like the reference (model.py:130-142)
    sd = {k: v.cpu() for k, v in ref.state_dict().items()}
    assert is_joint_indi_state_dict(sd)
    path = str(tmp_path / "I200_E4_gen.pth")
    torch.save(sd, path)

    net1 = UNet(cond_type="time", **JOINT_KW)
    net2 = UNet(cond_type="time", **JOINT_KW)
    variables = load_reference_joint_checkpoint(str(tmp_path / "I200_E4"), net1, net2)
    assert float(variables["params"]["extra"]["scale_param"]) == 1.0

    proc = JointInDIProcess(image_size=16, channels=1, out_channel=1,
                            conditional=False, e=0.0, num_timesteps=4,
                            val_num_timesteps=4)
    x = np.random.default_rng(2).normal(size=(1, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref.inference(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             continuous=False, num_timesteps=4,
                             t_float_start=0.5)
    want = want.numpy().transpose(0, 2, 3, 1)  # (1, H, W, 2)

    d1 = lambda xx, tt: net1.apply({"params": variables["params"]["net_ch1"]}, xx, tt)
    d2 = lambda xx, tt: net2.apply({"params": variables["params"]["net_ch2"]}, xx, tt)
    got = np.asarray(proc.inference(
        d1, d2, __import__("jax").random.PRNGKey(0), jnp.asarray(x),
        continuous=False, num_timesteps=4, t_float_start=0.5,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_single_loader_rejects_joint_checkpoint(tmp_path):
    torch.manual_seed(4)
    ref = _ref_joint()
    path = str(tmp_path / "I1_E1_gen.pth")
    torch.save({k: v.cpu() for k, v in ref.state_dict().items()}, path)
    net = UNet(cond_type="time", **JOINT_KW)
    with pytest.raises(ValueError, match="joint_indi"):
        load_reference_checkpoint(path, net)


def _joint_opt(tmp_path, prefix):
    from diffsplitting_tpu.config import dict_to_nonedict

    return dict_to_nonedict({
        "name": "t", "phase": "val",
        "path": {"checkpoint": str(tmp_path), "resume_state": prefix},
        "model": {
            "which_model_G": "joint_indi", "loss_type": "l1",
            "finetune_norm": False,
            "indi": {"e": 0.0},
            "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"n_timestep": 4}, "val": {"n_timestep": 4}},
            "diffusion": {"image_size": 16, "channels": 1,
                          "conditional": False},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    })


def test_trainer_resumes_joint_from_torch_pth(tmp_path):
    """DiffusionModel.load_network routes joint_indi `.pth` resume through
    the joint import — reference Hagen checkpoints drive every CLI."""
    import jax as _jax

    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.torch_import import joint_indi_state_dict_to_flax

    torch.manual_seed(5)
    ref = _ref_joint()
    prefix = str(tmp_path / "I300_E5")
    torch.save({k: v.cpu() for k, v in ref.state_dict().items()},
               prefix + "_gen.pth")

    model = DiffusionModel(_joint_opt(tmp_path, prefix))
    want = joint_indi_state_dict_to_flax(
        ref.state_dict(), model.nets["net_ch1"], model.nets["net_ch2"]
    )["params"]
    for role in ("net_ch1", "net_ch2", "extra"):
        for a, b in zip(_jax.tree_util.tree_leaves(model.params[role]),
                        _jax.tree_util.tree_leaves(want[role])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the joint sampler runs on the imported weights and matches the
    # executed reference (e=0 → deterministic)
    x = np.random.default_rng(3).normal(size=(1, 16, 16, 1)).astype(np.float32)
    model.feed_data({"input": x})
    got = np.asarray(model.test(continuous=False))
    with torch.no_grad():
        ref_out = ref.inference(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                continuous=False, num_timesteps=4,
                                t_float_start=0.5)
    np.testing.assert_allclose(got, ref_out.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=5e-4)


def test_module_prefix_stripped():
    """DataParallel-style 'module.' prefixes are accepted."""
    kw = dict(in_channel=1, out_channel=1, inner_channel=8, norm_groups=4,
              channel_mults=(1,), attn_res=(), res_blocks=1, dropout=0,
              image_size=8)
    ref = _ref_module("sr3")(**kw).eval()
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    net = UNet(cond_type="noise_level", **kw)
    variables = torch_state_dict_to_flax(sd, net)
    out = net.apply(variables, jnp.zeros((1, 8, 8, 1)), jnp.asarray([0.5]))
    assert np.isfinite(np.asarray(out)).all()

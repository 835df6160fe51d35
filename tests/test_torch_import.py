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
        sys.path.insert(0, REF)
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

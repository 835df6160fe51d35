"""End-to-end trainer smoke tests on the 8-device CPU mesh (synthetic data).

Mirrors the reference's debug-mode smoke harness (core/logger.py:72-80):
tiny nets, 10 timesteps, a few optimization steps; checks loss finiteness,
inference shapes, schedule switching, and checkpoint resume.
"""

import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel


def tiny_opt(which="indi", tmp_path=None, conditional=False, in_ch=1, out_ch=2,
             channels=2, loss="l1"):
    opt = {
        "name": "unittest",
        "phase": "train",
        "path": {
            "checkpoint": str(tmp_path) if tmp_path else "/tmp/dsp_ckpt",
            "resume_state": None,
        },
        "model": {
            "which_model_G": which,
            "loss_type": loss,
            "lr_reduction": "mean",
            "finetune_norm": False,
            "unet": {
                "in_channel": in_ch,
                "out_channel": out_ch,
                "inner_channel": 8,
                "norm_groups": 4,
                "channel_multiplier": [1, 2],
                "attn_res": [],
                "res_blocks": 1,
                "dropout": 0,
            },
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 4,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": 16, "channels": channels,
                          "conditional": conditional},
        },
        "train": {"n_iter": 10, "optimizer": {"type": "adam", "lr": 1e-3}},
    }
    return dict_to_nonedict(opt)


def synth_batch(b=8, s=16, in_ch=1, out_ch=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input": rng.normal(size=(b, s, s, in_ch)).astype(np.float32),
        "target": rng.normal(size=(b, s, s, out_ch)).astype(np.float32),
    }


def test_indi_train_and_infer(tmp_path):
    m = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2))
    losses = []
    for i in range(3):
        m.feed_data(synth_batch(seed=i))
        m.optimize_parameters()
        losses.append(m.get_current_log()["l_pix"])
    assert all(np.isfinite(l) for l in losses)

    # schedule switch to val (T=4) then inference
    m.set_new_noise_schedule(m.opt["model"]["beta_schedule"]["val"], "val")
    m.feed_data(synth_batch(b=1))
    out = m.test(continuous=False)
    assert np.shape(out) == (1, 16, 16, 2)
    frames = m.test(continuous=True)
    assert np.shape(frames) == (5, 1, 16, 16, 2)  # T=4 -> 4 frames + seed

    vis = m.get_current_visuals()
    assert set(vis) == {"prediction", "input", "target"}


def test_joint_indi_train_and_infer(tmp_path):
    m = DiffusionModel(tiny_opt("joint_indi", in_ch=1, out_ch=1, channels=1))
    m.feed_data(synth_batch(out_ch=2))
    m.optimize_parameters()
    logs = m.get_current_log()
    assert np.isfinite(logs["l_pix"])
    assert "loss_splitting" in logs and "alpha" in logs

    m.set_new_noise_schedule(m.opt["model"]["beta_schedule"]["val"], "val")
    m.feed_data(synth_batch(b=1))
    out = m.test(continuous=False)
    assert np.shape(out) == (1, 16, 16, 2)  # two channels concatenated


def test_ddpm_conditional_train_and_sample():
    m = DiffusionModel(tiny_opt("ddpm", conditional=True, in_ch=3, out_ch=2, channels=2))
    m.feed_data(synth_batch(in_ch=1, out_ch=2))
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])

    m.set_new_noise_schedule(m.opt["model"]["beta_schedule"]["val"], "val")
    m.feed_data(synth_batch(b=1, in_ch=1))
    out = m.test(continuous=False)
    assert np.shape(out) == (1, 16, 16, 2)


def test_sr3_train_and_super_resolution():
    m = DiffusionModel(tiny_opt("sr3", conditional=True, in_ch=2, out_ch=1,
                                channels=1, loss="l2"))
    m.feed_data(synth_batch(in_ch=1, out_ch=1))
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])

    m.feed_data(synth_batch(b=1, in_ch=1, out_ch=1))
    out = m.test(continuous=False)
    assert np.shape(out) == (1, 16, 16, 1)


def test_unconditional_sample():
    m = DiffusionModel(tiny_opt("ddpm", conditional=False, in_ch=2, out_ch=2, channels=2))
    out = m.sample(batch_size=2, continuous=False)
    assert np.shape(out) == (2, 16, 16, 2)
    vis = m.get_current_visuals(sample=True)
    assert "SAM" in vis


def test_training_reduces_loss_identityish_task():
    """InDI on a trivially learnable task: loss after training < loss before."""
    m = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2))
    batch = synth_batch(b=8, seed=42)
    batch["target"] = np.tile(batch["input"], (1, 1, 1, 2))
    m.feed_data(batch)
    m.optimize_parameters()
    first = m.get_current_log()["l_pix"]
    for _ in range(30):
        m.feed_data(batch)
        m.optimize_parameters()
    last = m.get_current_log()["l_pix"]
    assert last < first


def test_checkpoint_roundtrip(tmp_path):
    import jax

    m = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2))
    m.feed_data(synth_batch())
    m.optimize_parameters()
    m.save_network(epoch=1, iter_step=7)

    opt2 = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt2["path"]["resume_state"] = str(tmp_path / "I7_E1")
    m2 = DiffusionModel(opt2)
    assert m2.begin_step == 7 and m2.begin_epoch == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(m.params), jax.tree_util.tree_leaves(m2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_batch_is_sharded_over_mesh():
    import jax

    m = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2))
    assert m.mesh is not None and m.mesh.devices.size == 8
    m.feed_data(synth_batch(b=8))
    shard_devices = {d.device for d in m.data["input"].addressable_shards}
    assert len(shard_devices) == 8  # batch split across all 8 virtual chips
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])

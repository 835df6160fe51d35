"""DeepCache through the production serving surfaces.

Round-2 left the 1.58× cached sampler reachable only via a bench env var;
these tests pin the round-3 wiring: `model.deepcache` config /
`set_deepcache()` route `DiffusionModel.test()` (the serving surface of the
reference's /root/reference/model/model.py:63-76) through the cached scan,
with the exact chain as default and interval=1 reproducing it exactly.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel

from tests.test_trainer import synth_batch, tiny_opt


def _sr3_opt(tmp_path, deepcache=None):
    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    if deepcache is not None:
        opt["model"]["deepcache"] = dict_to_nonedict(deepcache)
    return opt


def test_config_interval1_matches_exact_chain(tmp_path):
    """model.deepcache {interval: 1} through test() == the exact chain
    (same rng discipline — bit-equal for the clipped SR3 chain)."""
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    exact = DiffusionModel(_sr3_opt(tmp_path), seed=0)
    exact.set_new_noise_schedule(
        exact.opt["model"]["beta_schedule"]["val"], "val")
    exact.feed_data(batch)
    want = np.asarray(exact.test(continuous=False))

    cached = DiffusionModel(_sr3_opt(tmp_path, {"interval": 1, "depth": 1}),
                            seed=0)
    assert cached.deepcache == (1, 1)
    cached.set_new_noise_schedule(
        cached.opt["model"]["beta_schedule"]["val"], "val")
    cached.feed_data(batch)
    got = np.asarray(cached.test(continuous=False))
    np.testing.assert_array_equal(got, want)


def test_set_deepcache_toggles_and_interval2_differs_gracefully(tmp_path):
    model = DiffusionModel(_sr3_opt(tmp_path), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    model.feed_data(batch)

    model._rng_counter = 100
    exact = np.asarray(model.test(continuous=False))

    model.set_deepcache(2, 1)
    model._rng_counter = 100  # same sampler rng
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == exact.shape
    assert np.isfinite(fast).all()

    # back to the exact chain
    model.set_deepcache(None)
    model._rng_counter = 100
    again = np.asarray(model.test(continuous=False))
    np.testing.assert_array_equal(again, exact)


def test_joint_indi_deepcache_serving(tmp_path):
    """joint_indi test() rides the per-channel cached samplers; interval=1
    matches the exact joint chain."""
    opt = tiny_opt("joint_indi", tmp_path, conditional=False, in_ch=1,
                   out_ch=1, channels=1)
    model = DiffusionModel(opt, seed=0)
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    model.feed_data(batch)

    model._rng_counter = 50
    exact = np.asarray(model.test(continuous=False))

    model.set_deepcache(1, 1)
    model._rng_counter = 50
    cached1 = np.asarray(model.test(continuous=False))
    np.testing.assert_allclose(cached1, exact, rtol=1e-5, atol=1e-6)

    model.set_deepcache(3, 1)
    model._rng_counter = 50
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == exact.shape == (2, 16, 16, 2)
    assert np.isfinite(fast).all()


def test_auto_interval(tmp_path):
    """interval: 'auto' resolves from the chain length (round-3 span rule:
    clamp(round(0.4 T), 1, 5)) — T=4 val schedule → interval 2."""
    model = DiffusionModel(_sr3_opt(tmp_path, {"interval": "auto"}), seed=0)
    assert model.deepcache == ("auto", 1)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    assert model._dc_interval(model.current_sched.num_timesteps) == 2
    assert model._dc_interval(2000) == 5
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False))
    assert np.isfinite(out).all()


def test_continuous_falls_back_to_exact_chain(tmp_path):
    """Trajectory requests can't ride the cache — they must still work."""
    model = DiffusionModel(_sr3_opt(tmp_path, {"interval": 5}), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=True))
    assert out.ndim == 5 and out.shape[0] > 1  # (frames, B, H, W, C)


def test_ema_plus_deepcache(tmp_path):
    """use_ema=True samples the cached chain with EMA weights (params are
    jit arguments, so weight choice is orthogonal to the sampler)."""
    opt = _sr3_opt(tmp_path, {"interval": 2})
    opt["train"]["ema_scheduler"] = dict_to_nonedict(
        {"enabled": True, "ema_decay": 0.99, "step_start_ema": 0})
    model = DiffusionModel(opt, seed=0)
    model.feed_data(synth_batch(b=2, in_ch=1, out_ch=1))
    model.optimize_parameters()
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False, use_ema=True))
    assert np.isfinite(out).all()


def test_unconditional_sample_deepcache(tmp_path):
    """sample() (unconditional generation, sample.py's serving path) rides
    the cached chain too; interval=1 matches the exact sampler bit-for-bit."""
    opt = tiny_opt("ddpm", tmp_path, conditional=False, in_ch=2, out_ch=2,
                   channels=2)
    model = DiffusionModel(opt, seed=0)
    model._rng_counter = 10
    exact = np.asarray(model.sample(batch_size=2, continuous=False))

    model.set_deepcache(1, 1)
    model._rng_counter = 10
    cached1 = np.asarray(model.sample(batch_size=2, continuous=False))
    np.testing.assert_array_equal(cached1, exact)

    model.set_deepcache(2, 1)
    model._rng_counter = 10
    fast = np.asarray(model.sample(batch_size=2, continuous=False))
    assert fast.shape == exact.shape and np.isfinite(fast).all()

    # trajectory sampling still falls back to the exact chain
    frames = np.asarray(model.sample(batch_size=1, continuous=True))
    assert frames.ndim == 5


@pytest.mark.slow
def test_predict_cli_joint_pth_with_deepcache(tmp_path):
    """predict.py resumes a REFERENCE joint-InDI `.pth` and serves it with
    --deepcache — the two round-3 VERDICT items composed end-to-end."""
    torch = pytest.importorskip("torch")
    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference tree not present")
    if REF not in sys.path:
        sys.path.append(REF)
    from model.ddpm_modules.joint_indi import JointIndi
    from model.ddpm_modules.unet import UNet as RefUNet

    kw = dict(in_channel=1, out_channel=1, inner_channel=8, norm_groups=4,
              channel_mults=(1, 2), attn_res=(), res_blocks=1, dropout=0,
              image_size=32)
    torch.manual_seed(0)
    ref = JointIndi(None, 32, channels=1, loss_type="l1", out_channel=1,
                    denoise_fn_ch1=RefUNet(**kw), denoise_fn_ch2=RefUNet(**kw),
                    conditional=False, schedule_opt={"n_timestep": 4},
                    val_schedule_opt={"n_timestep": 4})
    prefix = str(tmp_path / "I900_E9")
    torch.save({k: v.cpu() for k, v in ref.state_dict().items()},
               prefix + "_gen.pth")

    from PIL import Image

    frames = np.random.default_rng(0).uniform(0, 800, (1, 64, 64)).astype(np.uint16)
    in_tif = str(tmp_path / "mixed.tif")
    Image.fromarray(frames[0]).save(in_tif)

    cfg = {
        "name": "dc_cli", "phase": "val",
        "path": {"checkpoint": str(tmp_path), "resume_state": None},
        "datasets": {"patch_size": 32, "max_qval": 1.0,
                     "channel_weights": [1, 1]},
        "model": {
            "which_model_G": "joint_indi", "loss_type": "l1",
            "finetune_norm": False,
            "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {"train": {"n_timestep": 4},
                              "val": {"n_timestep": 4}},
            "diffusion": {"image_size": 32, "channels": 1,
                          "conditional": False},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 1e-3}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = repo
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    out_dir = str(tmp_path / "preds")
    res = subprocess.run(
        [sys.executable, "predict.py", "-c", str(cfg_path),
         "--resume", prefix, "--input", in_tif, "--out", out_dir,
         "--num_steps", "4", "--batch_size", "4", "--deepcache", "2,1",
         "--mmse", "2"],  # exercises the coalesced (batched-chain) MMSE path
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.isfile(os.path.join(out_dir, "pred_ch0.tif"))
    assert os.path.isfile(os.path.join(out_dir, "pred_ch1.tif"))

"""Respaced DDIM through the production serving surfaces.

`model.ddim {steps, eta}` / `set_ddim()` route `DiffusionModel.test()` /
`sample()` (the serving surface of the reference's
/root/reference/model/model.py:63-85) through the S-step DDIM scan
(diffusion/ddim.py) for the ddpm/sr3 families. Pinned contract: the exact
chain returns when the mode is unset, η=0 is deterministic for a fixed rng,
the mode composes with EMA weights, errors loudly when combined with the
other accel modes, and trajectory requests fall back to the exact chain.
"""

import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel

from tests.test_trainer import synth_batch, tiny_opt


def _sr3_opt(tmp_path, ddim=None):
    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    if ddim is not None:
        opt["model"]["ddim"] = dict_to_nonedict(ddim)
    return opt


def test_config_routes_and_unset_restores_exact(tmp_path):
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    model = DiffusionModel(_sr3_opt(tmp_path, {"steps": 2}), seed=0)
    assert model.ddim == (2, 0.0)
    model.set_new_noise_schedule(
        model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data(batch)

    model._rng_counter = 100
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == (2, 16, 16, 1)
    assert np.isfinite(fast).all()

    # deterministic for a fixed sampler rng (eta=0)
    model._rng_counter = 100
    again = np.asarray(model.test(continuous=False))
    np.testing.assert_array_equal(again, fast)

    # unset -> bit-equal to a never-ddim model's exact chain
    model.set_ddim(None)
    model._rng_counter = 100
    exact = np.asarray(model.test(continuous=False))

    ref = DiffusionModel(_sr3_opt(tmp_path), seed=0)
    ref.set_new_noise_schedule(ref.opt["model"]["beta_schedule"]["val"], "val")
    ref.feed_data(batch)
    ref._rng_counter = 100
    np.testing.assert_array_equal(np.asarray(ref.test(continuous=False)),
                                  exact)


def test_mutually_exclusive_with_sliding_window(tmp_path):
    """DDIM composes with DeepCache (cached respaced chain,
    tests/test_ddim_deepcache.py) but stays exclusive with sliding-window."""
    model = DiffusionModel(_sr3_opt(tmp_path, {"steps": 2}), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})

    model.set_deepcache(2, 1)
    out = np.asarray(model.test(continuous=False))  # composes, must run
    assert np.isfinite(out).all()
    model.set_deepcache(None)

    model.set_sliding_window(4, 0.1)
    with pytest.raises(ValueError, match="mutually"):
        model.test(continuous=False)


def test_continuous_falls_back_to_exact_chain(tmp_path):
    model = DiffusionModel(_sr3_opt(tmp_path, {"steps": 2}), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=True))
    assert out.ndim == 5 and out.shape[0] > 1  # (frames, B, H, W, C)


def test_unconditional_sample_ddim(tmp_path):
    opt = tiny_opt("ddpm", tmp_path, conditional=False, in_ch=2, out_ch=2,
                   channels=2)
    model = DiffusionModel(opt, seed=0)

    model.set_ddim(2, 0.0)
    model._rng_counter = 10
    fast = np.asarray(model.sample(batch_size=2, continuous=False))
    assert fast.shape == (2, 16, 16, 2)
    assert np.isfinite(fast).all()

    model._rng_counter = 10
    again = np.asarray(model.sample(batch_size=2, continuous=False))
    np.testing.assert_array_equal(again, fast)

    # trajectory sampling falls back to the exact chain
    frames = np.asarray(model.sample(batch_size=1, continuous=True))
    assert frames.ndim == 5


def test_ddim_rides_sampler_chunk(tmp_path):
    """model.sampler_chunk set (the 512²-class escape hatch) routes DDIM
    through ⌈S/K⌉ jitted chunks — same output as the single-scan route."""
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}

    plain = DiffusionModel(_sr3_opt(tmp_path, {"steps": 3}), seed=0)
    plain.set_new_noise_schedule(
        plain.opt["model"]["beta_schedule"]["val"], "val")
    plain.feed_data(batch)
    plain._rng_counter = 40
    want = np.asarray(plain.test(continuous=False))

    opt = _sr3_opt(tmp_path, {"steps": 3})
    opt["model"]["sampler_chunk"] = 2
    chunked = DiffusionModel(opt, seed=0)
    assert chunked.sampler_chunk == 2
    chunked.set_new_noise_schedule(
        chunked.opt["model"]["beta_schedule"]["val"], "val")
    chunked.feed_data(batch)
    chunked._rng_counter = 40
    got = np.asarray(chunked.test(continuous=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_indi_ignores_ddim(tmp_path):
    """InDI respaces natively via num_timesteps — model.ddim must be inert
    there (exact chain runs, no error)."""
    opt = tiny_opt("joint_indi", tmp_path, conditional=False, in_ch=1,
                   out_ch=1, channels=1)
    opt["model"]["ddim"] = dict_to_nonedict({"steps": 2})
    model = DiffusionModel(opt, seed=0)
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False))
    assert out.shape == (1, 16, 16, 2) and np.isfinite(out).all()


def test_ema_plus_ddim(tmp_path):
    opt = _sr3_opt(tmp_path, {"steps": 2, "eta": 0.5})
    opt["train"]["ema_scheduler"] = dict_to_nonedict(
        {"enabled": True, "ema_decay": 0.99, "step_start_ema": 0})
    model = DiffusionModel(opt, seed=0)
    model.feed_data(synth_batch(b=2, in_ch=1, out_ch=1))
    model.optimize_parameters()
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False, use_ema=True))
    assert np.isfinite(out).all()

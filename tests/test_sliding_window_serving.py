"""Sliding-window Picard sampling through the production serving surfaces.

`model.sliding_window {window, tau}` / `set_sliding_window()` route
`DiffusionModel.test()` / `sample()` (the serving surface of the reference's
/root/reference/model/model.py:63-85) through the windowed parallel sampler
(diffusion/parallel_sampling.py). The windowed chain uses its own frozen
fold_in noise layout, so tau=0 is NOT bit-equal to the scan sampler — the
serving contract pinned here is: tau=0 output is identical at EVERY window
width (the frozen-noise sequential chain), the exact chain returns when the
mode is unset, and the mode composes with EMA weights / errors loudly when
combined with DeepCache.
"""

import numpy as np
import pytest

from diffsplitting_tpu.config import dict_to_nonedict
from diffsplitting_tpu.train import DiffusionModel

from tests.test_trainer import synth_batch, tiny_opt


def _sr3_opt(tmp_path, sliding_window=None):
    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1)
    if sliding_window is not None:
        opt["model"]["sliding_window"] = dict_to_nonedict(sliding_window)
    return opt


def test_config_tau0_equal_across_window_widths(tmp_path):
    """model.sliding_window at tau=0 yields the frozen-noise sequential
    chain — identical output for W=1 and any wider window."""
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    outs = {}
    for W in (1, 3, 8):
        model = DiffusionModel(
            _sr3_opt(tmp_path, {"window": W, "tau": 0.0}), seed=0)
        assert model.sliding_window == (W, 0.0)
        model.set_new_noise_schedule(
            model.opt["model"]["beta_schedule"]["val"], "val")
        model.feed_data(batch)
        outs[W] = np.asarray(model.test(continuous=False))
        # tau=0 forces exactly one step of progress per sweep
        assert model.last_sliding_sweeps == model.current_sched.num_timesteps
    # a different W compiles a different (W*B)-batched forward — XLA
    # reassociates reductions, so width-invariance holds to float32
    # tolerance, not bitwise
    np.testing.assert_allclose(outs[3], outs[1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(outs[8], outs[1], rtol=1e-3, atol=1e-4)


def test_set_sliding_window_toggles_back_to_exact(tmp_path):
    model = DiffusionModel(_sr3_opt(tmp_path), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    model.feed_data(batch)

    model._rng_counter = 100
    exact = np.asarray(model.test(continuous=False))

    model.set_sliding_window(4, 0.0)
    model._rng_counter = 100
    windowed = np.asarray(model.test(continuous=False))
    assert windowed.shape == exact.shape
    assert np.isfinite(windowed).all()

    model.set_sliding_window(None)
    model._rng_counter = 100
    again = np.asarray(model.test(continuous=False))
    np.testing.assert_array_equal(again, exact)


def test_mutually_exclusive_with_deepcache(tmp_path):
    model = DiffusionModel(_sr3_opt(tmp_path, {"window": 4}), seed=0)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"], "val")
    model.set_deepcache(2, 1)
    model.feed_data({"input": synth_batch(b=1, in_ch=1, out_ch=1)["input"]})
    with pytest.raises(ValueError, match="mutually"):
        model.test(continuous=False)


def test_joint_indi_sliding_window_serving(tmp_path):
    """joint_indi test() rides the per-channel windowed InDI samplers;
    tau=0 output is window-width invariant."""
    opt = tiny_opt("joint_indi", tmp_path, conditional=False, in_ch=1,
                   out_ch=1, channels=1)
    model = DiffusionModel(opt, seed=0)
    batch = {"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]}
    model.feed_data(batch)

    model.set_sliding_window(1, 0.0)
    model._rng_counter = 50
    ref = np.asarray(model.test(continuous=False))
    assert ref.shape == (2, 16, 16, 2)
    # both channels' chains sweep once per step at tau=0
    assert model.last_sliding_sweeps == 2 * model.current_T

    model.set_sliding_window(3, 0.0)
    model._rng_counter = 50
    wide = np.asarray(model.test(continuous=False))
    np.testing.assert_allclose(wide, ref, rtol=1e-3, atol=1e-4)

    model.set_sliding_window(4, 0.5)
    model._rng_counter = 50
    fast = np.asarray(model.test(continuous=False))
    assert fast.shape == ref.shape and np.isfinite(fast).all()


def test_unconditional_sample_sliding_window(tmp_path):
    """sample() (unconditional generation, sample.py's serving path) rides
    the windowed chain; tau=0 is window-width invariant there too."""
    opt = tiny_opt("ddpm", tmp_path, conditional=False, in_ch=2, out_ch=2,
                   channels=2)
    model = DiffusionModel(opt, seed=0)

    model.set_sliding_window(1, 0.0)
    model._rng_counter = 10
    ref = np.asarray(model.sample(batch_size=2, continuous=False))

    model.set_sliding_window(4, 0.0)
    model._rng_counter = 10
    wide = np.asarray(model.sample(batch_size=2, continuous=False))
    np.testing.assert_allclose(wide, ref, rtol=1e-3, atol=1e-4)

    # trajectory sampling falls back to the exact chain (windowed loop
    # keeps no frames)
    frames = np.asarray(model.sample(batch_size=1, continuous=True))
    assert frames.ndim == 5


def test_ema_plus_sliding_window(tmp_path):
    """use_ema=True serves the windowed chain with EMA weights (params stay
    jit arguments, so weight choice is orthogonal to the sampler)."""
    opt = _sr3_opt(tmp_path, {"window": 3, "tau": 0.0})
    opt["train"]["ema_scheduler"] = dict_to_nonedict(
        {"enabled": True, "ema_decay": 0.99, "step_start_ema": 0})
    model = DiffusionModel(opt, seed=0)
    model.feed_data(synth_batch(b=2, in_ch=1, out_ch=1))
    model.optimize_parameters()
    model.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    model.feed_data({"input": synth_batch(b=2, in_ch=1, out_ch=1)["input"]})
    out = np.asarray(model.test(continuous=False, use_ema=True))
    assert np.isfinite(out).all()

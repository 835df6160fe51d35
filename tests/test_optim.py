"""LR schedules + gradient accumulation (train/optim.py).

Both are opt-in; unset configs must reproduce the reference's fixed-LR bare
Adam (/root/reference/model/model.py:39-40).
"""

import jax
import numpy as np
import optax

from diffsplitting_tpu.train.optim import make_lr, maybe_accumulate

from tests.test_trainer import synth_batch, tiny_opt


def test_make_lr_unset_is_float():
    assert make_lr(1e-4, None, 1000) == 1e-4
    assert make_lr(1e-4, {}, 1000) == 1e-4


def test_make_lr_cosine():
    s = make_lr(1e-3, {"type": "cosine", "warmup": 100,
                       "end_factor": 0.1}, 1000)
    assert float(s(0)) < 1e-5                       # warmup starts ~0
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-5)  # peak
    np.testing.assert_allclose(float(s(1000)), 1e-4, rtol=1e-2)  # end_factor
    # monotone decay after the peak
    vals = [float(s(t)) for t in range(100, 1001, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_make_lr_linear_and_constant_warmup():
    lin = make_lr(1e-3, {"type": "linear", "decay_iters": 500}, None)
    np.testing.assert_allclose(float(lin(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(lin(500)), 0.0, atol=1e-9)
    warm = make_lr(1e-3, {"type": "constant", "warmup": 50}, 1000)
    assert float(warm(0)) < 1e-5
    np.testing.assert_allclose(float(warm(50)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(warm(900)), 1e-3, rtol=1e-5)


def test_make_lr_rejects_unknown():
    try:
        make_lr(1e-3, {"type": "step"}, 100)
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_maybe_accumulate_dispatch():
    base = optax.adam(1e-3)
    assert maybe_accumulate(base, None) is base
    assert maybe_accumulate(base, {"accum_steps": 1}) is base
    assert isinstance(maybe_accumulate(base, {"accum_steps": 4}),
                      optax.MultiSteps)


def test_trainer_accumulation_updates_every_k(tmp_path):
    """With accum_steps=3 the params are bit-frozen for micro-steps 1..2 and
    move exactly at step 3 (optax.MultiSteps applies Adam on the 3-step mean
    gradient)."""
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt["train"]["optimizer"]["accum_steps"] = 3
    m = DiffusionModel(opt)
    leaf = lambda: np.asarray(jax.tree_util.tree_leaves(m.params)[0])  # noqa: E731
    p0 = leaf().copy()
    for i in range(2):
        m.feed_data(synth_batch(seed=i))
        m.optimize_parameters()
        np.testing.assert_array_equal(leaf(), p0)
    m.feed_data(synth_batch(seed=2))
    m.optimize_parameters()
    assert np.max(np.abs(leaf() - p0)) > 0
    assert np.isfinite(m.get_current_log()["l_pix"])


def test_trainer_lr_schedule_runs(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1, loss="l2")
    opt["train"]["optimizer"]["schedule"] = {
        "type": "cosine", "warmup": 2, "decay_iters": 10}
    m = DiffusionModel(opt)
    for i in range(3):
        m.feed_data(synth_batch(seed=i, in_ch=1, out_ch=1))
        m.optimize_parameters()
        assert np.isfinite(m.get_current_log()["l_pix"])


def test_trainer_accum_composes_with_clip_and_ema(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt["train"]["optimizer"]["accum_steps"] = 2
    opt["train"]["optimizer"]["grad_clip"] = "auto"
    opt["train"]["ema_scheduler"] = {
        "enabled": True, "step_start_ema": 0, "ema_decay": 0.9}
    m = DiffusionModel(opt)
    for i in range(4):
        m.feed_data(synth_batch(seed=i))
        m.optimize_parameters()
    log = m.get_current_log()
    assert np.isfinite(log["l_pix"]) and np.isfinite(log["grad_norm"])
    assert m.ema_params is not None

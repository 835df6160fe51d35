"""Gradient-clipping transforms (train/clipping.py) + trainer integration.

Reference parity: the reference trains with bare Adam and never clips
(/root/reference/model/model.py:39-40), so grad_clip is strictly opt-in —
the default-off path must be bit-identical to before.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsplitting_tpu.train.clipping import clip_by_ema_norm, maybe_clip

from tests.test_trainer import synth_batch, tiny_opt


def _updates(norm, n=4):
    # a 2-leaf tree whose global norm is exactly `norm`
    v = norm / np.sqrt(2 * n)
    return {"a": jnp.full((n,), v), "b": jnp.full((n,), v)}


def test_ema_clip_warmup_passes_through():
    tx = clip_by_ema_norm(factor=2.0, warmup=5)
    state = tx.init(None)
    for _ in range(5):
        u, state = tx.update(_updates(100.0), state)
        np.testing.assert_allclose(optax.global_norm(u), 100.0, rtol=1e-6)


def test_ema_clip_caps_spike_and_ema_not_inflated():
    tx = clip_by_ema_norm(factor=2.0, decay=0.9, warmup=3)
    state = tx.init(None)
    for _ in range(30):  # steady-state norm 10 → EMA ≈ 10
        u, state = tx.update(_updates(10.0), state)
    ema_before = float(state.ema)
    assert abs(ema_before - 10.0) < 0.5

    # a 100× spike is clipped to factor×EMA ≈ 20, not 1000
    u, state = tx.update(_updates(1000.0), state)
    spike_norm = float(optax.global_norm(u))
    assert spike_norm < 25.0, spike_norm
    # the EMA tracked the POST-clip norm: the spike can't raise its own
    # ceiling past one decayed step of the clipped value
    assert float(state.ema) < ema_before * 1.2

    # normal steps afterwards are untouched
    u, state = tx.update(_updates(10.0), state)
    np.testing.assert_allclose(optax.global_norm(u), 10.0, rtol=1e-6)


def test_ema_clip_adapts_to_regime_change():
    tx = clip_by_ema_norm(factor=2.0, decay=0.9, warmup=3)
    state = tx.init(None)
    for _ in range(20):
        _, state = tx.update(_updates(10.0), state)
    # sustained shift to norm 18 (< factor×EMA): never clipped, EMA follows
    for _ in range(40):
        u, state = tx.update(_updates(18.0), state)
    np.testing.assert_allclose(optax.global_norm(u), 18.0, rtol=1e-6)
    assert float(state.ema) > 16.0


def test_maybe_clip_dispatch():
    base = optax.adam(1e-3)
    assert maybe_clip(base, None) is base
    assert maybe_clip(base, {"lr": 1e-3}) is base  # unset → untouched
    for cfg in ({"grad_clip": 1.0}, {"grad_clip": "auto"},
                {"grad_clip": "auto", "grad_clip_factor": 3.0}):
        tx = maybe_clip(base, cfg)
        assert tx is not base
        p = {"w": jnp.ones((3,))}
        state = tx.init(p)
        u, _ = tx.update({"w": jnp.ones((3,))}, state, p)
        assert np.all(np.isfinite(np.asarray(u["w"])))


def test_trainer_grad_clip_and_norm_logging(tmp_path):
    from diffsplitting_tpu.train import DiffusionModel

    opt = tiny_opt("sr3", tmp_path, conditional=True, in_ch=2, out_ch=1,
                   channels=1, loss="l2")
    opt["train"]["optimizer"]["grad_clip"] = "auto"
    m = DiffusionModel(opt)
    for i in range(3):
        m.feed_data(synth_batch(seed=i, in_ch=1, out_ch=1))
        m.optimize_parameters()
        log = m.get_current_log()
        assert np.isfinite(log["l_pix"])
        assert np.isfinite(log["grad_norm"]) and log["grad_norm"] > 0


def test_trainer_fixed_clip_caps_update(tmp_path):
    """A near-zero global-norm ceiling must freeze the params (post-Adam the
    update magnitude is lr-scaled, but zero-clipped grads give zero Adam
    updates up to eps), while the unclipped run moves them."""
    from diffsplitting_tpu.train import DiffusionModel

    def run(clip):
        opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
        if clip is not None:
            opt["train"]["optimizer"]["grad_clip"] = clip
        m = DiffusionModel(opt)
        before = jax.tree_util.tree_leaves(m.params)[0].copy()
        m.feed_data(synth_batch())
        m.optimize_parameters()
        after = jax.tree_util.tree_leaves(m.params)[0]
        return float(jnp.max(jnp.abs(after - before)))

    moved_clipped = run(1e-30)
    moved_free = run(None)
    assert moved_clipped < 1e-6, moved_clipped
    assert moved_free > 1e-5, moved_free

"""Opt-in EMA tracking and remat (gradient checkpointing) paths."""

import jax
import numpy as np

from tests.test_trainer import synth_batch, tiny_opt
from diffsplitting_tpu.train import DiffusionModel


def test_ema_tracks_params():
    opt = tiny_opt("indi", in_ch=2, out_ch=2)
    opt["train"]["ema_scheduler"] = {
        "enabled": True, "step_start_ema": 2, "update_ema_every": 1, "ema_decay": 0.5,
    }
    m = DiffusionModel(opt)
    assert m.use_ema
    for i in range(4):
        m.feed_data(synth_batch(seed=i))
        m.optimize_parameters()
    # before step_start_ema the EMA copies params exactly; after, it lags
    leaves_p = jax.tree_util.tree_leaves(m.params)
    leaves_e = jax.tree_util.tree_leaves(m.ema_params)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(leaves_p, leaves_e)]
    assert max(diffs) > 0  # lagging after decay kicks in
    assert all(np.all(np.isfinite(np.asarray(e))) for e in leaves_e)


def test_no_ema_by_default():
    m = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2))
    assert not m.use_ema
    m.feed_data(synth_batch())
    m.optimize_parameters()
    assert m.ema_params is None


def test_remat_config_trains():
    opt = tiny_opt("indi", in_ch=2, out_ch=2)
    opt["model"]["remat"] = True
    m = DiffusionModel(opt)
    m.feed_data(synth_batch())
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])


def test_compute_dtype_config():
    import jax.numpy as jnp

    opt = tiny_opt("indi", in_ch=2, out_ch=2)
    opt["model"]["compute_dtype"] = "bfloat16"
    m = DiffusionModel(opt)
    assert m.nets["net"].dtype == jnp.bfloat16
    m.feed_data(synth_batch())
    m.optimize_parameters()
    assert np.isfinite(m.get_current_log()["l_pix"])


def test_ema_checkpoint_roundtrip(tmp_path):
    """EMA weights persist through save/load and aren't reset to fresh params."""
    import numpy as np

    opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt["train"]["ema_scheduler"] = {
        "enabled": True, "step_start_ema": 0, "ema_decay": 0.5,
    }
    m = DiffusionModel(opt)
    for i in range(3):
        m.feed_data(synth_batch(seed=i))
        m.optimize_parameters()
    m.save_network(epoch=1, iter_step=3)
    ema_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(m.ema_params)]

    opt2 = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt2["train"]["ema_scheduler"] = {
        "enabled": True, "step_start_ema": 0, "ema_decay": 0.5,
    }
    opt2["path"]["resume_state"] = str(tmp_path / "I3_E1")
    m2 = DiffusionModel(opt2)
    ema_after = [np.asarray(x) for x in jax.tree_util.tree_leaves(m2.ema_params)]
    for a, b in zip(ema_before, ema_after):
        np.testing.assert_allclose(a, b)
    assert m2.global_step == 3


def test_dropout_rbg_stream_default():
    """Dropout masks ride an rbg-derived key by default (threefry mask bits
    were 31% of the flagship train step on v5e — trainer._dropout_key);
    train.dropout_prng='threefry' opts out. Both must train finite."""
    import numpy as np

    for impl in ("rbg", "threefry"):
        opt = tiny_opt("indi", in_ch=2, out_ch=2)
        opt["model"]["unet"]["dropout"] = 0.3
        if impl == "threefry":
            opt["train"]["dropout_prng"] = impl
        m = DiffusionModel(opt)
        assert m._dropout_prng == impl
        for i in range(2):
            m.feed_data(synth_batch(seed=i))
            m.optimize_parameters()
        assert np.isfinite(m.get_current_log()["l_pix"])


def test_finetune_norm_fails_loudly():
    import pytest

    opt = tiny_opt("indi", in_ch=2, out_ch=2)
    opt["model"]["finetune_norm"] = True
    with pytest.raises(ValueError, match="finetune_norm"):
        DiffusionModel(opt)

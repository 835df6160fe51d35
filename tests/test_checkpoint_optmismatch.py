"""Optimizer-chain mismatch tolerance in load_checkpoint.

A checkpoint's `_opt` payload holds the FULL optimizer-chain state of the
model that wrote it. Reloading with a model built around a different chain
(e.g. trained with grad_clip's clip-EMA wrapper, reloaded bare-Adam for
resume-only sampling) used to crash in orbax's structure check and lose the
run; load_checkpoint now partial-restores step/EMA and returns
opt_state=None with a warning (checkpoints.py). Reference contract:
/root/reference/model/model.py:150-173 (resume loads gen+opt pair).
"""

import warnings

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffsplitting_tpu.train.checkpoints import load_checkpoint, save_checkpoint


def _params():
    return {"net": {"Conv_0": {"kernel": jnp.ones((3, 3, 2, 4)),
                               "bias": jnp.zeros((4,))}}}


def test_mismatched_opt_chain_restores_step_and_ema(tmp_path):
    params = _params()
    # writer: clip + adam chain (two-element chain state)
    writer_opt = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adam(1e-3)).init(params)
    ema = {"net": {"Conv_0": {"kernel": 2.0 * jnp.ones((3, 3, 2, 4)),
                              "bias": jnp.ones((4,))}}}
    save_checkpoint(str(tmp_path), "I7_E1", params, writer_opt, 1, 7,
                    ema_params=ema)

    # reader: bare adam — different chain structure
    reader_opt = optax.adam(1e-3).init(params)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        p, opt_state, epoch, step, ema_r = load_checkpoint(
            str(tmp_path / "I7_E1"), params, reader_opt, with_ema=True)
    assert any("optimizer chain" in str(w.message) for w in rec)
    assert opt_state is None  # caller keeps its fresh optimizer
    assert (epoch, step) == (1, 7)
    np.testing.assert_array_equal(
        np.asarray(ema_r["net"]["Conv_0"]["bias"]), np.ones(4))
    np.testing.assert_array_equal(
        np.asarray(p["net"]["Conv_0"]["bias"]), np.zeros(4))


def test_matching_opt_chain_still_roundtrips(tmp_path):
    params = _params()
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(1e-3)).init(params)
    save_checkpoint(str(tmp_path), "I3_E0", params, opt, 0, 3)
    _, opt_state, _, step, _ = load_checkpoint(
        str(tmp_path / "I3_E0"), params, opt)
    assert step == 3 and opt_state is not None
    # adam moments round-trip exactly
    np.testing.assert_array_equal(
        np.asarray(opt_state[1][0].mu["net"]["Conv_0"]["bias"]),
        np.asarray(opt[1][0].mu["net"]["Conv_0"]["bias"]))


def test_non_structure_errors_still_raise(tmp_path):
    params = _params()
    opt = optax.adam(1e-3).init(params)
    save_checkpoint(str(tmp_path), "I2_E0", params, opt, 0, 2)
    bad_shape = {"net": {"Conv_0": {"kernel": jnp.ones((3, 3, 2, 8)),
                                    "bias": jnp.zeros((8,))}}}
    with pytest.raises(Exception):
        load_checkpoint(str(tmp_path / "I2_E0"), bad_shape,
                        optax.adam(1e-3).init(bad_shape))

"""End-to-end PSNR-based t-refinement workflow (scripts/t_refinement_workflow.py).

The reference's flagship inference-time composition
(/root/reference/core/psnr_based_t_refinement.py +
notebooks/time_prediction_evaluation.ipynb): a trained TimePredictor + a
trained joint-InDI model refine the start time for OOD mixtures. Here both
models are overfit on tiny synthetic two-channel data, and the workflow must
(a) recover t_true≈0.35 from the mixture and (b) beat naive t=0.5 inference.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

PATCH = 16


def _synth_channels(n=8, seed=0):
    """Morphologically distinct smooth channels (coarse blobs vs fine grain)."""
    rng = np.random.default_rng(seed)
    ch0 = np.stack([gaussian_filter(rng.normal(size=(PATCH, PATCH)), 3.0)
                    for _ in range(n)])
    ch1 = np.stack([gaussian_filter(rng.normal(size=(PATCH, PATCH)), 0.8)
                    for _ in range(n)])
    # positive microscopy-like counts in a uint16-ish range
    ch0 = 200 + 1200 * (ch0 - ch0.min()) / np.ptp(ch0)
    ch1 = 200 + 1200 * (ch1 - ch1.min()) / np.ptp(ch1)
    return ch0.astype(np.float32), ch1.astype(np.float32)


def _write_val_tiffs(tmp_path, ch0, ch1):
    from diffsplitting_tpu.data.io import save_tiff_stack

    p0 = str(tmp_path / "val_ch0.tif")
    p1 = str(tmp_path / "val_ch1.tif")
    save_tiff_stack(p0, ch0.astype(np.uint16))
    save_tiff_stack(p1, ch1.astype(np.uint16))
    return p0, p1


def _joint_cfg(tmp_path, p0, p1):
    return {
        "name": "tref", "phase": "train",
        "path": {"checkpoint": str(tmp_path / "ckpt"), "resume_state": None},
        "datasets": {
            "patch_size": PATCH, "max_qval": 1.0, "channel_weights": [1, 1],
            "val": {"name": "Hagen", "datapath": {"ch0": p0, "ch1": p1}},
        },
        "model": {
            "which_model_G": "joint_indi", "loss_type": "l1",
            "lr_reduction": "mean", "finetune_norm": False,
            "allow_full_translation": True,
            "unet": {"in_channel": 1, "out_channel": 1, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {"train": {"n_timestep": 10},
                              "val": {"n_timestep": 4}},
            "diffusion": {"image_size": PATCH, "channels": 1,
                          "conditional": False},
        },
        "train": {"n_iter": 1, "optimizer": {"type": "adam", "lr": 2e-3}},
    }


@pytest.mark.slow
def test_refined_t_beats_naive_on_ood_mixture(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from diffsplitting_tpu.config import dict_to_nonedict
    from diffsplitting_tpu.data.split_dataset import compute_normalization_dict
    from diffsplitting_tpu.models import TimePredictor
    from diffsplitting_tpu.parallel.mesh import init_on_host
    from diffsplitting_tpu.train import DiffusionModel

    ch0, ch1 = _synth_channels()
    p0, p1 = _write_val_tiffs(tmp_path, ch0, ch1)
    cfg = _joint_cfg(tmp_path, p0, p1)
    os.makedirs(cfg["path"]["checkpoint"], exist_ok=True)

    # normalization identical to the workflow script's (quantile scheme on
    # the same TIFF round-tripped data)
    data_dict = {0: list(ch0.astype(np.uint16).astype(np.float32)),
                 1: list(ch1.astype(np.uint16).astype(np.float32))}
    norm = compute_normalization_dict(data_dict, [1, 1], q_val=1.0)
    mt = np.asarray(norm["mean_target"], np.float32)
    st = np.asarray(norm["std_target"], np.float32)
    ch0n = (np.stack(data_dict[0]) - mt[0]) / st[0]
    ch1n = (np.stack(data_dict[1]) - mt[1]) / st[1]
    target = np.stack([ch0n, ch1n], axis=-1).astype(np.float32)

    # ---- overfit the joint splitter on the fixed batch
    model = DiffusionModel(dict_to_nonedict(cfg), seed=0)
    model.feed_data({"target": target})
    for _ in range(700):
        model.optimize_parameters()
    loss = float(model.log_dict["l_pix"])
    assert np.isfinite(loss)
    model.save_network(epoch=1, iter_step=700)
    joint_prefix = str(tmp_path / "ckpt" / "I700_E1")

    # ---- overfit a tiny TimePredictor: mixture -> t
    tp = TimePredictor(in_channel=1, out_channel=1, inner_channel=8,
                       norm_groups=4, channel_mults=(1, 2), attn_res=(),
                       res_blocks=1, dropout=0.0, image_size=PATCH)
    tp_params = init_on_host(
        tp.init, jax.random.PRNGKey(1), jnp.zeros((1, PATCH, PATCH, 1))
    )["params"]
    tx = optax.adam(2e-3)
    opt_state = jax.jit(tx.init)(tp_params)

    @jax.jit
    def tp_step(params, opt_state, x, t):
        def loss_fn(p):
            return jnp.mean((tp.apply({"params": p}, x) - t) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(7)
    for _ in range(250):
        t = rng.uniform(0.1, 0.9, size=(8,)).astype(np.float32)
        x = (t[:, None, None] * ch0n + (1 - t[:, None, None]) * ch1n)[..., None]
        tp_params, opt_state, tp_loss = tp_step(
            tp_params, opt_state, jnp.asarray(x, jnp.float32), jnp.asarray(t))
    assert float(tp_loss) < 0.05, f"time predictor failed to fit: {tp_loss}"

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tp_prefix = str(tmp_path / "ckpt" / "best_time_predictor")
    ckptr.save(tp_prefix + "_gen", jax.device_get(tp_params), force=True)
    ckptr.wait_until_finished()

    # ---- run the workflow script
    cfg["phase"] = "val"
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out_json = str(tmp_path / "report.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = repo
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    res = subprocess.run(
        [sys.executable, "scripts/t_refinement_workflow.py",
         "-c", str(cfg_path), "--resume", joint_prefix,
         "--time-resume", tp_prefix, "--t-true", "0.35",
         "--num_steps", "4", "--batch", "8", "--out", out_json],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.load(open(out_json))[0]

    # the grid search must land near the true mixing fraction …
    assert abs(report["consensus_t"] - 0.35) <= 0.15, report
    # … and starting the bridge there must beat the naive 0.5 start
    refined = report["psnr_refined_ch0"] + report["psnr_refined_ch1"]
    naive = report["psnr_naive_ch0"] + report["psnr_naive_ch1"]
    assert refined > naive, report

"""DevicePatchPool: on-device batch drawing must mirror SplitDataset's host
path (split_dataset.py:244-279 semantics; reference data/split_dataset.py
:227-278) while keeping pixels off the host after one upload."""

import json

import numpy as np
import pytest

import jax

import diffsplitting_tpu.data.split_dataset as sd
from diffsplitting_tpu.data.device_pool import DevicePatchPool
from diffsplitting_tpu.data.split_dataset import DataLocation, SplitDataset

F, H, W = 4, 24, 24


@pytest.fixture
def synth(monkeypatch):
    rng = np.random.default_rng(3)
    ch0 = [rng.uniform(0, 100, (H, W)).astype(np.float32) for _ in range(F)]
    ch1 = [rng.uniform(0, 50, (H, W)).astype(np.float32) for _ in range(F)]
    monkeypatch.setattr(sd, "load_data", lambda *a, **k: {0: list(ch0), 1: list(ch1)})
    return np.stack(ch0), np.stack(ch1)


def make_ds(**kw):
    defaults = dict(
        data_type="Hagen",
        data_location=DataLocation(channelwise_fpath=("a", "b")),
        patch_size=H,  # whole-frame patches -> exact frame matching in tests
        max_qval=1.0,
        enable_transforms=False,
        random_patching=True,
    )
    defaults.update(kw)
    return SplitDataset(**defaults)


def _match_frame(patch, frames):
    """Index of the frame exactly equal to `patch`, or -1."""
    for i in range(frames.shape[0]):
        if np.allclose(patch, frames[i], atol=1e-5):
            return i
    return -1


def test_draw_shapes_device_resident(synth):
    ds = make_ds(patch_size=8)
    pool = DevicePatchPool(ds, batch_size=6)
    b = pool.draw()
    assert b["input"].shape == (6, 8, 8, 1)
    assert b["target"].shape == (6, 8, 8, 2)
    assert b["input"].dtype == np.float32
    assert isinstance(b["input"], jax.Array)  # device-resident, no host copy


def test_values_match_host_semantics(synth):
    """Whole-frame draws: every sample must be a normalized real frame pair
    (correlated), with input = normalize(w0*raw0 + w1*raw1)."""
    ch0, ch1 = synth
    ds = make_ds(channel_weights=[1.0, 0.5])
    pool = DevicePatchPool(ds, batch_size=16)
    b = jax.tree_util.tree_map(np.asarray, pool.draw())
    nd = ds.get_normalization_dict()
    mean_t, std_t = nd["mean_target"], nd["std_target"]
    for s in range(16):
        raw = b["target"][s] * std_t + mean_t  # un-normalize -> raw pair
        i0 = _match_frame(raw[..., 0], ch0)
        i1 = _match_frame(raw[..., 1], ch1)
        assert i0 >= 0 and i1 == i0, "correlated draw must use one frame idx"
        want_inp = (1.0 * ch0[i0] + 0.5 * ch1[i0] - nd["mean_input"]) / nd["std_input"]
        np.testing.assert_allclose(b["input"][s, ..., 0], want_inp, atol=1e-4)


def test_uncorrelated_channels(synth):
    ch0, ch1 = synth
    ds = make_ds(uncorrelated_channels=True)
    pool = DevicePatchPool(ds, batch_size=32)
    b = jax.tree_util.tree_map(np.asarray, pool.draw())
    nd = ds.get_normalization_dict()
    raw = b["target"] * nd["std_target"] + nd["mean_target"]
    pairs = [(_match_frame(raw[s, ..., 0], ch0), _match_frame(raw[s, ..., 1], ch1))
             for s in range(32)]
    assert all(i0 >= 0 and i1 >= 0 for i0, i1 in pairs)
    assert any(i0 != i1 for i0, i1 in pairs), "ch1 must draw frames independently"


def test_hflip_paired(synth):
    ch0, ch1 = synth
    ds = make_ds(enable_transforms=True)
    pool = DevicePatchPool(ds, batch_size=32)
    b = jax.tree_util.tree_map(np.asarray, pool.draw())
    nd = ds.get_normalization_dict()
    raw = b["target"] * nd["std_target"] + nd["mean_target"]
    flipped = unflipped = 0
    for s in range(32):
        i_plain = _match_frame(raw[s, ..., 0], ch0)
        i_flip = _match_frame(raw[s, ..., 0], ch0[:, :, ::-1])
        assert (i_plain >= 0) != (i_flip >= 0)
        if i_plain >= 0:  # ch1 must NOT be flipped either (paired aug)
            unflipped += 1
            assert _match_frame(raw[s, ..., 1], ch1) == i_plain
        else:
            flipped += 1
            assert _match_frame(raw[s, ..., 1], ch1[:, :, ::-1]) == i_flip
    assert flipped and unflipped, "p=0.5 flip must produce both kinds in 32 draws"


def test_input_from_normalized_target(synth):
    ds = make_ds(input_from_normalized_target=True, channel_weights=[1.0, 1.0])
    pool = DevicePatchPool(ds, batch_size=4)
    b = jax.tree_util.tree_map(np.asarray, pool.draw())
    np.testing.assert_allclose(
        b["input"][..., 0], b["target"][..., 0] + b["target"][..., 1], atol=1e-5)


def test_target_channel_idx(synth):
    ds_full = make_ds()
    ds = make_ds(target_channel_idx=1, normalization_dict=ds_full.get_normalization_dict())
    pool = DevicePatchPool(ds, batch_size=3)
    assert pool.draw()["target"].shape == (3, H, W, 1)


def test_determinism_and_stream(synth):
    ds = make_ds(patch_size=8)
    p1, p2 = DevicePatchPool(ds, 4, seed=7), DevicePatchPool(ds, 4, seed=7)
    a, b = p1.draw(), p2.draw()
    np.testing.assert_array_equal(np.asarray(a["target"]), np.asarray(b["target"]))
    c = p1.draw()  # stream advances
    assert not np.array_equal(np.asarray(a["target"]), np.asarray(c["target"]))
    assert p1._draw_jit is p1._draw_jit  # jit built once, reused


def test_random_offsets_are_valid_crops(synth):
    """Sub-frame patches: each drawn patch must exist verbatim somewhere in
    some source frame (validates offset bounds + slicing)."""
    ch0, _ = synth
    ds = make_ds(patch_size=8)
    pool = DevicePatchPool(ds, batch_size=8)
    b = jax.tree_util.tree_map(np.asarray, pool.draw())
    nd = ds.get_normalization_dict()
    raw0 = b["target"][..., 0] * nd["std_target"][..., 0] + nd["mean_target"][..., 0]
    for s in range(8):
        found = any(
            np.allclose(raw0[s], ch0[i, y:y + 8, x:x + 8], atol=1e-4)
            for i in range(F) for y in range(H - 8) for x in range(W - 8))
        assert found, f"sample {s} is not a crop of any frame"


def test_mesh_sharded_output(synth):
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(devs, ("data",))
    ds = make_ds(patch_size=8)
    pool = DevicePatchPool(ds, batch_size=8, mesh=mesh)
    b = pool.draw()
    spec = b["input"].sharding.spec
    assert tuple(spec)[:1] == ("data",), spec


def test_fused_pool_train_step(synth):
    """attach_pool: the patch draw runs INSIDE the train-step jit (one
    dispatch per iteration — no feed_data, no standalone draw). Loss must be
    finite and the whole fused pipeline deterministic under fixed seeds."""
    from diffsplitting_tpu.train import DiffusionModel

    from tests.test_trainer import tiny_opt

    ds = make_ds(patch_size=8)

    def run(n):
        m = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2), seed=0)
        m.attach_pool(DevicePatchPool(ds, batch_size=4, seed=3, mesh=m.mesh))
        for _ in range(n):
            m.optimize_parameters()  # no feed_data — draw is in-jit
        return m

    m1, m2 = run(3), run(3)
    assert np.isfinite(float(m1.get_current_log()["l_pix"]))
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # detach restores the feed_data path
    m1.attach_pool(None)
    m1.feed_data({"input": np.zeros((4, 8, 8, 1), np.float32),
                  "target": np.zeros((4, 8, 8, 2), np.float32)})
    m1.optimize_parameters()
    assert np.isfinite(float(m1.get_current_log()["l_pix"]))


def test_split_cli_device_pool(tmp_path):
    """split.py end-to-end with datasets.train.device_pool: true (the
    production wiring: pool draws feed feed_data/optimize_parameters)."""
    from tests.test_cli_e2e import run_cli, write_tiff

    import os
    data = tmp_path / "data"
    data.mkdir()
    for split_name, seed in [("train", 0), ("val", 1)]:
        write_tiff(str(data / f"{split_name}_ch0.tif"), seed=seed)
        write_tiff(str(data / f"{split_name}_ch1.tif"), seed=seed + 10)
    cfg = {
        "name": "poolsmoke", "phase": "train", "gpu_ids": [0],
        "path": {"root": str(tmp_path / "exp"), "log": "logs",
                 "results": "results", "checkpoint": "checkpoint",
                 "resume_state": None},
        "datasets": {
            "upper_clip": False, "patch_size": 32, "max_qval": 1.0,
            "channel_weights": [1, 1],
            "train": {"name": "Hagen",
                      "datapath": {"ch0": str(data / "train_ch0.tif"),
                                   "ch1": str(data / "train_ch1.tif")},
                      "datatype": "img", "batch_size": 4, "num_workers": 0,
                      "use_shuffle": True, "uncorrelated_channels": False,
                      "device_pool": True},
            "val": {"name": "Hagen",
                    "datapath": {"ch0": str(data / "val_ch0.tif"),
                                 "ch1": str(data / "val_ch1.tif")},
                    "patch_size": 32, "datatype": "img"},
        },
        "model": {
            "which_model_G": "indi", "loss_type": "l1",
            "lr_reduction": "mean", "finetune_norm": False,
            "unet": {"in_channel": 2, "out_channel": 2, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [], "res_blocks": 1, "dropout": 0},
            "beta_schedule": {
                "train": {"schedule": "linear", "n_timestep": 10,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "linear", "n_timestep": 2,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 2, "conditional": False},
        },
        "train": {"n_iter": 4, "val_freq": 4, "save_checkpoint_freq": 4,
                  "print_freq": 2, "optimizer": {"type": "adam", "lr": 1e-3}},
        "wandb": {"project": "smoke"},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli("split.py", ["-p", "train", "-c", str(p),
                               "-rootdir", str(tmp_path / "exp")], cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]
    month = next((tmp_path / "exp").iterdir())
    log = (month / "Hagen-indi-l1" / "0" / "logs" / "train.log").read_text()
    assert "device_pool: " in log and "l_pix" in log
    assert "Validation # PSNR" in log

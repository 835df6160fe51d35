"""SplitDataset / TimePredictorDataset / loader behavior tests (synthetic data)."""

import numpy as np
import pytest

import diffsplitting_tpu.data.split_dataset as sd
from diffsplitting_tpu.data import NumpyLoader, SplitDataset, TimePredictorDataset
from diffsplitting_tpu.data.split_dataset import (
    DataLocation,
    compute_normalization_dict,
)


@pytest.fixture
def synth(monkeypatch):
    N, H, W = 4, 64, 64
    rng = np.random.default_rng(0)
    ch0 = [rng.uniform(0, 100, (H, W)).astype(np.float32) for _ in range(N)]
    ch1 = [rng.uniform(0, 50, (H, W)).astype(np.float32) for _ in range(N)]
    monkeypatch.setattr(sd, "load_data", lambda *a, **k: {0: list(ch0), 1: list(ch1)})
    return ch0, ch1


def make_ds(**kw):
    defaults = dict(
        data_type="Hagen",
        data_location=DataLocation(channelwise_fpath=("a", "b")),
        patch_size=32,
        max_qval=1.0,
        enable_transforms=False,
        random_patching=False,
    )
    defaults.update(kw)
    return SplitDataset(**defaults)


def test_dataloc_validation():
    with pytest.raises(AssertionError):
        DataLocation()
    with pytest.raises(AssertionError):
        DataLocation(fpath="x", directory="y")
    DataLocation(directory="z")


def test_normalization_dict_float(synth):
    ch0, ch1 = synth
    nd = compute_normalization_dict({0: ch0, 1: ch1}, [1.0, 1.0], q_val=1.0)
    t0 = np.concatenate([x.reshape(-1) for x in ch0])
    t1 = np.concatenate([x.reshape(-1) for x in ch1])
    assert nd["target0_max"] == pytest.approx(t0.max())
    assert nd["target1_max"] == pytest.approx(t1.max())
    assert nd["input_max"] == pytest.approx((t0 + t1).max())
    assert nd["mean_input"] == pytest.approx(nd["input_max"] / 2)


def test_normalization_dict_uint8():
    nd = compute_normalization_dict({0: [np.zeros((4, 4))]}, [1, 0.5], uint8_data=True)
    assert nd["input_max"] == pytest.approx(255 * 1.5)
    assert nd["mean_target"].shape == (2,)
    nd3 = compute_normalization_dict({0: [np.zeros((4, 4, 3))]}, [1, 1], uint8_data=True)
    assert nd3["mean_target"].shape == (6,)


def test_getitem_shapes_and_normalization(synth):
    ds = make_ds()
    s = ds[0]
    assert s["input"].shape == (32, 32, 1)
    assert s["target"].shape == (32, 32, 2)
    assert s["input"].dtype == np.float32
    # values roughly in [-1, 1] after quantile-max normalization
    assert s["target"].min() >= -1.001 and s["target"].max() <= 1.001


def test_getitem_weighted_input(synth):
    ch0, ch1 = synth
    w = [1.0, 0.3]
    ds = make_ds(channel_weights=w)
    s = ds[0]
    raw = w[0] * ch0[0][:32, :32] + w[1] * ch1[0][:32, :32]
    nd = ds.get_normalization_dict()
    expected = (raw - nd["mean_input"]) / nd["std_input"]
    np.testing.assert_allclose(s["input"][..., 0], expected, rtol=1e-5)


def test_input_from_normalized_target(synth):
    ds = make_ds(input_from_normalized_target=True)
    s = ds[0]
    expected = s["target"][..., 0:1] + s["target"][..., 1:2]
    np.testing.assert_allclose(s["input"], expected, rtol=1e-5)


def test_target_channel_idx(synth):
    ds = make_ds(target_channel_idx=0)
    assert ds[0]["target"].shape == (32, 32, 1)


def test_grid_patch_locations(synth):
    ds = make_ds()
    # 64/32 = 2 per dim -> 4 per frame, 4 frames
    assert len(ds) == 16
    assert ds.patch_location(0) == (0, 0, 0)
    assert ds.patch_location(1) == (0, 0, 32)
    assert ds.patch_location(2) == (0, 32, 0)
    assert ds.patch_location(5) == (1, 0, 32)


def test_upper_clip(synth):
    ds = make_ds(max_qval=0.5, upper_clip=True)
    nd = ds.get_normalization_dict()
    assert max(x.max() for x in ds._data_dict[0]) <= nd["target0_max"] + 1e-6


def test_uncorrelated_and_random_patching(synth):
    ds = make_ds(random_patching=True, uncorrelated_channels=True, enable_transforms=True)
    s = ds[0]
    assert s["target"].shape == (32, 32, 2)


def test_time_predictor_dataset(synth):
    ds = TimePredictorDataset(
        "Hagen",
        DataLocation(channelwise_fpath=("a", "b")),
        32,
        max_qval=1.0,
        enable_transforms=False,
        random_patching=False,
        gaussian_noise_std_factor=0.02,
    )
    inp, t = ds[0]
    assert inp.shape == (32, 32, 1)
    assert 0.0 <= float(t) < 1.0
    # min-max scaled inputs live around [-1, 1] (noise can push slightly out)
    assert inp.min() > -1.5 and inp.max() < 1.5
    # stats exist for every t on the grid
    assert set(ds.input_normalization_dict.keys()) == set(range(101))


def test_time_predictor_raw_mixture_inputs(synth):
    """raw_mixture_inputs=True returns the plain normalized t-mixture — the
    exact input the t-refinement workflow serves (no per-t min-max)."""
    ds = TimePredictorDataset(
        "Hagen", DataLocation(channelwise_fpath=("a", "b")), 32,
        max_qval=1.0, enable_transforms=False, random_patching=False,
        raw_mixture_inputs=True,
    )
    ds._rng = np.random.default_rng(0)
    inp, t = ds[0]
    # reconstruct the mixture by hand from the same location + t
    fidx, h, w = ds._get_location(0)
    P = 32
    tgt = np.concatenate(
        [np.asarray(ds._data_dict[c][fidx][h:h + P, w:w + P])[..., None]
         for c in (0, 1)], axis=-1).astype(np.float32)
    tgt = ds.normalize_target(tgt)
    want = float(t) * tgt[..., 0:1] + (1 - float(t)) * tgt[..., 1:2]
    np.testing.assert_allclose(inp, want, rtol=1e-4, atol=1e-6)  # f32 vs f64 t


def test_time_predictor_minmax_exact(synth):
    """Per-t min/max must equal a brute-force pixelwise scan."""
    ds = TimePredictorDataset(
        "Hagen", DataLocation(channelwise_fpath=("a", "b")), 32,
        max_qval=1.0, enable_transforms=False, random_patching=False,
    )
    mean = ds._mean_target.reshape(-1)
    std = ds._std_target.reshape(-1)
    ch0 = [(x - mean[0]) / std[0] for x in ds._data_dict[0]]
    ch1 = [(x - mean[1]) / std[1] for x in ds._data_dict[1]]
    for t_int in [0, 37, 100]:
        t = t_int / 100
        mixes = [t * a + (1 - t) * b for a, b in zip(ch0, ch1)]
        lo = min(m.min() for m in mixes)
        hi = max(m.max() for m in mixes)
        got_lo, got_hi = ds.input_normalization_dict[t_int]
        assert got_lo == pytest.approx(lo, rel=1e-5)
        assert got_hi == pytest.approx(hi, rel=1e-5)


def test_numpy_loader_batching(synth):
    ds = make_ds()
    loader = NumpyLoader(ds, batch_size=4, shuffle=True)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["input"].shape == (4, 32, 32, 1)
    assert batches[0]["target"].shape == (4, 32, 32, 2)

    capped = NumpyLoader(ds, batch_size=4, shuffle=False, data_len=3)
    assert len(list(capped)) == 1
    loader0 = NumpyLoader(ds, batch_size=5, shuffle=False, prefetch=0)
    got = list(loader0)
    assert got[-1]["input"].shape[0] == 1  # 16 % 5


def test_loader_propagates_dataset_errors(synth):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError("bad frame")
            return {"x": np.zeros((2, 2), np.float32)}

    loader = NumpyLoader(Broken(), batch_size=1, shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="bad frame"):
        for _ in loader:
            pass


def test_loader_early_break_no_leak(synth):
    import threading

    ds = make_ds()
    before = threading.active_count()
    for _ in range(5):
        for i, _batch in enumerate(NumpyLoader(ds, batch_size=2, prefetch=2)):
            if i == 0:
                break
    # workers must exit after the consumer abandons iteration
    import time

    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_augment_paired_coherence():
    from diffsplitting_tpu.data.augment import augment

    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 8, 1)).astype(np.float32)
    b = a * 2
    # val split: never flips
    oa, ob = augment([a, b], split="val", rng=np.random.default_rng(1))
    np.testing.assert_array_equal(oa, a)
    # train split: both images get the SAME transform
    for seed in range(5):
        oa, ob = augment([a, b], split="train", rng=np.random.default_rng(seed))
        np.testing.assert_allclose(ob, oa * 2)

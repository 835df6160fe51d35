"""Tiling index arithmetic + stitcher round-trip golden tests.

Port of the reference's test style (/root/reference/tests/test_tiling_setup.py):
synthetic arange volume, identity normalization, predict = crop, stitch must
reproduce the original exactly.
"""

import numpy as np
import pytest

from diffsplitting_tpu.data import (
    SplitDatasetTiledPred,
    TileIndexManager,
    TilingMode,
    stitch_predictions,
)
from diffsplitting_tpu.data.split_dataset import DataLocation


def test_index_location_roundtrip():
    mng = TileIndexManager(
        data_shape=(5, 5, 64, 64, 2),
        grid_shape=(1, 1, 8, 8, 2),
        patch_shape=(1, 3, 16, 16, 2),
        tiling_mode=TilingMode.ShiftBoundary,
    )
    total = mng.total_grid_count()
    assert total > 0
    for i in range(total):
        loc = mng.get_location_from_dataset_idx(i)
        assert mng.get_dataset_idx_from_grid_location(loc) == i


def test_grid_counts_modes():
    # data 100, grid 50, patch 100 -> excess 50
    for mode, expect in [
        (TilingMode.PadBoundary, 2),     # ceil(100/50)
        (TilingMode.ShiftBoundary, 1),   # ceil((100-50)/50)
        (TilingMode.TrimBoundary, 1),    # floor((100-50)/50)
    ]:
        mng = TileIndexManager((100,), (50,), (100,), mode)
        assert mng.get_individual_dim_grid_count(0) == expect


def test_shift_boundary_last_grid_touches_edge():
    mng = TileIndexManager((10, 100), (1, 30), (1, 50), TilingMode.ShiftBoundary)
    n = mng.get_individual_dim_grid_count(1)
    last_start = mng.get_gridstart_location_from_dim_index(1, n - 1)
    # patch start = grid start - 10; patch end = start + 50 == 100
    assert last_start - 10 + 50 == 100


def test_on_boundary_and_walk():
    mng = TileIndexManager((4, 64, 64), (1, 16, 16), (1, 32, 32), TilingMode.ShiftBoundary)
    assert mng.on_boundary(0, 0)
    nxt = mng.next_grid_along_dim(0, 2)
    assert nxt == 1
    assert mng.prev_grid_along_dim(0, 2) is None


@pytest.fixture
def synthetic_tiled_dataset(monkeypatch):
    """SplitDatasetTiledPred over a deterministic arange volume with identity
    normalization (mirrors reference test_tiling_setup.py:10-33)."""
    N, H, W = 5, 96, 96
    vol = np.arange(N * H * W * 2, dtype=np.float32).reshape(N, H, W, 2)
    data = {0: [vol[i, ..., 0] for i in range(N)], 1: [vol[i, ..., 1] for i in range(N)]}

    import diffsplitting_tpu.data.split_dataset as sd

    monkeypatch.setattr(sd, "load_data", lambda *a, **k: {k2: list(v) for k2, v in data.items()})
    norm = {
        "mean_input": 0.0,
        "std_input": 1.0,
        "mean_target": np.zeros(2),
        "std_target": np.ones(2),
        "target0_max": vol[..., 0].max(),
        "target1_max": vol[..., 1].max(),
        "input_max": vol.sum(-1).max(),
    }
    ds = SplitDatasetTiledPred(
        "Hagen",
        DataLocation(channelwise_fpath=("a", "b")),
        32,
        normalization_dict=norm,
        enable_transforms=False,
        random_patching=False,
    )
    return ds, vol


def test_stitch_roundtrip_exact(synthetic_tiled_dataset):
    """Every tile's target, stitched, reproduces the full volume exactly."""
    ds, vol = synthetic_tiled_dataset
    tiles = []
    for i in range(len(ds)):
        sample = ds[i]
        tiles.append(sample["target"])  # (P, P, 2)
    tiles = np.stack(tiles)  # (n, P, P, 2)
    out = stitch_predictions(tiles, ds.tile_manager)
    assert out.shape == vol.shape
    np.testing.assert_array_equal(out, vol)


def test_stitch_roundtrip_nonsquare(monkeypatch):
    """Non-divisible frame size exercises the ShiftBoundary edge shift."""
    N, H, W = 2, 70, 50
    vol = np.arange(N * H * W * 2, dtype=np.float32).reshape(N, H, W, 2)

    import diffsplitting_tpu.data.split_dataset as sd

    monkeypatch.setattr(
        sd, "load_data",
        lambda *a, **k: {0: [vol[i, ..., 0] for i in range(N)], 1: [vol[i, ..., 1] for i in range(N)]},
    )
    norm = {
        "mean_input": 0.0, "std_input": 1.0,
        "mean_target": np.zeros(2), "std_target": np.ones(2),
        "target0_max": 1.0, "target1_max": 1.0, "input_max": 1.0,
    }
    ds = SplitDatasetTiledPred(
        "Hagen", DataLocation(channelwise_fpath=("a", "b")), 20,
        normalization_dict=norm, enable_transforms=False, random_patching=False,
    )
    tiles = np.stack([ds[i]["target"] for i in range(len(ds))])
    out = stitch_predictions(tiles, ds.tile_manager)
    np.testing.assert_array_equal(out, vol)

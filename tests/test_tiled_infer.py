"""Device-side tiled prediction must agree exactly with the host stitcher."""

import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.data import TileIndexManager, TilingMode, stitch_predictions
from diffsplitting_tpu.data.tiled_infer import (
    extract_tiles,
    predict_tiled,
    stitch_tiles,
    tile_plan,
)


def make_mng(F=3, H=96, W=96, P=32):
    return TileIndexManager(
        data_shape=(F, H, W),
        grid_shape=(1, P // 2, P // 2),
        patch_shape=(1, P, P),
        tiling_mode=TilingMode.ShiftBoundary,
    )


def test_extract_stitch_roundtrip_identity():
    F, H, W, C = 3, 96, 96, 2
    vol = np.arange(F * H * W * C, dtype=np.float32).reshape(F, H, W, C)
    mng = make_mng(F, H, W)
    plan = tile_plan(mng)
    tiles = extract_tiles(jnp.asarray(vol), plan)
    assert tiles.shape == (mng.total_grid_count(), 32, 32, C)
    out = np.asarray(stitch_tiles(tiles, plan))
    np.testing.assert_array_equal(out, vol)


def test_device_stitch_matches_host_stitcher():
    F, H, W, C = 2, 70, 50, 2
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(F, H, W, C)).astype(np.float32)
    mng = TileIndexManager((F, H, W), (1, 10, 10), (1, 20, 20), TilingMode.ShiftBoundary)
    plan = tile_plan(mng)
    tiles = np.asarray(extract_tiles(jnp.asarray(vol), plan))
    host = stitch_predictions(tiles, mng)
    dev = np.asarray(stitch_tiles(jnp.asarray(tiles), plan))
    np.testing.assert_array_equal(dev, host)


def test_predict_tiled_with_model_fn():
    """infer_fn that doubles its input: stitched output == 2 * input frames."""
    F, H, W, C = 2, 64, 64, 1
    vol = np.random.default_rng(1).normal(size=(F, H, W, C)).astype(np.float32)
    mng = make_mng(F, H, W, P=32)
    out = predict_tiled(lambda t: t * 2.0, vol, mng, batch_size=4)
    np.testing.assert_allclose(out, vol * 2.0, rtol=1e-6)


def test_predict_tiled_channel_expansion():
    """A splitting-style infer_fn (1 ch -> 2 ch) stitches to 2 channels."""
    F, H, W = 1, 64, 64
    vol = np.random.default_rng(2).normal(size=(F, H, W, 1)).astype(np.float32)
    mng = make_mng(F, H, W, P=32)
    out = predict_tiled(
        lambda t: jnp.concatenate([t, -t], axis=-1), vol, mng, batch_size=3
    )
    assert out.shape == (F, H, W, 2)
    np.testing.assert_allclose(out[..., 0], vol[..., 0], rtol=1e-6)
    np.testing.assert_allclose(out[..., 1], -vol[..., 0], rtol=1e-6)

"""TPU-native tiled prediction: batched device-side tile extraction + stitch.

The reference's large-frame path walks tiles one-by-one through a host loop
(one dataset __getitem__ + one model call per overlapping tile, SURVEY.md
§3.4) and stitches on host (data/tile_stitcher.py). Here the whole pipeline
stays on device:

  * `extract_tiles`: vmapped `lax.dynamic_slice` gathers every (P,P) tile of
    a (F,H,W,C) stack at host-precomputed start coordinates (static per tile
    manager, so the gather compiles once per geometry).
  * batched inference over tiles (the caller maps its sampler over tile
    batches — tiles are just a batch axis, so they also shard over the mesh's
    'data' axis for multi-chip tiled inference).
  * `stitch_tiles`: a `lax.scan` of uniform-shape masked
    dynamic_update_slice writes — each tile owns the region
    [owned_lo, owned_hi) inside its patch (its central grid region, extended
    to the frame border for edge tiles, matching ShiftBoundary semantics of
    data/stitcher.py); a per-pixel ownership mask merges it into the canvas.

All shapes are static; no host sync anywhere between extraction and the
stitched canvas.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tiling import TileIndexManager, TilingMode


def tile_plan(mng: TileIndexManager) -> dict:
    """Host-precomputed per-tile coordinates for a (F, H, W) tile manager.

    Returns arrays of shape (n_tiles, 3): patch starts `ps`, and the owned
    region [lo, hi) RELATIVE to the patch start.
    """
    n = mng.total_grid_count()
    grid = np.asarray(mng.grid_shape, dtype=np.int64)
    patch = np.asarray(mng.patch_shape, dtype=np.int64)
    offset = np.asarray(mng.patch_offset(), dtype=np.int64)
    data = np.asarray(mng.data_shape, dtype=np.int64)

    ps_list, lo_list, hi_list = [], [], []
    for i in range(n):
        gs = np.asarray(mng.get_location_from_dataset_idx(i), dtype=np.int64)
        ps = gs - offset
        pe = ps + patch
        vgs, vge = gs.copy(), gs + grid
        if mng.tiling_mode == TilingMode.ShiftBoundary:
            vgs = np.where(ps == 0, 0, vgs)
            vge = np.where(pe == data, data, vge)
        ps_list.append(ps)
        lo_list.append(vgs - ps)
        hi_list.append(vge - ps)
    return {
        "ps": np.stack(ps_list),
        "lo": np.stack(lo_list),
        "hi": np.stack(hi_list),
        "patch": tuple(int(p) for p in patch),
        "data_shape": tuple(int(d) for d in data),
    }


def extract_tiles(frames: jnp.ndarray, plan: dict) -> jnp.ndarray:
    """(F, H, W, C) -> (n_tiles, pH, pW, C) via vmapped dynamic_slice."""
    pF, pH, pW = plan["patch"]
    assert pF == 1, "one frame per tile"
    C = frames.shape[-1]
    starts = jnp.asarray(plan["ps"], dtype=jnp.int32)

    def one(start):
        tile = jax.lax.dynamic_slice(
            frames, (start[0], start[1], start[2], 0), (1, pH, pW, C)
        )
        return tile[0]

    return jax.vmap(one)(starts)


def stitch_tiles(tiles: jnp.ndarray, plan: dict) -> jnp.ndarray:
    """(n_tiles, pH, pW, C) -> (F, H, W, C) canvas with ownership-masked writes."""
    pF, pH, pW = plan["patch"]
    C = tiles.shape[-1]
    F, H, W = plan["data_shape"]
    canvas = jnp.zeros((F, H, W, C), dtype=tiles.dtype)

    starts = jnp.asarray(plan["ps"], dtype=jnp.int32)
    los = jnp.asarray(plan["lo"], dtype=jnp.int32)
    his = jnp.asarray(plan["hi"], dtype=jnp.int32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (pH, pW), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (pH, pW), 1)

    def body(canvas, inp):
        tile, start, lo, hi = inp
        mask = (
            (row_ids >= lo[1]) & (row_ids < hi[1])
            & (col_ids >= lo[2]) & (col_ids < hi[2])
        )[..., None]
        region = jax.lax.dynamic_slice(
            canvas, (start[0], start[1], start[2], 0), (1, pH, pW, C)
        )
        merged = jnp.where(mask[None], tile[None], region)
        canvas = jax.lax.dynamic_update_slice(
            canvas, merged, (start[0], start[1], start[2], 0)
        )
        return canvas, None

    canvas, _ = jax.lax.scan(body, canvas, (tiles, starts, los, his))
    return canvas


def predict_tiled(
    infer_fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames,
    mng: TileIndexManager,
    batch_size: int = 8,
    out_channels: Optional[int] = None,
) -> np.ndarray:
    """Full pipeline: extract tiles -> batched infer_fn -> device stitch.

    infer_fn: (B, pH, pW, Cin) -> (B, pH, pW, Cout), e.g. a jitted InDI
    sampler. `frames`: (F, H, W, Cin). Returns the stitched (F, H, W, Cout)
    canvas as numpy.
    """
    plan = tile_plan(mng)
    frames = jnp.asarray(frames)
    tiles = extract_tiles(frames, plan)
    n = tiles.shape[0]

    outs = []
    pad = (-n) % batch_size
    if pad:
        tiles = jnp.concatenate([tiles, jnp.repeat(tiles[-1:], pad, axis=0)], axis=0)
    for i in range(0, n + pad, batch_size):
        outs.append(infer_fn(tiles[i : i + batch_size]))
    preds = jnp.concatenate(outs, axis=0)[:n]
    return np.asarray(stitch_tiles(preds, plan))

"""Stitch per-tile predictions back into full-size frames.

Semantics parity with /root/reference/data/tile_stitcher.py:10-81: each tile
contributes only its central grid region; in ShiftBoundary mode a tile whose
patch touches the data edge extends its contribution to cover the edge
(:47-52). Output is channel-LAST over the full `data_shape` — same as the
reference — but predictions here are channel-last (N, *spatial, C) rather
than channel-first, and writes are N-D slice assignments for any rank.
"""

from __future__ import annotations

import numpy as np

from .tiling import TileIndexManager, TilingMode


def stitch_predictions(predictions: np.ndarray, idx_manager: TileIndexManager) -> np.ndarray:
    """predictions: (num_tiles, *patch_spatial, C) -> (*data_shape, C)."""
    mng = idx_manager
    n_channels = predictions.shape[-1]
    out_shape = tuple(mng.data_shape) + (n_channels,)
    output = np.zeros(out_shape, dtype=predictions.dtype)

    grid = np.asarray(mng.grid_shape, dtype=int)
    patch = np.asarray(mng.patch_shape, dtype=int)
    offset = np.asarray(mng.patch_offset(), dtype=int)
    data = np.asarray(mng.data_shape, dtype=int)

    for tile_idx in range(predictions.shape[0]):
        gs = np.asarray(mng.get_location_from_dataset_idx(tile_idx), dtype=int)
        ge = gs + grid
        ps = gs - offset
        pe = ps + patch

        vgs = np.maximum(gs, 0)
        vge = np.minimum(ge, data)
        assert np.all(vgs == gs) and np.all(vge == ge)

        if mng.tiling_mode == TilingMode.ShiftBoundary:
            # extend edge tiles so the stitched canvas reaches the data border
            at_lo = ps == 0
            at_hi = pe == data
            vgs = np.where(at_lo, 0, vgs)
            vge = np.where(at_hi, data, vge)

        rs = vgs - ps
        re = rs + (vge - vgs)

        dst = tuple(slice(int(a), int(b)) for a, b in zip(vgs, vge))
        # tile arrays drop trivial leading dims (e.g. data rank 3 with patch
        # (1,P,P) yields (P,P,C) tiles); align ranks before slicing
        tile = predictions[tile_idx]
        spatial_rank = len(data)
        while tile.ndim < spatial_rank + 1:
            tile = tile[None]
        src = tuple(slice(int(a), int(b)) for a, b in zip(rs, re))
        output[dst] = tile[src]

    return output

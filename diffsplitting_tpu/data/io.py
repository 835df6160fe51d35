"""Image IO helpers (PIL-based; this image has no tifffile/skimage)."""

from __future__ import annotations

import numpy as np


def load_tiff_stack(path: str) -> np.ndarray:
    """Read a (possibly multi-frame) TIFF into (N, H, W[, C]) numpy.

    Replaces the reference's `skimage.io.imread(..., plugin='tifffile')`
    (split_dataset.py:78-79). PIL handles uint8/uint16/float TIFFs.
    """
    from PIL import Image, ImageSequence

    with Image.open(path) as im:
        frames = [np.asarray(frame.copy()) for frame in ImageSequence.Iterator(im)]
    if len(frames) == 1:
        arr = frames[0]
        # single-page stacks may still be (N,H,W) saved as one big page
        return arr[None] if arr.ndim == 2 else arr
    return np.stack(frames, axis=0)


def save_tiff_stack(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    frames = [Image.fromarray(a) for a in arr]
    frames[0].save(path, save_all=True, append_images=frames[1:])

"""prepare_data triplet generation + TIFF stack IO round-trips."""

import numpy as np
import pytest

from diffsplitting_tpu.data.io import load_tiff_stack, save_tiff_stack
from diffsplitting_tpu.data.prepare_data import prepare


def test_tiff_stack_roundtrip(tmp_path):
    arr = np.random.default_rng(0).integers(0, 60000, (3, 16, 20), dtype=np.uint16)
    p = str(tmp_path / "stack.tif")
    save_tiff_stack(p, arr)
    back = load_tiff_stack(p)
    np.testing.assert_array_equal(back, arr)


def test_prepare_png_triplets(tmp_path):
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(src / f"{i}.png")

    out = tmp_path / "out"
    n = prepare(str(src), str(out), n_worker=1, sizes=(8, 16))
    assert n == 3
    for sub, size in [("lr_8", 8), ("hr_16", 16), ("sr_8_16", 16)]:
        files = sorted((out / sub).glob("*.png"))
        assert len(files) == 3
        img = np.asarray(Image.open(files[0]))
        assert img.shape[:2] == (size, size)

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


def test_prepare_lmdb_roundtrip(tmp_path, monkeypatch):
    """LMDB write (prepare_data) → read (LRHRDataset) round-trip, executed
    against tests/fake_lmdb.py (the wheel is absent from this image; the
    fake implements the exact API subset used)."""
    import sys

    from PIL import Image

    from tests import fake_lmdb
    from diffsplitting_tpu.data.lrhr_dataset import LRHRDataset

    monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    originals = {}
    for i in range(3):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        originals[i] = arr
        Image.fromarray(arr).save(src / f"{i}.png")

    out = tmp_path / "out_lmdb"
    n = prepare(str(src), str(out), n_worker=1, sizes=(8, 16), lmdb_save=True)
    assert n == 3
    assert (out / "data.pkl").exists()

    ds = LRHRDataset(str(out), "lmdb", l_resolution=8, r_resolution=16,
                     split="val", need_LR=True)
    assert len(ds) == 3
    s = ds[1]
    assert set(s) == {"LR", "HR", "SR", "Index"} and int(s["Index"]) == 1
    assert s["HR"].shape == (16, 16, 3) and s["SR"].shape == (16, 16, 3)
    assert s["LR"].shape == (8, 8, 3)
    assert s["HR"].min() >= -1.0 and s["HR"].max() <= 1.0
    # HR content round-trips exactly: [-1,1] → uint8 equals the 16×16 source
    hr_u8 = np.round((s["HR"] + 1.0) / 2.0 * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(hr_u8, originals[1])


def test_lrhr_lmdb_missing_key_redraw(tmp_path, monkeypatch):
    """Reference LRHR_dataset.py:48-57 rot-for-rot: a missing key triggers a
    random redraw until a present index is found."""
    import io
    import sys

    from PIL import Image

    from tests import fake_lmdb
    from diffsplitting_tpu.data.lrhr_dataset import LRHRDataset

    monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)

    def png_bytes(v):
        buf = io.BytesIO()
        Image.fromarray(np.full((4, 4, 3), v, np.uint8)).save(buf, format="png")
        return buf.getvalue()

    out = tmp_path / "db"
    env = fake_lmdb.open(str(out))
    with env.begin(write=True) as txn:
        txn.put(b"length", b"2")
        # only index 00001 exists; index 00000 is a hole
        txn.put(b"hr_4_00001", png_bytes(200))
        txn.put(b"sr_2_4_00001", png_bytes(100))

    ds = LRHRDataset(str(out), "lmdb", l_resolution=2, r_resolution=4, split="val")
    s = ds[0]  # must redraw onto index 1 instead of crashing
    np.testing.assert_allclose(((s["HR"] + 1) / 2 * 255), 200, atol=1)


def test_hagen_split_script(tmp_path):
    """scripts/hagen_train_val_test_split.py: seeded 80/10/10 frame split."""
    import subprocess, sys, os

    from tests.test_cli_e2e import run_cli

    actin = tmp_path / "actin-60x.tif"
    mito = tmp_path / "mito-60x.tif"
    rng = np.random.default_rng(0)
    save_tiff_stack(str(actin), rng.integers(0, 999, (10, 8, 8), dtype=np.uint16))
    save_tiff_stack(str(mito), rng.integers(0, 999, (10, 8, 8), dtype=np.uint16))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run_cli(
        "scripts/hagen_train_val_test_split.py",
        ["--actin", str(actin), "--mito", str(mito), "--out", str(tmp_path / "out")],
        cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    train = load_tiff_stack(str(tmp_path / "out/train/train_actin-60x.tif"))
    val = load_tiff_stack(str(tmp_path / "out/val/val_actin-60x.tif"))
    test = load_tiff_stack(str(tmp_path / "out/test/test_actin-60x.tif"))
    assert len(train) == 8 and len(val) == 1 and len(test) == 1
    # frames are a permutation of the input (no duplication/loss)
    allf = np.concatenate([train, val, test])
    orig = load_tiff_stack(str(actin))
    assert sorted(map(lambda f: f.tobytes(), allf)) == sorted(map(lambda f: f.tobytes(), orig))

"""PSNR / RangeInvariantPsnr / SSIM / tensor2img tests."""

import numpy as np
import pytest

from diffsplitting_tpu.utils.metrics import (
    calculate_psnr,
    calculate_ssim,
    save_img,
    tensor2img,
)
from diffsplitting_tpu.utils.psnr import PSNR, RangeInvariantPsnr


def test_psnr_identical_images_inf_or_large():
    x = np.random.default_rng(0).uniform(0, 1, (2, 16, 16)).astype(np.float32)
    val = PSNR(x, x)
    assert np.all(val > 100)


def test_psnr_known_value():
    gt = np.zeros((1, 8, 8), np.float32)
    gt[0, 0, 0] = 1.0  # range = 1
    pred = gt + 0.1
    # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
    np.testing.assert_allclose(PSNR(gt, pred), [20.0], rtol=1e-4)


def test_range_invariant_psnr_scale_invariance():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    pred = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    base = RangeInvariantPsnr(gt, pred)
    scaled = RangeInvariantPsnr(gt, pred * 7.3 + 0.5)
    # the scale/offset fix keeps the mean-removed, rescaled PSNR ~equal
    np.testing.assert_allclose(base, scaled, atol=0.3)


def test_range_invariant_matches_manual_formula():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 10, (2, 8, 8)).astype(np.float64)
    pred = rng.uniform(0, 10, (2, 8, 8)).astype(np.float64)
    got = RangeInvariantPsnr(gt, pred)

    g = gt.reshape(2, -1)
    p = pred.reshape(2, -1)
    std = g.std(axis=1)
    ra = (g.max(1) - g.min(1)) / std
    gz = (g - g.mean(1, keepdims=True)) / std[:, None]
    pz = p - p.mean(1, keepdims=True)
    a = (gz * pz).sum(1, keepdims=True) / (pz * pz).sum(1, keepdims=True)
    fixed = pz * a
    mse = ((gz - fixed) ** 2).mean(1)
    expected = 20 * np.log10(ra / np.sqrt(mse))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_calculate_psnr_ssim_basics():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    assert calculate_psnr(a, a) == float("inf")
    assert calculate_ssim(a, a) == pytest.approx(1.0)
    b = np.clip(a.astype(int) + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
    assert 10 < calculate_psnr(a, b) < 50
    assert 0 < calculate_ssim(a, b) < 1


def test_tensor2img_ranges():
    x = np.linspace(-1, 1, 64, dtype=np.float32).reshape(8, 8)
    img = tensor2img(x)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255

    batch = np.zeros((4, 8, 8, 3), np.float32)
    grid = tensor2img(batch)
    assert grid.shape == (16, 16, 3)


def test_save_img_multichannel(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 2)).astype(np.uint8)
    p = str(tmp_path / "two_ch.png")
    save_img(img, p, mode="L")
    import os

    assert os.path.exists(p)
    rgb6 = np.random.default_rng(0).integers(0, 255, (16, 16, 6)).astype(np.uint8)
    p2 = str(tmp_path / "six_ch.png")
    save_img(rgb6, p2, mode="RGB")
    assert os.path.exists(p2)

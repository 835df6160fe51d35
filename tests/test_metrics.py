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
    # torchvision make_grid geometry: (H+2)*rows+2 with 2px padding
    assert grid.shape == (22, 22, 3)


def test_psnr_ssim_golden_values():
    """Golden constants computed by EXECUTING /root/reference/core/metrics.py
    (calculate_psnr/calculate_ssim) on these exact seeded inputs — guards
    MATLAB-PSNR/SSIM parity at full float precision."""
    rng = np.random.default_rng(42)
    a = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-25, 26, a.shape), 0, 255).astype(np.uint8)
    assert calculate_psnr(a, b) == pytest.approx(24.9927811238, abs=1e-8)
    assert calculate_ssim(a, b) == pytest.approx(0.9805471706, abs=1e-8)

    a3 = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    b3 = np.clip(a3.astype(int) + rng.integers(-25, 26, a3.shape), 0, 255).astype(np.uint8)
    assert calculate_psnr(a3, b3) == pytest.approx(25.0075036063, abs=1e-8)
    assert calculate_ssim(a3, b3) == pytest.approx(0.9803480066, abs=1e-8)

    # beyond-reference: 2-channel splitting outputs are accepted and equal the
    # per-channel mean
    a2, b2 = a3[..., :2], b3[..., :2]
    per_ch = np.mean([calculate_ssim(a2[..., c], b2[..., c]) for c in range(2)])
    assert calculate_ssim(a2, b2) == pytest.approx(per_ch, abs=1e-12)


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

"""Image export + MATLAB-style PSNR/SSIM metrics.

Parity with /root/reference/core/metrics.py:
  * tensor2img (:8-34): [-1,1]→uint8; 4D batches become a √N-per-row grid.
  * save_img (:37-59): multi-channel (2/6-channel) outputs are tiled
    side-by-side by channel group before writing.
  * calculate_psnr (:62-69) on [0,255]; calculate_ssim (:72-113) with the
    11×11 σ=1.5 gaussian window, valid-region crop — same outputs as MATLAB.

Layout note: inputs here are channel-LAST (HWC / NHWC) numpy or jax arrays.
"""

from __future__ import annotations

import math
import os

import numpy as np


def _to_numpy(t):
    return np.asarray(t)


def _make_grid(batch_hwc: np.ndarray) -> np.ndarray:
    """(N,H,W,C) -> single (H*rows, W*cols, C) grid image, √N per row."""
    n, h, w, c = batch_hwc.shape
    ncols = int(math.sqrt(n)) or 1
    nrows = int(math.ceil(n / ncols))
    grid = np.zeros((nrows * h, ncols * w, c), dtype=batch_hwc.dtype)
    for i in range(n):
        r, cc = divmod(i, ncols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = batch_hwc[i]
    return grid


def tensor2img(tensor, out_type=np.uint8, min_max=(-1, 1)):
    """NHWC/HWC/HW array in `min_max` -> HWC (or HW) image in [0,255] uint8."""
    img = _to_numpy(tensor).astype(np.float32)
    img = np.squeeze(img)
    img = np.clip(img, min_max[0], min_max[1])
    img = (img - min_max[0]) / (min_max[1] - min_max[0])
    if img.ndim == 4:
        img = _make_grid(img)
    elif img.ndim not in (2, 3):
        raise TypeError(f"Only 4D/3D/2D supported, got ndim={img.ndim}")
    if out_type == np.uint8:
        img = (img * 255.0).round()
    return img.astype(out_type)


def save_img(img, img_path, mode="RGB"):
    """Write an image; multi-channel HWC stacks are tiled horizontally.

    img: (H, W, C) with C ∈ {1,3} written directly; C ∈ {2,6,...} splits into
    C//3 (RGB) or C (gray) panels laid out side-by-side (reference :37-59).
    """
    import cv2

    img = _to_numpy(img)
    assert img.ndim == 3, f"img shape is {img.shape}"
    h, w, c = img.shape
    if c not in (1, 3):
        if mode == "RGB":
            panels = c // 3
            img = img.reshape(h, w, panels, 3)
            img = img.transpose(0, 2, 1, 3).reshape(h, panels * w, 3)
        else:
            img = img.transpose(0, 2, 1).reshape(h, c * w, 1)
    if mode == "RGB":
        cv2.imwrite(img_path, img.astype(np.uint8))
    else:
        cv2.imwrite(img_path, img)


def calculate_psnr(img1, img2):
    """PSNR on [0,255] images."""
    img1 = _to_numpy(img1).astype(np.float64)
    img2 = _to_numpy(img2).astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1, img2):
    import cv2

    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)

    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def calculate_ssim(img1, img2):
    """MATLAB-compatible SSIM on [0,255] images (HW or HWC)."""
    img1 = _to_numpy(img1)
    img2 = _to_numpy(img2)
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return np.mean([_ssim_single(img1, img2) for _ in range(3)])
        if img1.shape[2] == 1:
            return _ssim_single(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")

"""Standalone PSNR/SSIM evaluator over a results directory.

CLI parity with /root/reference/eval.py: pairs `*_hr.png` / `*_sr.png` by
sorted order and prints running + average PSNR/SSIM.
"""

from __future__ import annotations

import argparse
import glob

import numpy as np
from PIL import Image

from diffsplitting_tpu.utils.metrics import calculate_psnr, calculate_ssim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--path", type=str, default="experiments/results")
    args = parser.parse_args()

    real_names = sorted(glob.glob(f"{args.path}/*_hr.png"))
    fake_names = sorted(glob.glob(f"{args.path}/*_sr.png"))

    avg_psnr, avg_ssim, idx = 0.0, 0.0, 0
    for rname, fname in zip(real_names, fake_names):
        idx += 1
        ridx = rname.rsplit("_hr", 1)[0]
        fidx = fname.rsplit("_sr", 1)[0]
        assert ridx == fidx, f"Image ridx:{ridx}!=fidx:{fidx}"

        hr_img = np.array(Image.open(rname))
        sr_img = np.array(Image.open(fname))
        psnr = calculate_psnr(sr_img, hr_img)
        ssim = calculate_ssim(sr_img, hr_img)
        avg_psnr += psnr
        avg_ssim += ssim
        if idx % 20 == 0:
            print(f"Image:{idx}, PSNR:{psnr:.4f}, SSIM:{ssim:.4f}")

    if idx:
        print("# Validation # PSNR: {:.4e}".format(avg_psnr / idx))
        print("# Validation # SSIM: {:.4e}".format(avg_ssim / idx))


if __name__ == "__main__":
    main()

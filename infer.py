"""Inference-only CLI for super-resolution.

CLI parity with /root/reference/infer.py: iterate the val LR/HR loader, run
the full reverse trajectory (`test(continuous=True)`), save
`*_sr_process/sr/hr/inf.png`. The reference reads stale HR/SR/INF visual keys
(SURVEY.md §2.7); here the wrapper's prediction/input/target keys feed the
same outputs.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from diffsplitting_tpu import config as Logger
from diffsplitting_tpu import data as Data
from diffsplitting_tpu.train import create_model
from diffsplitting_tpu.utils import setup_logger
from diffsplitting_tpu.utils.cli import parse_accel_flag
from diffsplitting_tpu.utils.metrics import save_img, tensor2img
from diffsplitting_tpu.utils.wandb_logger import WandbLogger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default="configs/sr_sr3_64_512.json")
    parser.add_argument("-p", "--phase", type=str, choices=["val"], default="val")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    parser.add_argument("-debug", "-d", action="store_true", dest="debug")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_infer", action="store_true")
    parser.add_argument("-rootdir", type=str, default=None)
    parser.add_argument("--deepcache", type=str, default=None, metavar="K[,D]",
                        help="DeepCache serving (full refresh every K steps, "
                             "split depth D). Final frames only — the "
                             "*_sr_process.png trajectory grid is skipped. "
                             "K='auto' picks the largest fidelity-safe "
                             "interval (conservative); on well-trained "
                             "checkpoints explicit larger intervals (e.g. "
                             "'12,1') measured BOTH faster and higher task "
                             "PSNR (results/quality_deepcache/"
                             "auto_sweep.json) — sweep K on a validation "
                             "image if throughput matters.")
    parser.add_argument("--sliding_window", type=str, default=None,
                        metavar="W[,TAU]",
                        help="sliding-window Picard serving (W-step window "
                             "batched per sweep, TAU-gated advance; default "
                             "TAU 0.1, 0 = exact frozen-noise chain). Final "
                             "frames only; exclusive with --deepcache.")
    parser.add_argument("--ddim", type=str, default=None, metavar="S[,ETA]",
                        help="respaced DDIM serving: S steps through the "
                             "trained net instead of the full T-step chain "
                             "(default ETA 0 = deterministic). Final frames "
                             "only; composes with --deepcache (cached "
                             "respaced chain), exclusive with "
                             "--sliding_window.")
    parser.add_argument("--w8a8", action="store_true",
                        help="W8A8 quantized serving: int8 MXU convs (2x "
                             "peak rate on v5e) after a one-time "
                             "activation-scale calibration. Approximate; "
                             "composes with --ddim, --deepcache and "
                             "--sliding_window.")
    parser.add_argument("--w8a8_sites", choices=["default", "all", "attn"],
                        default="default",
                        help="'all' extends int8 coverage to Down/Upsample "
                             "and 1×1 shortcut convs (1.27x vs 1.18x exact "
                             "chain; rel-L2 0.051 vs 0.038); 'attn' is a "
                             "SUPERSET of 'all' adding the SelfAttention "
                             "QKV/proj convs")
    args = parser.parse_args()

    opt = Logger.parse(args)
    setup_logger(None, opt["path"]["log"], "train", level=logging.INFO, screen=True)
    setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")

    wandb_logger = (
        WandbLogger(opt, opt["path"]["experiment_root"], opt["experiment_name"])
        if opt["enable_wandb"]
        else None
    )

    val_set = Data.create_dataset(opt["datasets"]["val"], "val")
    val_loader = Data.create_dataloader(val_set, opt["datasets"]["val"], "val")
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")
    diffusion.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    if args.deepcache:
        diffusion.set_deepcache(
            *parse_accel_flag(args.deepcache, 1, second_cast=int))
    if args.sliding_window:
        diffusion.set_sliding_window(*parse_accel_flag(args.sliding_window, 0.1))
    if args.ddim:
        diffusion.set_ddim(*parse_accel_flag(args.ddim, 0.0))
    if args.w8a8 or args.w8a8_sites != "default":
        # --w8a8_sites implies --w8a8 (else silently bf16)
        wide = args.w8a8_sites in ("all", "attn")
        diffusion.set_quant(8, updown=wide, shortcut=wide,
                            attn=args.w8a8_sites == "attn")

    logger.info("Begin Model Inference.")
    current_step, idx = 0, 0
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)

    for val_data in val_loader:
        idx += 1
        batch = {"input": val_data["SR"], "target": val_data["HR"]}
        diffusion.feed_data(batch)
        # the accelerated samplers (deepcache / windowed Picard / ddim —
        # CLI flags or config keys) yield final frames only: no trajectory
        # grid in those modes
        final_only = (diffusion.deepcache is not None
                      or diffusion.sliding_window is not None
                      or diffusion.ddim is not None)
        diffusion.test(continuous=not final_only)
        visuals = diffusion.get_current_visuals(need_LR=False)

        hr_img = tensor2img(visuals["target"])
        fake_img = tensor2img(visuals["input"])  # the bicubic-upsampled condition

        if not final_only:
            frames = visuals["prediction"]  # (n_frames, B, H, W, C)
            grid = tensor2img(frames.reshape((-1,) + frames.shape[2:]))
            save_img(_hwc(grid), f"{result_path}/{current_step}_{idx}_sr_process.png")
            sr_final = tensor2img(frames[-1])
        else:
            sr_final = tensor2img(visuals["prediction"])
        save_img(_hwc(sr_final), f"{result_path}/{current_step}_{idx}_sr.png")
        save_img(_hwc(hr_img), f"{result_path}/{current_step}_{idx}_hr.png")
        save_img(_hwc(fake_img), f"{result_path}/{current_step}_{idx}_inf.png")

        if wandb_logger and opt.get("log_infer"):
            wandb_logger.log_eval_data(fake_img, sr_final, hr_img)

    if wandb_logger and opt.get("log_infer"):
        wandb_logger.log_eval_table(commit=True)


def _hwc(img):
    return img if img.ndim == 3 else np.asarray(img)[..., None]


if __name__ == "__main__":
    main()

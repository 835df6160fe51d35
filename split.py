"""Training/eval CLI for the splitting task (InDI / joint-InDI / DDPM / SR3).

CLI parity with /root/reference/split.py:
  python split.py -p train -c configs/splitting_hagen_indi.json [-debug]
        [-enable_wandb] [-rootdir DIR]

Train loop semantics (:141-270): iterate to n_iter; log every print_freq;
every val_freq switch to the val schedule, run ≤20 val samples, un-normalize
to uint16 and log channel-wise PSNR, dump target/input/pred PNGs, switch
back; checkpoint every save_checkpoint_freq. Val phase (:271-337) evaluates
PSNR/SSIM over the whole val set (the reference's val branch reads stale
HR/SR visual keys — fixed here to prediction/input/target per SURVEY.md §2.7).
"""

from __future__ import annotations

import argparse
import logging
import os
from collections import defaultdict

import numpy as np

from diffsplitting_tpu import config as Logger
from diffsplitting_tpu import data as Data
from diffsplitting_tpu.data import SplitDataset, SplitDatasetTiledPred
from diffsplitting_tpu.data.split_dataset import DataLocation
from diffsplitting_tpu.train import create_model
from diffsplitting_tpu.utils import setup_logger
from diffsplitting_tpu.utils.metrics import calculate_psnr, calculate_ssim, save_img
from diffsplitting_tpu.utils.psnr import PSNR
from diffsplitting_tpu.utils.profiling import StepTimer
from diffsplitting_tpu.utils.wandb_logger import WandbLogger


def _train_flops_per_step(opt):
    """~3× forward FLOPs (fwd + bwd) for the configured UNet and batch."""
    try:
        from diffsplitting_tpu.utils.flops import unet_forward_flops

        m = opt["model"]
        n_nets = 2 if m["which_model_G"] == "joint_indi" else 1
        fwd = unet_forward_flops(
            image_size=opt["datasets"]["patch_size"],
            in_channel=m["unet"]["in_channel"],
            out_channel=m["unet"]["out_channel"],
            inner_channel=m["unet"]["inner_channel"],
            channel_mults=tuple(m["unet"]["channel_multiplier"]),
            attn_res=tuple(m["unet"]["attn_res"] or ()),
            res_blocks=m["unet"]["res_blocks"],
            batch=opt["datasets"]["train"]["batch_size"],
        )
        return 3.0 * fwd * n_nets
    except Exception:
        return None


def _device_pool_eligible(train_set, cap_bytes=4 << 30) -> bool:
    """Whether the train dataset can ride the device-resident patch pool:
    a random-patching SplitDataset whose full source stacks fit comfortably
    on device (cap 4 GB of a v5e's 16 GB HBM — Hagen scale is ~100 MB).
    Used to AUTO-enable datasets.train.device_pool when the config is silent:
    the per-iteration host feed leaks host RAM through the axon tunnel
    (~54.6 GB/h measured, results/soak_split), so long runs must not default
    to it."""
    if not getattr(train_set, "_random_patching", False):
        return False
    dd = getattr(train_set, "_data_dict", None)
    if not dd or 0 not in dd or 1 not in dd:
        return False
    try:  # pool stores stacks as float32 regardless of source dtype
        nbytes = 4 * sum(np.asarray(f).size for f in list(dd[0]) + list(dd[1]))
    except Exception:  # ragged/lazy frames: stay on the host path
        return False
    return nbytes <= cap_bytes


def add_git_info(opt):
    """Record git provenance in the config (reference split.py:20-27)."""
    try:
        import subprocess

        here = os.path.dirname(os.path.realpath(__file__))
        def git(*args):
            return subprocess.check_output(["git", *args], cwd=here, text=True).strip()

        opt["git"] = {
            "branch": git("rev-parse", "--abbrev-ref", "HEAD"),
            "latest_commit": git("rev-parse", "HEAD"),
            "changedFiles": git("diff", "--name-only").splitlines(),
            "untracked_files": git("ls-files", "--others", "--exclude-standard").splitlines(),
        }
    except Exception:
        opt["git"] = {}


def get_datasets(opt, tiled_pred=False):
    """Dataset pair per config (reference split.py:30-71)."""
    dsets = opt["datasets"]
    patch_size = dsets["patch_size"]
    target_channel_idx = dsets.get("target_channel_idx", None)
    upper_clip = bool(dsets.get("upper_clip", False))
    max_qval = dsets["max_qval"]
    channel_weights = dsets.get("channel_weights", None)

    data_type = dsets["train"]["name"]
    uncorrelated_channels = bool(dsets["train"]["uncorrelated_channels"])
    assert data_type in ("cifar10", "Hagen")
    if data_type == "Hagen":
        train_loc = DataLocation(
            channelwise_fpath=(dsets["train"]["datapath"]["ch0"], dsets["train"]["datapath"]["ch1"])
        )
        val_loc = DataLocation(
            channelwise_fpath=(dsets["val"]["datapath"]["ch0"], dsets["val"]["datapath"]["ch1"])
        )
    else:
        train_loc = DataLocation(directory=dsets["train"]["datapath"])
        val_loc = DataLocation(directory=dsets["val"]["datapath"])

    input_from_normalized_target = opt["model"]["which_model_G"] == "joint_indi"
    train_set = SplitDataset(
        data_type, train_loc, patch_size,
        target_channel_idx=target_channel_idx,
        max_qval=max_qval, upper_clip=upper_clip,
        uncorrelated_channels=uncorrelated_channels,
        channel_weights=channel_weights,
        normalization_dict=None, enable_transforms=True, random_patching=True,
        input_from_normalized_target=input_from_normalized_target,
    )
    val_cls = SplitDatasetTiledPred if tiled_pred else SplitDataset
    val_set = val_cls(
        data_type, val_loc, patch_size,
        target_channel_idx=target_channel_idx,
        normalization_dict=train_set.get_normalization_dict(),
        max_qval=max_qval, upper_clip=upper_clip,
        channel_weights=channel_weights,
        enable_transforms=False, random_patching=False,
        input_from_normalized_target=input_from_normalized_target,
    )
    return train_set, val_set


def unnormalize_for_psnr(visuals, norm_dict):
    """[-1,1]-ish floats -> uint16 images (reference split.py:182-229)."""
    inp = visuals["input"][0]
    target = visuals["target"][0]
    pred = visuals["prediction"]
    pred = pred[0] if pred.ndim == 4 else pred

    mean_t = np.asarray(norm_dict["mean_target"]).reshape(1, 1, -1)
    std_t = np.asarray(norm_dict["std_target"]).reshape(1, 1, -1)
    mean_i, std_i = norm_dict["mean_input"], norm_dict["std_input"]

    input_img = ((inp * std_i + mean_i) / 2).astype(np.uint16)
    target_img = (target * std_t + mean_t).astype(np.uint16)
    pred_img = pred * std_t + mean_t
    pred_img = np.clip(pred_img, 0, 65535).astype(np.uint16)
    return input_img, target_img, pred_img


def run_validation(diffusion, val_loader, val_set, opt, current_step, current_epoch,
                   logger, wandb_logger, val_step, max_items=20):
    psnr_values = defaultdict(list)
    result_path = os.path.join(opt["path"]["results"], str(current_epoch))
    os.makedirs(result_path, exist_ok=True)

    diffusion.set_new_noise_schedule(opt["model"]["beta_schedule"]["val"], "val")
    norm = val_set.get_normalization_dict()
    idx = 0
    for val_data in val_loader:
        idx += 1
        if idx == max_items:
            break
        diffusion.feed_data(val_data)
        diffusion.test(continuous=False)
        visuals = diffusion.get_current_visuals()
        input_img, target_img, pred_img = unnormalize_for_psnr(visuals, norm)

        n_ch = target_img.shape[-1]
        mode = "RGB" if input_img.shape[-1] == 3 else "L"
        ncols = 3 if mode == "RGB" else 1
        for ch_idx in range(0, n_ch, ncols):
            psnr_val = PSNR(
                np.moveaxis(target_img[..., ch_idx : ch_idx + ncols] * 1.0, -1, 0),
                np.moveaxis(pred_img[..., ch_idx : ch_idx + ncols] * 1.0, -1, 0),
            ).mean()
            psnr_values[ch_idx].append(float(psnr_val))

        if mode != "RGB":
            # normalize uint16 to [0,1] panels for the png dump (split.py:215-229)
            minv = target_img.reshape(-1, n_ch).min(axis=0).reshape(1, 1, -1)
            t_img = target_img - minv
            maxv = t_img.reshape(-1, n_ch).max(axis=0).reshape(1, 1, -1)
            t_img = t_img / np.maximum(maxv, 1)
            i_img = input_img - input_img.min()
            i_img = i_img / max(i_img.max(), 1)
            p_img = np.clip((pred_img - minv) / np.maximum(maxv, 1), 0, 1)
            target_img, input_img, pred_img = (
                (t_img * 255), (i_img * 255), (p_img * 255))

        save_img(target_img, f"{result_path}/{current_step}_{idx}_target.png", mode=mode)
        save_img(input_img, f"{result_path}/{current_step}_{idx}_input.png", mode=mode)
        save_img(pred_img, f"{result_path}/{current_step}_{idx}_pred.png", mode=mode)

    avg_psnr = float(np.mean([np.mean(v) for v in psnr_values.values()]))
    diffusion.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")

    logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
    logging.getLogger("val").info(
        "<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}".format(current_epoch, current_step, avg_psnr)
    )
    if wandb_logger:
        wandb_logger.log_metrics(
            {"validation/val_psnr": avg_psnr, "validation/val_step": val_step}
        )
    return avg_psnr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default="configs/splitting_hagen_indi.json")
    parser.add_argument("-p", "--phase", type=str, choices=["train", "val"], default="train")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)  # accepted, unused on TPU
    parser.add_argument("-debug", "-d", action="store_true", dest="debug")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_wandb_ckpt", action="store_true")
    parser.add_argument("-log_eval", action="store_true")
    parser.add_argument("-rootdir", type=str, default=None)
    parser.add_argument("--check_data", action="store_true",
                        help="fail-fast dataset-layout validation: verify "
                             "the config's Hagen TIFF stacks load with the "
                             "expected shape/pairing, print the parity-run "
                             "commands, and exit (no training, no experiment "
                             "dir)")
    args = parser.parse_args()

    if args.check_data:
        from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
        from diffsplitting_tpu.data.check import run_check

        raise SystemExit(
            0 if run_check(args.config, dict_to_nonedict(load_json(args.config)))
            else 1)

    opt = Logger.parse(args)

    model_conf = opt["model"]
    assert model_conf["unet"]["out_channel"] == model_conf["diffusion"]["channels"]

    setup_logger(None, opt["path"]["log"], "train", level=logging.INFO, screen=True)
    setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")

    if opt["enable_wandb"]:
        add_git_info(opt)
        wandb_logger = WandbLogger(opt, opt["path"]["experiment_root"], opt["experiment_name"])
        val_step = 0
    else:
        wandb_logger = None
        val_step = 0

    train_set, val_set = get_datasets(opt)
    train_loader = Data.create_dataloader(train_set, opt["datasets"]["train"], "train")
    val_loader = Data.create_dataloader(val_set, opt["datasets"]["val"], "val")
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")

    current_step = diffusion.begin_step
    current_epoch = diffusion.begin_epoch
    n_iter = int(opt["train"]["n_iter"])

    if opt["path"]["resume_state"]:
        logger.info(
            "Resuming training from epoch: %d, iter: %d.", current_epoch, current_step
        )

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"][opt["phase"]], schedule_phase=opt["phase"]
    )

    if opt["phase"] == "train":
        timer = StepTimer(flops_per_step=_train_flops_per_step(opt))
        # Device-resident patch pool (datasets.train.device_pool): draw every
        # batch on device from one upfront stack upload instead of a fresh
        # host->device put per iteration (which the axon tunnel leaks —
        # ~54.6 GB/h measured over the full 40k soak at 128px b8,
        # results/soak_split). AUTO-ENABLED when the config doesn't say and
        # the source stacks fit comfortably on device (long training through
        # the leaking host path is unsafe by default); set
        # datasets.train.device_pool: false to force the host loader.
        use_pool = opt["datasets"]["train"].get("device_pool")
        if use_pool is None:
            use_pool = _device_pool_eligible(train_set)
            if use_pool:
                logger.info(
                    "device_pool auto-enabled (random-patch dataset, stacks "
                    "fit on device); set datasets.train.device_pool: false "
                    "to opt out")
        if use_pool:
            from diffsplitting_tpu.data.device_pool import DevicePatchPool

            bsz = int(opt["datasets"]["train"]["batch_size"])
            pool = DevicePatchPool(
                train_set, bsz, seed=int(opt["datasets"]["train"].get("pool_seed") or 0),
                mesh=diffusion.mesh)
            # FUSED: the batch draw runs inside the train-step jit (one
            # dispatch per iteration total — a standalone pool.draw() per
            # iter costs two extra tunnel RPCs and measured SLOWER than the
            # leaking host loader; results/soak_split_pool round 4)
            diffusion.attach_pool(pool)
            batches_per_epoch = max(1, len(train_set) // bsz)
            epoch_batches = lambda: iter([None] * batches_per_epoch)  # noqa: E731
            logger.info("device_pool: %d frames resident on device, "
                        "%d fused draws/epoch", pool._F, batches_per_epoch)
        else:
            epoch_batches = lambda: train_loader  # noqa: E731
        while current_step < n_iter:
            current_epoch += 1
            for train_data in epoch_batches():
                current_step += 1
                if current_step > n_iter:
                    break
                with timer.step():
                    if train_data is not None:
                        diffusion.feed_data(train_data)
                    diffusion.optimize_parameters()

                if current_step % int(opt["train"]["print_freq"]) == 0:
                    logs = dict(diffusion.get_current_log())
                    logs.update(timer.metrics())
                    message = "<epoch:{:3d}, iter:{:8,d}> ".format(current_epoch, current_step)
                    for k, v in logs.items():
                        message += "{:s}: {:.2e} ".format(k, v)
                    logger.info(message)
                    if wandb_logger:
                        wandb_logger.log_metrics(logs)

                if current_step % int(opt["train"]["val_freq"]) == 0:
                    run_validation(
                        diffusion, val_loader, val_set, opt, current_step,
                        current_epoch, logger, wandb_logger, val_step,
                    )
                    val_step += 1

                if current_step % int(opt["train"]["save_checkpoint_freq"]) == 0:
                    logger.info("Saving models and training states.")
                    diffusion.save_network(current_epoch, current_step)
                    if wandb_logger and opt.get("log_wandb_ckpt"):
                        wandb_logger.log_checkpoint(current_epoch, current_step)

            if wandb_logger:
                wandb_logger.log_metrics({"epoch": current_epoch - 1})
        logger.info("End of training.")
    else:
        logger.info("Begin Model Evaluation.")
        avg_psnr, avg_ssim, idx = 0.0, 0.0, 0
        result_path = opt["path"]["results"]
        os.makedirs(result_path, exist_ok=True)
        norm = val_set.get_normalization_dict()
        for val_data in val_loader:
            idx += 1
            diffusion.feed_data(val_data)
            diffusion.test(continuous=False)
            visuals = diffusion.get_current_visuals()
            input_img, target_img, pred_img = unnormalize_for_psnr(visuals, norm)

            mode = "RGB" if input_img.shape[-1] == 3 else "L"
            save_img(pred_img, f"{result_path}/{idx}_pred.png", mode=mode)
            save_img(target_img, f"{result_path}/{idx}_target.png", mode=mode)
            save_img(input_img, f"{result_path}/{idx}_input.png", mode=mode)

            scale = 255.0 / 65535.0
            eval_psnr = calculate_psnr(pred_img * scale, target_img * scale)
            eval_ssim = calculate_ssim(
                (pred_img[..., :1] * scale).astype(np.uint8),
                (target_img[..., :1] * scale).astype(np.uint8),
            )
            avg_psnr += eval_psnr
            avg_ssim += eval_ssim
            if wandb_logger and opt.get("log_eval"):
                wandb_logger.log_eval_data(input_img, pred_img, target_img, eval_psnr, eval_ssim)

        avg_psnr /= idx
        avg_ssim /= idx
        logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
        logger.info("# Validation # SSIM: {:.4e}".format(avg_ssim))
        if wandb_logger:
            if opt.get("log_eval"):
                wandb_logger.log_eval_table()
            wandb_logger.log_metrics({"PSNR": float(avg_psnr), "SSIM": float(avg_ssim)})


if __name__ == "__main__":
    main()

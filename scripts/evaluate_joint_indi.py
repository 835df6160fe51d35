"""Full-frame joint-InDI evaluation: tiled prediction → stitch → metrics.

Script equivalent of the reference's notebook eval workflow
(/root/reference/notebooks/EvaluateJointIndi.ipynb, SURVEY.md §3.4): load a
trained checkpoint, build the tiled val dataset over the 2048×2048 Hagen
frames, run InDI inference per overlapping tile, stitch centers, and report
RangeInvariantPSNR per channel, optionally sweeping the reverse-step budget N
(the EvaluateJointIndiIterative.ipynb axis).

TPU-native: tiles stream through the device-side tiled pipeline
(data/tiled_infer.py) in batches — no per-tile host loop.

Usage:
  python scripts/evaluate_joint_indi.py -c configs/splitting_hagen_indi_joint.json \
      --resume <ckpt_prefix> [--num_steps 1 5 10] [--t_float_start 0.5] [--mmse 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from diffsplitting_tpu.config.loader import load_json, dict_to_nonedict
from diffsplitting_tpu.data import SplitDatasetTiledPred
from diffsplitting_tpu.data.split_dataset import DataLocation
from diffsplitting_tpu.data.tiled_infer import predict_tiled
from diffsplitting_tpu.train import DiffusionModel
from diffsplitting_tpu.utils.psnr import RangeInvariantPsnr


def build_val_dataset(opt):
    dsets = opt["datasets"]
    loc = DataLocation(
        channelwise_fpath=(dsets["val"]["datapath"]["ch0"], dsets["val"]["datapath"]["ch1"])
    )
    return SplitDatasetTiledPred(
        "Hagen", loc, dsets["patch_size"],
        max_qval=dsets["max_qval"],
        upper_clip=bool(dsets.get("upper_clip", False)),
        channel_weights=dsets.get("channel_weights"),
        enable_transforms=False, random_patching=False,
        input_from_normalized_target=opt["model"]["which_model_G"] == "joint_indi",
    )


def normalized_input_frames(ds):
    """Mean of normalized channels per full frame (the notebook's input mix)."""
    norm = ds.get_normalization_dict()
    mean_t = np.asarray(norm["mean_target"]).reshape(-1)
    std_t = np.asarray(norm["std_target"]).reshape(-1)
    frames = []
    targets = []
    for f in range(ds._frameN):
        ch0 = (np.asarray(ds._data_dict[0][f]) - mean_t[0]) / std_t[0]
        ch1 = (np.asarray(ds._data_dict[1][f]) - mean_t[1]) / std_t[1]
        frames.append(((ch0 + ch1) / 2.0)[..., None].astype(np.float32))
        targets.append(np.stack([ch0, ch1], axis=-1).astype(np.float32))
    return np.stack(frames), np.stack(targets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--resume", default=None, help="checkpoint prefix (…/I{it}_E{ep})")
    ap.add_argument("--num_steps", type=int, nargs="+", default=[1])
    ap.add_argument("--t_float_start", type=float, default=0.5)
    ap.add_argument("--mmse", type=int, default=1, help="avg over N samples (notebook N=1/5)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=None, help="write metrics JSON here")
    ap.add_argument(
        "--lpips-weights", default=None,
        help="local AlexNet-LPIPS weights (.npz or torch .pth, see "
        "utils/lpips.py); when given, LPIPS is reported alongside PSNR "
        "(EvaluateJointIndi.ipynb cells 30-34)",
    )
    ap.add_argument("--check_data", action="store_true",
                    help="validate the config's Hagen TIFF layout and print "
                         "the parity-run commands (reference "
                         "EvaluateJointIndi.ipynb cell 34), then exit")
    args = ap.parse_args()

    if args.check_data:
        from diffsplitting_tpu.data.check import run_check

        raise SystemExit(
            0 if run_check(args.config, dict_to_nonedict(load_json(args.config)))
            else 1)

    lpips_params = None
    if args.lpips_weights:
        from diffsplitting_tpu.utils.lpips import load_lpips_weights

        lpips_params = load_lpips_weights(args.lpips_weights)

    opt = dict_to_nonedict(load_json(args.config))
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    opt.setdefault("path", {})

    ds = build_val_dataset(opt)
    frames, targets = normalized_input_frames(ds)
    model = DiffusionModel(opt)

    results = {}
    for n_steps in args.num_steps:
        model.current_T = int(n_steps)
        model.schedule_phase = f"eval_{n_steps}"

        def infer_fn(tile_batch, _n=n_steps):
            reps = []
            for s in range(args.mmse):
                model.data = {"input": tile_batch}
                reps.append(
                    np.asarray(
                        model.test(continuous=False, t_float_start=args.t_float_start)
                    )
                )
            return np.mean(reps, axis=0)

        pred = predict_tiled(infer_fn, frames, ds.tile_manager, batch_size=args.batch_size)
        psnr0 = RangeInvariantPsnr(targets[..., 0], pred[..., 0]).mean()
        psnr1 = RangeInvariantPsnr(targets[..., 1], pred[..., 1]).mean()
        results[n_steps] = {"psnr_ch0": float(psnr0), "psnr_ch1": float(psnr1)}
        print(f"N={n_steps}: RangeInvariantPSNR ch0={psnr0:.2f} dB ch1={psnr1:.2f} dB")

        if lpips_params is not None:
            from diffsplitting_tpu.utils.lpips import lpips_grayscale

            # per-channel LPIPS on [-1,1]-scaled frames (notebook convention)
            def to_pm1(a):
                lo, hi = a.min(), a.max()
                return (2.0 * (a - lo) / max(hi - lo, 1e-8) - 1.0).astype(np.float32)

            for ch in (0, 1):
                d = lpips_grayscale(
                    lpips_params,
                    to_pm1(targets[..., ch])[..., None],
                    to_pm1(pred[..., ch])[..., None],
                )
                results[n_steps][f"lpips_ch{ch}"] = float(np.mean(np.asarray(d)))
            print(
                f"N={n_steps}: LPIPS ch0={results[n_steps]['lpips_ch0']:.4f} "
                f"ch1={results[n_steps]['lpips_ch1']:.4f}"
            )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

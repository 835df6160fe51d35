"""Batch prediction CLI: checkpoint -> (tiled) splitting inference -> files.

The deployment-facing complement to split.py's training loop: load a trained
InDI / joint-InDI checkpoint, run full frames through the device-side tiled
pipeline (data/tiled_infer.py), and write un-normalized uint16 TIFF stacks
(plus optional PNG previews).

Usage:
  python predict.py -c configs/splitting_hagen_indi_joint.json \
      --resume <ckpt_prefix> --input mixed.tif --out predictions/ \
      [--num_steps 1] [--t_float_start 0.5] [--batch_size 8] [--mmse 1]

The input TIFF is normalized with the config's quantile scheme computed from
the input itself unless --norm_from provides the two training channel TIFFs
(then the training-set statistics are reproduced, matching the reference's
eval workflow, SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
from diffsplitting_tpu.data import TileIndexManager, TilingMode
from diffsplitting_tpu.data.io import load_tiff_stack, save_tiff_stack
from diffsplitting_tpu.data.split_dataset import compute_normalization_dict
from diffsplitting_tpu.data.tiled_infer import predict_tiled
from diffsplitting_tpu.train import DiffusionModel
from diffsplitting_tpu.utils.cli import parse_accel_flag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--resume", required=True, help="checkpoint prefix (…/I{it}_E{ep})")
    ap.add_argument("--input", required=True, help="mixed-input TIFF stack")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--norm_from", nargs=2, default=None,
                    metavar=("CH0_TIF", "CH1_TIF"),
                    help="training channel TIFFs for normalization statistics")
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--t_float_start", type=float, default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--mmse", type=int, default=1)
    ap.add_argument("--coalesce", type=int, default=1,
                    help="1 (default): run the --mmse repetitions as ONE "
                         "batched chain (higher MFU at low batch); 0: "
                         "sequential chains (lower peak memory)")
    ap.add_argument("--deepcache", type=str, default=None, metavar="K[,D]",
                    help="DeepCache serving: full UNet refresh every K steps, "
                         "shallow-only in between (split depth D, default 1). "
                         "Measured 1.58x at 5,1 on v5e; exact chain if unset. "
                         "K='auto' = largest fidelity-safe interval "
                         "(conservative); on trained checkpoints larger "
                         "explicit K (e.g. 12) measured faster AND higher "
                         "task PSNR (results/quality_deepcache).")
    ap.add_argument("--sliding_window", type=str, default=None,
                    metavar="W[,TAU]",
                    help="sliding-window Picard serving (ParaDiGMS): W "
                         "consecutive timesteps batched as one (W*B) "
                         "forward, advance gated at TAU*sigma_t^2 per pixel "
                         "(default 0.1; 0 = exact frozen-noise chain). "
                         "Low-batch latency lever; exclusive with "
                         "--deepcache.")
    ap.add_argument("--w8a8", action="store_true",
                    help="W8A8 quantized serving: int8 MXU convs (2x peak "
                         "rate on v5e) after a one-time activation-scale "
                         "calibration. Approximate; composes with "
                         "--deepcache and --sliding_window.")
    ap.add_argument("--w8a8_sites", choices=["default", "all", "attn"],
                    default="default",
                    help="'all' extends int8 coverage to Down/Upsample and "
                         "1×1 shortcut convs (1.27x vs 1.18x exact chain; "
                         "rel-L2 0.051 vs 0.038); 'attn' is a SUPERSET of "
                         "'all' adding the SelfAttention QKV/proj convs")
    ap.add_argument("--png_preview", action="store_true")
    args = ap.parse_args()

    opt = dict_to_nonedict(load_json(args.config))
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    which = opt["model"]["which_model_G"]
    assert which in ("indi", "joint_indi"), "predict.py serves the splitting models"

    frames = load_tiff_stack(args.input).astype(np.float32)
    if frames.ndim == 2:
        frames = frames[None]

    weights = opt["datasets"].get("channel_weights") or [1, 1]
    if args.norm_from:
        ch0 = load_tiff_stack(args.norm_from[0]).astype(np.float32)
        ch1 = load_tiff_stack(args.norm_from[1]).astype(np.float32)
        norm = compute_normalization_dict(
            {0: list(ch0), 1: list(ch1)}, weights,
            q_val=opt["datasets"]["max_qval"],
        )
    else:
        # self-statistics: treat the mixed input as its own reference
        q = float(opt["datasets"]["max_qval"])
        m = np.quantile(frames.reshape(-1), q)
        norm = {
            "mean_input": m / 2, "std_input": m / 2,
            "mean_target": np.array([m / 2, m / 2]),
            "std_target": np.array([m / 2, m / 2]),
            "target0_max": m, "target1_max": m, "input_max": m,
        }

    inp = ((frames - norm["mean_input"]) / norm["std_input"])[..., None].astype(np.float32)

    model = DiffusionModel(opt)
    if args.deepcache:
        model.set_deepcache(
            *parse_accel_flag(args.deepcache, 1, second_cast=int))
    if args.sliding_window:
        model.set_sliding_window(*parse_accel_flag(args.sliding_window, 0.1))
    if args.w8a8 or args.w8a8_sites != "default":
        # --w8a8_sites implies --w8a8: a sites choice without quantization
        # would silently serve the bf16 chain (round-3 advisor finding)
        wide = args.w8a8_sites in ("all", "attn")
        model.set_quant(8, updown=wide, shortcut=wide,
                        attn=args.w8a8_sites == "attn")
    T = args.num_steps or int(opt["model"]["beta_schedule"]["val"]["n_timestep"])
    model.current_T = T
    model.schedule_phase = f"predict_{T}"
    t_start = args.t_float_start
    if t_start is None:
        t_start = 0.5 if which == "joint_indi" else 1.0

    patch = int(opt["datasets"]["patch_size"])
    F, H, W = frames.shape
    mng = TileIndexManager(
        (F, H, W), (1, patch // 2, patch // 2), (1, patch, patch),
        TilingMode.ShiftBoundary,
    )

    def infer_fn(tile_batch):
        if args.mmse > 1 and args.coalesce:
            # batch the independent MMSE chains into ONE wider chain: v5e MFU
            # rises with batch (b8 38% -> b16 44% -> b32 48%, BENCH_NOTES),
            # so averaging N reps costs less than N sequential chains
            b = tile_batch.shape[0]
            model.data = {"input": np.tile(tile_batch, (args.mmse, 1, 1, 1))}
            out = np.asarray(model.test(continuous=False, t_float_start=t_start))
            return out.reshape((args.mmse, b) + out.shape[1:]).mean(axis=0)
        reps = []
        for _ in range(args.mmse):
            model.data = {"input": tile_batch}
            reps.append(np.asarray(model.test(continuous=False, t_float_start=t_start)))
        return np.mean(reps, axis=0)

    pred = predict_tiled(infer_fn, inp, mng, batch_size=args.batch_size)

    mean_t = np.asarray(norm["mean_target"]).reshape(1, 1, 1, -1)
    std_t = np.asarray(norm["std_target"]).reshape(1, 1, 1, -1)
    pred_raw = np.clip(pred * std_t + mean_t, 0, 65535).astype(np.uint16)

    os.makedirs(args.out, exist_ok=True)
    for c in range(pred_raw.shape[-1]):
        save_tiff_stack(os.path.join(args.out, f"pred_ch{c}.tif"), pred_raw[..., c])
    if args.png_preview:
        import cv2

        for c in range(pred_raw.shape[-1]):
            img = pred_raw[0, ..., c].astype(np.float32)
            img = (255 * (img - img.min()) / max(float(np.ptp(img)), 1.0)).astype(np.uint8)
            cv2.imwrite(os.path.join(args.out, f"preview_ch{c}.png"), img)
    print(f"wrote {pred_raw.shape[-1]} channel stacks ({F}x{H}x{W}) to {args.out}")


if __name__ == "__main__":
    main()

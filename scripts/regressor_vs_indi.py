"""The "what does the iterative bridge buy?" ablation, quantified.

The reference's notebooks/train_unet.ipynb trains the InDI UNet as a
one-step supervised regressor and eyeballs predictions against the
diffusion model; it never puts a number on the comparison. This script
does, on the synthetic two-channel microscopy data of
quality_joint_indi_synthetic.py, with a SHARED evaluation protocol:

  * InDI: trained through `split.py` (the production CLI) for --iters
    steps, then N-step inference (N ∈ --num_steps) via DiffusionModel.test.
  * Regressor: scripts/train_unet_regressor.py on the SAME config for the
    same number of gradient steps (epochs computed from the loader length).
  * Both evaluated as channel-wise PSNR on uint16-unnormalized val patches
    (split.py's unnormalize_for_psnr + utils.psnr.PSNR), same val set.

Usage (TPU, detached):
  python scripts/regressor_vs_indi.py --iters 3000 \
      --workdir /tmp/reg_vs_indi --out results/unet_regressor
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_indi_config(workdir, iters, patch, batch):
    from diffsplitting_tpu.config.loader import load_json

    opt = load_json(os.path.join(REPO, "configs/splitting_hagen_indi.json"))
    ds = opt["datasets"]
    ds["patch_size"] = patch
    for split in ("train", "val"):
        ds[split]["datapath"] = {
            "ch0": f"{workdir}/{split}/{split}_actin.tif",
            "ch1": f"{workdir}/{split}/{split}_mito.tif",
        }
        ds[split]["patch_size"] = patch
    ds["train"]["batch_size"] = batch
    opt["path"]["root"] = f"{workdir}/experiments/"
    opt["model"]["diffusion"]["image_size"] = patch
    opt["train"]["n_iter"] = iters
    opt["train"]["val_freq"] = iters
    opt["train"]["save_checkpoint_freq"] = iters
    opt["train"]["print_freq"] = 200
    opt["enable_wandb"] = False
    cfg_path = f"{workdir}/cfg_indi.json"
    with open(cfg_path, "w") as f:
        json.dump(opt, f, indent=1)
    return cfg_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--num_steps", type=int, nargs="+", default=[1, 10])
    ap.add_argument("--eval_batches", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/reg_vs_indi")
    ap.add_argument("--out", default=os.path.join(REPO, "results/unet_regressor"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from scripts.quality_joint_indi_synthetic import make_stacks

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.data import NumpyLoader
    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.psnr import PSNR
    from split import get_datasets, unnormalize_for_psnr

    os.makedirs(args.workdir, exist_ok=True)
    print("synthesizing frames ...", flush=True)
    make_stacks(args.workdir, args.frames, args.size)
    cfg = write_indi_config(args.workdir, args.iters, args.patch, args.batch)

    print("training InDI via split.py ...", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "split.py"), "-c", cfg],
        cwd=REPO, capture_output=True, text=True,
    )
    sys.stdout.write(r.stdout[-2000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit("split.py failed")

    ckpts = sorted(glob.glob(f"{args.workdir}/experiments/*/*/*/checkpoint/I*_gen"),
                   key=os.path.getmtime)
    assert ckpts, "no checkpoint written by split.py"
    prefix = ckpts[-1][: -len("_gen")]
    print("InDI checkpoint:", prefix, flush=True)

    # shared channel-wise uint16-PSNR eval (split.py protocol)
    opt = dict_to_nonedict(load_json(cfg))
    opt["phase"] = "val"
    train_set, val_set = get_datasets(opt)
    norm = train_set.get_normalization_dict()
    out_ch = opt["model"]["unet"]["out_channel"]
    val_loader = NumpyLoader(val_set, batch_size=args.batch, shuffle=False,
                             drop_last=False)

    def eval_channels(predict):
        vals = {c: [] for c in range(out_ch)}
        for bi, batch in enumerate(val_loader):
            if bi >= args.eval_batches:
                break
            pred = np.asarray(predict(np.asarray(batch["input"])))
            for i in range(pred.shape[0]):
                visuals = {
                    "input": np.asarray(batch["input"])[i : i + 1],
                    "target": np.asarray(batch["target"])[i : i + 1],
                    "prediction": pred[i : i + 1],
                }
                _, target_img, pred_img = unnormalize_for_psnr(visuals, norm)
                for c in range(out_ch):
                    vals[c].append(float(PSNR(
                        target_img[..., c][None].astype(np.float32),
                        pred_img[..., c][None].astype(np.float32),
                    )[0]))
        return {c: float(np.mean(v)) for c, v in vals.items() if v}

    results = {"iters": args.iters, "patch": args.patch, "indi": {},
               "protocol": "channel-wise PSNR on uint16-unnormalized val "
                           "patches, identical eval for both models"}

    for n in args.num_steps:
        opt_n = dict_to_nonedict(load_json(cfg))
        opt_n["phase"] = "val"
        opt_n["path"]["resume_state"] = prefix
        opt_n["model"]["beta_schedule"]["val"]["n_timestep"] = n
        model = DiffusionModel(opt_n)
        model.set_new_noise_schedule(
            opt_n["model"]["beta_schedule"]["val"], "val")

        def indi_predict(x, _m=model):
            _m.feed_data({"input": x})
            out = _m.test(continuous=False)
            return out

        results["indi"][f"N={n}"] = eval_channels(indi_predict)
        print(f"InDI N={n}: {results['indi'][f'N={n}']}", flush=True)
        del model

    # regressor: same config, same gradient-step budget
    from scripts.train_unet_regressor import main as reg_main

    steps_per_epoch = max(1, len(train_set) // args.batch)
    epochs = max(1, round(args.iters / steps_per_epoch))
    print(f"training regressor: {epochs} epochs × {steps_per_epoch} steps",
          flush=True)
    best, history = reg_main([
        "--config", cfg, "--epochs", str(epochs),
        "--eval_batches", str(args.eval_batches),
        "--out", os.path.join(args.out, "reg_history"),
        "--workdir", f"{args.workdir}/regressor",
    ])
    results["regressor"] = {"best_avg_psnr": best,
                            "final": history[-1]["val_psnr"],
                            "epochs": epochs}

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "regressor_vs_indi.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), flush=True)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()

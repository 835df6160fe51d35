"""TimePredictor evaluation: predicted t vs ground-truth mixing fraction.

Script equivalent of /root/reference/notebooks/time_prediction_evaluation.ipynb:
for every t on a grid, mix the normalized val channels as t·ch0 + (1-t)·ch1,
min-max normalize with the per-t stats, run the classifier over the val set,
and report per-t mean/std predictions and overall RMSE.

Usage:
  python scripts/evaluate_time_predictor.py -c configs/splitting_hagen_time_predictor.json \
      --resume <experiment_root>/best_time_predictor [--num_timesteps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
from diffsplitting_tpu.data import NumpyLoader, TimePredictorDataset
from diffsplitting_tpu.data.split_dataset import DataLocation
from diffsplitting_tpu.data.time_predictor_dataset import compute_input_normalization_dict
from diffsplitting_tpu.models import TimePredictor
from diffsplitting_tpu.parallel.mesh import init_on_host
from diffsplitting_tpu.train.checkpoints import load_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--resume", required=True, help="checkpoint prefix")
    ap.add_argument("--num_timesteps", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_batches", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    opt = dict_to_nonedict(load_json(args.config))
    dsets = opt["datasets"]
    val_loc = DataLocation(
        channelwise_fpath=(dsets["val"]["datapath"]["ch0"], dsets["val"]["datapath"]["ch1"])
    )
    val_set = TimePredictorDataset(
        "Hagen", val_loc, dsets["patch_size"],
        max_qval=dsets["max_qval"], upper_clip=bool(dsets.get("upper_clip", False)),
        channel_weights=dsets.get("channel_weights"),
        enable_transforms=False, random_patching=False,
    )

    model_opt = opt["model"]
    net = TimePredictor(
        in_channel=model_opt["unet"]["in_channel"],
        out_channel=model_opt["unet"]["out_channel"],
        norm_groups=model_opt["unet"]["norm_groups"] or 32,
        inner_channel=model_opt["unet"]["inner_channel"],
        channel_mults=tuple(model_opt["unet"]["channel_multiplier"]),
        attn_res=tuple(model_opt["unet"]["attn_res"] or ()),
        res_blocks=model_opt["unet"]["res_blocks"],
        dropout=0.0,
        image_size=dsets["patch_size"],
    )
    P = dsets["patch_size"]
    template = init_on_host(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, P, P, model_opt["unet"]["in_channel"]))
    )["params"]
    params, _, _, _, _ = load_checkpoint(args.resume, template)
    predict = jax.jit(lambda x: net.apply({"params": params}, x))

    T = args.num_timesteps
    val_set.fixed_t_norm_dict = compute_input_normalization_dict(
        val_set._data_dict, T, val_set._mean_target, val_set._std_target
    )
    gt_grid = np.arange(0, 1.01, 1 / T)

    n_items = len(val_set)
    if args.max_batches:
        n_items = min(n_items, args.max_batches * args.batch_size)

    results = []
    for t_int, t in enumerate(gt_grid):
        preds = []
        for start in range(0, n_items, args.batch_size):
            batch = np.stack(
                [val_set.item_at_t(i, float(t), t_int)
                 for i in range(start, min(start + args.batch_size, n_items))]
            )
            preds.append(np.asarray(predict(jnp.asarray(batch))))
        preds = np.concatenate(preds)
        results.append({"t": float(t), "pred_mean": float(preds.mean()),
                        "pred_std": float(preds.std())})
        print(f"t={t:.2f}: pred {preds.mean():.3f} ± {preds.std():.3f}")

    rmse = float(np.sqrt(np.mean([(r["pred_mean"] - r["t"]) ** 2 for r in results])))
    print(f"RMSE: {rmse:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"per_t": results, "rmse": rmse}, f, indent=2)


if __name__ == "__main__":
    main()

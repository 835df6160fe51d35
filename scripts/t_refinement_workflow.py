"""PSNR-based t-refinement workflow: the reference's flagship inference-time
composition, as a script.

Composes a trained TimePredictor + a trained joint-InDI model exactly like
/root/reference/core/psnr_based_t_refinement.py:41-57 and
notebooks/time_prediction_evaluation.ipynb:
  1. mix the two (normalized) val channels at an OOD fraction t_true ≠ 0.5,
  2. classifier predicts t̂ from the mixture,
  3. one-step bridge inversions of both directions at the classifier's t̂,
  4. grid-search the remix t maximizing RangeInvariantPSNR vs the input
     (`estimate_time_using_PSNR`, utils/t_refinement.py),
  5. run FULL joint-InDI inference starting from the refined t and from the
     naive t=0.5, and report per-channel PSNR of both against ground truth.

The refined start should win on OOD mixtures: starting the bridge at t=0.5
mis-models a t=0.35 input, while the refined start matches the actual
mixture.

Usage:
  python scripts/t_refinement_workflow.py -c <joint_config.json> \
      --resume <joint_ckpt_prefix_or_pth> \
      [--time-resume <time_predictor_ckpt_prefix>] \
      [--t-true 0.35 0.4 0.5] [--num_steps 10] [--batch 8] [--out out.json]

Without --time-resume the classifier stage is skipped and the one-step
estimates start from t=0.5 (the grid search still refines t) — useful when
only the splitting model is trained.
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
from diffsplitting_tpu.data.split_dataset import (
    DataLocation,
    compute_normalization_dict,
    load_data,
)
from diffsplitting_tpu.parallel.mesh import init_on_host
from diffsplitting_tpu.train import DiffusionModel
from diffsplitting_tpu.train.checkpoints import load_checkpoint
from diffsplitting_tpu.utils.psnr import RangeInvariantPsnr
from diffsplitting_tpu.utils.t_refinement import estimate_time_using_PSNR


def load_normalized_channels(opt, split="val", patch=None, max_frames=None):
    """Val channels, quantile-normalized with the config's scheme, center-
    cropped to `patch`. Returns (ch0n, ch1n) as (N, P, P) float32."""
    ds = opt["datasets"]
    dp = ds[split]["datapath"]
    loc = DataLocation(channelwise_fpath=(dp["ch0"], dp["ch1"]))
    data_dict = load_data(ds[split].get("name") or "Hagen", loc)
    norm = compute_normalization_dict(
        data_dict, ds.get("channel_weights") or [1, 1], q_val=ds["max_qval"]
    )
    mean_t = np.asarray(norm["mean_target"], np.float32)
    std_t = np.asarray(norm["std_target"], np.float32)
    ch = [np.stack(data_dict[c]).astype(np.float32) for c in (0, 1)]
    if max_frames:
        ch = [c[:max_frames] for c in ch]
    if patch:
        H, W = ch[0].shape[-2:]
        y0, x0 = (H - patch) // 2, (W - patch) // 2
        ch = [c[:, y0 : y0 + patch, x0 : x0 + patch] for c in ch]
    ch0n = (ch[0] - mean_t[0]) / std_t[0]
    ch1n = (ch[1] - mean_t[1]) / std_t[1]
    return ch0n, ch1n


def build_time_classifier(opt_path, resume):
    """Jitted TimePredictor closure from its config + checkpoint prefix."""
    opt = dict_to_nonedict(load_json(opt_path))
    u = opt["model"]["unet"]
    from diffsplitting_tpu.models import TimePredictor

    net = TimePredictor(
        in_channel=u["in_channel"], out_channel=u["out_channel"],
        inner_channel=u["inner_channel"], norm_groups=u["norm_groups"] or 32,
        channel_mults=tuple(u["channel_multiplier"]),
        attn_res=tuple(u["attn_res"] or ()), res_blocks=u["res_blocks"],
        dropout=0.0, image_size=opt["datasets"]["patch_size"],
    )
    P = opt["datasets"]["patch_size"]
    template = init_on_host(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((1, P, P, u["in_channel"]))
    )["params"]
    params, _, _, _, _ = load_checkpoint(resume, template)
    return jax.jit(lambda x: net.apply({"params": params}, x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True, help="joint-InDI config")
    ap.add_argument("--resume", required=True,
                    help="joint-InDI checkpoint prefix (orbax or reference .pth)")
    ap.add_argument("--time-config", default=None,
                    help="TimePredictor config (defaults to the joint config)")
    ap.add_argument("--time-resume", default=None,
                    help="TimePredictor checkpoint prefix; omit to start the "
                         "one-step estimates from t=0.5")
    ap.add_argument("--t-true", type=float, nargs="+", default=[0.35, 0.5, 0.65])
    ap.add_argument("--num_steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=None,
                    help="center-crop size (defaults to datasets.patch_size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    opt = dict_to_nonedict(load_json(args.config))
    opt["phase"] = "val"
    opt["path"]["resume_state"] = args.resume
    assert opt["model"]["which_model_G"] == "joint_indi"

    patch = args.patch or int(opt["datasets"]["patch_size"])
    ch0n, ch1n = load_normalized_channels(opt, patch=patch)
    n = min(args.batch, ch0n.shape[0])
    ch0n, ch1n = ch0n[:n], ch1n[:n]

    model = DiffusionModel(opt)
    proc = model.process
    params = model.params
    d1 = jax.jit(lambda x, t: model.nets["net_ch1"].apply(
        {"params": params["net_ch1"]}, x, t))
    d2 = jax.jit(lambda x, t: model.nets["net_ch2"].apply(
        {"params": params["net_ch2"]}, x, t))

    if args.time_resume:
        classifier = build_time_classifier(
            args.time_config or args.config, args.time_resume
        )
    else:
        classifier = lambda x: jnp.full((x.shape[0],), 0.5)  # noqa: E731

    rng = jax.random.PRNGKey(args.seed)
    report = []
    for t_true in args.t_true:
        # mixture convention of TimePredictorDataset / the refinement
        # (reference time_predictor_dataset.py:50-89): t is ch0's coefficient
        inp = (t_true * ch0n + (1 - t_true) * ch1n)[..., None].astype(np.float32)

        per_sample_t, consensus_t = estimate_time_using_PSNR(
            jnp.asarray(inp), proc.indi1, proc.indi2, d1, d2, classifier,
            rng=jax.random.fold_in(rng, 0),
        )
        classifier_t = float(np.mean(np.asarray(classifier(jnp.asarray(inp)))))

        # joint inference: indi1 starts at t_float_start, indi2 at
        # 1 - t_float_start (joint_indi.py:131-135). indi1 recovers ch0 from
        # x = (1-t)·ch0 + t·ch1, so its start time is 1 - t_mix.
        def run(t_start):
            model.data = {"input": jnp.asarray(inp)}
            out = np.asarray(model.test(
                continuous=False, t_float_start=float(t_start)))
            p0 = RangeInvariantPsnr(ch0n, out[..., 0]).mean()
            p1 = RangeInvariantPsnr(ch1n, out[..., 1]).mean()
            return float(p0), float(p1)

        model.current_T = int(args.num_steps)
        model.schedule_phase = f"tref_{args.num_steps}"
        refined_start = 1.0 - consensus_t
        psnr_refined = run(refined_start)
        psnr_naive = run(0.5)

        row = {
            "t_true": t_true,
            "classifier_t": classifier_t,
            "per_sample_t_mean": float(np.mean(per_sample_t)),
            "consensus_t": consensus_t,
            "refined_t_start": refined_start,
            "psnr_refined_ch0": psnr_refined[0],
            "psnr_refined_ch1": psnr_refined[1],
            "psnr_naive_ch0": psnr_naive[0],
            "psnr_naive_ch1": psnr_naive[1],
        }
        report.append(row)
        print(
            f"t_true={t_true:.2f}: classifier t̂={classifier_t:.3f}, "
            f"consensus t={consensus_t:.3f} → start {refined_start:.3f} | "
            f"PSNR refined {psnr_refined[0]:.2f}/{psnr_refined[1]:.2f} dB "
            f"vs naive {psnr_naive[0]:.2f}/{psnr_naive[1]:.2f} dB",
            flush=True,
        )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

"""Fidelity of cached joint-InDI inference on a TRAINED splitting model.

Loads the checkpoint produced by quality_joint_indi_synthetic.py (via the
real split.py training path), runs exact vs deep-feature-cached joint
inference at N reverse steps with the SAME rng, and reports PSNR(cached,
exact) per interval — the splitting-task counterpart of the SR3 study in
results/quality_deepcache.

Usage: python scripts/eval_joint_deepcache_fidelity.py --workdir /tmp/quality_ji2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_ckpt(workdir):
    ckpts = []
    for root, dirs, files in os.walk(workdir):
        for f in list(dirs) + list(files):
            if f.endswith("_gen"):
                ckpts.append(os.path.join(root, f[: -len("_gen")]))
    assert ckpts, f"no checkpoint under {workdir}"
    return max(ckpts, key=lambda p: os.path.getmtime(f"{p}_gen"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_ji2")
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--intervals", default="2,5")
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "results/quality_deepcache/joint_indi_fidelity.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.diffusion.deepcache import (
        cached_joint_indi_inference,
        make_cached_denoisers,
    )
    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.utils.psnr import PSNR

    cfg = f"{args.workdir}/cfg_joint_indi.json"
    opt = load_json(cfg)
    opt["phase"] = "val"
    opt["path"]["resume_state"] = find_ckpt(args.workdir)
    model = DiffusionModel(dict_to_nonedict(opt))

    # a held-out val patch batch through the dataset pipeline (same
    # construction as scripts/evaluate_joint_indi.py)
    from diffsplitting_tpu.data.split_dataset import DataLocation, SplitDataset

    ds_opt = opt["datasets"]
    loc = DataLocation(channelwise_fpath=(
        ds_opt["val"]["datapath"]["ch0"], ds_opt["val"]["datapath"]["ch1"]))
    val = SplitDataset(
        "Hagen", loc, ds_opt["patch_size"],
        max_qval=ds_opt["max_qval"],
        upper_clip=bool(ds_opt.get("upper_clip", False)),
        channel_weights=ds_opt.get("channel_weights"),
        enable_transforms=False, random_patching=False,
        input_from_normalized_target=True,
    )
    batch = np.stack([val[i]["input"] for i in range(8)]).astype(np.float32)
    x_in = jnp.asarray(batch)

    proc, nets = model.process, model.nets
    p1 = {"params": model.params["net_ch1"]}
    p2 = {"params": model.params["net_ch2"]}
    rng = jax.random.PRNGKey(77)

    exact_fn = jax.jit(
        lambda q1, q2, r, c: proc.inference(
            lambda xx, tt: nets["net_ch1"].apply(q1, xx, tt),
            lambda xx, tt: nets["net_ch2"].apply(q2, xx, tt),
            r, c, num_timesteps=args.n,
        )
    )
    exact = np.asarray(exact_fn(p1, p2, rng, x_in))

    results = {"n_steps": args.n, "depth": args.depth}
    for k in (int(v) for v in args.intervals.split(",")):
        def cached(q1, q2, r, c, _k=k):
            a1 = make_cached_denoisers(nets["net_ch1"], q1, args.depth)[:2]
            a2 = make_cached_denoisers(nets["net_ch2"], q2, args.depth)[:2]
            return cached_joint_indi_inference(proc, r, c, a1, a2, interval=_k,
                                               num_timesteps=args.n)

        t0 = time.perf_counter()
        out = np.asarray(jax.jit(cached)(p1, p2, rng, x_in))
        # per-channel PSNR of cached vs exact prediction
        ps = [
            float(np.mean(np.asarray(PSNR(
                exact[..., c_], out[..., c_]
            )))) for c_ in range(out.shape[-1])
        ]
        results[f"interval{k}"] = {
            "psnr_vs_exact_ch0": ps[0], "psnr_vs_exact_ch1": ps[1],
            "first_call_s": round(time.perf_counter() - t0, 1),
        }
        print(k, results[f"interval{k}"], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()

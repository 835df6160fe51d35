"""DeepCache refresh-schedule study on trained joint-InDI (round-3 roadmap).

Round 2 measured uniform refresh intervals on the joint bridge: 51/53 dB
fidelity at interval 2 but only 38/41 dB at interval 5 (N=10). The refresh
flags are a TRACED scan input (`refresh_override`,
diffusion/deepcache.py:79-86), so arbitrary non-uniform schedules sweep with
ONE compile per (N, depth). This script maps the fidelity/speedup frontier
over:

  * schedule families: uniform-k, front-dense (every step for the first m,
    then interval k — the bridge moves fastest right after t=0.5), geometric
    (refresh at 0,1,2,4,8,…), both-ends,
  * N ∈ {10, 25, 50} reverse steps, depth ∈ {1, 2},

against the exact chain (same rng), reporting PSNR(cached, exact) per
channel and measured wall-clock speedup. Goal: a recommended default holding
≥45 dB at ≥1.3× for N=10.

Usage: python scripts/deepcache_schedule_study.py --workdir /tmp/quality_ji2 \
         [--n 10 25 50] [--depths 1] [--out results/quality_deepcache/schedule_study.json]
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


def schedules_for(N: int):
    """(name, refresh flag vector) candidates; flag[0]=1 always (the scan's
    first step must fill the cache)."""
    out = []

    def flags(idxs):
        f = np.zeros(N, np.int32)
        f[list(idxs)] = 1
        f[0] = 1
        return f

    for k in (2, 3, 4, 5):
        if k < N:
            out.append((f"uniform{k}", flags(range(0, N, k))))
    # front-dense: every step for the first m, then every k
    for m, k in ((2, 4), (3, 5), (2, 8), (4, 8)):
        if m < N:
            out.append((f"front{m}_then{k}",
                        flags(list(range(m)) + list(range(m, N, k)))))
    # geometric: 0,1,2,4,8,16…
    g = [0]
    step = 1
    while g[-1] + step < N:
        g.append(g[-1] + step)
        step *= 2
    out.append(("geometric", flags(g)))
    # both ends dense, sparse middle
    m = max(2, N // 8)
    out.append((f"ends{m}", flags(list(range(m)) + list(range(N - m, N)))))
    # dedupe identical flag vectors (tiny N collapses families)
    seen = {}
    for name, f in out:
        key = f.tobytes()
        if key not in seen:
            seen[key] = (name, f)
    return list(seen.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_ji2")
    ap.add_argument("--n", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results/quality_deepcache/schedule_study.json"))
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
    x_in = jnp.asarray(
        np.stack([val[i]["input"] for i in range(args.batch)]).astype(np.float32)
    )

    proc, nets = model.process, model.nets
    p1 = {"params": model.params["net_ch1"]}
    p2 = {"params": model.params["net_ch2"]}
    rng = jax.random.PRNGKey(77)

    def timed(fn, *a):
        out = np.asarray(fn(*a))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(*a)
        np.asarray(r)
        return out, (time.perf_counter() - t0) / args.reps

    results = {"batch": args.batch, "rows": []}
    for N in args.n:
        exact_fn = jax.jit(
            lambda q1, q2, r, c, _N=N: proc.inference(
                lambda xx, tt: nets["net_ch1"].apply(q1, xx, tt),
                lambda xx, tt: nets["net_ch2"].apply(q2, xx, tt),
                r, c, num_timesteps=_N,
            )
        )
        exact, exact_s = timed(exact_fn, p1, p2, rng, x_in)
        print(f"N={N}: exact {exact_s*1000:.0f} ms/chain", flush=True)

        for depth in args.depths:
            # ONE jitted program per (N, depth); schedules are traced inputs
            def cached(q1, q2, r, c, rf, _d=depth, _N=N):
                a1 = make_cached_denoisers(nets["net_ch1"], q1, _d)[:2]
                a2 = make_cached_denoisers(nets["net_ch2"], q2, _d)[:2]

                def one(pr, aa, ts):
                    from diffsplitting_tpu.diffusion.deepcache import (
                        cached_indi_inference,
                    )
                    return cached_indi_inference(
                        pr, ts[0], c, *aa, interval=1, num_timesteps=_N,
                        t_float_start=ts[1], refresh_override=rf,
                    )

                r1, r2 = jax.random.split(r)
                ch1 = one(proc.indi1, a1, (r1, 0.5))
                ch2 = one(proc.indi2, a2, (r2, 0.5))
                return jnp.concatenate([ch1, ch2], axis=-1)

            jfn = jax.jit(cached)
            for name, rf in schedules_for(N):
                out, dt = timed(jfn, p1, p2, rng, x_in, jnp.asarray(rf))
                ps = [
                    float(np.mean(np.asarray(PSNR(exact[..., ch], out[..., ch]))))
                    for ch in range(out.shape[-1])
                ]
                row = {
                    "n": N, "depth": depth, "schedule": name,
                    "full_evals": int(rf.sum()),
                    "psnr_ch0": round(ps[0], 2), "psnr_ch1": round(ps[1], 2),
                    "chain_s": round(dt, 4),
                    "speedup": round(exact_s / dt, 3),
                }
                results["rows"].append(row)
                print(row, flush=True)

    # recommendation: fastest schedule holding >=45 dB on both channels, N=10
    cand = [r for r in results["rows"]
            if r["n"] == 10 and min(r["psnr_ch0"], r["psnr_ch1"]) >= 45.0]
    if cand:
        best = max(cand, key=lambda r: r["speedup"])
        results["recommended_n10"] = best
        print("RECOMMENDED (N=10, ≥45 dB):", best, flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()

"""Standing quality-vs-iters A/B over saved checkpoints (VERDICT r4 ask #3).

The round-4 512² regression (18k read 16.33 dB vs 15k's 18.16) conflated
two variables: more training AND a different sampler (DDIM×DeepCache vs the
exact chain) — and the checkpoints died with a host recycle before the A/B
could attribute it. This sweep walks every I{N}_E0 checkpoint a training
run left behind (quality_sr3_overfit --save_every) and scores EACH with
BOTH samplers on the same faces:

  A. exact ancestral chain (chunked — bit-identical to the single scan)
  B. DDIM(S,η)×DeepCache(K,D) — the accelerated serving route

so quality-vs-iters is attributable per sampler the moment it moves.
Mode-major loop order: each sampler traces ONCE and all checkpoints ride
the same compiled program (params are jit arguments).

Usage (on chip, after/alongside a --save_every training run):
  setsid python scripts/eval_512_checkpoints.py \
      --workdir /root/repo/workdirs/q512_r5 \
      --config configs/sr_sr3_64_512.json --l_res 64 --r_res 512 \
      --faces 2 --out results/quality_sr3_64_512_r5/ab_table.json \
      > /tmp/eval512.log 2>&1 &
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="training workdir holding ckpt/I{N}_E0_gen dirs")
    ap.add_argument("--config", default="configs/sr_sr3_64_512.json")
    ap.add_argument("--l_res", type=int, default=64)
    ap.add_argument("--r_res", type=int, default=512)
    ap.add_argument("--faces", type=int, default=2,
                    help="first N prepared faces (keeps each eval cheap)")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--ddim", default="250,1.0", metavar="S,ETA")
    ap.add_argument("--deepcache", default="5,1", metavar="K,D")
    ap.add_argument("--ema", type=float, default=0.9999,
                    help="score EMA weights when the checkpoint carries them "
                         "(0: raw weights)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--min_iter", type=int, default=0)
    ap.add_argument("--only", default=None,
                    help="comma-separated iter list (e.g. '10000,12000') to "
                         "score just those checkpoints — for re-scoring the "
                         "sweep's peak on the full face set")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np

    from diffsplitting_tpu.train import DiffusionModel
    from diffsplitting_tpu.train.checkpoints import load_checkpoint
    from diffsplitting_tpu.utils.metrics import (
        calculate_psnr, calculate_ssim, tensor2img,
    )
    from quality_sr3_overfit import build_opt, prepare_face_batch

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    cks = []
    for d in glob.glob(os.path.join(ckpt_dir, "I*_E*_gen")):
        m = re.match(r"I(\d+)_E(\d+)_gen$", os.path.basename(d))
        if m and int(m.group(1)) >= args.min_iter:
            cks.append((int(m.group(1)), d[: -len("_gen")]))
    if args.only:
        keep = {int(v) for v in args.only.split(",")}
        cks = [(i, p) for i, p in cks if i in keep]
    cks.sort()
    assert cks, f"no checkpoints under {ckpt_dir}"
    print(f"{len(cks)} checkpoints: {[i for i, _ in cks]}", flush=True)

    batch_np = prepare_face_batch(args.workdir, args.l_res, args.r_res)
    faces = {k: v[: args.faces] for k, v in batch_np.items()}
    hr = [tensor2img(faces["target"][i]) for i in range(args.faces)]

    # phase stays "train": EMA weights ride the _opt payload, and
    # load_checkpoint only restores them when an opt-state template exists
    opt = build_opt(f"{args.workdir}/ckpt", args.config, remat=False,
                    bf16=True, ema=args.ema)
    opt["path"]["resume_state"] = None
    model = DiffusionModel(opt)
    model.set_new_noise_schedule(model.opt["model"]["beta_schedule"]["val"],
                                 "val")
    model.sampler_chunk = args.chunk

    S, eta = args.ddim.split(",")
    K, D = (int(v) for v in args.deepcache.split(","))
    modes = [("exact", lambda: (model.set_ddim(None), model.set_deepcache(None))),
             (f"ddim{S}x dc{K}", lambda: (model.set_ddim(int(S), float(eta)),
                                          model.set_deepcache(K, D)))]
    # resume across tunnel outages: rows already in --out are skipped, so a
    # supervisor relaunch (flaky_tunnel_supervisor.py) only re-scores what's
    # missing instead of re-walking the whole sweep
    table = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f).get("table", {})
        done = sum(len(v) for v in table.values())
        if done:
            print(f"resuming: {done} rows already scored in {args.out}",
                  flush=True)
    for mode_name, enable in modes:
        enable()
        for it, prefix in cks:
            if table.get(str(it), {}).get(mode_name):
                continue  # scored before an outage relaunch
            params, _, _, _, ema = load_checkpoint(
                prefix, model.params,
                model.opt_state if args.ema > 0 else None,
                with_ema=args.ema > 0)
            model.params = model._place_params(params)
            model.ema_params = (model._place_params(ema)
                                if ema is not None else None)
            use_ema = args.ema > 0 and model.ema_params is not None
            model.feed_data({"input": faces["input"]})
            t0 = time.perf_counter()
            sr = np.asarray(model.test(continuous=False, use_ema=use_ema))
            dt = time.perf_counter() - t0
            ps = [calculate_psnr(tensor2img(sr[i]), hr[i])
                  for i in range(args.faces)]
            ss = [calculate_ssim(tensor2img(sr[i]), hr[i])
                  for i in range(args.faces)]
            row = {"psnr": round(float(np.mean(ps)), 3),
                   "ssim": round(float(np.mean(ss)), 4),
                   "s": round(dt, 1), "ema": use_ema}
            table.setdefault(str(it), {})[mode_name] = row
            print(f"iter {it:>6} [{mode_name}]: "
                  f"{row['psnr']:.2f} dB / {row['ssim']:.3f} ({dt:.0f}s)",
                  flush=True)
            if args.out:
                os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
                with open(args.out, "w") as f:
                    json.dump({"faces": args.faces, "chunk": args.chunk,
                               "ddim": args.ddim, "deepcache": args.deepcache,
                               "table": table}, f, indent=1)
    print(json.dumps(table), flush=True)


if __name__ == "__main__":
    main()

"""One-step supervised UNet regression baseline — the script counterpart of
the reference's notebooks/train_unet.ipynb (the last notebook workflow
without one).

The notebook (cells 4-10) pulls `diffusion.netG.denoise_fn` out of an InDI
model and trains it as a DIRECT regressor: input = cat([x, x], ch) +
eps * netG.e (exactly InDI's x_end at t=1 plus its t=1 noise, cf.
/root/reference/model/ddpm_modules/indi.py:116-124), target = the
normalized 2-channel target, L1 loss, Adam(lr=1e-3), ~20 epochs. It is the
"what does the iterative bridge buy?" ablation: a one-step deterministic
splitter over the same UNet + dataset + noise model.

Notebook rot NOT replicated by default (kept available for exactness):
its time conditioning is `t = arange(B) / B` — each sample is conditioned
on its BATCH POSITION, so inference behavior depends on batch size and
sample order. Default here is the semantically meaningful constant t=1.0
(the InDI time at which x_t equals the fully-mixed input the regressor
sees); `--t_mode batch_index` reproduces the notebook literally.

Runs on CPU for the e2e test (tiny config) and on TPU for real training;
everything hot is inside jitted steps.

Usage:
  python scripts/train_unet_regressor.py --config configs/splitting_cifar10_indi.json \
      --epochs 20 --out results/unet_regressor
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/splitting_cifar10_indi.json")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=0, help="0 = config batch size")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="notebook cell 9 uses Adam(1e-3)")
    ap.add_argument("--t_mode", choices=("one", "batch_index"), default="one")
    ap.add_argument("--steps_per_epoch", type=int, default=0,
                    help="truncate epochs (0 = full loader); for tests")
    ap.add_argument("--eval_batches", type=int, default=8,
                    help="val batches per eval pass")
    ap.add_argument("--out", default=os.path.join(REPO, "results/unet_regressor"))
    ap.add_argument("--workdir", default="/tmp/unet_regressor")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from diffsplitting_tpu.config.loader import dict_to_nonedict, load_json
    from diffsplitting_tpu.data import NumpyLoader
    from diffsplitting_tpu.parallel.mesh import (
        init_on_host, make_mesh, replicate, shard_batch,
    )
    from diffsplitting_tpu.train.checkpoints import save_checkpoint
    from diffsplitting_tpu.train.factory import define_generator
    from diffsplitting_tpu.utils.psnr import PSNR
    from split import get_datasets, unnormalize_for_psnr

    cfg_path = args.config if os.path.isabs(args.config) else os.path.join(REPO, args.config)
    opt = dict_to_nonedict(load_json(cfg_path))
    opt["phase"] = "train"

    train_set, val_set = get_datasets(opt)
    norm = train_set.get_normalization_dict()

    process, nets = define_generator(opt)
    # the notebook grabs the (single) denoise_fn; joint_indi would have two —
    # take net_ch1 for that case so the script runs on any splitting config
    net = nets.get("net") or nets["net_ch1"]
    out_ch = opt["model"]["unet"]["out_channel"]
    e = float(getattr(process, "e", 0.01))  # InDI noise scale (netG.e, cell 9)

    mesh = make_mesh()
    patch = opt["datasets"]["patch_size"]
    in_ch = opt["model"]["unet"]["in_channel"]
    rng = jax.random.PRNGKey(0)
    params = init_on_host(
        net.init, rng, jnp.zeros((1, patch, patch, in_ch)), jnp.ones((1,))
    )["params"]
    params = replicate(params, mesh)

    tx = optax.adam(args.lr)
    opt_state = replicate(jax.jit(tx.init)(params), mesh)

    t_mode = args.t_mode

    def make_t(b):
        if t_mode == "batch_index":
            # notebook cell 9: t = arange(B) / (1 + max) == arange(B)/B
            return jnp.arange(b, dtype=jnp.float32) / b
        return jnp.ones((b,), jnp.float32)

    def regress_input(x, noise):
        # x: (B,H,W,1) mixed input -> x_end at t=1 plus t=1 noise (e*1)
        return jnp.tile(x, (1, 1, 1, out_ch)) + noise * e

    def loss_fn(p, x, y, step_rng):
        noise = jax.random.normal(step_rng, x.shape[:3] + (out_ch,), x.dtype)
        xin = regress_input(x, noise)
        pred = net.apply({"params": p}, xin, make_t(x.shape[0]))
        return jnp.mean(jnp.abs(pred - y))  # cell 9: L1Loss

    @jax.jit
    def train_step(p, s, x, y, step_rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y, step_rng)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    @jax.jit
    def predict(p, x, step_rng):
        noise = jax.random.normal(step_rng, x.shape[:3] + (out_ch,), x.dtype)
        return net.apply({"params": p}, regress_input(x, noise), make_t(x.shape[0]))

    bs = args.batch or opt["datasets"]["train"]["batch_size"]
    train_loader = NumpyLoader(train_set, batch_size=bs, shuffle=True, drop_last=True)
    val_loader = NumpyLoader(val_set, batch_size=bs, shuffle=False, drop_last=False)

    def eval_psnr(p):
        """Channel-wise PSNR on uint16-unnormalized val patches (split.py:143-185)."""
        vals = {c: [] for c in range(out_ch)}
        for bi, batch in enumerate(val_loader):
            if bi >= args.eval_batches:
                break
            x = shard_batch(np.asarray(batch["input"]), mesh)
            pred = np.asarray(predict(p, x, jax.random.PRNGKey(1234 + bi)))
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

    os.makedirs(args.workdir, exist_ok=True)
    best = -1e9
    history = []
    step = 0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        losses = []
        for bi, batch in enumerate(train_loader):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            step += 1
            x = shard_batch(np.asarray(batch["input"]), mesh)
            y = shard_batch(np.asarray(batch["target"]), mesh)
            params, opt_state, loss = train_step(
                params, opt_state, x, y, jax.random.fold_in(rng, step)
            )
            losses.append(float(loss))
        psnrs = eval_psnr(params)
        avg = float(np.mean(list(psnrs.values()))) if psnrs else float("nan")
        history.append({"epoch": epoch, "l1": float(np.mean(losses)),
                        "val_psnr": psnrs, "avg_psnr": avg})
        print(f"epoch {epoch}: l1={np.mean(losses):.4f} "
              f"val_psnr={psnrs} ({time.perf_counter() - t0:.0f}s)", flush=True)
        if avg == avg and avg > best:  # nan-safe
            best = avg
            save_checkpoint(args.workdir, "best_unet_regressor",
                            params, opt_state, epoch, step)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "history.json")
    with open(out_path, "w") as f:
        json.dump({"t_mode": t_mode, "e": e, "lr": args.lr, "batch": bs,
                   "best_avg_psnr": best, "history": history}, f, indent=1)
    print("best avg channel PSNR:", best, "->", out_path, flush=True)
    return best, history


if __name__ == "__main__":
    main()

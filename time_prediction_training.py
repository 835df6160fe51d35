"""TimePredictor (mixing-fraction regressor) training CLI.

CLI parity with /root/reference/time_prediction_training.py: Adam + a
reduce-on-plateau LR schedule (patience from `train.lr_scheduler_patience`,
factor 0.5, floor 1e-6, :98-104), epoch loop with mean train loss, full val
pass per epoch, best-val checkpointing to `best_time_predictor` (:148-152).

TPU-native: jitted train/eval steps (value_and_grad over the TimePredictor),
batches on the data-parallel mesh, orbax best checkpoint.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsplitting_tpu.config.loader import load_json, dict_to_nonedict
from diffsplitting_tpu.data import NumpyLoader, TimePredictorDataset
from diffsplitting_tpu.data.split_dataset import DataLocation
from diffsplitting_tpu.models import TimePredictor
from diffsplitting_tpu.parallel import make_mesh, replicate, shard_batch
from diffsplitting_tpu.utils import get_workdir, mkdirs
from diffsplitting_tpu.utils.wandb_logger import WandbLogger


def get_datasets(opt):
    dsets = opt["datasets"]
    patch_size = dsets["patch_size"]
    max_qval = dsets["max_qval"]
    channel_weights = dsets.get("channel_weights")
    upper_clip = bool(dsets.get("upper_clip", False))
    gaussian_noise = dsets["train"].get("gaussian_noise_std_factor")
    # opt-in: train on raw normalized mixtures (the exact serving input of
    # the t-refinement workflow) instead of the reference's per-t min-max
    # rescale — fixes the measured train/serve mismatch (BENCH_NOTES round 3)
    raw_mixture = bool(dsets["train"].get("raw_mixture_inputs", False))

    train_loc = DataLocation(
        channelwise_fpath=(dsets["train"]["datapath"]["ch0"], dsets["train"]["datapath"]["ch1"])
    )
    val_loc = DataLocation(
        channelwise_fpath=(dsets["val"]["datapath"]["ch0"], dsets["val"]["datapath"]["ch1"])
    )
    train_set = TimePredictorDataset(
        "Hagen", train_loc, patch_size,
        max_qval=max_qval, upper_clip=upper_clip,
        channel_weights=channel_weights,
        uncorrelated_channels=bool(dsets["train"].get("uncorrelated_channels", False)),
        enable_transforms=True, random_patching=True,
        gaussian_noise_std_factor=gaussian_noise,
        raw_mixture_inputs=raw_mixture,
    )
    val_set = TimePredictorDataset(
        "Hagen", val_loc, patch_size,
        normalization_dict=train_set.get_normalization_dict(),
        max_qval=max_qval, upper_clip=upper_clip,
        channel_weights=channel_weights,
        enable_transforms=False, random_patching=False,
        raw_mixture_inputs=raw_mixture,
    )
    return train_set, val_set


class ReduceLROnPlateau:
    """Minimal reduce-on-plateau: halve lr after `patience` non-improving epochs."""

    def __init__(self, lr, patience, factor=0.5, min_lr=1e-6):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad = 0

    def step(self, metric) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr


def start_training(opt, max_epochs=None, steps_per_epoch=None):
    wandb_logger = (
        WandbLogger(opt, opt["path"]["experiment_root"], opt["experiment_name"])
        if opt.get("enable_wandb")
        else None
    )

    train_set, val_set = get_datasets(opt)
    model_opt = opt["model"]
    net = TimePredictor(
        in_channel=model_opt["unet"]["in_channel"],
        out_channel=model_opt["unet"]["out_channel"],
        norm_groups=model_opt["unet"]["norm_groups"] or 32,
        inner_channel=model_opt["unet"]["inner_channel"],
        channel_mults=tuple(model_opt["unet"]["channel_multiplier"]),
        attn_res=tuple(model_opt["unet"]["attn_res"] or ()),
        res_blocks=model_opt["unet"]["res_blocks"],
        dropout=model_opt["unet"]["dropout"] or 0.0,
        image_size=opt["datasets"]["patch_size"],
    )

    bs = opt["datasets"]["train"]["batch_size"]
    patch = opt["datasets"]["patch_size"]
    in_ch = model_opt["unet"]["in_channel"]
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    # init on host CPU: orthogonal-init QR is pathologically slow on the TPU
    # backend / tunnel (parallel/mesh.py init_on_host docstring)
    from diffsplitting_tpu.parallel.mesh import init_on_host

    params = init_on_host(net.init, rng, jnp.zeros((1, patch, patch, in_ch)))["params"]
    params = replicate(params, mesh)

    loss_type = model_opt["loss_type"]

    def loss_fn(params, x, y, drop_rng):
        pred = net.apply(
            {"params": params}, x, deterministic=False, rngs={"dropout": drop_rng}
        )
        if loss_type == "l1":
            return jnp.mean(jnp.abs(pred - y))
        return jnp.mean((pred - y) ** 2)

    base_lr = float(opt["train"]["optimizer"]["lr"])
    lr_state = ReduceLROnPlateau(base_lr, int(opt["train"].get("lr_scheduler_patience") or 15))
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=base_lr)
    # jit the init: eager per-leaf zeros_like dispatch is pathological
    # through the remote-TPU tunnel (CLAUDE.md gotchas)
    opt_state = replicate(jax.jit(tx.init)(params), mesh)

    @jax.jit
    def train_step(params, opt_state, x, y, drop_rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, drop_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, x, y):
        pred = net.apply({"params": params}, x)
        if loss_type == "l1":
            return jnp.mean(jnp.abs(pred - y))
        return jnp.mean((pred - y) ** 2)

    train_loader = NumpyLoader(train_set, batch_size=bs, shuffle=True, drop_last=True)
    val_loader = NumpyLoader(val_set, batch_size=bs, shuffle=False, drop_last=True)

    num_epochs = int(max_epochs or opt["train"]["num_epochs"])
    best_val_loss = 1e6
    step = 0
    for epoch in range(num_epochs):
        loss_arr = []
        for bi, (x, y) in enumerate(train_loader):
            if steps_per_epoch and bi >= steps_per_epoch:
                break
            step += 1
            bx = shard_batch(x, mesh)
            by = shard_batch(y, mesh)
            params, opt_state, loss = train_step(
                params, opt_state, bx, by, jax.random.fold_in(rng, step)
            )
            loss_arr.append(float(loss))
            if wandb_logger is not None:
                wandb_logger.log_metrics({"train_loss_step": float(loss)})

        # validation
        val_losses = []
        for bi, (x, y) in enumerate(val_loader):
            if steps_per_epoch and bi >= steps_per_epoch:
                break
            val_losses.append(
                float(eval_step(params, shard_batch(x, mesh), shard_batch(y, mesh)))
            )
        if val_losses:
            val_loss = float(np.mean(val_losses))
        else:
            # val loader produced no batches (val set smaller than the batch
            # size with drop_last): fall back to the train epoch loss so a
            # best checkpoint is still written. The reference would silently
            # never checkpoint in this case (best_val stays 1e6).
            logging.getLogger("base").warning(
                "validation loader is empty (val set < batch size); using "
                "train loss for best-model selection"
            )
            val_loss = float(np.mean(loss_arr))
        logging.getLogger("base").info(
            "Ep:%d loss %.5f val_loss %.5f lr %.2e",
            epoch, float(np.mean(loss_arr)), val_loss, lr_state.lr,
        )
        if wandb_logger is not None:
            wandb_logger.log_metrics({"val_loss": val_loss})

        # reduce-on-plateau on the train epoch loss (reference :133)
        new_lr = lr_state.step(float(np.mean(loss_arr)))
        opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)

        if val_loss < best_val_loss:
            best_val_loss = val_loss
            from diffsplitting_tpu.train.checkpoints import save_checkpoint

            save_checkpoint(
                opt["path"]["experiment_root"], "best_time_predictor",
                params, opt_state.inner_state, epoch, step,
            )
            print("Saved best model", os.path.join(opt["path"]["experiment_root"],
                                                   "best_time_predictor_gen"))
    return params, best_val_loss


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/splitting_hagen_time_predictor.json")
    parser.add_argument("--rootdir", type=str, default="./experiments")
    parser.add_argument("-enable_wandb", action="store_true")
    args = parser.parse_args()
    opt = load_json(args.config)
    opt["enable_wandb"] = args.enable_wandb
    experiment_root, expname = get_workdir(opt, args.rootdir, use_max_version=False)
    opt["path"]["experiment_root"] = experiment_root
    opt["experiment_name"] = expname
    for key, path in list(opt["path"].items()):
        if "resume" not in key and "experiments" not in key and key != "experiment_root":
            opt["path"][key] = os.path.join(experiment_root, path)
            mkdirs(opt["path"][key])
    logging.basicConfig(level=logging.INFO)
    start_training(dict_to_nonedict(opt))

"""W&B experiment logging, gracefully degraded when wandb isn't installed.

API parity with /root/reference/core/wandb_logger.py (init with
project/config/dir/name, log_metrics/log_image/log_images, checkpoint
artifacts, eval/infer tables). When the `wandb` package is absent (this image
doesn't ship it), the logger becomes a JSONL file logger under the experiment
dir so runs still record their metric streams.
"""

from __future__ import annotations

import json
import os
import time

try:
    import wandb as _wandb
except ImportError:  # pragma: no cover - env without wandb
    _wandb = None


class WandbLogger:
    def __init__(self, opt, logdir, name):
        self._logdir = logdir
        self._name = name
        self._wandb = _wandb
        self._opt = opt
        self.eval_table = None
        self.infer_table = None
        self._jsonl = None

        if self._wandb is not None:
            if self._wandb.run is None:
                self._wandb.init(
                    project=opt["wandb"]["project"], config=dict(opt), dir=logdir, name=name
                )
            self.config = self._wandb.config
            if self.config.get("log_eval", None):
                self.eval_table = self._wandb.Table(
                    columns=["fake_image", "sr_image", "hr_image", "psnr", "ssim"]
                )
            if self.config.get("log_infer", None):
                self.infer_table = self._wandb.Table(
                    columns=["fake_image", "sr_image", "hr_image"]
                )
        else:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
            self.config = dict(opt)

    def log_metrics(self, metrics, commit=True):
        if self._wandb is not None:
            self._wandb.log(metrics, commit=commit)
        else:
            rec = {"ts": time.time()}
            rec.update({k: float(v) for k, v in metrics.items() if _is_num(v)})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def log_image(self, key_name, image_array):
        if self._wandb is not None:
            self._wandb.log({key_name: self._wandb.Image(image_array)})

    def log_images(self, key_name, list_images):
        if self._wandb is not None:
            self._wandb.log({key_name: [self._wandb.Image(i) for i in list_images]})

    def log_checkpoint(self, current_epoch, current_step):
        if self._wandb is None:
            return
        model_artifact = self._wandb.Artifact(self._wandb.run.id + "_model", type="model")
        ckpt_dir = self.config.path["checkpoint"] if hasattr(self.config, "path") else None
        if ckpt_dir:
            gen_path = os.path.join(ckpt_dir, f"I{current_step}_E{current_epoch}_gen")
            if os.path.exists(gen_path):
                model_artifact.add_dir(gen_path)
                self._wandb.log_artifact(model_artifact, aliases=["latest"])

    def log_eval_data(self, fake_img, sr_img, hr_img, psnr=None, ssim=None):
        if self._wandb is None:
            return
        if psnr is not None and ssim is not None and self.eval_table is not None:
            self.eval_table.add_data(
                self._wandb.Image(fake_img), self._wandb.Image(sr_img),
                self._wandb.Image(hr_img), psnr, ssim,
            )
        elif self.infer_table is not None:
            self.infer_table.add_data(
                self._wandb.Image(fake_img), self._wandb.Image(sr_img),
                self._wandb.Image(hr_img),
            )

    def log_eval_table(self, commit=False):
        if self._wandb is None:
            return
        if self.eval_table:
            self._wandb.log({"eval_data": self.eval_table}, commit=commit)
        elif self.infer_table:
            self._wandb.log({"infer_data": self.infer_table}, commit=commit)


def _is_num(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False

"""Optimizer construction knobs beyond the reference's bare Adam.

The reference's only optimizer surface is ``torch.optim.Adam(params, lr)``
(/root/reference/model/model.py:39-40) with a fixed LR for the diffusion
models (its ReduceLROnPlateau exists only for the time predictor,
/root/reference/time_prediction_training.py). These opt-in knobs cover the
two production needs that came up in bounded single-chip runs:

``train.optimizer.schedule`` — LR schedule (all iteration-indexed)::

    {"type": "cosine",  "warmup": 500, "decay_iters": N, "end_factor": 0.1}
    {"type": "linear",  "warmup": 0,   "decay_iters": N, "end_factor": 0.0}
    {"type": "constant","warmup": 500}

  ``decay_iters`` defaults to ``train.n_iter``; ``end_factor`` is the final
  LR as a fraction of the peak. Unset → fixed LR (reference parity).

``train.optimizer.accum_steps`` — gradient accumulation: ``k`` micro-steps
  are averaged into one Adam update (``optax.MultiSteps``), so configs whose
  full batch does not fit HBM (e.g. 512² without remat) can keep the
  effective batch. Params are bit-frozen between the k-th steps; the EMA
  decays every micro-step (a no-op between updates since params are
  unchanged — documented semantics, not drift).
"""

from __future__ import annotations

import optax


def make_lr(lr: float, schedule_opt, n_iter: int | None):
    """Return a float (no schedule) or an optax schedule callable."""
    sch = schedule_opt or {}
    kind = sch.get("type")
    if not kind:
        return lr
    warmup = int(sch.get("warmup") or 0)
    decay_iters = int(sch.get("decay_iters") or n_iter or 0)
    end = float(sch.get("end_factor") or 0.0) * lr
    if kind == "constant":
        if not warmup:
            return lr
        return optax.linear_schedule(0.0, lr, warmup)
    decay_len = max(decay_iters - warmup, 1)
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else lr, peak_value=lr,
            warmup_steps=max(warmup, 1), decay_steps=warmup + decay_len,
            end_value=end)
    if kind == "linear":
        ramp = optax.linear_schedule(0.0 if warmup else lr, lr, max(warmup, 1))
        decay = optax.linear_schedule(lr, end, decay_len)
        return optax.join_schedules([ramp, decay], [warmup])
    raise ValueError(f"unknown lr schedule type: {kind!r}")


def maybe_accumulate(tx, optimizer_opt):
    """Wrap ``tx`` in optax.MultiSteps when ``accum_steps`` > 1."""
    k = int((optimizer_opt or {}).get("accum_steps") or 1)
    if k <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=k)

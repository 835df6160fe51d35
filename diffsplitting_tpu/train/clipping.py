"""Gradient clipping transforms (opt-in via ``train.optimizer.grad_clip``).

The reference trains with bare Adam (/root/reference/model/model.py:39-40)
and none of its shipped configs clip gradients — so clipping defaults OFF
for parity. The knob exists because bounded high-LR runs destabilize late
in training: the 64→512 SR3 overfit at lr 5e-5 ran clean to 15k iters then
spiked its (sum-reduced) loss ~8× at 16.4k/16.8k/18k, dropping sampled
PSNR by ~2 dB (results/quality_sr3_64_512_r4_ddim/metrics.json,
loss_trajectory) — exactly the Adam-moment-poisoning failure that
global-norm clipping prevents.

Config surface::

    train.optimizer.grad_clip: 1.0       # fixed global-norm ceiling
    train.optimizer.grad_clip: "auto"    # ceiling = factor × EMA of norms
    train.optimizer.grad_clip_factor: 2.5  # (auto only; default 2.5)

``"auto"`` needs no calibration against the loss scale — relevant here
because the SR3 loss is a SUM over every pixel (sr3.py parity with the
reference), so raw grad-norm scale varies by orders of magnitude across
configs/resolutions. The auto ceiling self-tunes to each run.

Resume note: clipping state lives inside the optax opt_state, so a
checkpoint saved WITH clipping must be resumed with the same ``grad_clip``
setting (and vice versa) — the opt-state tree structure differs and orbax
will refuse the restore otherwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class EmaClipState(NamedTuple):
    """Carried in the optax state (checkpointed/resumed with it)."""

    ema: jnp.ndarray  # f32 scalar: EMA of the post-clip gradient norm
    count: jnp.ndarray  # int32 scalar: update steps seen


def clip_by_ema_norm(factor: float = 2.5, decay: float = 0.98,
                     warmup: int = 25, eps: float = 1e-8):
    """Clip gradients to ``factor ×`` a bias-corrected EMA of their own norm.

    - For the first ``warmup`` steps nothing is clipped (early-training
      norms are legitimately large and the EMA is still calibrating).
    - The EMA tracks the POST-clip norm, so a spike cannot inflate its own
      ceiling; a genuine regime change still raises the ceiling over
      ~1/(1-decay) steps.
    - Scale-free: works unchanged for mean- and sum-reduced losses.

    ``warmup`` must be ≥ 1 (the first step has no EMA to clip against).
    """
    assert warmup >= 1, "clip_by_ema_norm needs >= 1 warmup step"

    def init_fn(params):
        del params
        return EmaClipState(jnp.zeros([], jnp.float32),
                            jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates).astype(jnp.float32)
        count = state.count + 1
        # state.ema holds (count-1) accumulations → bias-correct by
        # 1 - decay^(count-1); the max(…, eps) keeps step 1 NaN-free
        # (it is warmup-protected anyway).
        corr = jnp.maximum(1.0 - decay ** (count - 1).astype(jnp.float32), eps)
        limit = factor * state.ema / corr
        in_warmup = count <= warmup
        do_clip = jnp.logical_and(jnp.logical_not(in_warmup), norm > limit)
        scale = jnp.where(do_clip, limit / (norm + eps), 1.0)
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
        tracked = jnp.where(in_warmup, norm, jnp.minimum(norm, limit))
        ema = decay * state.ema + (1.0 - decay) * tracked
        return updates, EmaClipState(ema, count)

    return optax.GradientTransformation(init_fn, update_fn)


def maybe_clip(tx, optimizer_opt) -> optax.GradientTransformation:
    """Wrap ``tx`` with the configured clipping transform, if any.

    ``optimizer_opt`` is the ``train.optimizer`` config dict (may be a
    NoneDict). Returns ``tx`` unchanged when ``grad_clip`` is unset — the
    reference-parity default.
    """
    gc = (optimizer_opt or {}).get("grad_clip")
    if not gc:
        return tx
    if gc == "auto":
        factor = float((optimizer_opt or {}).get("grad_clip_factor") or 2.5)
        clip = clip_by_ema_norm(factor=factor)
    else:
        clip = optax.clip_by_global_norm(float(gc))
    return optax.chain(clip, tx)

"""Checkpoint save/restore via orbax.

Parity with the reference's checkpoint contract
(/root/reference/model/model.py:131-173): a generator payload
`I{iter}_E{epoch}_gen` and a trainer payload `I{iter}_E{epoch}_opt` holding
{epoch, iter, optimizer-state}; resume is by path PREFIX (`{prefix}_gen` /
`{prefix}_opt`). Torch .pth files become orbax checkpoint directories.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def _rename_blocks(tree, to_legacy: bool):
    """Map between the canonical block names (`ResnetBlockWithAttn_*`) and the
    legacy remat auto-names (`CheckpointResnetBlockWithAttn_*`) at every dict
    level (model trees are nested under role keys)."""
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # optax NamedTuples
        return type(tree)(*(_rename_blocks(v, to_legacy) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(_rename_blocks(v, to_legacy) for v in tree)
    if not isinstance(tree, dict):
        return tree
    src, dst = (
        ("ResnetBlockWithAttn_", "CheckpointResnetBlockWithAttn_")
        if to_legacy
        else ("CheckpointResnetBlockWithAttn_", "ResnetBlockWithAttn_")
    )

    def rename(k: str) -> str:
        return dst + k[len(src):] if isinstance(k, str) and k.startswith(src) else k

    return {rename(k): _rename_blocks(v, to_legacy) for k, v in tree.items()}


def _has_legacy_names(ckptr, path) -> bool:
    """Probe the on-disk checkpoint's key metadata for the legacy remat
    auto-names, so the renamed-template retry only fires for genuinely
    legacy checkpoints — any other restore failure (corrupt file, shape
    mismatch, I/O) surfaces with its original message."""
    try:
        tree = ckptr.metadata(path).item_metadata.tree
    except Exception:
        return False

    def walk(t) -> bool:
        if isinstance(t, dict):
            return any(
                (isinstance(k, str) and k.startswith("CheckpointResnetBlockWithAttn_"))
                or walk(v)
                for k, v in t.items()
            )
        return False

    return walk(tree)


def _checkpoint_has_key(ckptr, path, key: str) -> bool:
    """Whether the on-disk checkpoint's top level holds `key` (metadata probe,
    no restore). Missing/unreadable metadata → False."""
    try:
        tree = ckptr.metadata(path).item_metadata.tree
    except Exception:
        return False
    return isinstance(tree, dict) and key in tree


def save_checkpoint(ckpt_dir: str, prefix: str, params, opt_state, epoch: int,
                    step: int, ema_params=None):
    """Write `<ckpt_dir>/<prefix>_gen` (params) and `<prefix>_opt` (trainer
    state: epoch/iter/optimizer, plus EMA weights when tracked)."""
    ckptr = _checkpointer()
    gen_path = os.path.abspath(os.path.join(ckpt_dir, f"{prefix}_gen"))
    opt_path = os.path.abspath(os.path.join(ckpt_dir, f"{prefix}_opt"))
    ckptr.save(gen_path, params, force=True)
    payload = {
        "epoch": np.asarray(epoch, dtype=np.int64),
        "iter": np.asarray(step, dtype=np.int64),
        "optimizer": opt_state,
    }
    if ema_params is not None:
        payload["ema"] = ema_params
    ckptr.save(opt_path, payload, force=True)
    ckptr.wait_until_finished()
    return gen_path, opt_path


def load_checkpoint(
    prefix_path: str,
    params_template,
    opt_state_template: Optional[Any] = None,
    with_ema: bool = False,
) -> Tuple[Any, Optional[Any], int, int, Optional[Any]]:
    """Restore from a `{prefix}_gen` / `{prefix}_opt` pair.

    Returns (params, opt_state or None, epoch, step, ema or None). The
    templates supply the pytree structure/shardings (orbax restores into
    abstract targets). `with_ema` requests EMA weights when the checkpoint
    has them (falls back to None for pre-EMA checkpoints).
    """
    ckptr = _checkpointer()
    gen_path = os.path.abspath(f"{prefix_path}_gen")
    abstract_params = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_template)
    if _has_legacy_names(ckptr, gen_path):
        # pre-fix remat checkpoints named blocks "CheckpointResnetBlockWithAttn_*"
        # (nn.remat auto-prefix); restore through a renamed template and map
        # the keys back to the canonical schema
        renamed = _rename_blocks(abstract_params, to_legacy=True)
        params = _rename_blocks(ckptr.restore(gen_path, renamed), to_legacy=False)
    else:
        params = ckptr.restore(gen_path, abstract_params)

    opt_state, epoch, step, ema = None, 0, 0, None
    opt_path = os.path.abspath(f"{prefix_path}_opt")
    if opt_state_template is not None and os.path.exists(opt_path):
        abstract_opt = {
            "epoch": ocp.utils.to_shape_dtype_struct(np.asarray(0, dtype=np.int64)),
            "iter": ocp.utils.to_shape_dtype_struct(np.asarray(0, dtype=np.int64)),
            "optimizer": jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, opt_state_template
            ),
        }
        if with_ema:
            abstract_opt["ema"] = abstract_params
        legacy_opt = _has_legacy_names(ckptr, opt_path)

        def _restore_opt(abstract):
            if legacy_opt:
                # legacy remat block naming (see gen restore above)
                legacy = _rename_blocks(abstract, to_legacy=True)
                return _rename_blocks(
                    ckptr.restore(opt_path, legacy), to_legacy=False
                )
            return ckptr.restore(opt_path, abstract)

        if with_ema and not _checkpoint_has_key(ckptr, opt_path, "ema"):
            abstract_opt.pop("ema")  # pre-EMA checkpoint
        try:
            restored = _restore_opt(abstract_opt)
        except ValueError as err:
            if "structures do not match" not in str(err):
                raise
            # The on-disk optimizer state was written by a model with a
            # different optimizer-wrapper stack (e.g. trained with grad_clip's
            # clip-EMA chain, reloaded by a bare-Adam model, or vice versa).
            # Params/EMA/step are still valid; partial-restore those and hand
            # the caller opt_state=None (fresh optimizer) instead of crashing.
            import warnings

            warnings.warn(
                f"optimizer state in {opt_path} does not match this model's "
                "optimizer chain; restoring step/EMA only — optimizer state "
                f"will be re-initialized. Mismatch: {err}"
            )
            subset = {k: v for k, v in abstract_opt.items() if k != "optimizer"}
            if legacy_opt:
                subset = _rename_blocks(subset, to_legacy=True)
            ptc = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
            restored = ptc.restore(
                opt_path,
                args=ocp.args.PyTreeRestore(item=subset, partial_restore=True),
            )
            if legacy_opt:
                restored = _rename_blocks(restored, to_legacy=False)
            restored["optimizer"] = None
        opt_state = restored["optimizer"]
        epoch = int(restored["epoch"])
        step = int(restored["iter"])
        ema = restored.get("ema")
    return params, opt_state, epoch, step, ema

"""Inference-time parameter precasting.

The UNet stores params in float32 (flax default `param_dtype`) and computes in
bfloat16 (`dtype=jnp.bfloat16`): every `nn.Conv`/`nn.Dense` apply casts its
kernel/bias f32→bf16 via flax `promote_dtype`. Inside a 100–2000-step reverse
sampler (one `lax.scan`), those casts sit in the loop body; whether XLA's
while-loop invariant code motion hoists a ~370 MB convert out of the loop is
its call, not ours. `cast_unet_params_for_inference` performs exactly the same
casts ONCE, outside the scan, so the loop body reads bf16 weights directly —
bit-identical outputs (the weights went through the identical f32→bf16
rounding either way), strictly less HBM traffic per step.

GroupNorm affines (`gn_scale`/`gn_bias` in Block, `scale`/`bias` under
`GroupNorm_*` in SelfAttention) are NOT cast: normalization statistics and the
affine run in f32 (see `ops.groupnorm`), so casting them would change numerics.

Reference contrast: the torch reference keeps one f32 copy and computes in
f32 (/root/reference/model/sr3_modules/unet.py — no autocast/AMP anywhere);
precision policy is a TPU-side addition, not a parity surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: param collections that flax promotes to the module compute dtype
_CAST_LEAF_NAMES = ("kernel", "bias")
#: module scopes whose kernel/bias participate in bf16 compute
_CAST_SCOPE_PREFIXES = ("Conv", "Dense")


def _should_cast(path) -> bool:
    keys = [getattr(k, "key", None) for k in path]
    if not keys or keys[-1] not in _CAST_LEAF_NAMES:
        return False
    # the leaf's owning module scope is the second-to-last key
    for k in reversed(keys[:-1]):
        if k is None:
            continue
        return any(str(k).startswith(p) for p in _CAST_SCOPE_PREFIXES)
    return False


@functools.partial(jax.jit, static_argnums=(1,))
def _cast_tree(variables, dtype):
    def cast(path, leaf):
        if _should_cast(path) and leaf.dtype == jnp.float32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, variables)


def cast_unet_params_for_inference(variables, dtype=jnp.bfloat16):
    """Cast Conv/Dense kernels+biases to `dtype`; leave norm affines in f32.

    Works on either a full `{'params': ...}` variables dict or a bare params
    tree. Returns the same structure. Runs as ONE jitted program — eager
    per-leaf casts are ~1 s/dispatch through the remote-TPU tunnel
    (CLAUDE.md gotchas).
    """
    return _cast_tree(variables, dtype)

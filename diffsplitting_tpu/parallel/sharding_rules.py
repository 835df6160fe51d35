"""Tensor-parallel sharding rules for the UNet over a ('data', 'model') mesh.

The reference has no TP (SURVEY.md §2.5 marks it optional); this provides the
mesh-axis layering the 512² SR UNet needs when one chip's HBM/FLOPs aren't
enough. Strategy: shard every conv kernel's OUTPUT-channel dim (and each
Dense kernel's output dim, and matching biases/norm params) over 'model';
activations are left unconstrained so GSPMD propagates channel sharding
through the network and inserts the all-gathers/psums where layers mix
channels (1×1 convs, attention qkv, skip concats).

This is sharding-annotation-only — no manual collectives; jit compiles the
same program for 1 or N model shards.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path, leaf, model_size: int) -> P:
    # path entries are jax KeyEntry objects (DictKey renders as "['kernel']");
    # use .key for the bare name — str() broke the endswith match and left
    # kernels replicated (caught by test_tp_inserts_collectives_and_shards_memory)
    name = getattr(path[-1], "key", str(path[-1])) if path else ""
    shape = leaf.shape
    # conv kernels (kh, kw, in, out): shard out
    if name.endswith("kernel") and leaf.ndim == 4 and shape[-1] % model_size == 0:
        return P(None, None, None, "model")
    # dense kernels (in, out): shard out
    if name.endswith("kernel") and leaf.ndim == 2 and shape[-1] % model_size == 0:
        return P(None, "model")
    # per-output-channel vectors (bias, gn_scale, gn_bias, scale)
    if leaf.ndim == 1 and shape[0] % model_size == 0:
        return P("model")
    return P()


def shard_params_tp(params, mesh: Mesh):
    """device_put a param pytree with model-axis channel sharding."""
    assert "model" in mesh.axis_names, "mesh needs a 'model' axis"
    model_size = mesh.shape["model"]

    def put(path, leaf):
        spec = _spec_for(path, leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def tp_num_shards(mesh: Optional[Mesh]) -> int:
    if mesh is None or "model" not in mesh.axis_names:
        return 1
    return mesh.shape["model"]

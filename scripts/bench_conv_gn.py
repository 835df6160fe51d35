"""On-chip A/B: fused conv_gn Pallas kernel vs the XLA GN→swish→conv chain.

Per UNet level shape (b32 SR3 128² config), times K chained iterations of:
  * xla:   GN-stats(x) → normalize+swish → conv3×3   (today's Block path)
  * conv:  conv3×3 alone                              (lower bound)
  * fused: fold_gn_affine(carried stats) → conv_gn_fused (kernel, stats carried)
All inside a single jit (lax.scan) — eager dispatch through the tunnel is ~1s.

Usage: python scripts/bench_conv_gn.py [--iters 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dsp_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffsplitting_tpu.experimental.conv_gn import (  # noqa: E402
    channel_stats,
    conv_gn_fused,
    fold_gn_affine,
)
from diffsplitting_tpu.ops.groupnorm import group_norm_swish_reference  # noqa: E402

SHAPES = [  # (B, H, W, C) — SR3 128² UNet levels at batch 32
    (32, 128, 128, 64),
    (32, 64, 64, 128),
    (32, 32, 32, 256),
    (32, 16, 16, 512),
]
GROUPS = 32


def timed(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    K = args.iters

    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    for B, H, W, C in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray((rng.normal(size=(3, 3, C, C)) * 0.05).astype(np.float32),
                        jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)

        def xla_chain(x):
            def body(h, _):
                hn = group_norm_swish_reference(h, gamma, beta, GROUPS)
                y = jax.lax.conv_general_dilated(
                    hn.astype(jnp.bfloat16), w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(jnp.bfloat16)
                return y, ()
            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        def conv_only(x):
            def body(h, _):
                y = jax.lax.conv_general_dilated(
                    h, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(jnp.bfloat16)
                return y, ()
            h, _ = jax.lax.scan(body, x, None, length=K)
            return h

        def fused_chain(x):
            s0, q0 = channel_stats(x)

            def body(carry, _):
                h, s, q = carry
                sc, sh = fold_gn_affine(s, q, H * W, gamma, beta, GROUPS)
                y, s2, q2 = conv_gn_fused(h, w, bias, sc, sh)
                return (y, s2, q2), ()
            (h, _, _), _ = jax.lax.scan(body, (x, s0, q0), None, length=K)
            return h

        row = {}
        for name, fn in [("xla", xla_chain), ("conv", conv_only),
                         ("fused", fused_chain)]:
            jfn = jax.jit(fn)
            dt = timed(jfn, (x,), args.reps) / K
            flops = 2 * B * H * W * 9 * C * C
            row[name] = {
                "us_per_op": round(dt * 1e6, 1),
                "tflops": round(flops / dt / 1e12, 1),
            }
            print(f"{B}x{H}x{W}x{C} {name:6s}: {dt*1e6:8.1f} us/op, "
                  f"{flops/dt/1e12:6.1f} TF/s", flush=True)
        row["speedup_vs_xla"] = round(
            row["xla"]["us_per_op"] / row["fused"]["us_per_op"], 3)
        results[f"{B}x{H}x{W}x{C}"] = row

    print(json.dumps(results))


if __name__ == "__main__":
    main()

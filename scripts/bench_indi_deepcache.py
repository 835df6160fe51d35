"""Speed of cached vs exact joint-InDI inference at the iterative protocol's
step counts (EvaluateJointIndiIterative: N up to 50).

Timing-only (weights random — fidelity is covered by the interval=1
exactness tests and the SR3 study in results/quality_deepcache). Shapes
follow the Hagen config: 256d patches, 2x 64-channel UNets.

Usage: python scripts/bench_indi_deepcache.py [--n 50] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--depth", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from diffsplitting_tpu.diffusion import JointInDIProcess
    from diffsplitting_tpu.diffusion.deepcache import (
        cached_joint_indi_inference,
        make_cached_denoisers,
    )
    from diffsplitting_tpu.models import UNet
    from diffsplitting_tpu.parallel.mesh import init_on_host

    # splitting_hagen_indi_joint.json UNet shape
    net = UNet(in_channel=2, out_channel=2, inner_channel=64, norm_groups=8,
               channel_mults=(1, 2, 4, 8), attn_res=(16,), res_blocks=2,
               image_size=args.size, cond_type="time", dtype=jnp.bfloat16)
    proc = JointInDIProcess(image_size=args.size, channels=1,
                            conditional=False, num_timesteps=args.n)
    x_in = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, args.size, args.size, 1)),
        jnp.float32,
    )
    vs = [
        jax.device_put(
            init_on_host(net.init, jax.random.PRNGKey(i),
                         jnp.zeros((1, args.size, args.size, 2)),
                         jnp.ones((1,))),
            jax.devices()[0])  # init_on_host leaves the tree CPU-committed;
        for i in range(2)      # unplaced args re-feed through the tunnel
    ]

    def time_fn(jfn, *a, reps=3):
        out = jfn(*a)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(*a)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        return (time.perf_counter() - t0) / reps

    exact = jax.jit(
        lambda p1, p2, r, c: proc.inference(
            lambda xx, tt: net.apply(p1, xx, tt),
            lambda xx, tt: net.apply(p2, xx, tt),
            r, c, num_timesteps=args.n,
        )
    )
    t_exact = time_fn(exact, vs[0], vs[1], jax.random.PRNGKey(1), x_in)

    def cached(p1, p2, r, c):
        a1 = make_cached_denoisers(net, p1, args.depth)[:2]
        a2 = make_cached_denoisers(net, p2, args.depth)[:2]
        return cached_joint_indi_inference(proc, r, c, a1, a2,
                                           interval=args.interval,
                                           num_timesteps=args.n)

    t_cached = time_fn(jax.jit(cached), vs[0], vs[1], jax.random.PRNGKey(1), x_in)

    print(json.dumps({
        "n_steps": args.n, "batch": args.batch, "size": args.size,
        "interval": args.interval, "depth": args.depth,
        "exact_s": round(t_exact, 4), "cached_s": round(t_cached, 4),
        "speedup": round(t_exact / t_cached, 3),
    }))


if __name__ == "__main__":
    main()

"""b1 serving-chain profile (VERDICT r4 ask #5): what bounds the 26%-MFU
single-request chain, and is there a lever?

Three questions, answered on-chip:
  1. WHERE does b1 time go? Device trace of the compiled 100-step scan
     (b1 vs b32), top fusions via trace_summary — distinguishes
     small-batch MXU underfill (conv fusions dominate but run slow)
     from scan/elementwise overhead (non-conv ops dominate).
  2. Do chunk boundaries cost anything at 2000 steps? The b1 production
     chain is served as 100-step chunks (model.sampler_chunk); this times
     chunk ∈ {100, 500, 2000} — 2000 = the whole chain in ONE scan (the
     128² full-T program compiles fine; only 512² faults, CLAUDE.md).
  3. steps/s + effective MFU per leg, positioned against the b8/b32
     numbers (results/serving_lowbatch).

Matches serving the reference's per-request loop
(/root/reference/model/sr3_modules/diffusion.py:177-203) at request size 1.

Run detached on the chip:
  setsid python scripts/probe_b1_serving.py > /tmp/probe_b1.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/dsp_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

IMG = 128  # --smoke shrinks to 32 (CPU plumbing check; numbers meaningless)
INNER = 64
MULTS = (1, 2, 4, 8, 8)
ATTN = (16,)
RES_BLOCKS = 2
SCAN_T = 100          # leg-1 single-scan length
CHAIN_T = 2000        # leg-2 production chain length
CHUNKS = (100, 500, 2000)
BIG_B = 32            # leg-1 contrast batch


def build(T: int):
    """Headline SR3 UNet + schedule (same shape as bench.py's)."""
    from diffsplitting_tpu.diffusion import SR3Process, build_ddpm_schedule
    from diffsplitting_tpu.models import UNet
    from diffsplitting_tpu.parallel.mesh import init_on_host

    net = UNet(in_channel=6, out_channel=3, inner_channel=INNER,
               norm_groups=min(32, INNER), channel_mults=MULTS,
               attn_res=ATTN, res_blocks=RES_BLOCKS, dropout=0.0,
               image_size=IMG, cond_type="noise_level", dtype=jnp.bfloat16)
    process = SR3Process(image_size=IMG, channels=3, conditional=True)
    sched = build_ddpm_schedule({"schedule": "linear", "n_timestep": T,
                                 "linear_start": 1e-6, "linear_end": 1e-2})
    params = init_on_host(net.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, IMG, IMG, 6)),
                          jnp.full((1,), 0.5, jnp.float32))
    params = jax.device_put(params, jax.devices()[0])
    return net, process, sched, params


def flops_per_step(batch: int) -> float:
    from diffsplitting_tpu.utils.flops import unet_forward_flops

    return unet_forward_flops(image_size=IMG, in_channel=6, out_channel=3,
                              inner_channel=INNER, channel_mults=MULTS,
                              attn_res=ATTN, res_blocks=RES_BLOCKS, cond=True,
                              batch=batch)


def peak() -> float:
    from diffsplitting_tpu.utils.profiling import peak_flops_per_chip

    return peak_flops_per_chip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "results/serving_b1_probe"))
    ap.add_argument("--trace", action="store_true", default=True)
    ap.add_argument("--no_trace", dest="trace", action="store_false")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU: validates the plumbing only")
    args = ap.parse_args()
    global IMG, INNER, MULTS, ATTN, RES_BLOCKS, SCAN_T, CHAIN_T, CHUNKS, BIG_B
    if args.smoke:
        IMG, INNER, MULTS, ATTN, RES_BLOCKS = 32, 8, (1, 2), (), 1
        SCAN_T, CHAIN_T, CHUNKS, BIG_B = 10, 20, (10, 20), 4
    os.makedirs(args.out, exist_ok=True)
    res = {"device": str(jax.devices()[0]), "img": IMG, "legs": {}}

    from diffsplitting_tpu.models import apply_unet

    # ---- leg 1: 100-step single-scan at b1 / b32, plus traces
    net, process, sched, params = build(SCAN_T)

    def sample(params, cond, rng):
        dn = lambda xx, tt: apply_unet(net, params, xx, tt)  # noqa: E731
        return process.p_sample_loop(dn, sched, rng, cond, continuous=False)

    jfn = jax.jit(sample)
    for B in (1, BIG_B):
        cond = jnp.zeros((B, IMG, IMG, 3), jnp.float32)
        rng = jax.random.PRNGKey(1)
        jfn(params, cond, rng).block_until_ready()          # compile
        jfn(params, cond, jax.random.fold_in(rng, 9)).block_until_ready()
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = jfn(params, cond, jax.random.fold_in(rng, r))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        # caveat (measured round 5): through the tunnel the b32 leg once
        # returned from block_until_ready before execution (0.001 s/chain);
        # the device trace carries the real number — trust trace_b{B} when
        # the timed read is implausible (MFU >100%)
        mfu = 100 * flops_per_step(B) / (dt / SCAN_T) / peak()
        res["legs"][f"scan{SCAN_T}_b{B}"] = {
            "s_per_chain": round(dt, 4),
            "steps_per_s": round(SCAN_T / dt, 1), "mfu_pct": round(mfu, 2)}
        print(f"scan{SCAN_T} b{B}: {dt:.3f}s/chain, {SCAN_T/dt:.1f} steps/s, "
              f"MFU {mfu:.1f}%", flush=True)
        if args.trace:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from trace_summary import capture, summarize

            tdir = os.path.join(args.out, f"trace_b{B}")
            with capture(tdir):
                jfn(params, cond, jax.random.fold_in(rng, 77)).block_until_ready()
            try:
                rows = summarize(tdir, top=15)
                res["legs"][f"scan{SCAN_T}_b{B}"]["trace_planes"] = {
                    k: v for k, v in rows.items()}
                for pl, d in rows.items():
                    print(f"  [{pl}] total {d['total_ms']}ms "
                          f"top: {d['ops'][:5]}", flush=True)
            except Exception as e:
                res["legs"][f"scan{SCAN_T}_b{B}"]["trace_error"] = repr(e)
                print("  trace parse failed:", e, flush=True)

    # ---- leg 2: 2000-step b1 chain, chunk size sweep (incl. one-scan 2000)
    net2, process2, sched2, params2 = build(CHAIN_T)
    dn_apply = lambda p, xx, tt: apply_unet(net2, p, xx, tt)  # noqa: E731
    cond = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    from diffsplitting_tpu.diffusion.common import ChunkRunner

    for K in CHUNKS:
        runner = ChunkRunner()

        def chain(r):
            return process2.p_sample_loop_chunked(
                dn_apply, params2, sched2, jax.random.PRNGKey(r), cond,
                chunk_size=K, runner=runner)

        jax.block_until_ready(chain(0))   # compile
        jax.block_until_ready(chain(1))   # deferred transfers
        t0 = time.perf_counter()
        reps = 2
        for r in range(reps):
            out = chain(2 + r)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        mfu = 100 * flops_per_step(1) / (dt / CHAIN_T) / peak()
        res["legs"][f"chain{CHAIN_T}_b1_chunk{K}"] = {
            "s_per_chain": round(dt, 3),
            "steps_per_s": round(CHAIN_T / dt, 1), "mfu_pct": round(mfu, 2)}
        print(f"chain{CHAIN_T} b1 chunk{K}: {dt:.2f}s/chain, "
              f"{CHAIN_T/dt:.1f} steps/s, MFU {mfu:.1f}%", flush=True)

    with open(os.path.join(args.out, "probe.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "trace_planes"}
                      for k, v in res["legs"].items()}), flush=True)


if __name__ == "__main__":
    main()

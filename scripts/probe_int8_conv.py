"""Probe: does XLA lower int8 convs to the v5e MXU at the 2x int8 rate?

v5e peak is 197 TFLOP/s bf16 vs 394 TOP/s int8. If `lax.conv_general_dilated`
with int8 operands (int32 accumulate) actually runs at ~2x the bf16 conv rate
at the SR3 UNet's dominant shapes, a W8A8 quantized serving path is worth
building (Q-Diffusion-style). If int8 convs lower to a slow path, the idea
dies here for the cost of one probe.

Measures, per shape: bf16 conv, int8 conv (preferred_element_type=int32),
plus a large bf16-vs-int8 matmul as a known-good ceiling check. Each timing
is a jitted lax.scan of N chained iterations (one cheap elementwise requant
in the carry, same for both dtypes) so the tunnel's dispatch overhead is
amortized.

Usage (TPU, after the chip is free):
  python scripts/probe_int8_conv.py --out results/probe_int8.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (batch, H, W, Cin, Cout) — the four resolution levels of the 128^2 SR3 UNet
# (inner_channel 64, mults 1/2/4/8; 3x3 SAME convs carry ~all the FLOPs).
SHAPES = [
    (32, 128, 128, 64, 64),
    (32, 64, 64, 128, 128),
    (32, 32, 32, 256, 256),
    (32, 16, 16, 512, 512),
]
MATMUL_N = 8192


def timed(fn, *args):
    """Time fn via a host fetch of its (scalar) output.

    block_until_ready is a no-op through the axon tunnel (measured:
    50-iter conv scans "finish" in 0.1ms => 30 PFLOP/s); np.asarray forces
    the device->host round trip that actually waits for execution, matching
    the repo's working benches (scripts/bench_512_serving.py).
    """
    np.asarray(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt2 = time.perf_counter() - t0
    return min(dt1, dt2)


def conv_loop(n_iters, dtype_tag):
    import jax
    import jax.numpy as jnp
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def run(x, w):
        def body(x, _):
            if dtype_tag == "int8":
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                x2 = jnp.clip(y >> 6, -127, 127).astype(jnp.int8)
            else:
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.bfloat16)
                x2 = jnp.clip(y * jnp.bfloat16(0.01), -3, 3).astype(jnp.bfloat16)
            return x2, ()

        out, _ = lax.scan(body, x, None, length=n_iters)
        # Reduce to one scalar in-graph so the timing fetch moves 4 bytes.
        return jnp.sum(out.astype(jnp.float32))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + 2 iters (CPU correctness smoke)")
    ap.add_argument("--out", default=os.path.join(REPO, "results/probe_int8.json"))
    args = ap.parse_args()

    global SHAPES, MATMUL_N
    if args.smoke:
        SHAPES = [(2, 16, 16, 8, 8)]
        MATMUL_N = 256
        args.iters = 2

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dsp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    rows = []

    # Dispatch+fetch floor: a trivial jitted scalar, timed the same way.
    # All conv/matmul timings below get this subtracted before the FLOP/s
    # conversion (the tunnel's HTTP round trip would otherwise dominate).
    zero = jax.device_put(np.float32(0.0))
    floor = timed(jax.jit(lambda z: z + 1.0), zero)
    print(f"dispatch+fetch floor: {floor:.4f}s", flush=True)

    for (b, h, w_, cin, cout) in SHAPES:
        flops_per_iter = 2.0 * b * h * w_ * cout * 9 * cin
        x8 = jax.device_put(
            rng.integers(-127, 127, (b, h, w_, cin), dtype=np.int8))
        k8 = jax.device_put(
            rng.integers(-127, 127, (3, 3, cin, cout), dtype=np.int8))
        xb = jax.device_put(
            rng.standard_normal((b, h, w_, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        kb = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32)
        ).astype(jnp.bfloat16)

        row = {"shape": [b, h, w_, cin, cout]}
        for tag, xx, kk in (("bf16", xb, kb), ("int8", x8, k8)):
            run = conv_loop(args.iters, tag)
            try:
                dt = max(timed(run, xx, kk) - floor, 1e-6)
                tflops = flops_per_iter * args.iters / dt / 1e12
                row[tag] = {"sec": round(dt, 4), "tflops": round(tflops, 1)}
                print(f"{row['shape']} {tag}: {dt:.4f}s  {tflops:.1f} T/s",
                      flush=True)
            except Exception as e:  # int8 conv may simply not lower on this backend
                row[tag] = {"error": repr(e)[:200]}
                print(f"{row['shape']} {tag}: FAILED {e!r}", flush=True)
        if "sec" in row.get("bf16", {}) and "sec" in row.get("int8", {}):
            row["int8_speedup"] = round(
                row["bf16"]["sec"] / max(row["int8"]["sec"], 1e-9), 2)
        rows.append(row)

    # known-good ceiling check: plain big matmul
    n = MATMUL_N
    a8 = jax.device_put(rng.integers(-127, 127, (n, n), dtype=np.int8))
    b8_ = jax.device_put(rng.integers(-127, 127, (n, n), dtype=np.int8))
    ab = jax.device_put(rng.standard_normal((n, n)).astype(np.float32)).astype(jnp.bfloat16)
    bb = jax.device_put(rng.standard_normal((n, n)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
                       .astype(jnp.float32))

    @jax.jit
    def mm_int8(a, b):
        return jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.int32)
                       .astype(jnp.float32))

    mm_row = {"shape": ["matmul", n]}
    for tag, fn, aa, cc in (("bf16", mm_bf16, ab, bb), ("int8", mm_int8, a8, b8_)):
        try:
            dt = max(timed(fn, aa, cc) - floor, 1e-6)
            tflops = 2.0 * n ** 3 / dt / 1e12
            mm_row[tag] = {"sec": round(dt, 4), "tflops": round(tflops, 1)}
            print(f"matmul {n} {tag}: {dt:.4f}s  {tflops:.1f} T/s", flush=True)
        except Exception as e:
            mm_row[tag] = {"error": repr(e)[:200]}
            print(f"matmul {n} {tag}: FAILED {e!r}", flush=True)
    if "sec" in mm_row.get("bf16", {}) and "sec" in mm_row.get("int8", {}):
        mm_row["int8_speedup"] = round(
            mm_row["bf16"]["sec"] / max(mm_row["int8"]["sec"], 1e-9), 2)
    rows.append(mm_row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"device": str(dev), "iters": args.iters,
                   "dispatch_floor_sec": round(floor, 4), "rows": rows}, f,
                  indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()

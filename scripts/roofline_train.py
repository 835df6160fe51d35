"""Analytic roofline for a config's UNet train step: per-level FLOPs vs HBM
bytes → time lower bounds on v5e (197 TF/s bf16, ~819 GB/s HBM).

Documents WHY a config's measured train MFU sits where it does (VERDICT
round-3 item 1: "≥40% train MFU or document the specific ceiling").
Result for 64→512: every level sits ABOVE the ~240 FLOP/byte ridge point,
i.e. the conv math is MXU-bound on paper — the measured 14.9% is therefore
NOT a bandwidth ceiling but half-lane 64/128-channel contractions (one MXU
tile is 128 lanes) plus remat recompute and wide-spatial scheduling
(analysis in BENCH_NOTES round 4).

Usage: python scripts/roofline_train.py --config configs/sr_sr3_64_512.json --batch 4
(backend-independent: pure arithmetic, runs anywhere)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_BW = 819e9       # v5e HBM GB/s


def conv_cost(B, H, W, cin, cout, k, dtype_bytes=2):
    flops = 2 * B * H * W * cin * cout * k * k
    byts = dtype_bytes * B * H * W * (cin + cout) + 4 * k * k * cin * cout
    return flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/sr_sr3_64_512.json")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train_mult", type=float, default=3.0,
                    help="train FLOPs/bytes multiple of forward (bwd≈2×fwd)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from diffsplitting_tpu.config.loader import load_json

    d = load_json(os.path.join(REPO, args.config))
    u = d["model"]["unet"]
    size = d["model"]["diffusion"]["image_size"]
    inner, mults, rb = u["inner_channel"], u["channel_multiplier"], u["res_blocks"]
    in_ch, out_ch = u["in_channel"], u["out_channel"]
    B = args.batch

    rows = []
    total_f = total_b = 0.0

    def add(level, flops, byts):
        nonlocal total_f, total_b
        total_f += flops
        total_b += byts
        rows.append((level, flops, byts))

    # encoder + decoder per level (approximate: rb blocks with 2 convs each
    # encoder-side, rb+1 decoder-side at concat width; up/down 1 conv)
    res = size
    prev_c = inner
    f, b = conv_cost(B, size, size, in_ch, inner, 3)
    add("stem", f, b)
    for i, m in enumerate(mults):
        c = inner * m
        lf = lb = 0.0
        for _ in range(rb):  # encoder blocks
            f1, b1 = conv_cost(B, res, res, prev_c, c, 3)
            f2, b2 = conv_cost(B, res, res, c, c, 3)
            lf += f1 + f2
            lb += b1 + b2
            if prev_c != c:
                fs, bs = conv_cost(B, res, res, prev_c, c, 1)
                lf += fs
                lb += bs
            prev_c = c
        for _ in range(rb + 1):  # decoder blocks (concat input ~2c)
            f1, b1 = conv_cost(B, res, res, 2 * c, c, 3)
            f2, b2 = conv_cost(B, res, res, c, c, 3)
            fs, bs = conv_cost(B, res, res, 2 * c, c, 1)
            lf += f1 + f2 + fs
            lb += b1 + b2 + bs
        if i < len(mults) - 1:  # down+up convs
            fd, bd = conv_cost(B, res // 2, res // 2, c, c, 3)
            fu, bu = conv_cost(B, res, res, c, c, 3)
            lf += fd + fu
            lb += bd + bu
        add(f"level{i} ({res}px, {c}ch)", lf, lb)
        if i < len(mults) - 1:
            res //= 2
    c_mid = inner * mults[-1]
    for _ in range(2):
        f1, b1 = conv_cost(B, res, res, c_mid, c_mid, 3)
        f2, b2 = conv_cost(B, res, res, c_mid, c_mid, 3)
        add(f"mid ({res}px)", f1 + f2, b1 + b2)
    f, b = conv_cost(B, size, size, inner, out_ch, 3)
    add("head", f, b)

    ridge = PEAK_FLOPS / PEAK_BW
    print(f"{args.config} b{B}: ridge point {ridge:.0f} FLOP/byte")
    print(f"{'level':28s} {'GFLOP':>9s} {'GB':>7s} {'F/B':>7s} {'bound':>6s} "
          f"{'t_flops_ms':>10s} {'t_bw_ms':>8s}")
    t_bound = 0.0
    out_rows = []
    for name, fl, by in rows:
        ai = fl / by
        tf, tb = fl / PEAK_FLOPS * 1e3, by / PEAK_BW * 1e3
        t_bound += max(tf, tb)
        bound = "BW" if tb > tf else "MXU"
        print(f"{name:28s} {fl / 1e9:9.1f} {by / 1e9:7.3f} {ai:7.1f} {bound:>6s} "
              f"{tf:10.3f} {tb:8.3f}")
        out_rows.append({"level": name, "gflop": round(fl / 1e9, 1),
                         "gb": round(by / 1e9, 3), "ai": round(ai, 1),
                         "bound": bound})
    fwd_ms = t_bound
    train_ms = fwd_ms * args.train_mult
    mfu_ceiling = (total_f * args.train_mult) / (train_ms / 1e3) / PEAK_FLOPS
    print(f"\nforward lower bound {fwd_ms:.1f} ms; train (×{args.train_mult}) "
          f"≈ {train_ms:.1f} ms → roofline MFU ceiling {mfu_ceiling:.1%}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": args.config, "batch": B, "rows": out_rows,
                       "fwd_lower_bound_ms": round(fwd_ms, 2),
                       "train_lower_bound_ms": round(train_ms, 2),
                       "roofline_mfu_ceiling": round(mfu_ceiling, 4)}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

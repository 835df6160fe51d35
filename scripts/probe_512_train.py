"""512² train-step attack (VERDICT r4 ask #4): the sr_sr3_64_512 config —
the reference's only multi-GPU training config
(/root/reference/config/sr_sr3_64_512.json:4-6) — measures 14.9% MFU on
v5e while the roofline (scripts/roofline_train.py) says the convs are
MXU-bound on paper. Hypotheses from results/roofline_64_512.json:
half-lane 64-channel contractions at levels 0-1, remat recompute, and
wide-spatial scheduling.

This driver runs bench_train.py as subprocesses over the matrix:
  1. baseline        config as shipped (remat on)            [+ device trace]
  2. remat_min_res   128 / 256 (skip remat for wide levels)
  3. no_remat        remat fully off (HBM-fit probe at b4)
  4. pad_level0      inner_channel 128, mults [1,1,2,4,8] — levels 0-1 get
     full 128-lane contractions at ~1.3× the FLOPs; if the half-lane
     hypothesis holds, MFU jumps far more than step time (the lanes were
     half-idle anyway)

Each leg is a separate process (one jit per process; compiles ride the
persistent cache). Run detached on the chip:
  setsid python scripts/probe_512_train.py > /tmp/probe_512.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results/probe_512_train")
CFG = os.path.join(REPO, "configs/sr_sr3_64_512.json")


def padded_config() -> str:
    """sr_sr3_64_512 with level 0 padded to 128 lanes (iso-deep-channels)."""
    sys.path.insert(0, REPO)
    from diffsplitting_tpu.config.loader import load_json

    opt = load_json(CFG)
    u = opt["model"]["unet"]
    assert u["inner_channel"] == 64 and u["channel_multiplier"][:2] == [1, 2]
    u["inner_channel"] = 128
    u["channel_multiplier"] = [1, 1, 2, 4, 8]  # 128,128,256,512,1024 vs
    # baseline 64,128,256,512,1024 — only level 0 widens (64→128 lanes)
    path = "/tmp/sr_sr3_64_512_pad128.json"
    with open(path, "w") as f:
        json.dump(opt, f, indent=1)
    return path


def run(tag, extra, timeout=2400):
    out = os.path.join(OUT, f"{tag}.jsonl")
    cmd = [sys.executable, "scripts/bench_train.py", "--config", CFG,
           "--batch", "4", "--reps", "10", "--out", out, *extra]
    print(">>>", tag, " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    tail = (r.stdout + r.stderr)[-1500:]
    print(tail, flush=True)
    ok = r.returncode == 0
    if not ok:
        with open(os.path.join(OUT, f"{tag}.FAILED.log"), "w") as f:
            f.write(r.stdout + "\n==STDERR==\n" + r.stderr)
    return ok


def main():
    os.makedirs(OUT, exist_ok=True)
    legs = [
        ("baseline_trace", ["--trace", os.path.join(OUT, "trace_baseline")]),
        ("remat_min_128", ["--remat_min_res", "128"]),
        ("remat_min_256", ["--remat_min_res", "256"]),
        ("no_remat", ["--no_remat"]),
    ]
    status = {}
    for tag, extra in legs:
        status[tag] = run(tag, extra)
    pad = padded_config()
    cmd_pad = [sys.executable, "scripts/bench_train.py", "--config", pad,
               "--batch", "4", "--reps", "10",
               "--out", os.path.join(OUT, "pad_level0.jsonl")]
    print(">>> pad_level0", " ".join(cmd_pad), flush=True)
    r = subprocess.run(cmd_pad, cwd=REPO, capture_output=True, text=True,
                       timeout=2400)
    print((r.stdout + r.stderr)[-1500:], flush=True)
    status["pad_level0"] = r.returncode == 0
    with open(os.path.join(OUT, "status.json"), "w") as f:
        json.dump(status, f, indent=1)
    print("PROBE_512_DONE", json.dumps(status), flush=True)


if __name__ == "__main__":
    main()

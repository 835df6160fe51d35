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


def run(tag, extra, timeout=2400, config=CFG):
    """One bench leg. Resumable: a leg that already produced its .jsonl is
    skipped, and a leg that failed twice (tunnel outage windows count) is
    abandoned — so the driver can ride flaky_tunnel_supervisor relaunches."""
    out = os.path.join(OUT, f"{tag}.jsonl")
    if os.path.exists(out):
        print(f">>> {tag}: done earlier, skipping", flush=True)
        return True
    strikes = os.path.join(OUT, f"{tag}.FAILED2.log")
    if os.path.exists(strikes):
        print(f">>> {tag}: failed twice, abandoning", flush=True)
        return False
    cmd = [sys.executable, "scripts/bench_train.py", "--config", config,
           "--batch", "4", "--reps", "10", "--out", out, *extra]
    print(">>>", tag, " ".join(cmd), flush=True)
    try:
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout)
        tail, ok = (r.stdout + r.stderr)[-1500:], r.returncode == 0
    except subprocess.TimeoutExpired as e:
        tail, ok = f"TIMEOUT after {timeout}s (tunnel outage?)", False
        r = None
    print(tail, flush=True)
    if not ok:
        first = os.path.join(OUT, f"{tag}.FAILED.log")
        path = strikes if os.path.exists(first) else first
        with open(path, "w") as f:
            f.write(tail if r is None
                    else r.stdout + "\n==STDERR==\n" + r.stderr)
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
    status["pad_level0"] = run("pad_level0", [], config=padded_config())
    # status.json is the supervisor's done-file: only write it when every
    # leg is RESOLVED (data on disk, or abandoned after two strikes) so an
    # outage-interrupted sweep gets relaunched instead of declared done
    resolved = all(
        os.path.exists(os.path.join(OUT, f"{t}.jsonl"))
        or os.path.exists(os.path.join(OUT, f"{t}.FAILED2.log"))
        for t in status
    )
    if resolved:
        with open(os.path.join(OUT, "status.json"), "w") as f:
            json.dump(status, f, indent=1)
    print("PROBE_512_DONE" if resolved else "PROBE_512_INCOMPLETE",
          json.dumps(status), flush=True)


if __name__ == "__main__":
    main()

"""Supervise a long-running TPU job across axon-tunnel outages.

The tunnel drops RPCs during outages; a JAX client whose RPC dropped hangs
FOREVER with zero CPU (CLAUDE.md gotcha — seen on cold start and twice
mid-session round 5: ~45-min outages at 06:30 and 07:41). Any multi-hour
run through the tunnel therefore needs external supervision: detect the
hang, kill the client, wait for the tunnel to answer a fresh probe, and
relaunch from the newest checkpoint.

This is the generic supervisor (the aux "failure detection/recovery" leg
of SURVEY §5 for this environment):

  python scripts/flaky_tunnel_supervisor.py \
      --log /path/run.log --done-file /path/out/metrics.json \
      --match quality_sr3_overfit.py \
      --ckpt-glob '/path/ckpt/I*_E0_gen' \
      --launch 'python scripts/quality_sr3_overfit.py ... {resume}' \
      --resume-flag '--resume_from {iter}'

Policy details:
  * staleness threshold is phase-aware: --sampling-marker lines (default
    "sampling (full val reverse schedule)") switch to the longer
    --sampling-thresh (big one-off compiles legitimately go quiet for
    15-20 min through the tunnel);
  * a stale log with a HEALTHY tunnel gets one extra window before the
    kill (long compile vs dropped RPC is indistinguishable from outside);
  * {resume} in --launch expands to the --resume-flag template with the
    newest complete checkpoint iter, or to "" when none/finished;
  * never kills by pattern alone — only PIDs whose cmdline contains
    --match AND are python processes, after the staleness+probe policy.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shlex
import signal
import subprocess
import sys
import time


def slog(msg: str):
    print(f"{time.strftime('%H:%M:%S')} {msg}", flush=True)


def probe(timeout: int = 120) -> bool:
    """Can a FRESH client run one tiny device op end-to-end?"""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((64,64))@jnp.ones((64,64)))[0,0]))"],
            timeout=timeout, capture_output=True, text=True)
        return "64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def job_pids(match: str):
    out = subprocess.run(["ps", "-eo", "pid,cmd"], capture_output=True,
                         text=True).stdout
    pids = []
    for line in out.splitlines():
        if match in line and "python" in line and "supervisor" not in line:
            pids.append(int(line.split()[0]))
    return pids


def latest_ckpt_iter(ckpt_glob: str) -> int:
    best = 0
    for d in glob.glob(ckpt_glob):
        m = re.search(r"I(\d+)_E\d+_gen$", os.path.basename(d))
        if m and os.path.isdir(d.replace("_gen", "_opt")):
            best = max(best, int(m.group(1)))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="job log file (mtime = liveness)")
    ap.add_argument("--done-file", required=True,
                    help="supervisor exits once this exists")
    ap.add_argument("--match", required=True,
                    help="cmdline substring identifying the job's python proc")
    ap.add_argument("--launch", required=True,
                    help="relaunch command; '{resume}' expands per --resume-flag")
    ap.add_argument("--ckpt-glob", default=None)
    ap.add_argument("--resume-flag", default="--resume_from {iter}")
    ap.add_argument("--max-iter", type=int, default=None,
                    help="resume flag omitted when newest ckpt >= this")
    ap.add_argument("--thresh", type=int, default=720,
                    help="train-phase staleness seconds before intervention")
    ap.add_argument("--sampling-thresh", type=int, default=1500)
    ap.add_argument("--sampling-marker",
                    default="sampling (full val reverse schedule)")
    ap.add_argument("--poll", type=int, default=60)
    args = ap.parse_args()

    def launch():
        resume = ""
        if args.ckpt_glob:
            it = latest_ckpt_iter(args.ckpt_glob)
            if it and (args.max_iter is None or it < args.max_iter):
                resume = args.resume_flag.format(iter=it)
        cmd = args.launch.format(resume=resume)
        logf = open(args.log, "a")
        p = subprocess.Popen(shlex.split(cmd), stdout=logf, stderr=logf,
                             start_new_session=True)
        slog(f"launched pid {p.pid}: {cmd}")

    slog("supervisor start")
    while True:
        if os.path.exists(args.done_file):
            slog(f"done-file present ({args.done_file}); exiting")
            return 0
        pids = job_pids(args.match)
        if not pids:
            slog("job not running; waiting for tunnel")
            while not probe():
                slog("tunnel down")
                time.sleep(args.poll)
            if args.ckpt_glob:  # clear torn orbax tmp dirs from the kill
                root = os.path.dirname(args.ckpt_glob)
                for tmp in glob.glob(os.path.join(root, "*.orbax-checkpoint-tmp")):
                    subprocess.run(["rm", "-rf", tmp])
            launch()
            time.sleep(2 * args.poll)
            continue
        if not os.path.exists(args.log):
            time.sleep(args.poll)
            continue
        stale = time.time() - os.path.getmtime(args.log)
        with open(args.log, "rb") as f:
            f.seek(max(0, os.path.getsize(args.log) - 4000))
            tail = f.read().decode(errors="replace")
        thresh = (args.sampling_thresh
                  if args.sampling_marker and args.sampling_marker in tail
                  else args.thresh)
        if stale < thresh:
            time.sleep(args.poll)
            continue
        slog(f"log stale {stale:.0f}s (thresh {thresh}); probing tunnel")
        if probe() and probe():
            slog("tunnel healthy; granting one extra window (long compile?)")
            time.sleep(thresh / 2)
            if time.time() - os.path.getmtime(args.log) < thresh:
                continue
            slog("still stale with healthy tunnel — dropped RPC; killing")
        else:
            slog("tunnel down + stale log — killing")
        for pid in job_pids(args.match):
            slog(f"SIGKILL {pid}")
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        time.sleep(10)


if __name__ == "__main__":
    sys.exit(main())

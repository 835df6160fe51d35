"""Shared helpers for the on-chip bench/soak scripts."""

from __future__ import annotations

import subprocess
import threading
import time


def rss_watch_run(cmd, env=None, cwd=None, on_line=None):
    """Run cmd, polling the child's peak RSS (VmHWM) once a second while a
    reader thread DRAINS stdout (a full 64KB pipe otherwise deadlocks the
    child against the parent's poll loop — e.g. a long JAX traceback through
    stderr=STDOUT). Returns (wall_s, peak_rss_mb, rc, tail_str).

    on_line: optional callback fired per output line (streaming parsers).
    """
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, env=env, cwd=cwd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    tail = []

    def drain():
        for line in proc.stdout:
            tail.append(line)
            del tail[:-80]
            if on_line is not None:
                on_line(line)

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    peak = 0
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        peak = max(peak, int(line.split()[1]))  # kB
        except OSError:
            pass
        time.sleep(1.0)
    th.join(timeout=10)
    return (time.perf_counter() - t0, peak / 1024.0, proc.returncode,
            "".join(tail)[-4000:])

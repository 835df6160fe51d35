"""Profiling & observability: jax.profiler traces, step-time and MFU meters.

The reference has no tracing/profiling at all — only tqdm bars around hot
loops (SURVEY.md §5). Here:

  * `trace(logdir)` — context manager around `jax.profiler.trace` producing
    TensorBoard-viewable device traces.
  * `StepTimer` — EMA step-time + steps/sec, with optional per-step FLOPs for
    an MFU readout (peak FLOPs per chip auto-detected from the TPU
    generation env).
  * `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper for labeling
    host-side phases inside a trace.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax

PEAK_BY_GEN = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}


def peak_flops_per_chip() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    for k, v in PEAK_BY_GEN.items():
        if k in gen:
            return v
    if jax.default_backend() in ("tpu", "axon"):
        return PEAK_BY_GEN["v5e"]
    return 1e12  # CPU: arbitrary


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks step wall time (EMA) and derives steps/sec and MFU."""

    def __init__(self, flops_per_step: Optional[float] = None, ema: float = 0.9):
        self.flops_per_step = flops_per_step
        self.ema = ema
        self._avg = None
        self._last = None
        self.n_devices = jax.device_count()
        self.peak = peak_flops_per_chip()

    def start(self):
        self._last = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._last
        self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def avg_step_time(self) -> Optional[float]:
        return self._avg

    @property
    def steps_per_sec(self) -> Optional[float]:
        return None if not self._avg else 1.0 / self._avg

    @property
    def mfu(self) -> Optional[float]:
        if not self._avg or not self.flops_per_step:
            return None
        return self.flops_per_step / self._avg / (self.peak * self.n_devices)

    def metrics(self) -> dict:
        out = {}
        if self._avg:
            out["step_time_s"] = self._avg
            out["steps_per_sec"] = self.steps_per_sec
            if self.mfu is not None:
                out["mfu"] = self.mfu
        return out

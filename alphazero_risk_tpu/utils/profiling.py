"""Profiling / tracing hooks.

Replaces the reference's compile-time LOG_PERFORMANCE probes
(SURVEY.md section 5): ``jax.profiler`` traces for kernel-level analysis and
lightweight wall-clock phase timers feeding the JSONL event log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "log/traces"):
    """Capture a jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock timing per named phase, mirrored into a Logs JSONL."""

    def __init__(self, logs=None):
        self.logs = logs
        self.totals = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            if self.logs is not None:
                self.logs.event("phase_time", phase=name, seconds=dt)

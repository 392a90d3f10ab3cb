"""Profiling/tracing harness.

Capability parity with SURVEY.md §5.1: the reference's only tracing is
benchmark-mode CUDA-event timing; here ``jax.profiler`` traces (viewable
in TensorBoard/XProf) plus a step timer usable from any trainer loop.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace('/tmp/jax-trace'): ...`` -> TensorBoard profile."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard (the reference's
    benchmark-mode semantics, run_fcos.py:551-575)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self) -> dict:
        import numpy as np

        arr = np.asarray(self.times) * 1000
        return {
            "mean_ms": float(arr.mean()) if arr.size else 0.0,
            "std_ms": float(arr.std()) if arr.size else 0.0,
            "n": int(arr.size),
        }

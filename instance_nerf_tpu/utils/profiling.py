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


def _chain_time_ms(f, args, reps: int, warmup: int) -> float:
    import jax.numpy as jnp

    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = f(c, *args)
    float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(reps):
        c = f(c, *args)
    float(c)
    return (time.perf_counter() - t0) / reps * 1000.0


def dispatch_overhead_ms(reps: int = 50) -> float:
    """Per-dispatch overhead of a trivial chained op (~5 ms through the
    axon tunnel)."""
    triv = jax.jit(lambda c: c + 1.0 - 1.0)
    return _chain_time_ms(triv, (), reps, 2)


def chained_latency_ms(step, args=(), reps: int = 20, warmup: int = 2,
                       subtract_overhead: bool = True) -> float:
    """Device latency of a jitted ``step(c, *args) -> c'`` chained scalar.

    ``jax.block_until_ready`` does NOT synchronize through the axon
    remote-PJRT tunnel, so wall-clock timing of independent dispatches
    measures dispatch, not device time. Each iteration here depends on the
    previous one's scalar output and a single scalar is fetched at the
    end; the measured per-dispatch overhead is subtracted (bench.py
    pattern, BENCH_NOTES.md)."""
    total = _chain_time_ms(step, args, reps, warmup)
    if subtract_overhead:
        total = max(total - dispatch_overhead_ms(), 1e-3)
    return total


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

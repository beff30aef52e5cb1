"""Profiling and throughput instrumentation.

Replaces the reference's cProfile dump + pstats reader (simulator.py:10,
tools/parser.py:1-4) with JAX-native tooling: ``jax.profiler`` trace
capture for on-device timelines, wall-clock timers that block on device
completion, and decoded-bits/s throughput counters.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Timing:
    seconds: float
    reps: int

    @property
    def per_call(self) -> float:
        return self.seconds / self.reps


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 1) -> Timing:
    """Time a jitted callable with proper device synchronisation."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return Timing(seconds=time.perf_counter() - start, reps=reps)


@dataclasses.dataclass
class ThroughputCounter:
    """Decoded-information-bits/s accumulator for Monte Carlo runs."""

    info_bits_per_trial: int
    trials: int = 0
    seconds: float = 0.0
    _start: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._start
        self._start = None

    def add_trials(self, count: int):
        self.trials += count

    @property
    def bits_per_second(self) -> float:
        return (self.info_bits_per_trial * self.trials / self.seconds
                if self.seconds else 0.0)

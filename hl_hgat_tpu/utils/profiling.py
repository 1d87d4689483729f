"""Profiling & tracing (SURVEY.md §5: the reference has none).

``StepTimer`` produces steps/s + edges/s (the required benchmark counter);
``trace_context`` wraps a region in a ``jax.profiler`` trace for TensorBoard.
Debug-mode NaN checking is one switch away via ``enable_nan_checks``.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock step timing with edges/s accounting."""

    def __init__(self, edges_per_step: int = 0):
        self.edges_per_step = edges_per_step
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def edges_per_sec(self) -> float:
        return self.steps_per_sec * self.edges_per_step

    def summary(self) -> dict:
        return dict(
            steps=len(self.times),
            steps_per_sec=round(self.steps_per_sec, 3),
            edges_per_sec=round(self.edges_per_sec, 1),
            best_step_s=round(min(self.times), 5) if self.times else None,
        )


def device_barrier(tree) -> None:
    """Reliable synchronization: host-readback of the smallest leaf.

    On the tunneled TPU backend ``jax.block_until_ready`` returns before
    execution finishes (measured: a 10-step scan "blocks" in 0.1 ms while
    the next host readback waits 437 ms — benchmarks/sync_probe.py), so
    wall-clock timing MUST gate on a device→host transfer.  Every benchmark
    in this repo uses this (or an inline ``np.asarray``) as its barrier.
    """
    import numpy as np

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]
    if leaves:
        np.asarray(min(leaves, key=lambda x: x.size))


@contextlib.contextmanager
def trace_context(logdir: str):
    """jax.profiler trace around a region (open in TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Debug-mode NaN detection inside jit (SURVEY.md §5 'race detection'
    analog: purity + numeric sanitizers)."""
    jax.config.update("jax_debug_nans", enable)

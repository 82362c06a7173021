# -*- coding: utf-8 -*-
"""Tracing / profiling utilities (aux subsystem; the reference has none —
SURVEY §5 "Tracing / profiling: absent").

  * `trace(logdir)` — context manager around jax.profiler.trace; view with
    TensorBoard or xprof.  Wired to `train.py --profile-dir`.
  * `StepTimer` — wall-clock per-step timing with compile-step exclusion and
    rolling throughput (steps/s, examples/s).
  * `annotate` — TraceAnnotation wrapper for host-side phases so data-loading
    vs device time separates in profiles.
  * `nan_guard` — enables jax debug_nans (the race-detector analogue for a
    pure-functional runtime: any NaN-producing op raises at its source).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "StepTimer", "annotate", "nan_guard"]


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def nan_guard(enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Rolling step timing; the first `skip` steps (compiles) are excluded.

    Two further guards keep the reported examples_per_s honest:
      * ``pause()`` — call across known non-step gaps (epoch boundaries:
        eval, checkpoint save) so the next tick doesn't record the gap.
      * outlier rejection — an interval > 10x the window median with >= 5
        samples banked is a mid-run compile (e.g. the deferred apply_lfd
        jit variant at step n_step_fd; ~30-60 s against ~1 s steps here),
        not a step; it is dropped rather than skewing the window.
    """

    def __init__(self, skip: int = 1, window: int = 50):
        self.skip = skip
        self.window = window
        self._times: list = []
        self._count = 0
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip:
                dt = now - self._last
                if len(self._times) >= 5:
                    med = sorted(self._times)[len(self._times) // 2]
                    if dt > 10.0 * med:
                        self._last = now
                        return
                self._times.append(dt)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    def pause(self) -> None:
        """Forget the last tick: the time until the next tick is not a
        step (eval, checkpointing, epoch turnover)."""
        self._last = None

    @property
    def seconds_per_step(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(self._times) / len(self._times)

    def throughput(self, batch_size: int) -> Optional[float]:
        sps = self.seconds_per_step
        return batch_size / sps if sps else None

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
    """Rolling step timing; the first `skip` steps (compiles) are excluded."""

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
                self._times.append(now - self._last)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    @property
    def seconds_per_step(self) -> Optional[float]:
        if not self._times:
            return None
        return sum(self._times) / len(self._times)

    def throughput(self, batch_size: int) -> Optional[float]:
        sps = self.seconds_per_step
        return batch_size / sps if sps else None

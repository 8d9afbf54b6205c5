"""Tracing / profiling hooks.

The reference's observability is commented-out wall-clock prints and a
``@nameit`` decorator (coach_utils.py:13-22, SURVEY.md §5). TPU-native
equivalents: ``jax.profiler`` traces viewable in TensorBoard/Perfetto,
named trace annotations for pipeline stages, and the same wall-clock
decorator for host-side phases.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def nameit(fn):
    """Wall-clock decorator (coach_utils.nameit twin)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[{fn.__qualname__}] took {time.perf_counter() - t0:.3f}s")
        return out

    return wrapper


@contextlib.contextmanager
def stage(name: str):
    """Named annotation that shows up in profiler traces AND host timing."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _STAGE_TIMES.setdefault(name, []).append(dt)


_STAGE_TIMES: dict = {}


def stage_report() -> dict:
    return {k: {"mean_s": sum(v) / len(v), "count": len(v)} for k, v in _STAGE_TIMES.items()}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", host: bool = False):
    """Capture a device trace: ``with trace('logs/trace'): step(...)``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Tracing/profiling subsystem (SURVEY §5: the reference logs wall-clock
pairs only, ``al_trainer.py:1147-1396``; the TPU build wires
``jax.profiler`` annotations into the same phase structure).

- ``trace_span(name)``: context manager emitting a ``jax.profiler``
  TraceAnnotation (visible in TensorBoard/XProf captures) AND recording
  wall-clock into a process-local registry.
- ``start_profiler(logdir)`` / ``stop_profiler()``: programmatic capture.
- ``phase_times()``: accumulated per-phase wall-clock for log lines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_PHASE_TIMES: dict[str, float] = defaultdict(float)
_PHASE_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def trace_span(name: str):
    start = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    elapsed = time.perf_counter() - start
    _PHASE_TIMES[name] += elapsed
    _PHASE_COUNTS[name] += 1


def phase_times() -> dict[str, dict[str, float]]:
    return {
        name: {
            "total_s": _PHASE_TIMES[name],
            "count": _PHASE_COUNTS[name],
            "mean_s": _PHASE_TIMES[name] / max(_PHASE_COUNTS[name], 1),
        }
        for name in _PHASE_TIMES
    }


def reset_phase_times():
    _PHASE_TIMES.clear()
    _PHASE_COUNTS.clear()


def start_profiler(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_profiler():
    jax.profiler.stop_trace()

"""Tracing/profiling utilities (SURVEY.md §5.1).

The reference's only observability is wall-clock prints persisted to
`_time.txt` reports (reference tree_parsing.py:53-76,
preprocessing.py:151-155). We keep that contract (`time_report`) and
add what the reference lacks: structured phase timers and real device
traces via `jax.profiler` (parse with
`tests/.../vm.trace.json.gz`-style tooling or TensorBoard).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Named phase timer: `with Timer() as t: ... t.lap("phase")`."""

    def __init__(self):
        self.laps: dict[str, float] = {}
        self._t0 = time.perf_counter()

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        return False

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t0 = now
        return dt


def time_report(path: str, lines: dict[str, float | int]):
    """Write a reference-style `_time.txt` report: one
    '<label> %d seconds' (or raw int) line per entry."""
    with open(path, "w") as f:
        for label, value in lines.items():
            if "time" in label.lower():
                f.write("%s %d seconds\n" % (label, value))
            else:
                f.write("%s %d\n" % (label, value))


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jaxtrace"):
    """jax.profiler trace context; view in TensorBoard or parse the
    trace.json.gz directly."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir

"""Structured step metrics and profiling hooks.

The reference's observability is stdout progress prints (main.cu:172-225)
and a DEBUG byte counter (helpers.cuh:28-33).  Here: JSON-line metrics (one
parseable record per step/benchmark — the format bench.py emits and the
driver records), simple wall-clock timers, and jax.profiler integration for
XProf/TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any, Iterator, TextIO


class MetricsLogger:
    """Emit one JSON line per record; machine-parseable, human-skimmable."""

    def __init__(self, stream: TextIO | None = None, prefix: str = ""):
        self.stream = stream or sys.stdout
        self.prefix = prefix

    def log(self, record: dict[str, Any]) -> None:
        if self.prefix:
            record = {"tag": self.prefix, **record}
        self.stream.write(json.dumps(record, default=float) + "\n")
        self.stream.flush()


@contextlib.contextmanager
def timer() -> Iterator[dict[str, float]]:
    """``with timer() as t: ...; t['seconds']``."""
    box: dict[str, float] = {}
    t0 = time.perf_counter()
    try:
        yield box
    finally:
        box["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(logdir: str, *, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf.

    The TPU-native answer to "how do I see where time goes" — per-op device
    timelines from the compiled HLO (SURVEY.md §5 tracing gap).
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator/context: name a region in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)

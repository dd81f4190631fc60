"""Timing / throughput observability (SURVEY.md §5.1).

The reference's only instrumentation is a wall-clock timer around each API
call (src/timer.h:20-140, main.cpp:29-57) plus stubbed-out kernel timing
scaffolding (utils.impala:157-201). Here: a context-manager timer, GCUPS
reporting, and an optional jax.profiler trace hook.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time


class Timer:
    """Wall-clock timer, reference ``am::timer`` semantics."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        if self._t0 is not None:
            self.elapsed += time.perf_counter() - self._t0
            self._t0 = None
        return self

    def milliseconds(self) -> int:
        return int(round(self.elapsed * 1000))


@contextlib.contextmanager
def timed(name: str, cells: int | None = None, file=None, emit_json=False):
    """Time a block; prints reference-style "testing <name> N ms" plus
    GCUPS when a cell count is given."""
    out = file or sys.stdout
    t = Timer().start()
    yield t
    t.stop()
    if emit_json:
        rec = {"name": name, "ms": t.milliseconds()}
        if cells:
            rec["gcups"] = round(cells / max(t.elapsed, 1e-12) / 1e9, 3)
        print(json.dumps(rec), file=out)
    else:
        line = f"testing {name} {t.milliseconds()} ms"
        if cells:
            line += f" ({cells / max(t.elapsed, 1e-12) / 1e9:.2f} GCUPS)"
        print(line, file=out)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace for offline analysis (tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

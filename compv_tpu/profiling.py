"""Profiling / tracing / observability helpers.

Reference (SURVEY.md §5): millisecond timers (CompVTime::nowMillis) around
sections + log-based perf annotations; no real profiler. TPU equivalents:
  * Timer / timed(): wall-clock section timers that block on device work.
  * trace(): context manager around jax.profiler traces (TensorBoard files).
  * device_memory_stats(): live HBM usage per device.
  * log: leveled logger with pluggable sinks (CompVDebugMgr analogue,
    base/include/compv/base/compv_debug.h:32-59).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax

__all__ = ["Timer", "timed", "trace", "device_memory_stats", "Log", "log"]


class Timer:
    """Accumulating section timer (ms), blocking on async device work."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = (time.perf_counter() - t0) * 1000.0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[k]
            lines.append(f"{k}: {self.totals[k]:.2f} ms total, "
                         f"{self.totals[k] / n:.3f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def timed(name: str = "section"):
    t0 = time.perf_counter()
    yield
    print(f"[compv_tpu] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace -> TensorBoard/perfetto files in ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> List[dict]:
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({"device": str(d),
                    "bytes_in_use": s.get("bytes_in_use", -1),
                    "bytes_limit": s.get("bytes_limit", -1)})
    return out


class Log:
    """Leveled logger with pluggable sinks (CompVDebugMgr analogue)."""

    LEVELS = {"verbose": 0, "info": 1, "warn": 2, "error": 3, "fatal": 4}

    def __init__(self):
        self.level = "info"
        self.sinks: Dict[str, List[Callable[[str], None]]] = {}

    def add_sink(self, level: str, fn: Callable[[str], None]) -> None:
        self.sinks.setdefault(level, []).append(fn)

    def _emit(self, level: str, msg: str) -> None:
        if self.LEVELS[level] < self.LEVELS[self.level]:
            return
        line = f"[compv_tpu {level.upper()}] {msg}"
        sinks = self.sinks.get(level)
        if sinks:
            for fn in sinks:
                fn(line)
        else:
            print(line, flush=True)   # logs must survive piped/buffered IO

    def verbose(self, msg):
        self._emit("verbose", msg)

    def info(self, msg):
        self._emit("info", msg)

    def warn(self, msg):
        self._emit("warn", msg)

    def error(self, msg):
        self._emit("error", msg)


log = Log()

"""Performance tracing: named timers + per-frame log columns to CSV.

Equivalent of the reference's ``PerformanceMonitor`` (/root/reference/
include/hso/vikit/performance_monitor.h, enabled with HSO_TRACE): register
timers/log columns, stamp them per frame, flush CSV rows.  Timers optionally
fence device work (``jax.block_until_ready``) so stage timings are real on
an asynchronous backend — the reference's timers measure synchronous CPU
stages and need no fencing.
"""

from __future__ import annotations

import os
import time


class PerformanceMonitor:
    def __init__(self, trace_name: str = "hso_tpu", trace_dir: str = "/tmp"):
        self.trace_name = trace_name
        self.trace_dir = trace_dir
        self._timers: dict[str, float] = {}
        self._starts: dict[str, float] = {}
        self._logs: dict[str, float] = {}
        self._columns: list[str] = []
        self._fh = None

    def add_timer(self, name: str) -> None:
        self._columns.append(f"timer_{name}")
        self._timers[name] = 0.0

    def add_log(self, name: str) -> None:
        self._columns.append(f"log_{name}")
        self._logs[name] = 0.0

    def init(self) -> None:
        os.makedirs(self.trace_dir, exist_ok=True)
        path = os.path.join(self.trace_dir, f"{self.trace_name}.csv")
        self._fh = open(path, "w")
        self._fh.write(",".join(self._columns) + "\n")

    def new_frame(self) -> None:
        """Zero all timers/logs so stages skipped this frame read 0."""
        for k in self._timers:
            self._timers[k] = 0.0
        for k in self._logs:
            self._logs[k] = 0.0

    def start_timer(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop_timer(self, name: str, fence=None) -> float:
        if fence is not None:
            import jax

            jax.block_until_ready(fence)
        dt = time.perf_counter() - self._starts.pop(name, time.perf_counter())
        self._timers[name] = dt
        return dt

    def log(self, name: str, value: float) -> None:
        self._logs[name] = float(value)

    def set_timer(self, name: str, seconds: float) -> None:
        """Record an externally measured duration."""
        self._timers[name] = float(seconds)

    def timing(self, name: str):
        """Context manager: with monitor.timing('stage'): ..."""
        mon = self

        class _Ctx:
            def __enter__(self):
                mon.start_timer(name)

            def __exit__(self, *a):
                mon.stop_timer(name)

        return _Ctx()

    def update_finished(self) -> None:
        """Flush one CSV row (reference: writeToFile per frame)."""
        if self._fh is None:
            return
        row = []
        for c in self._columns:
            kind, name = c.split("_", 1)
            src = self._timers if kind == "timer" else self._logs
            row.append(f"{src.get(name, 0.0):.6f}")
        self._fh.write(",".join(row) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

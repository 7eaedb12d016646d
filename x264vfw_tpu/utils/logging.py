"""Four-level logger (none/error/warning/info/debug) — the reference's log
system re-hosted (/root/reference/x264vfw.h:92-99, codec.c:654-794): same
levels, pluggable sink instead of a Win32 listbox console.
"""

from __future__ import annotations

import sys
import time

LOG_NONE = -1
LOG_ERROR = 0
LOG_WARNING = 1
LOG_INFO = 2
LOG_DEBUG = 3

_NAMES = {LOG_ERROR: "error", LOG_WARNING: "warning",
          LOG_INFO: "info", LOG_DEBUG: "debug"}


class Logger:
    """Level-gated logger with an optional callback sink (the pf_log role)."""

    def __init__(self, level: int = LOG_INFO, sink=None, name: str = "x264vfw_tpu"):
        self.level = level
        self.sink = sink
        self.name = name
        self.history: list[tuple[int, str]] = []  # console-buffer equivalent

    def log(self, level: int, msg: str) -> None:
        if level > self.level:
            return
        self.history.append((level, msg))
        line = f"{self.name} [{_NAMES.get(level, '?')}]: {msg}"
        if self.sink is not None:
            self.sink(level, msg)
        else:
            print(line, file=sys.stderr)

    def error(self, msg: str) -> None:
        self.log(LOG_ERROR, msg)

    def warning(self, msg: str) -> None:
        self.log(LOG_WARNING, msg)

    def info(self, msg: str) -> None:
        self.log(LOG_INFO, msg)

    def debug(self, msg: str) -> None:
        self.log(LOG_DEBUG, msg)


class Timer:
    """Tiny scoped profiler for per-stage telemetry (tracing aux subsystem)."""

    def __init__(self) -> None:
        self.acc: dict[str, float] = {}

    def section(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timer.acc[name] = timer.acc.get(name, 0.0) \
                    + time.perf_counter() - self.t0

        return _Ctx()

    def report(self) -> dict[str, float]:
        return dict(self.acc)

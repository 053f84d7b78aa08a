"""Execution tracing.

The reference hand-rolls Paje traces for ViTE (``trace_mod.F90``) and uses
StarPU FxT; the TPU-native equivalents are
  * a host-side event log dumped as Chrome-trace JSON (view in Perfetto) —
    records plan-level structure (level widths, batch launches), and
  * a thin wrapper over ``jax.profiler`` for full XLA device traces.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time

__all__ = ["TraceLog", "device_trace"]


class TraceLog:
    """Chrome-trace event collector (Paje-dump analogue)."""

    def __init__(self):
        self.events: list[dict] = []
        self._t0 = time.perf_counter()
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def event(self, name: str, category: str = "spllt", **args):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t1 = time.perf_counter()
            with self._lock:
                self.events.append({
                    "name": name, "cat": category, "ph": "X",
                    "ts": (t0 - self._t0) * 1e6,
                    "dur": (t1 - t0) * 1e6,
                    "pid": 0, "tid": threading.get_ident() % 1000,
                    "args": args,
                })

    def instant(self, name: str, **args):
        with self._lock:
            self.events.append({
                "name": name, "cat": "spllt", "ph": "i",
                "ts": (time.perf_counter() - self._t0) * 1e6,
                "pid": 0, "tid": 0, "s": "g", "args": args,
            })

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device profile (TensorBoard/Perfetto viewable) —
    the FxT/`starpu_fxt_tool` analogue for the TPU runtime."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

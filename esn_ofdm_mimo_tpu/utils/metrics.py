"""Structured metrics registry + JSONL event log + profiler hooks.

The reference's observability is `print` statements (SURVEY.md §5). Here:
  * `MetricsLogger` appends one JSON object per event to a .jsonl file and
    mirrors it to stdout;
  * `profile_trace` wraps a region in a jax.profiler trace annotation and, if
    a trace dir is configured, dumps a perfetto-compatible trace.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"t": time.time(), "event": event, **fields}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        if self.echo:
            kv = " ".join(f"{k}={v}" for k, v in fields.items())
            print(f"[{event}] {kv}", flush=True)
        return rec

    def close(self) -> None:
        if self._f:
            self._f.close()


@contextlib.contextmanager
def profile_trace(name: str, trace_dir: Optional[str] = None):
    """jax.profiler annotation around a host-side region; optionally starts a
    full device trace when trace_dir is given (dev-mode only — tracing has
    overhead)."""
    import jax
    started = False
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        started = True
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if started:
            jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nan_checks(enabled: bool = True):
    """Dev-mode NaN guard (SURVEY.md §5 race-detection equivalent)."""
    import jax
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

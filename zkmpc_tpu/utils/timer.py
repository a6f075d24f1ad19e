"""Structured timers — the analogue of the reference's thread-aware
`start_timer!`/`end_timer!`/`timed!` macros (`mpc-net/src/utils/timer.rs`).

Wall-clock scopes with nesting, plus a `report()` dump.  For on-device
profiling use `jax.profiler.trace` around the region instead; these timers
measure host-side orchestration (setup, compile, dispatch).
"""

from __future__ import annotations

import contextlib
import threading
import time

_state = threading.local()


def _stack():
    if not hasattr(_state, "stack"):
        _state.stack = []
        _state.records = []
    return _state.stack


@contextlib.contextmanager
def timed(label: str, enabled: bool = True):
    stack = _stack()
    depth = len(stack)
    stack.append(label)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        stack.pop()
        _state.records.append((depth, label, dt))
        if enabled:
            print(f"{'  ' * depth}[timer] {label}: {dt * 1e3:.1f} ms")


def records():
    _stack()
    return list(_state.records)


def reset():
    _stack()
    _state.records = []

"""Signals — user predicates gating interval readiness.

Reference: sqlmesh/core/signal.py:14 (@signal decorator) and the builtin
freshness signal (:46); the scheduler consults signals before evaluating
an interval (scheduler.py:950 _check_ready_intervals,
snapshot/definition.py:2452 check_ready_intervals).

A signal is a callable (batch: list[(start_epoch, end_epoch)]) -> ready
subset (or bool for all-or-nothing). Models reference signals by name in
their header; unreported intervals stay missing and are retried on the
next run — late upstream data simply delays, never corrupts.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Union

SignalFn = Callable[[Sequence[tuple[int, int]]], Union[bool, Sequence[tuple[int, int]]]]

_SIGNALS: dict[str, SignalFn] = {}


def signal(name: str) -> Callable[[SignalFn], SignalFn]:
    """Register a named signal (reference @signal, signal.py:14)."""

    def deco(fn: SignalFn) -> SignalFn:
        _SIGNALS[name.lower()] = fn
        return fn

    return deco


def get_signal(name: str) -> SignalFn:
    return _SIGNALS[name.lower()]


def check_ready_intervals(
    names: Sequence[str], batch: Sequence[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Intersect every signal's ready subset (definition.py:2452): an
    interval runs only when ALL signals admit it."""
    ready = list(batch)
    for name in names:
        fn = get_signal(name)
        verdict = fn(ready)
        if verdict is True:
            continue
        if verdict is False:
            return []
        allowed = {tuple(iv) for iv in verdict}
        ready = [iv for iv in ready if tuple(iv) in allowed]
        if not ready:
            return []
    return ready


@signal("freshness")
def freshness(batch: Sequence[tuple[int, int]]) -> Sequence[tuple[int, int]]:
    """Builtin (signal.py:46): only intervals fully in the past are ready —
    the guard against computing partial periods."""
    now = int(time.time())
    return [iv for iv in batch if iv[1] <= now]

"""Fixture-cost attribution for the benchmark harness.

Several registry entries (snapshot_*, doc_incr_*, emb_*) build
session-cached fixtures — versioned tables with DML histories, trained
codebooks — ONCE per (session, sf_dir), inside whichever query happens
to run first. Without attribution, BENCH per-query numbers mix that
one-time build cost into operator cost (snapshot_dv_read reads as
~8 s when the operator itself is ~0.3 s), and round-over-round
regression triage can't separate host weather from real drift.

Every session-cached builder wraps its cache-MISS path in
``with timed("<fixture>")``; cache hits never enter the block, so the
accumulated seconds are exactly the build cost. ``bench.py`` snapshots
:func:`total` around each timed query to attribute per-entry
``fixture_s`` and emits the per-fixture breakdown in the BENCH JSON.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

_LOCK = threading.Lock()

#: serializes session-fixture BUILDS across concurrent query streams
#: (bench.py --streams N): without it, every stream that misses a
#: cache builds its own copy of the fixture — wasted wall and, for
#: builders that commit versioned tables, racing DML against shared
#: global state. Builders double-check their cache inside this lock.
#: RLock: a builder may invoke another cached builder (signatures →
#: band index) on the same thread.
BUILD_LOCK = threading.RLock()

#: accumulated build seconds per fixture name (cache misses only)
SECONDS: dict[str, float] = {}


@contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            SECONDS[name] = SECONDS.get(name, 0.0) + dt


def start() -> float:
    """Mark a cache-miss build's start (pair with :func:`done`) — the
    two-call form keeps builder bodies un-reindented."""
    return time.perf_counter()


def done(name: str, t0: float) -> None:
    dt = time.perf_counter() - t0
    with _LOCK:
        SECONDS[name] = SECONDS.get(name, 0.0) + dt


def total() -> float:
    with _LOCK:
        return sum(SECONDS.values())


def snapshot() -> dict[str, float]:
    with _LOCK:
        return dict(SECONDS)


def reset() -> None:
    with _LOCK:
        SECONDS.clear()

"""Bounded memo-cache insert for persisted / localCheckpoint'd frames.

Several operator families memoize an expensive intermediate per
(session, dataset) — MinHash signatures and scored pairs, CC labels,
synthesized media tables. Each persisted frame pins executor block
storage, so every cache shares this FIFO-bounded insert: past ``cap``
entries the oldest frame is unpersisted (which also frees
localCheckpoint blocks — they live in the same block store) before the
new one is remembered. One implementation means an eviction-semantics
fix lands everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_CACHE_CAP = 8


def bounded_cache_put(cache: dict, key, df: DataFrame,
                      cap: int = DEFAULT_CACHE_CAP) -> DataFrame:
    if cap < 1:
        raise ValueError("cap must be >= 1")
    # Re-putting an existing key releases the frame it replaces —
    # otherwise the old persisted blocks leak unreachable — and must
    # not evict an unrelated entry (the dict doesn't grow).
    old = cache.pop(key, None)
    if old is not None:
        old.unpersist()
    while len(cache) >= cap:
        cache.pop(next(iter(cache))).unpersist()
    cache[key] = df
    return df

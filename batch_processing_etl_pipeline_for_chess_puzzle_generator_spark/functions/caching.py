"""Bounded memo-cache insert for persisted / localCheckpoint'd frames.

Several operator families memoize an expensive intermediate per
(session, dataset) — MinHash signatures and scored pairs, CC labels,
synthesized media tables. Each persisted frame pins executor block
storage, so every cache shares this FIFO-bounded insert: past ``cap``
entries the oldest frame is evicted before the new one is remembered.
One implementation means an eviction-semantics fix lands everywhere at
once.

Release semantics: ``unpersist()`` frees frames cached via
``persist()`` immediately (CacheManager-registered plans). For
localCheckpoint'd frames it is a no-op at the block level — their
storage is RDD-level and invisible to the CacheManager — so eviction's
job there is dropping the LAST reference: Spark's ContextCleaner
reclaims a checkpoint's blocks once the RDD is garbage-collected.
Caches holding frames that must free promptly should therefore store
``persist()`` frames, not checkpoints (the dedup pair cache does).
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

"""Engine-portable deterministic hashing.

Spark's native ``hash``/``xxhash64`` are fast but their exact bit
patterns are Spark-private, which would make every hash-derived operator
(MinHash, SimHash, LSH buckets, fingerprints) unverifiable by an
external SQL oracle. Instead all content hashing routes through md5 —
available with identical semantics in Spark, DuckDB, and every warehouse
— truncated to 60 bits so it fits a signed BIGINT in both engines:

    Spark : conv(substring(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

md5 here is a *partitioning/fingerprint* hash, not a security boundary.
It runs JVM-side inside whole-stage codegen (no Python), so the hot path
stays vectorized; at 100 TB the cost is dominated by the scan, not md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits kept from the md5 digest (15 hex chars = 60 bits < 63)
HEX_CHARS = 15


def stable_hash64(col: Column | str) -> Column:
    """60-bit stable content hash of a string column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def stable_hash64_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: hash of ``seed || ':' || s`` — one independent
    hash family member per seed (MinHash permutations)."""
    c = F.col(col) if isinstance(col, str) else col
    return stable_hash64(F.concat(F.lit(f"{seed}:"), c))


def STABLE_HASH_SQL(expr: str, seed: int | None = None) -> str:
    """The DuckDB-SQL replica of :func:`stable_hash64` for oracles."""
    if seed is not None:
        expr = f"('{seed}:' || {expr})"
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_CHARS})) AS BIGINT)"


def SPARK_HASH_SQL(expr: str, seed: int | None = None) -> str:
    """Spark-SQL fragment form of :func:`stable_hash64` (for use inside
    higher-order-function lambdas where Column API can't reach)."""
    if seed is not None:
        expr = f"CONCAT('{seed}:', {expr})"
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, {HEX_CHARS}), 16, 10) AS BIGINT)"

"""Z-order (Morton) interleaving for multi-dimensional data layout.

A lakehouse engine clusters files on a space-filling curve so range
predicates on EITHER dimension prune row groups (Delta's OPTIMIZE
ZORDER BY, Iceberg's sort orders). The key is pure integer bit math —
built from `&`, integer division and multiplication only, so the SAME
construction is expressible in Spark SQL and in the DuckDB oracle and
produces identical keys.

``morton_sql`` emits the expression for one engine; the only dialect
difference is the integer-division operator (Spark ``div``, DuckDB
``//``), injected as a parameter. Keys are driver-side SQL strings —
the per-row work is whole-stage-codegen'd JVM arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_sql(x: str, y: str, bits: int = 8, div: str = "div") -> str:
    """Bit-interleave expression: x's bit i → key bit 2i, y's bit i →
    key bit 2i+1. ``x``/``y`` must already be non-negative ints below
    2**bits (bucket them first)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {div} {1 << i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div} {1 << i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(df: DataFrame, x: str, y: str, bits: int = 8,
                    key_col: str = "z_key") -> DataFrame:
    return df.withColumn(key_col, F.expr(morton_sql(x, y, bits)).cast("long"))


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   bits: int = 8, mode: str = "overwrite") -> None:
    """Sort-write on the Morton key. ``repartitionByRange`` gives
    contiguous, balanced key ranges per file; ``sortWithinPartitions``
    orders rows inside each file so parquet row-group min/max stats on
    the ORIGINAL columns become selective for range predicates on
    either dimension."""
    keyed = with_zorder_key(df, x, y, bits)
    (
        keyed.repartitionByRange("z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode(mode)
        .parquet(path)
    )

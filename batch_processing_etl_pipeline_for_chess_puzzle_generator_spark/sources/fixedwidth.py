"""Fixed-width (mainframe/COBOL-layout) text source and sink.

The legacy interchange format big batch shops still emit: every row is
one line, every field a fixed byte range, no delimiters. Expressed
Spark-first in both directions:

- write: each field is ``rpad``-ed (strings) / ``lpad``-ed (numbers)
  to its declared width and concatenated into one string column, then
  written through the distributed text sink — one row-local projection,
  no UDF, no driver loop.
- read: ``spark.read.text`` + one ``substring``/``trim``/``cast`` per
  field — a single narrow projection Catalyst collapses into the scan.
  Column pruning still works: unused fields are dropped from the
  projection before the scan at the optimizer level (the line is read,
  but no per-field work happens for pruned columns).

A field layout is ``(name, width, dtype)``; widths are character
positions (1-based ``substring``), matching how COBOL copybooks
declare PIC clauses. Values wider than their field raise at write
time rather than silently truncating a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long", "short")


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0].lower() in _NUMERIC


def write_fixed_width(df: DataFrame, path: str,
                      layout: list[tuple[str, int]],
                      mode: str = "overwrite") -> None:
    """Serialize ``df`` to fixed-width lines per ``layout`` =
    [(column, width), ...]. Numeric columns are right-aligned
    (space-padded left), strings left-aligned (space-padded right) —
    the classic copybook convention. A value longer than its field
    width fails the job (better than silently corrupting a column
    boundary); NULLs serialize as all-spaces."""
    types = dict(df.dtypes)
    parts = []
    for col, width in layout:
        s = F.col(col).cast("string")
        guard = (
            f"IF(length(CAST(`{col}` AS STRING)) > {width}, "
            f"raise_error(CONCAT('fixed-width overflow in {col}: ', "
            f"CAST(`{col}` AS STRING))), true)"
        )
        pad = F.lpad(s, width, " ") if _is_numeric(types[col]) \
            else F.rpad(s, width, " ")
        parts.append(
            F.when(F.col(col).isNull(), F.lit(" " * width))
            .otherwise(F.when(F.expr(guard), pad)),
        )
    out = df.select(F.concat(*parts).alias("value"))
    out.write.mode(mode).text(path)


def read_fixed_width(spark: SparkSession, path: str,
                     layout: list[tuple[str, int, str]]) -> DataFrame:
    """Parse fixed-width lines back per ``layout`` =
    [(column, width, dtype), ...]. All-space fields read as NULL
    (TRIM + empty→NULL), everything else trims and casts. One
    projection over ``spark.read.text``; no UDF."""
    lines = spark.read.text(path)
    cols = []
    pos = 1
    for name, width, dtype in layout:
        raw = F.trim(F.substring(F.col("value"), pos, width))
        cols.append(
            F.when(raw == "", F.lit(None)).otherwise(raw)
            .cast(dtype).alias(name)
        )
        pos += width
    return lines.select(*cols)

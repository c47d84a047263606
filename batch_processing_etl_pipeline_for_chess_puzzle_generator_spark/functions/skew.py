"""Skew mitigation: deterministic salting for hot join/group keys.

AQE's skew-join split (on by default in session.py) handles most skew
at runtime, but it only splits *sort-merge join* partitions. These
helpers cover the rest — a skewed groupBy, or a shuffle join whose hot
key would still serialize one reducer:

- ``with_salt``: adds a DETERMINISTIC salt in [0, n) derived from
  xxhash64 of the given columns (never rand(): task retries and
  speculative execution must re-derive identical salts or results
  drift under failure).
- ``salted_join``: fact side salted, dim side replicated n ways via
  explode — the hot key's rows spread over n reducers; result set is
  identical to the plain join.
- ``two_phase_agg``: algebraic aggregates as partial-on-(key, salt) →
  final-on-key. The first shuffle spreads the hot group across n
  partitions; the second moves only n rows per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# (partial expr over value col, final expr over partial col) per agg.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic `__salt` column in [0, n_salts)."""
    cols = cols or df.columns
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_join(facts: DataFrame, dim: DataFrame, on: str | list[str],
                n_salts: int, how: str = "inner") -> DataFrame:
    """`facts ⋈ dim` with the dim side replicated n_salts ways.

    Use when the dim is too big to broadcast and a fact key is hot:
    each (key, salt) shard joins against its own dim replica, so the
    hot key fans out over n_salts reducers instead of one.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_facts = with_salt(facts, n_salts)
    replicated = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    return (
        salted_facts.join(replicated, keys + [_SALT], how).drop(_SALT)
    )


def two_phase_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
                  n_salts: int = 16) -> DataFrame:
    """groupBy(keys) with algebraic aggregates, shuffled in two hops so
    no single reducer sees a whole hot group.

    ``aggs`` maps output column name → "fn(col)" with fn in
    sum/count/min/max, e.g. {"total": "sum(value)", "n": "count(value)"}.
    """
    parsed = {}
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn}: not algebraic; supported: {sorted(_ALGEBRAIC)}")
        parsed[out] = (fn, col.rstrip(")").strip())
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(f"__p_{out}")
            for out, (fn, col) in parsed.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{out}")).alias(out)
            for out, (fn, _) in parsed.items()
        ]
    )

"""Custom join operators Spark lacks natively: as-of and range joins.

Both are compositions of existing DataFrame ops — no Pandas UDF, no
cross join:

- ``asof_join``: for each left row, the latest right row with
  right_ts ≤ left_ts within the same key. Implemented by UNIONING both
  sides tagged, sorting once per key partition, and carrying the last
  right value forward with a window — one shuffle + one sort total,
  O(n log n) per key, versus the naive per-row range join's O(n·m).
  This is the kdb/Timescale/Flink temporal-join shape (trade⋈quote).
- ``range_join``: left rows joined to [lo, hi) intervals. Intervals are
  exploded onto fixed-width buckets and joined by (key?, bucket)
  equality + residual predicate — candidates ∝ interval width /
  bucket, never |L|×|R|. The bucket width is the tuning knob (match it
  to the median interval length).

``ev_asof_view`` registers an oracle-gated instance: each purchase
event matched to the user's most recent prior view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: latest right row with ts ≤ left ts per key.

    Left keeps all its columns; right contributes ``value_cols`` (+ its
    timestamp) renamed with ``suffix``. Rows with no prior right match
    keep NULLs — filter afterwards if inner semantics are wanted.
    """
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_l", F.lit(1))
    rt = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__is_l", F.lit(0))
    # Align schemas for the union: left lacks right's value cols, right
    # lacks left's payload. unionByName with allowMissingColumns fills
    # NULLs on both sides.
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # Right rows sort BEFORE left rows at equal timestamps (__is_l asc)
    # so an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last(F.when(F.col("__is_l") == 0, F.col("__t")), ignorenulls=True)
        .over(w).alias(f"{right_ts}{suffix}"),
        *[
            F.last(F.when(F.col("__is_l") == 0, F.col(c)), ignorenulls=True)
            .over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("__is_l") == 1)
        .drop("__t", "__is_l", *value_cols)
    )


def range_join(left: DataFrame, ranges: DataFrame, point: str,
               lo: str, hi: str, bucket_width: int,
               on: list[str] | None = None) -> DataFrame:
    """Join left rows to interval rows where lo ≤ point < hi.

    ``ranges`` explodes onto sequence(lo/width, hi/width) buckets; the
    join is (key?, bucket) equality plus the residual range predicate.
    """
    on = on or []
    b = F.lit(bucket_width)
    lt = left.withColumn("__bkt", (F.col(point) / b).cast("long"))
    rt = ranges.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.col(lo) / b).cast("long"),
                ((F.col(hi) - 1) / b).cast("long"),
            )
        ),
    )
    cond = [lt["__bkt"] == rt["__bkt"]] + [lt[k] == rt[k] for k in on]
    joined = lt.join(rt, cond).filter(
        (lt[point] >= rt[lo]) & (lt[point] < rt[hi])
    )
    return joined.drop(lt["__bkt"]).drop(rt["__bkt"]).drop(*[rt[k] for k in on])


# Oracle-gated instance: purchases matched to the user's latest prior
# (or simultaneous) view.
def ev_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join(purchases, views, on=["user_id"])
    return out.select(
        "user_id", "event_id", "ts", "value", F.col("ts_asof").alias("last_view_ts")
    )


QUERIES = {"ev_asof_view": ev_asof_view}

ORACLES = {
    "ev_asof_view": """
        SELECT p.user_id, p.event_id, p.ts, p.value,
               (SELECT max(v.ts) FROM events v
                WHERE v.event_type = 'view'
                  AND v.user_id = p.user_id
                  AND v.ts <= p.ts) AS last_view_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
}


# Oracle-gated instance of the bucketed range join: purchases landing
# inside [error_ts, error_ts + 10 min) for the SAME user — incident
# attribution. The interval side explodes onto fixed 10-min buckets, so
# the join is (user_id, bucket) EQUALITY plus a residual predicate —
# never an unbounded inequality join. At 100 TB both sides shuffle once
# on (user, bucket); bucket width trades fanout (intervals span ≤ 2
# buckets here) against residual-filter selectivity.
def ev_error_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_micros("ts").alias("lo"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("hi"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pt"), "value"
    )
    hits = range_join(
        purchases, errors, point="pt", lo="lo", hi="hi",
        bucket_width=600_000_000, on=["user_id"],
    )
    return hits.groupBy("error_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").alias("window_value"),
    )


QUERIES["ev_error_window_join"] = ev_error_window_join

ORACLES["ev_error_window_join"] = """
    SELECT e.event_id AS error_id, e.user_id,
           count(*) AS n_purchases,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS window_value
    FROM events e
    JOIN events p
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= e.ts
     AND p.ts < e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY 1, 2
"""


# Last-touch attribution revenue — the marketing rollup every event
# pipeline ships: each purchase's value is attributed to the DAY of the
# user's latest prior (or simultaneous) view via the as-of join above,
# then revenue rolls up per attribution day. Purchases with no prior
# view land in the NULL-day bucket (unattributed) instead of being
# dropped — the honest report. Plan: the as-of union-sort (one shuffle
# on user_id) + one partial-agg shuffle on the day; nothing scans
# events twice.
def ev_attribution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join(purchases, views, on=["user_id"])
    return (
        out.select(
            F.date_trunc("day", F.col("ts_asof")).alias("view_day"),
            "value",
        )
        .groupBy("view_day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)")
            .alias("revenue"),
        )
    )


QUERIES["ev_attribution_revenue"] = ev_attribution_revenue

ORACLES["ev_attribution_revenue"] = """
    WITH attributed AS (
        SELECT p.value,
               date_trunc('day', (SELECT max(v.ts) FROM events v
                                  WHERE v.event_type = 'view'
                                    AND v.user_id = p.user_id
                                    AND v.ts <= p.ts)) AS view_day
        FROM events p
        WHERE p.event_type = 'purchase'
    )
    SELECT CAST(view_day AS TIMESTAMP) AS view_day,
           count(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM attributed
    GROUP BY view_day
"""


# ----------------------------------- salted join for hot keys (skew)
#
# First-class demonstration of the skew playbook: when a join key's
# distribution is dominated by a few hot keys, a plain shuffle join
# lands each hot key on ONE reducer. The salted shape splits every
# probe-side row across SALT_N sub-keys (deterministic salt — here
# event_id % SALT_N so the oracle is replayable; at runtime any
# uniform hash works) and replicates the build side SALT_N× via a
# row-local explode, so a hot key's rows spread over SALT_N reducers.
# Build-side replication cost: |dim| × SALT_N rows — the trade the
# salting chooses over one straggler task. AQE's skew-join split
# handles moderate skew automatically; explicit salting is the
# deterministic, planner-independent version for the pathological
# keys. The salt never escapes: the post-join aggregate is on the
# original columns, and the oracle is the UNSALTED join — a hash
# match proves salting is semantics-neutral.
SALT_N = 8


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt_expr: str, n: int = SALT_N) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``key`` with an ``n``-way salt:
    probe rows get ``salt = salt_expr % n``; build rows are exploded
    to all ``n`` salts. Result = the plain inner join, with hot keys
    spread over ``n`` reducers."""
    p = probe.withColumn("_salt", F.expr(f"CAST(({salt_expr}) % {n} AS INT)"))
    b = build.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return p.join(b, [key, "_salt"]).drop("_salt")


def ev_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().withColumn(
        "tier",
        F.expr("CASE WHEN user_id % 3 = 0 THEN 'gold' "
               "WHEN user_id % 3 = 1 THEN 'silver' ELSE 'bronze' END"),
    )
    joined = salted_join(ev, dim, "user_id", "event_id")
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)")
        .alias("total_value"),
    )


QUERIES["ev_skew_salted_join"] = ev_skew_salted_join

ORACLES["ev_skew_salted_join"] = """
    WITH dim AS (
        SELECT DISTINCT user_id,
               CASE WHEN user_id % 3 = 0 THEN 'gold'
                    WHEN user_id % 3 = 1 THEN 'silver'
                    ELSE 'bronze' END AS tier
        FROM events
    )
    SELECT tier, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY tier
"""

"""Event/log analytics — batch suite over the ``events`` table.

Covers the stream-shaped workloads a log pipeline needs: tumbling
windows, lag-gap sessionization, staged funnels, top-k, JSON prop
extraction (the reference's nested-field access generalized to
schema-on-read JSON strings — reference: etl/transform.py:103-111),
and keep-latest dedup. ``streaming/`` holds the Structured Streaming
twins of the windowed agg and dedup.

Scale notes (100 TB):
- Everything partitions by user_id (sessionize, dedup, funnel) or by
  (bucket, event_type) — single hash shuffle each, no global sorts.
- Sessionization is one window pass: flag-new-session → running sum.
  State per user is bounded by the partition, not driver memory.
- ``value`` sums go through DECIMAL (the column is on a 2-decimal
  grid) so results are partition-order independent — see relational.py.
- get_json_object is JVM-side (codegen'd Jackson), not a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

SUM_VALUE = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"


# Tumbling 1-hour windows per event type. In streaming this is
# window(ts, '1 hour') + watermark; batch uses date_trunc for the
# identical bucketing.
def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("total_value"),
            F.expr(f"{SUM_VALUE} / COUNT(*)").alias("avg_value"),
        )
    )


# Lag-gap sessionization: a session breaks after 30 min of inactivity.
# One window pass: new-session flag, then a running sum numbers the
# sessions — no iterative logic, no state beyond the user partition.
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("new_session").over(run))
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            F.expr(SUM_VALUE).alias("total_value"),
        )
    )


# Ordered funnel view → click → purchase: stage N counts users whose
# first stage-N event happens after their first stage-(N-1) event.
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged view→click→purchase funnel (earliest qualifying event per
    stage, strictly after the prior stage) in ONE pass: a single
    groupBy(user_id) collects the first view plus sorted click/purchase
    timestamp arrays, and higher-order array functions resolve the
    stage chain row-locally. One scan + one shuffle (the 3-stage
    join-back formulation costs 5 shuffles and 3 scans of events;
    per-user arrays are bounded by that user's activity — fine for
    human-scale actors; a bot-heavy corpus would cap them with
    slice()). ``get()`` (0-based, null-on-empty) keeps the stage
    lookups total under ANSI mode."""
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("purchases"),
        )
        .withColumn("t_click", F.expr("get(filter(clicks, x -> x > t_view), 0)"))
        .withColumn("t_purchase", F.expr("get(filter(purchases, x -> x > t_click), 0)"))
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )


# Top-10 users by spend.
def ev_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("total_value"),
        )
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


# JSON prop extraction — schema-on-read over the props string column,
# JVM-side (no Python), mirroring the reference's nested projections.
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


# Keep-latest dedup per (user_id, event_type) — the batch twin of
# streaming dropDuplicates-with-watermark.
def ev_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "ts", "value")
    )


QUERIES = {
    "ev_tumbling_window": ev_tumbling_window,
    "ev_sessionize": ev_sessionize,
    "ev_funnel": ev_funnel,
    "ev_topk_users": ev_topk_users,
    "ev_json_props": ev_json_props,
    "ev_dedup_latest": ev_dedup_latest,
}

_SUM_VALUE_DUCK = "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"

ORACLES = {
    "ev_tumbling_window": f"""
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n_events,
               {_SUM_VALUE_DUCK} AS total_value,
               {_SUM_VALUE_DUCK} / count(*) AS avg_value
        FROM events
        GROUP BY bucket, event_type
    """,
    "ev_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               count(*) AS n_events,
               min(ts) AS t_start,
               max(ts) AS t_end,
               {_SUM_VALUE_DUCK} AS total_value
        FROM numbered
        GROUP BY user_id, session_seq
    """,
    "ev_funnel": """
        WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
             c AS (SELECT e.user_id, min(ts) AS t_click FROM events e
                   JOIN v USING (user_id)
                   WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
             p AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
                   JOIN c USING (user_id)
                   WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase
    """,
    "ev_topk_users": f"""
        SELECT user_id, count(*) AS n_events, {_SUM_VALUE_DUCK} AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY total_value DESC, user_id
        LIMIT 10
    """,
    "ev_json_props": """
        SELECT event_type,
               count(k) AS n_k,
               max(k) AS max_k,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events)
        GROUP BY event_type
    """,
    "ev_dedup_latest": """
        SELECT user_id, event_type, ts, value
        FROM (
            SELECT user_id, event_type, ts, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
}


# Day-over-day retention: users active on day d who return on day d+1.
# Two narrow aggregates of the distinct (user, day) set — the self-join
# is on the small per-day user table, not on raw events.
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shuffle gathers each user's distinct active days as a sorted
    # array (bounded by the calendar, not activity); consecutive-day
    # detection is then a row-local zip_with over adjacent slices, and
    # one tiny per-day agg finishes. Two shuffles, one scan, no join —
    # the self-join formulation costs three shuffles and two scans, and
    # a lead()-window formulation still needs a third repartition
    # because distinct hashes on (user, day), not (user).
    ev = table(spark, sf_dir, "events")
    adjacent = (
        "filter(zip_with(slice(ds, 1, size(ds) - 1), slice(ds, 2, size(ds) - 1), "
        "(a, b) -> IF(b = a + INTERVAL 1 DAY, a, CAST(NULL AS TIMESTAMP))), "
        "x -> x IS NOT NULL)"
    )
    return (
        ev.groupBy("user_id")
        .agg(F.expr("array_sort(collect_set(date_trunc('day', ts)))").alias("ds"))
        .select(F.explode(F.expr(adjacent)).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )


# Exact per-type value percentiles (p50/p90/p99). Spark's `percentile`
# and DuckDB's `quantile_cont` both linearly interpolate over the
# sorted values; outputs are rounded to 6dp so the comparison is on the
# statistic, not the last float bit. At 100 TB you'd switch to
# approx_percentile (t-digest) — kept exact here for the oracle gate.
def ev_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("CAST(ROUND(percentile(CAST(value AS DOUBLE), 0.5) * 1e6) "
               "AS BIGINT)").alias("p50"),
        F.expr("CAST(ROUND(percentile(CAST(value AS DOUBLE), 0.9) * 1e6) "
               "AS BIGINT)").alias("p90"),
        F.expr("CAST(ROUND(percentile(CAST(value AS DOUBLE), 0.99) * 1e6) "
               "AS BIGINT)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# Daily active users + event volume — the hygiene dashboard query.
def ev_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


# Sketch twins of ev_daily_active / ev_percentiles — the shapes that
# actually run at 100 TB: HLL++ (approx_count_distinct) shuffles a
# fixed-size sketch per group instead of every distinct user id;
# approx_percentile streams a bounded summary instead of sorting the
# partition. Sketch internals are engine-specific, so the oracle can't
# replay the estimate itself; instead each query emits the EXACT answer
# plus a boolean "sketch within tolerance" column, and the oracle
# asserts that boolean is TRUE.
#
# These gates are STATISTICAL, not exact: the tolerance is a ~4-sigma
# bound on the sketch's error distribution (rsd=0.02 → 8% relative),
# so a false failure needs a >4σ deviation — vanishingly unlikely but
# not impossible on a new dataset. Groups too small for relative error
# to mean anything (below the absolute-slack / _APPROX_MIN_N floor)
# are accepted outright, the per-group analog of a rows-only check.
# Public: text.py's approx twin shares the same floor.
APPROX_MIN_N = 100
_APPROX_MIN_N = APPROX_MIN_N


def ev_daily_active_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("dau_approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
        # rsd=0.02 → 8% is a 4σ bound; +4 absolute slack covers
        # single-digit groups where relative error is meaningless.
        .select(
            "day",
            "dau_exact",
            "n_events",
            F.expr(
                "abs(dau_approx - dau_exact) <= greatest(0.08 * dau_exact, 4.0)"
            ).alias("hll_ok"),
        )
    )


def ev_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = "CAST(value AS DOUBLE)"
    agged = ev.groupBy("event_type").agg(
        F.expr(
            f"approx_percentile({v}, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        # Exact quantiles at p ∓ 0.02 bracket the sketch output: the
        # GK-style summary returns a real data value whose rank error
        # is ≤ n/accuracy, far inside a ±0.02 quantile window.
        F.expr(
            f"percentile({v}, array(0.48, 0.52, 0.88, 0.92, 0.97, 1.0))"
        ).alias("ex"),
        F.count(F.lit(1)).alias("n"),
    )
    # Small groups fall back to accepted-outright: approx_percentile
    # returns a real data value, which on a handful of rows can sit
    # outside the interpolated p±0.02 window even though the sketch is
    # exact there (GK keeps every value for n ≤ accuracy).
    return agged.select(
        "event_type",
        "n",
        F.expr(f"n < {_APPROX_MIN_N} OR ap[0] BETWEEN ex[0] AND ex[1]").alias("p50_ok"),
        F.expr(f"n < {_APPROX_MIN_N} OR ap[1] BETWEEN ex[2] AND ex[3]").alias("p90_ok"),
        F.expr(f"n < {_APPROX_MIN_N} OR ap[2] BETWEEN ex[4] AND ex[5]").alias("p99_ok"),
    )


# Spark's NATIVE session_window operator (same 30-min gap semantics as
# the hand-rolled ev_sessionize): window.start = first event, window.end
# = last event + gap. In Structured Streaming the identical expression
# gives merging session state for free. Oracle replays it with lag-gap
# numbering (start = min ts, end = max ts + gap — provably the same
# segmentation).
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
            "n_events",
            "total_value",
        )
    )


# Cohort retention matrix: bucket users by first-seen day, then count
# distinct active users per (cohort_day, day_offset). Two shuffles —
# per-user min(day), then the matrix agg over the (small) user-day
# distinct set. The first-seen table re-joins events on user_id, the
# same key the min() agg hashed on, so AQE keeps it co-located; at
# 100 TB the user-day projection is the only thing that ever reaches
# the second shuffle.
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # One shuffle builds the per-user active-day set (collect_set
    # dedups map-side; cardinality is bounded by calendar days, not
    # events); cohort_day falls out as array_min — no distinct, no
    # first-seen self-join (the join formulation costs 4 shuffles).
    per_user = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
        .select(
            "user_id",
            F.array_min("days").alias("cohort_day"),
            F.explode("days").alias("day"),
        )
    )
    return (
        per_user.groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# 7-day moving aggregate over daily totals: a RANGE window frame keyed
# on event time (rows frames break on gap days). The daily pre-agg is
# one shuffle; the window then runs over ~days rows — at 100 TB the
# frame input is tiny because aggregation happened first.
def ev_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr(SUM_VALUE).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = (
        Window.orderBy(F.unix_seconds(F.col("day")))
        .rangeBetween(-6 * 86400, 0)
    )
    # The frame sum goes back through DECIMAL: double addition is not
    # associative and DuckDB's segment-tree window could associate
    # differently — decimal keeps both engines bit-exact.
    s7 = F.sum(F.col("day_value").cast("decimal(18,2)")).over(w).cast("double")
    return daily.withColumn(
        "avg_7d",
        F.round(s7 / F.count(F.lit(1)).over(w) * 1e6).cast("long"),
    ).select("day", "day_value", "n_events", "avg_7d")


# Daily anomaly z-scores: flag days whose total value deviates from the
# corpus mean. μ and σ come from exact decimal component sums (Σx, Σx²
# over the per-day totals) broadcast back over the daily table — the
# same component-sum determinism as stat_sales_corr, and the daily agg
# is the only pass over raw events.
def ev_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr(SUM_VALUE).alias("day_value"),
    )
    dv = "CAST(day_value AS DECIMAL(18,2))"
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(f"CAST(SUM({dv}) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM({dv} * {dv}) AS DOUBLE)").alias("sxx"),
    )
    return (
        daily.join(F.broadcast(stats))
        .select(
            "day",
            "day_value",
            # ppm grid, not ROUND(.,6): decimal-rounding a computed
            # DOUBLE is the engine-version-sensitive op (r3 lesson)
            F.expr(
                "CAST(ROUND((day_value - sx / n_days) / "
                "SQRT((n_days * sxx - sx * sx) / (CAST(n_days AS DOUBLE) * n_days))"
                " * 1e6) AS BIGINT)"
            ).alias("z_score"),
        )
    )


QUERIES["ev_daily_anomaly"] = ev_daily_anomaly

ORACLES["ev_daily_anomaly"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT count(*) AS n_days,
               CAST(SUM(CAST(day_value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(day_value AS DECIMAL(18,2))
                      * CAST(day_value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM daily
    )
    SELECT day, day_value,
           CAST(ROUND((day_value - sx / n_days) /
                 SQRT((n_days * sxx - sx * sx)
                      / (CAST(n_days AS DOUBLE) * n_days)) * 1e6)
                AS BIGINT) AS z_score
    FROM daily CROSS JOIN stats
"""

QUERIES["ev_retention"] = ev_retention
QUERIES["ev_percentiles"] = ev_percentiles
QUERIES["ev_daily_active"] = ev_daily_active
QUERIES["ev_daily_active_approx"] = ev_daily_active_approx
QUERIES["ev_percentiles_approx"] = ev_percentiles_approx
QUERIES["ev_session_window"] = ev_session_window
QUERIES["ev_cohort_retention"] = ev_cohort_retention
QUERIES["ev_moving_avg_7d"] = ev_moving_avg_7d

ORACLES["ev_cohort_retention"] = """
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    first_seen AS (
        SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY user_id
    )
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           count(DISTINCT user_id) AS n_users
    FROM user_days JOIN first_seen USING (user_id)
    GROUP BY 1, 2
"""

ORACLES["ev_moving_avg_7d"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value,
               count(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT day, day_value, n_events,
           CAST(ROUND(
               CAST(sum(CAST(day_value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               / count(*) OVER w * 1e6) AS BIGINT) AS avg_7d
    FROM daily
    WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                 AND CURRENT ROW)
"""

ORACLES["ev_session_window"] = """
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL 30 MINUTE AS s_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, seq
"""

ORACLES["ev_percentiles"] = """
    SELECT event_type,
           CAST(ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5) * 1e6)
                AS BIGINT) AS p50,
           CAST(ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9) * 1e6)
                AS BIGINT) AS p90,
           CAST(ROUND(quantile_cont(CAST(value AS DOUBLE), 0.99) * 1e6)
                AS BIGINT) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
"""

ORACLES["ev_daily_active"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS dau,
           count(*) AS n_events
    FROM events GROUP BY day
"""

ORACLES["ev_daily_active_approx"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS dau_exact,
           count(*) AS n_events,
           TRUE AS hll_ok
    FROM events GROUP BY day
"""

ORACLES["ev_percentiles_approx"] = """
    SELECT event_type,
           count(*) AS n,
           TRUE AS p50_ok,
           TRUE AS p90_ok,
           TRUE AS p99_ok
    FROM events GROUP BY event_type
"""

ORACLES["ev_retention"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
    )
    SELECT a.day, count(*) AS n_retained
    FROM days a JOIN days b
      ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.day
"""


# RFM segmentation — recency/frequency/monetary per user with quartile
# segments. The scale-critical choice: segment boundaries come from ONE
# exact percentile over the (already aggregated) per-user table,
# broadcast back — never ntile() over all users, which would force a
# single-partition global sort at 100 TB. Monetary goes through DECIMAL
# so the quartile cut points are bit-identical across engines.
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("MAX(CAST(date_trunc('day', ts) AS DATE))").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.expr(SUM_VALUE).alias("monetary"),
    )
    bounds = per_user.agg(
        F.expr("MAX(last_day)").alias("corpus_day"),
        F.expr("percentile(monetary, 0.25)").alias("m_q1"),
        F.expr("percentile(monetary, 0.50)").alias("m_q2"),
        F.expr("percentile(monetary, 0.75)").alias("m_q3"),
    )
    return per_user.join(F.broadcast(bounds)).select(
        "user_id",
        F.expr("CAST(datediff(corpus_day, last_day) AS BIGINT)").alias("recency_days"),
        "frequency",
        "monetary",
        F.expr(
            "CAST(CASE WHEN monetary > m_q3 THEN 4 WHEN monetary > m_q2 THEN 3 "
            "WHEN monetary > m_q1 THEN 2 ELSE 1 END AS BIGINT)"
        ).alias("m_quartile"),
    )


# Day-of-week × hour activity heatmap — the classic ops dashboard agg.
# One partial-aggregated shuffle of at most 7×24 groups; the heavy
# lifting (extract + map-side combine) rides the scan.
def ev_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            # 0 = Sunday in both engines after the -1 shift (Spark
            # dayofweek is 1-based Sunday=1; DuckDB's is 0-based).
            F.expr("CAST(dayofweek(ts) - 1 AS BIGINT)").alias("dow"),
            F.expr("CAST(hour(ts) AS BIGINT)").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("total_value"),
        )
    )


# Fixed-width value histogram per event type. width_bucket is spelled
# out as floor(value/width) with an overflow bucket so the DuckDB oracle
# replays it exactly; floor on IEEE doubles is engine-portable.
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.expr("CAST(LEAST(FLOOR(value / 50.0), 6) AS BIGINT)").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(SUM_VALUE).alias("bucket_value"),
        )
    )


QUERIES["ev_rfm_segments"] = ev_rfm_segments
QUERIES["ev_hourly_heatmap"] = ev_hourly_heatmap
QUERIES["ev_value_histogram"] = ev_value_histogram

ORACLES["ev_rfm_segments"] = """
    WITH per_user AS (
        SELECT user_id,
               MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
               count(*) AS frequency,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM events GROUP BY user_id
    ),
    bounds AS (
        SELECT MAX(last_day) AS corpus_day,
               quantile_cont(monetary, 0.25) AS m_q1,
               quantile_cont(monetary, 0.50) AS m_q2,
               quantile_cont(monetary, 0.75) AS m_q3
        FROM per_user
    )
    SELECT user_id,
           CAST(date_diff('day', last_day, corpus_day) AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(CASE WHEN monetary > m_q3 THEN 4 WHEN monetary > m_q2 THEN 3
                     WHEN monetary > m_q1 THEN 2 ELSE 1 END AS BIGINT) AS m_quartile
    FROM per_user CROSS JOIN bounds
"""

ORACLES["ev_hourly_heatmap"] = """
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
"""

ORACLES["ev_value_histogram"] = """
    SELECT event_type,
           CAST(LEAST(FLOOR(value / 50.0), 6) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
    FROM events GROUP BY 1, 2
"""


# Markov transition matrix over event types — per-user lag pairs
# (one hash shuffle on user_id for the window), a tiny
# (|types|²-group) agg, then the per-prev totals as a window SUM over
# that already-aggregated table. Three shuffles total, two of them over
# |types|² rows — a second agg+join would re-run the big lag pass.
# prob is a single double division of exact integer counts, so ranking
# is engine-independent.
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.expr(
            "n / SUM(n) OVER (PARTITION BY prev_type)"
        ).alias("prob"),
    )


# Per-user lifetime profile: span, activity density, intensity. One
# partial-aggregated shuffle on user_id; every output is exact integer
# math or a single double division.
def ev_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)"
            ).alias("n_active_days"),
            F.expr(SUM_VALUE).alias("total_value"),
        )
        .select(
            "user_id",
            "first_ts",
            "last_ts",
            F.expr(
                "CAST(datediff(CAST(last_ts AS DATE), CAST(first_ts AS DATE)) AS BIGINT)"
            ).alias("lifetime_days"),
            "n_events",
            "n_active_days",
            F.expr("n_events / n_active_days").alias("events_per_active_day"),
            "total_value",
        )
    )


# Calendar gap-fill: a (day × event_type) spine built from the corpus
# bounds (one tiny agg, broadcast) left-joined against the daily
# counts, missing cells coalesced to zero. The spine side is bounded
# (days × |types|) no matter the corpus size — at 100 TB the only big
# work is the daily agg itself, which partial-aggregates on the scan.
def ev_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(SUM_VALUE).alias("total_value"),
    )
    days = (
        ev.agg(
            F.expr("MIN(CAST(date_trunc('day', ts) AS DATE))").alias("d0"),
            F.expr("MAX(CAST(date_trunc('day', ts) AS DATE))").alias("d1"),
        )
        .select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)
    return spine.join(F.broadcast(daily), ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.expr("COALESCE(n_events, CAST(0 AS BIGINT))").alias("n_events"),
        F.expr("COALESCE(total_value, CAST(0 AS DOUBLE))").alias("total_value"),
    )


QUERIES["ev_transition_matrix"] = ev_transition_matrix
QUERIES["ev_user_lifetime"] = ev_user_lifetime
QUERIES["ev_daily_gapfill"] = ev_daily_gapfill

ORACLES["ev_transition_matrix"] = """
    WITH pairs AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    totals AS (SELECT prev_type, sum(n) AS n_from FROM pairs GROUP BY 1)
    SELECT p.prev_type, p.next_type, p.n, p.n / t.n_from AS prob
    FROM pairs p JOIN totals t USING (prev_type)
"""

ORACLES["ev_user_lifetime"] = """
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               count(*) AS n_events,
               CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
                   AS n_active_days,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    )
    SELECT user_id, first_ts, last_ts,
           CAST(date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE)) AS BIGINT)
               AS lifetime_days,
           n_events, n_active_days,
           n_events / CAST(n_active_days AS DOUBLE) AS events_per_active_day,
           total_value
    FROM per_user
"""

ORACLES["ev_daily_gapfill"] = """
    WITH bounds AS (
        SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
               MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
        FROM events
    ),
    days AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, d.day,
           COALESCE(x.n_events, 0) AS n_events,
           COALESCE(x.total_value, 0.0) AS total_value
    FROM days d
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN daily x ON x.event_type = t.event_type AND x.day = d.day
"""


# A/B experiment readout — users assigned to arms by id parity (the
# deterministic stand-in for an assignment hash), purchase conversion
# compared with a two-proportion z-statistic. The whole readout is ONE
# conditional-aggregate pass: per-user rollup (one shuffle), then a
# single-row wide agg — no per-arm subqueries, no second scan. All
# inputs to the z-stat are exact integer counts, so the statistic is
# bit-identical across engines.
def ev_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)").alias("converted")
    )
    wide = per_user.agg(
        F.expr("SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)").alias("n_a"),
        F.expr("SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)").alias("n_b"),
        F.expr("SUM(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)").alias("conv_a"),
        F.expr("SUM(CASE WHEN user_id % 2 = 1 THEN converted ELSE 0 END)").alias("conv_b"),
    )
    return wide.select(
        F.expr("CAST(n_a AS BIGINT)").alias("n_a"),
        F.expr("CAST(n_b AS BIGINT)").alias("n_b"),
        F.expr("CAST(conv_a AS BIGINT)").alias("conv_a"),
        F.expr("CAST(conv_b AS BIGINT)").alias("conv_b"),
        F.expr("conv_a / n_a").alias("rate_a"),
        F.expr("conv_b / n_b").alias("rate_b"),
        # NULLIF guards the degenerate pooled rates (p = 0 or 1), where
        # the z-stat is undefined — both engines yield NULL.
        F.expr(
            "(conv_a / n_a - conv_b / n_b) / "
            "NULLIF(sqrt((conv_a + conv_b) / (n_a + n_b) "
            "* (1 - (conv_a + conv_b) / (n_a + n_b)) * (1.0 / n_a + 1.0 / n_b)), 0)"
        ).alias("z_stat"),
    )


QUERIES["ev_ab_test"] = ev_ab_test

ORACLES["ev_ab_test"] = """
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    wide AS (
        SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
               SUM(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END) AS conv_a,
               SUM(CASE WHEN user_id % 2 = 1 THEN converted ELSE 0 END) AS conv_b
        FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
           conv_a / CAST(n_a AS DOUBLE) AS rate_a,
           conv_b / CAST(n_b AS DOUBLE) AS rate_b,
           (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE)) /
           NULLIF(sqrt((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)
                * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 / n_a + 1.0 / n_b)), 0) AS z_stat
    FROM wide
"""


# Exponential smoothing (EWMA, α = 0.3) of the daily value series per
# event type — the classic ops-forecasting recurrence s_t = αx_t +
# (1-α)s_{t-1}, which no window frame can express. Formulation: ONE
# shuffle builds the (tiny) per-type day-ordered series as an array,
# then the recurrence is a row-local fold (Spark ``aggregate``, DuckDB
# ``list_reduce``). Series values are exact decimal sums lifted onto a
# 1e-6 integer grid and re-rounded each fold step, so the smoothed
# trajectory is bit-identical across engines and partitionings. Series
# length is bounded by the calendar (days), not the corpus — the array
# never outgrows the executor.
def ev_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(
        F.expr(
            f"CAST(ROUND({SUM_VALUE} * 1000000, 0) AS BIGINT)"
        ).alias("m")
    )
    fold = (
        "aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1), "
        "(acc, x) -> CAST(ROUND(0.3 * x + 0.7 * acc, 0) AS BIGINT))"
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(day, m))), p -> p.m)"
            ).alias("xs")
        )
        .select(
            "event_type",
            F.expr("CAST(size(xs) AS BIGINT)").alias("n_days"),
            F.expr("element_at(xs, -1) / 1e6").alias("last_value"),
            F.expr(f"{fold} / 1e6").alias("smoothed"),
        )
    )


QUERIES["ev_exp_smoothing"] = ev_exp_smoothing

ORACLES["ev_exp_smoothing"] = """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          * 1000000, 0) AS BIGINT) AS m
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, list(m ORDER BY day) AS xs FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(len(xs) AS BIGINT) AS n_days,
           xs[-1] / 1e6 AS last_value,
           list_reduce(xs, (acc, x) ->
               CAST(ROUND(0.3 * x + 0.7 * acc, 0) AS BIGINT)) / 1e6 AS smoothed
    FROM series
"""


# Top behavioral trigram paths — two lags in one per-user window pass,
# then a tiny path-count agg and a TakeOrdered top-10. Shuffle cost:
# one hash partition on user_id + one on the |types|³-bounded paths.
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    return (
        ev.select(
            F.expr(f"lag(event_type, 2) OVER ({w})").alias("e1"),
            F.expr(f"lag(event_type, 1) OVER ({w})").alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .filter(F.col("e1").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


QUERIES["ev_top_paths"] = ev_top_paths

ORACLES["ev_top_paths"] = """
    WITH lagged AS (
        SELECT lag(event_type, 2) OVER w AS e1,
               lag(event_type, 1) OVER w AS e2,
               event_type AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, count(*) AS n
    FROM lagged WHERE e1 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 10
"""


# Bounce rate per day — single-event sessions over total sessions,
# composed on top of the sessionizer (one extra |days|-group agg on the
# already-small session table). Rate is a double division of exact
# integer counts.
def ev_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = ev_sessionize(spark, sf_dir)
    return (
        sessions.groupBy(
            F.expr("CAST(date_trunc('day', t_start) AS DATE)").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.expr("SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)").alias("n_bounce"),
        )
        .select(
            "day",
            "n_sessions",
            F.expr("CAST(n_bounce AS BIGINT)").alias("n_bounce"),
            F.expr("n_bounce / n_sessions").alias("bounce_rate"),
        )
    )


QUERIES["ev_bounce_rate"] = ev_bounce_rate

ORACLES["ev_bounce_rate"] = f"""
    WITH sessions AS ({ORACLES["ev_sessionize"]})
    SELECT CAST(date_trunc('day', t_start) AS DATE) AS day,
           count(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM sessions
    GROUP BY 1
"""


# Windowed funnel — same staged view→click→purchase chain but each
# stage must convert within 24 h of the previous one (real funnels
# always bound the conversion window; unbounded chains overcount).
# Identical one-shuffle array formulation as ev_funnel, with the window
# bound folded into the row-local stage filters.
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
            ).alias("clicks"),
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("purchases"),
        )
        .withColumn(
            "t_click",
            F.expr(
                "get(filter(clicks, x -> x > t_view "
                "AND x <= t_view + INTERVAL 24 HOURS), 0)"
            ),
        )
        .withColumn(
            "t_purchase",
            F.expr(
                "get(filter(purchases, x -> x > t_click "
                "AND x <= t_click + INTERVAL 24 HOURS), 0)"
            ),
        )
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )


QUERIES["ev_funnel_windowed"] = ev_funnel_windowed

ORACLES["ev_funnel_windowed"] = """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(ts) AS t_click FROM events e
               JOIN v USING (user_id)
               WHERE event_type = 'click' AND ts > t_view
                 AND ts <= t_view + INTERVAL 24 HOURS GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
               JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND ts > t_click
                 AND ts <= t_click + INTERVAL 24 HOURS GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase
"""


# New-vs-returning daily split — the canonical growth metric. One
# shuffle computes each user's first-seen day, one shuffle joins it
# back (both on user_id — AQE reuses the partitioning), and the daily
# agg uses conditional count-distincts.
def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.expr("MIN(CAST(date_trunc('day', ts) AS DATE))").alias("first_day")
    )
    return (
        ev.select("user_id", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"))
        .join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(count(DISTINCT CASE WHEN day = first_day THEN user_id END) AS BIGINT)"
            ).alias("n_new_users"),
            F.expr(
                "CAST(count(DISTINCT CASE WHEN day > first_day THEN user_id END) AS BIGINT)"
            ).alias("n_returning_users"),
        )
    )


QUERIES["ev_new_vs_returning"] = ev_new_vs_returning

ORACLES["ev_new_vs_returning"] = """
    WITH first AS (
        SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           CAST(count(DISTINCT CASE WHEN CAST(date_trunc('day', ts) AS DATE) = first_day
                                    THEN e.user_id END) AS BIGINT) AS n_new_users,
           CAST(count(DISTINCT CASE WHEN CAST(date_trunc('day', ts) AS DATE) > first_day
                                    THEN e.user_id END) AS BIGINT) AS n_returning_users
    FROM events e JOIN first USING (user_id)
    GROUP BY 1
"""


# Pareto concentration readout — the smallest user cohort producing
# 50/80/90% of event volume. The cumsum window runs over the
# ALREADY-AGGREGATED per-user table (|users| rows, not facts); at
# extreme user cardinality the same readout would bucket counts into a
# histogram first (equi-depth shape) instead of the exact sort.
def ev_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = per_user.select(
        "n",
        F.expr(
            "SUM(n) OVER (ORDER BY n DESC, user_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ).alias("cum"),
        F.expr("row_number() OVER (ORDER BY n DESC, user_id)").alias("rk"),
        F.expr("SUM(n) OVER ()").alias("total"),
        F.expr("COUNT(*) OVER ()").alias("n_users"),
    )
    out = None
    for pct in (50, 80, 90):
        t = ranked.filter(F.expr(f"cum >= total * {pct} / 100.0")).agg(
            F.expr(f"CAST({pct} AS BIGINT)").alias("volume_pct"),
            F.expr("CAST(MIN(rk) AS BIGINT)").alias("n_top_users"),
            F.expr("MIN(rk) / MAX(n_users)").alias("user_frac"),
        )
        out = t if out is None else out.unionByName(t)
    return out


QUERIES["ev_power_users_pareto"] = ev_power_users_pareto

ORACLES["ev_power_users_pareto"] = """
    WITH per_user AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT n,
               SUM(n) OVER (ORDER BY n DESC, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               row_number() OVER (ORDER BY n DESC, user_id) AS rk,
               SUM(n) OVER () AS total,
               COUNT(*) OVER () AS n_users
        FROM per_user
    )
    SELECT CAST(p.pct AS BIGINT) AS volume_pct,
           CAST(MIN(rk) AS BIGINT) AS n_top_users,
           MIN(rk) / CAST(MAX(n_users) AS DOUBLE) AS user_frac
    FROM ranked CROSS JOIN (SELECT unnest([50, 80, 90]) AS pct) p
    WHERE cum >= total * p.pct / 100.0
    GROUP BY p.pct
"""


# Session-duration histogram — minute-bucketed session lengths with an
# overflow bucket, composed on the sessionizer. The histogram agg runs
# over the (already small) session table.
def ev_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = ev_sessionize(spark, sf_dir)
    return (
        sessions.select(
            F.expr(
                "CAST(LEAST(FLOOR((unix_micros(t_end) - unix_micros(t_start)) "
                "/ 60e6 / 5), 6) AS BIGINT)"
            ).alias("bucket_5min")
        )
        .groupBy("bucket_5min")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


QUERIES["ev_session_durations"] = ev_session_durations

ORACLES["ev_session_durations"] = f"""
    WITH sessions AS ({ORACLES["ev_sessionize"]})
    SELECT CAST(LEAST(FLOOR((epoch_us(t_end) - epoch_us(t_start))
                            / 60e6 / 5), 6) AS BIGINT) AS bucket_5min,
           count(*) AS n_sessions
    FROM sessions
    GROUP BY 1
"""


# ------------------------------------------------------ sketch operators
#
# Count-Min Sketch + Bloom filter: the two classic fixed-memory stream
# summaries Spark has no built-in for. Both are md5-grid deterministic
# (functions/hashing.py), so unlike most sketch implementations they are
# EXACTLY replayable by the SQL oracle — the estimate itself is checked,
# not just a bound. At 100 TB the sketch tables are O(D·W) / O(M) rows
# regardless of input size: they broadcast, and the input is touched in
# one aggregation pass.
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.hashing import (  # noqa: E402
    SPARK_HASH_SQL,
    STABLE_HASH_SQL,
)

CMS_D = 4      # hash rows (seeds)
CMS_W = 256    # buckets per row


def _cms_bucket_spark(d: int) -> str:
    h = SPARK_HASH_SQL(f"CONCAT('cms{d}:', CAST(user_id AS STRING))")
    return f"pmod({h}, {CMS_W})"


def _cms_bucket_duck(d: int) -> str:
    h = STABLE_HASH_SQL(f"('cms{d}:' || CAST(user_id AS VARCHAR))")
    return f"{h} % {CMS_W}"


def ev_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by event count, with their Count-Min estimate.

    One pass builds exact per-user counts; the CMS is the (d, bucket)
    roll-up of those counts (equivalent to streaming increments, since
    addition is associative). Estimates = min over the D rows of the
    user's bucket counters — `cms_sound` asserts the CMS overcount
    invariant est ≥ exact, and the oracle replays the exact same grid.
    The top-10 is TakeOrdered (distributed), not a global window sort.
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    hashed = per_user.select(
        "user_id",
        "n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_cms_bucket_spark(d)).alias("bucket"),
                )
                for d in range(CMS_D)
            ])
        ).alias("h"),
    ).select("user_id", "n", "h.d", "h.bucket")
    sketch = hashed.groupBy("d", "bucket").agg(F.sum("n").alias("cnt"))
    est = (
        hashed.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"), F.max("n").alias("n_exact"))
    )
    top = est.orderBy(F.col("n_exact").desc(), F.col("user_id")).limit(10)
    return top.select(
        "user_id",
        "n_exact",
        "cms_est",
        F.expr("cms_est >= n_exact").alias("cms_sound"),
    )


BLOOM_K = 3     # hash functions
BLOOM_M = 4096  # bit positions


def _bloom_bit_spark(k: int) -> str:
    h = SPARK_HASH_SQL(f"CONCAT('bf{k}:', CAST(user_id AS STRING))")
    return f"pmod({h}, {BLOOM_M})"


def _bloom_bit_duck(k: int) -> str:
    h = STABLE_HASH_SQL(f"('bf{k}:' || CAST(user_id AS VARCHAR))")
    return f"{h} % {BLOOM_M}"


def ev_bloom_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day new-vs-seen triage through a Bloom filter trained on the
    corpus's first day of users.

    The bit set is the distinct bit table of the day-1 users (≤ K·n
    rows, broadcast); a later user is a bloom-positive iff all K of its
    bits are present. Emits exact seen counts next to bloom positives
    and false positives — `bloom_sound` checks the no-false-negative
    guarantee (positives ⊇ actually-seen). Everything is one pass over
    events + broadcast joins against tiny bit/user tables.
    """
    ev = table(spark, sf_dir, "events")
    # Materialized once: day0, the train set, and the probe set all
    # derive from it — without the checkpoint the plan scans events
    # three times (at 100 TB you'd write this table, not re-derive it).
    user_days = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .localCheckpoint()
    )
    day0 = user_days.agg(F.min("day").alias("day0"))
    train = (
        user_days.join(F.broadcast(day0), F.col("day") == F.col("day0"))
        .select("user_id")
        .distinct()
    )
    bits = (
        train.select(
            F.explode(
                F.array(*[F.expr(_bloom_bit_spark(k)) for k in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )
    later = user_days.join(F.broadcast(day0), F.col("day") > F.col("day0")).select(
        "user_id", "day"
    )
    probes = later.select(
        "user_id",
        "day",
        F.explode(
            F.array(*[F.expr(_bloom_bit_spark(k)) for k in range(BLOOM_K)])
        ).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits.withColumn("present", F.lit(1))), "bit", "left")
        .groupBy("user_id", "day")
        .agg(F.expr(f"count(present) = {BLOOM_K}").alias("bloom_pos"))
    )
    seen = hits.join(
        F.broadcast(train.withColumn("is_seen", F.lit(1))), "user_id", "left"
    )
    return (
        seen.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr(
                "CAST(SUM(CASE WHEN is_seen = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_seen_exact"),
            F.expr(
                "CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_bloom_pos"),
            F.expr(
                "CAST(SUM(CASE WHEN bloom_pos AND is_seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_false_pos"),
            F.expr(
                "SUM(CASE WHEN is_seen = 1 AND NOT bloom_pos THEN 1 ELSE 0 END) = 0"
            ).alias("bloom_sound"),
        )
    )


QUERIES["ev_cms_heavy_hitters"] = ev_cms_heavy_hitters
QUERIES["ev_bloom_new_users"] = ev_bloom_new_users


def _cms_oracle() -> str:
    rows = "\n            UNION ALL ".join(
        f"SELECT user_id, n, {d} AS d, {_cms_bucket_duck(d)} AS bucket FROM per_user"
        for d in range(CMS_D)
    )
    return f"""
        WITH per_user AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY user_id
        ),
        hashed AS (
            {rows}
        ),
        sketch AS (
            SELECT d, bucket, CAST(sum(n) AS BIGINT) AS cnt
            FROM hashed GROUP BY d, bucket
        ),
        est AS (
            SELECT h.user_id, min(s.cnt) AS cms_est, max(h.n) AS n_exact
            FROM hashed h JOIN sketch s USING (d, bucket)
            GROUP BY h.user_id
        )
        SELECT user_id, n_exact, cms_est, cms_est >= n_exact AS cms_sound
        FROM est
        ORDER BY n_exact DESC, user_id
        LIMIT 10
    """


def _bloom_oracle() -> str:
    train_bits = "\n            UNION ".join(
        f"SELECT DISTINCT {_bloom_bit_duck(k)} AS bit FROM train"
        for k in range(BLOOM_K)
    )
    probe_bits = "\n            UNION ALL ".join(
        f"SELECT user_id, day, {_bloom_bit_duck(k)} AS bit FROM later"
        for k in range(BLOOM_K)
    )
    return f"""
        WITH user_days AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        day0 AS (SELECT min(day) AS d0 FROM user_days),
        train AS (
            SELECT DISTINCT user_id FROM user_days, day0 WHERE day = d0
        ),
        bits AS (
            {train_bits}
        ),
        later AS (
            SELECT user_id, day FROM user_days, day0 WHERE day > d0
        ),
        probes AS (
            {probe_bits}
        ),
        hits AS (
            SELECT p.user_id, p.day,
                   count(b.bit) = {BLOOM_K} AS bloom_pos
            FROM probes p LEFT JOIN bits b USING (bit)
            GROUP BY p.user_id, p.day
        )
        SELECT CAST(h.day AS TIMESTAMP) AS day,
               count(*) AS n_users,
               CAST(SUM(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen_exact,
               CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos,
               CAST(SUM(CASE WHEN bloom_pos AND t.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               SUM(CASE WHEN t.user_id IS NOT NULL AND NOT bloom_pos THEN 1 ELSE 0 END) = 0 AS bloom_sound
        FROM hits h LEFT JOIN train t USING (user_id)
        GROUP BY h.day
    """


ORACLES["ev_cms_heavy_hitters"] = _cms_oracle()
ORACLES["ev_bloom_new_users"] = _bloom_oracle()


# Rolling 7-day active users — the sliding-window DISTINCT shape.
# COUNT(DISTINCT) can't ride a window frame, so each (user, day) pair
# CONTRIBUTES itself to the 7 calendar days it covers (explode of a
# 7-element sequence) and a plain per-day distinct count finishes. At
# 100 TB the exploded table is 7× the distinct user-day table — a
# linear, shuffle-friendly blowup (vs a self-join per window day), and
# the distinct agg is map-side combined.
def ev_rolling_dau_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Materialized once: both the bounds agg and the window fanout read
    # it (otherwise the plan scans events twice).
    user_days = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .localCheckpoint()
    )
    bounds = user_days.agg(
        F.min("day").alias("d_min"), F.max("day").alias("d_max")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("win_day"),
    )
    return (
        contrib.join(
            F.broadcast(bounds),
            (F.col("win_day") >= F.col("d_min")) & (F.col("win_day") <= F.col("d_max")),
        )
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("dau_7d"))
        .select(F.col("win_day").alias("day"), "dau_7d")
    )


QUERIES["ev_rolling_dau_7d"] = ev_rolling_dau_7d

ORACLES["ev_rolling_dau_7d"] = """
    WITH user_days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    bounds AS (SELECT min(day) AS d_min, max(day) AS d_max FROM user_days),
    contrib AS (
        SELECT user_id, day + to_days(CAST(o AS INTEGER)) AS win_day
        FROM user_days, unnest(range(0, 7)) AS t(o)
    )
    SELECT CAST(win_day AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS dau_7d
    FROM contrib, bounds
    WHERE win_day BETWEEN d_min AND d_max
    GROUP BY win_day
"""


# --------------------------------------------------- activity streaks
#
# Longest consecutive-day activity streak per user — the classic
# gaps-and-islands window: distinct (user, day), number the days per
# user, and day − row_number is CONSTANT within one consecutive run, so
# grouping on it isolates every streak without a self-join. Plan: one
# partial-agg shuffle for the distinct user-day set, then the window
# and both aggs all ride the same user_id hash partitioning (no further
# exchange). Streak state is never materialized per event — only per
# active user-day — so the plan scales with distinct activity, not
# event volume.
def ev_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day")
    ).distinct()
    runs = days.withColumn(
        "grp", F.expr("date_sub(day, CAST(row_number() OVER "
                      "(PARTITION BY user_id ORDER BY day) AS INT))")
    )
    streaks = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.expr("CAST(SUM(len) AS BIGINT)").alias("n_active_days"),
        F.expr("CAST(MAX(len) AS BIGINT)").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


QUERIES["ev_activity_streaks"] = ev_activity_streaks

ORACLES["ev_activity_streaks"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    runs AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER
                          (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS len FROM runs GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           count(*) AS n_streaks
    FROM streaks GROUP BY user_id
"""


# ------------------------------------------------- DAU/MAU stickiness
#
# Monthly product-stickiness readout: average daily active users over
# the month divided by the month's distinct actives. Two count-distinct
# aggregates over the same scan — per (month, day) and per month — then
# a broadcast join of two tiny rollups; the division is written
# identically in both engines. At 100 TB both distincts partial-agg on
# (period, user) pairs; no per-user state ever reaches the driver.
def ev_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    daily = (
        ev.groupBy("month", "day")
        .agg(F.countDistinct("user_id").alias("dau"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("CAST(SUM(dau) AS BIGINT)").alias("sum_dau"),
        )
    )
    monthly = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        daily.join(F.broadcast(monthly), "month")
        .select(
            "month",
            "n_days",
            "mau",
            F.expr("CAST(ROUND(sum_dau / n_days * 1e6) AS BIGINT)")
            .alias("avg_dau"),
            F.expr("CAST(ROUND(sum_dau / n_days / mau * 1e6) AS BIGINT)")
            .alias("stickiness"),
        )
    )


QUERIES["ev_dau_stickiness"] = ev_dau_stickiness

ORACLES["ev_dau_stickiness"] = """
    WITH daily AS (
        SELECT date_trunc('month', ts) AS month,
               date_trunc('day', ts) AS day,
               count(DISTINCT user_id) AS dau
        FROM events GROUP BY 1, 2
    ),
    per_month AS (
        SELECT month, count(*) AS n_days,
               CAST(SUM(dau) AS BIGINT) AS sum_dau
        FROM daily GROUP BY month
    ),
    monthly AS (
        SELECT date_trunc('month', ts) AS month,
               count(DISTINCT user_id) AS mau
        FROM events GROUP BY 1
    )
    SELECT CAST(p.month AS TIMESTAMP) AS month, p.n_days, m.mau,
           CAST(ROUND(p.sum_dau / CAST(p.n_days AS DOUBLE) * 1e6)
                AS BIGINT) AS avg_dau,
           CAST(ROUND(p.sum_dau / CAST(p.n_days AS DOUBLE) / m.mau * 1e6)
                AS BIGINT) AS stickiness
    FROM per_month p JOIN monthly m USING (month)
"""


# ------------------------------------------------ robust MAD anomalies
#
# Median-absolute-deviation anomaly flags — the robust twin of
# ev_daily_anomaly's z-score: median and MAD don't move when the
# anomalies themselves inflate the baseline (the classic failure of
# mean/stddev flagging). Two tiny aggregates over the DAILY rollup
# (|days| rows, never the event table): median of counts, then median
# of |count − median|; both medians interpolate over integer counts,
# so the doubles are bit-identical across engines. A day is anomalous
# when |count − median| > 3 × 1.4826 × MAD (the normal-consistent
# scale). Zero-MAD degenerates to flagging any deviation.
def ev_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    med = daily.agg(F.expr("percentile(n_events, 0.5)").alias("med"))
    dev = daily.join(F.broadcast(med)).select(
        "day", "n_events", "med", F.expr("abs(n_events - med)").alias("adev")
    )
    mad = dev.agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            F.expr("CAST(ROUND(med * 1e6) AS BIGINT)").alias("median_events"),
            F.expr("CAST(ROUND(mad * 1e6) AS BIGINT)").alias("mad"),
            F.expr("adev > 3 * 1.4826 * mad").alias("is_anomaly"),
        )
    )


QUERIES["ev_daily_anomaly_mad"] = ev_daily_anomaly_mad

ORACLES["ev_daily_anomaly_mad"] = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n_events
        FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM daily),
    dev AS (
        SELECT day, n_events, med, abs(n_events - med) AS adev
        FROM daily CROSS JOIN med
    ),
    mad AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
    SELECT CAST(day AS TIMESTAMP) AS day, n_events,
           CAST(ROUND(med * 1e6) AS BIGINT) AS median_events,
           CAST(ROUND(mad * 1e6) AS BIGINT) AS mad,
           adev > 3 * 1.4826 * mad AS is_anomaly
    FROM dev CROSS JOIN mad
"""


# ---------------------------------------------- Holt trend forecasting
#
# Holt's linear (double exponential) smoothing per event type: level
# AND trend recurrences (α = β = 0.3) over the daily value series —
# the step up from ev_exp_smoothing when the series drifts. Same
# 100 TB shape as the EWMA: one shuffle builds each type's day-ordered
# series (bounded by the calendar, never the corpus), then the
# recurrence is a row-local struct-state fold on the 1e-6 integer
# grid, re-rounded each step so the (level, trend) trajectory is
# bit-identical across engines — the DuckDB oracle unrolls the same
# recurrence with a recursive CTE. l' appears twice inside the lambda
# (HOFs have no let-binding); both copies are the same expression, so
# they evaluate to the same rounded value.
def ev_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(
        F.expr(
            f"CAST(ROUND({SUM_VALUE} * 1000000, 0) AS BIGINT)"
        ).alias("m")
    )
    lp = "CAST(ROUND(0.3 * x + 0.7 * (acc.l + acc.b), 0) AS BIGINT)"
    fold = (
        "aggregate(slice(xs, 3, size(xs) - 2), "
        "named_struct('l', element_at(xs, 2), "
        "'b', element_at(xs, 2) - element_at(xs, 1)), "
        f"(acc, x) -> named_struct('l', {lp}, "
        f"'b', CAST(ROUND(0.3 * ({lp} - acc.l) + 0.7 * acc.b, 0) AS BIGINT)))"
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(day, m))), p -> p.m)"
            ).alias("xs")
        )
        .filter(F.expr("size(xs) >= 2"))
        # fold once into a struct column, then project — four inline
        # copies would each re-run the whole recurrence wherever
        # common-subexpression elimination doesn't fire
        .select(
            "event_type",
            F.expr("CAST(size(xs) AS BIGINT)").alias("n_days"),
            F.expr(fold).alias("s"),
        )
        .select(
            "event_type",
            "n_days",
            F.expr("s.l / 1e6").alias("level"),
            F.expr("s.b / 1e6").alias("trend"),
            F.expr("(s.l + s.b) / 1e6").alias("forecast_next"),
        )
    )


QUERIES["ev_holt_forecast"] = ev_holt_forecast

ORACLES["ev_holt_forecast"] = """
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          * 1000000, 0) AS BIGINT) AS m
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
               m
        FROM daily
    ),
    n AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
    rec(event_type, i, l, b) AS (
        SELECT x2.event_type, 2, x2.m, x2.m - x1.m
        FROM idx x2
        JOIN idx x1 ON x1.event_type = x2.event_type AND x1.i = 1
        WHERE x2.i = 2
        UNION ALL
        SELECT r.event_type, r.i + 1,
               CAST(ROUND(0.3 * x.m + 0.7 * (r.l + r.b), 0) AS BIGINT),
               CAST(ROUND(0.3 * (CAST(ROUND(0.3 * x.m + 0.7 * (r.l + r.b), 0)
                                      AS BIGINT) - r.l)
                          + 0.7 * r.b, 0) AS BIGINT)
        FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
    )
    SELECT r.event_type, CAST(n.n AS BIGINT) AS n_days,
           r.l / 1e6 AS level, r.b / 1e6 AS trend,
           (r.l + r.b) / 1e6 AS forecast_next
    FROM rec r JOIN n USING (event_type)
    WHERE r.i = n.n AND n.n >= 2
"""


# ------------------------------------------- mergeable HLL weekly WAU
#
# The sketch-MERGE pattern that makes approx-distinct work at 100 TB:
# build one Datasketches HLL per (week, day) partial (hll_sketch_agg —
# partial-aggregable, so the map side combines before the shuffle),
# then UNION the daily sketches into weekly WAU (hll_union_agg) without
# ever re-touching raw events. Re-aggregation is what plain
# approx_count_distinct can't do — its estimate isn't mergeable across
# a different grouping, while sketches union losslessly: day partials
# serve DAU, their unions serve WAU/MAU, and a 1000-executor rollup
# ships kilobyte sketches instead of user-id sets. The estimate gate
# (4σ-style bound vs the exact WAU, small groups accepted outright) is
# checked as data, same as ev_daily_active_approx (events.py:300).
HLL_LGK = 14  # 2^14 registers → rsd ≈ 1.04/√2^14 ≈ 0.8%; 4σ ≈ 3.3%


def ev_hll_union_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("sk"),
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )
    weekly = daily.groupBy("week").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("wau_est"),
        F.sum("dau").alias("sum_daily_dau"),
        F.sum("n_events").alias("n_events"),
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.countDistinct("user_id").alias("wau_exact")
    )
    return weekly.join(exact, "week").select(
        "week",
        "wau_exact",
        "sum_daily_dau",
        "n_events",
        F.expr(
            "abs(wau_est - wau_exact) <= greatest(0.04 * wau_exact, 4.0)"
        ).alias("sketch_ok"),
        # a user active on several days is counted once by the sketch
        # union but once PER DAY by the naive daily-DAU sum — the gap
        # is the whole point of mergeable sketches
        (F.col("sum_daily_dau") >= F.col("wau_exact")).alias("union_dedups"),
    )


QUERIES["ev_hll_union_weekly"] = ev_hll_union_weekly

ORACLES["ev_hll_union_weekly"] = """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               COUNT(DISTINCT user_id) AS wau_exact,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    ),
    daily AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY date_trunc('week', ts), date_trunc('day', ts)
    )
    SELECT w.week, w.wau_exact,
           (SELECT SUM(dau) FROM daily d WHERE d.week = w.week)
               AS sum_daily_dau,
           w.n_events,
           TRUE AS sketch_ok,
           TRUE AS union_dedups
    FROM weekly w
"""


# ------------------------------------------ mergeable KLL quantiles
#
# The quantile analog of ev_hll_union_weekly: one KLL sketch per
# (week, day) partial (kll_sketch_agg_double — mergeable, map-side
# combined), then kll_merge_agg_double folds the day partials into
# weekly p50/p90/p99 WITHOUT re-scanning raw events. This is what
# approx_percentile's opaque result can't do — re-aggregate to a
# coarser grouping — and at 100 TB it's the difference between a
# kilobyte-sketch rollup and a second full pass. Gate: the KLL value
# must land inside the exact [p−0.03, p+0.03] rank bracket (KLL k=200
# has ~1.7% one-sided normalized rank error; 0.03 is a ~2× margin),
# small weeks accepted outright — same statistical-gate design as
# ev_percentiles_approx (events.py:322).
KLL_K = 200
_KLL_MIN_N = 200


def ev_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.expr(
            f"kll_sketch_agg_double(CAST(value AS DOUBLE), {KLL_K})"
        ).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    weekly = daily.groupBy("week").agg(
        F.expr("kll_merge_agg_double(sk)").alias("sk"),
        F.sum("n").alias("n"),
    ).select(
        "week", "n",
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("kp50"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.9)").alias("kp90"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.99)").alias("kp99"),
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.expr(
            "percentile(CAST(value AS DOUBLE), "
            "array(0.47, 0.53, 0.87, 0.93, 0.96, 1.0))"
        ).alias("ex")
    )
    return weekly.join(exact, "week").select(
        "week",
        "n",
        F.expr(f"n < {_KLL_MIN_N} OR kp50 BETWEEN ex[0] AND ex[1]").alias("p50_ok"),
        F.expr(f"n < {_KLL_MIN_N} OR kp90 BETWEEN ex[2] AND ex[3]").alias("p90_ok"),
        F.expr(f"n < {_KLL_MIN_N} OR kp99 BETWEEN ex[4] AND ex[5]").alias("p99_ok"),
    )


QUERIES["ev_kll_quantile_merge"] = ev_kll_quantile_merge

ORACLES["ev_kll_quantile_merge"] = """
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           COUNT(*) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM events GROUP BY 1
"""


# --------------------------------------------- Theta sketch set ops
#
# Audience overlap via Theta sketches: distinct clickers vs buyers as
# two sketches, then UNION / INTERSECTION / DIFFERENCE estimated from
# the sketches alone — the adtech audience calculus. HLL can only
# union; Theta's KMV-style samples support all three set ops on
# kilobyte summaries, so segment overlap at 100 TB needs one scan per
# segment ever, not a distinct-join per question. Estimates are gated
# against the exact overlap counts (4σ-style relative bound, tiny
# segments accepted outright).
def ev_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sk = ev.filter(F.col("event_type").isin("click", "purchase")).agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' "
            "THEN user_id END)"
        ).alias("sk_click"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' "
            "THEN user_id END)"
        ).alias("sk_buy"),
    )
    est = sk.select(
        F.expr("theta_sketch_estimate(sk_click)").alias("est_click"),
        F.expr("theta_sketch_estimate(sk_buy)").alias("est_buy"),
        F.expr(
            "theta_sketch_estimate(theta_union(sk_click, sk_buy))"
        ).alias("est_union"),
        F.expr(
            "theta_sketch_estimate(theta_intersection(sk_click, sk_buy))"
        ).alias("est_inter"),
        F.expr(
            "theta_sketch_estimate(theta_difference(sk_click, sk_buy))"
        ).alias("est_diff"),
    )
    exact = ev.agg(
        F.countDistinct(
            F.expr("CASE WHEN event_type = 'click' THEN user_id END")
        ).alias("n_click"),
        F.countDistinct(
            F.expr("CASE WHEN event_type = 'purchase' THEN user_id END")
        ).alias("n_buy"),
        F.countDistinct(
            F.expr(
                "CASE WHEN event_type IN ('click', 'purchase') "
                "THEN user_id END"
            )
        ).alias("n_union"),
    )
    gate = "abs({e} - {x}) <= greatest(0.05 * {s}, 4.0)"
    # Set-op estimate error scales with the UNION size (the sketches
    # being combined), NOT the result size — a small overlap of two
    # big segments has union-sized noise, so the inter/diff gates
    # scale their tolerance by n_union or they'd false-fail exactly
    # when overlaps are interesting (small relative to the segments).
    return est.crossJoin(exact).select(
        "n_click",
        "n_buy",
        "n_union",
        (F.col("n_click") + F.col("n_buy") - F.col("n_union"))
        .alias("n_inter"),
        F.expr(gate.format(e="est_click", x="n_click", s="n_click"))
        .alias("click_ok"),
        F.expr(gate.format(e="est_buy", x="n_buy", s="n_buy"))
        .alias("buy_ok"),
        F.expr(gate.format(e="est_union", x="n_union", s="n_union"))
        .alias("union_ok"),
        F.expr(
            gate.format(e="est_inter", x="(n_click + n_buy - n_union)",
                        s="n_union")
        ).alias("inter_ok"),
        F.expr(
            gate.format(e="est_diff", x="(n_union - n_buy)", s="n_union")
        ).alias("diff_ok"),
    )


QUERIES["ev_theta_audience_overlap"] = ev_theta_audience_overlap

ORACLES["ev_theta_audience_overlap"] = """
    WITH x AS (
        SELECT COUNT(DISTINCT CASE WHEN event_type = 'click'
                                   THEN user_id END) AS n_click,
               COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                   THEN user_id END) AS n_buy,
               COUNT(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                                   THEN user_id END) AS n_union
        FROM events
    )
    SELECT n_click, n_buy, n_union,
           n_click + n_buy - n_union AS n_inter,
           TRUE AS click_ok, TRUE AS buy_ok, TRUE AS union_ok,
           TRUE AS inter_ok, TRUE AS diff_ok
    FROM x
"""


# ------------------------------------- Holt-Winters seasonal forecast
#
# Triple exponential smoothing (additive, period 7 — weekly shape on
# daily series), extending ev_holt_forecast (events.py) with a rotating
# 7-slot seasonal state. Same distributed contract as Holt: the per-day
# aggregation is the only data-sized shuffle; the recurrence folds the
# tiny per-group day array (one row per group per day — thousands of
# entries at ANY corpus size) inside one aggregate HOF, all on an exact
# 1e-6 integer grid with explicit ROUND at every assignment so the
# DuckDB recursive-CTE oracle replays it bit-for-bit. Seasonal init =
# first-week deviations from the first-week mean; trend init = 0.
HW_PERIOD = 7


def ev_holtwinters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    P = HW_PERIOD
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(
        F.expr(
            f"CAST(ROUND({SUM_VALUE} * 1000000, 0) AS BIGINT)"
        ).alias("m")
    )
    s7 = "element_at(acc.s, 1)"
    lp = (
        f"CAST(ROUND(0.3 * (x - {s7}) + 0.7 * (acc.l + acc.b), 0) AS BIGINT)"
    )
    bp = f"CAST(ROUND(0.2 * ({lp} - acc.l) + 0.8 * acc.b, 0) AS BIGINT)"
    sp = f"CAST(ROUND(0.1 * (x - {lp}) + 0.9 * {s7}, 0) AS BIGINT)"
    fold = (
        f"aggregate(slice(xs, {P + 1}, size(xs) - {P}), "
        "named_struct('l', l0, 'b', CAST(0 AS BIGINT), 's', s0), "
        f"(acc, x) -> named_struct('l', {lp}, 'b', {bp}, "
        f"'s', concat(slice(acc.s, 2, {P - 1}), array({sp}))))"
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(day, m))), p -> p.m)"
            ).alias("xs")
        )
        .filter(F.expr(f"size(xs) >= {2 * P}"))
        .withColumn(
            "l0",
            F.expr(
                f"CAST(ROUND(aggregate(slice(xs, 1, {P}), CAST(0 AS BIGINT), "
                f"(a, v) -> a + v) / {P}.0, 0) AS BIGINT)"
            ),
        )
        .withColumn("s0", F.expr(f"transform(slice(xs, 1, {P}), v -> v - l0)"))
        .select(
            "event_type",
            F.expr("CAST(size(xs) AS BIGINT)").alias("n_days"),
            F.expr(fold).alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.expr("st.l / 1e6").alias("level"),
            F.expr("st.b / 1e6").alias("trend"),
            F.expr("element_at(st.s, 1) / 1e6").alias("season_next"),
            F.expr(
                "(st.l + st.b + element_at(st.s, 1)) / 1e6"
            ).alias("forecast_next"),
        )
    )


QUERIES["ev_holtwinters_forecast"] = ev_holtwinters_forecast

_HW_LP = ("CAST(ROUND(0.3 * (x.m - r.s[1]) + 0.7 * (r.l + r.b), 0) "
          "AS BIGINT)")

ORACLES["ev_holtwinters_forecast"] = f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          * 1000000, 0) AS BIGINT) AS m
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
               m
        FROM daily
    ),
    n AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
    init AS (
        SELECT i.event_type,
               CAST(ROUND(SUM(i.m) / {HW_PERIOD}.0, 0) AS BIGINT) AS l0,
               list(i.m ORDER BY i.i) AS w1
        FROM idx i WHERE i.i <= {HW_PERIOD}
        GROUP BY i.event_type
    ),
    rec(event_type, i, l, b, s) AS (
        SELECT init.event_type, {HW_PERIOD}, init.l0, CAST(0 AS BIGINT),
               list_transform(init.w1, v -> v - init.l0)
        FROM init JOIN n USING (event_type) WHERE n.n >= {2 * HW_PERIOD}
        UNION ALL
        SELECT r.event_type, r.i + 1,
               {_HW_LP},
               CAST(ROUND(0.2 * ({_HW_LP} - r.l) + 0.8 * r.b, 0) AS BIGINT),
               list_slice(r.s, 2, {HW_PERIOD})
                   || [CAST(ROUND(0.1 * (x.m - {_HW_LP}) + 0.9 * r.s[1], 0)
                            AS BIGINT)]
        FROM rec r JOIN idx x ON x.event_type = r.event_type
                             AND x.i = r.i + 1
    )
    SELECT r.event_type, CAST(n.n AS BIGINT) AS n_days,
           r.l / 1e6 AS level, r.b / 1e6 AS trend,
           r.s[1] / 1e6 AS season_next,
           (r.l + r.b + r.s[1]) / 1e6 AS forecast_next
    FROM rec r JOIN n USING (event_type)
    WHERE r.i = n.n AND n.n >= {2 * HW_PERIOD}
"""


# ------------------------------------------------ SLO burn-rate alert
#
# Multi-window error-budget burn (the SRE alerting pattern: page only
# when BOTH a fast and a slow window burn hot, killing flappy alerts):
# per-hour error rate over the 'error' event share, normalized by the
# SLO budget, joined to the enclosing day's burn. Two partial-agg
# shuffles (hour, day) + a broadcast of the tiny day table — the day
# side has one row per day regardless of corpus size, so the join
# never shuffles the hourly side a second time.
SLO_ERROR_BUDGET = 0.25  # tolerated error share
SLO_FAST_BURN = 1.50     # hourly burn threshold
SLO_SLOW_BURN = 0.90     # daily burn threshold


def ev_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    err = "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)"
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(err).alias("n_errors"),
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_day"),
        F.expr(err).alias("err_day"),
    )
    return (
        hourly.withColumn("day", F.expr("date_trunc('day', hour)"))
        .join(F.broadcast(daily), "day")
        .select(
            "hour",
            "n_events",
            "n_errors",
            F.expr(
                f"CAST(ROUND(n_errors / n_events / {SLO_ERROR_BUDGET} "
                "* 1e6) AS BIGINT)"
            ).alias("burn_1h"),
            F.expr(
                f"CAST(ROUND(err_day / n_day / {SLO_ERROR_BUDGET} "
                "* 1e6) AS BIGINT)"
            ).alias("burn_1d"),
            F.expr(
                f"n_errors / n_events / {SLO_ERROR_BUDGET} > {SLO_FAST_BURN} "
                f"AND err_day / n_day / {SLO_ERROR_BUDGET} > {SLO_SLOW_BURN}"
            ).alias("page"),
        )
    )


QUERIES["ev_slo_burn_rate"] = ev_slo_burn_rate

ORACLES["ev_slo_burn_rate"] = f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM events GROUP BY 1
    ),
    daily AS (
        SELECT date_trunc('day', ts) AS day,
               COUNT(*) AS n_day,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS err_day
        FROM events GROUP BY 1
    )
    SELECT CAST(h.hour AS TIMESTAMP) AS hour, h.n_events, h.n_errors,
           CAST(ROUND(h.n_errors / CAST(h.n_events AS DOUBLE)
                 / {SLO_ERROR_BUDGET} * 1e6) AS BIGINT) AS burn_1h,
           CAST(ROUND(d.err_day / CAST(d.n_day AS DOUBLE)
                 / {SLO_ERROR_BUDGET} * 1e6) AS BIGINT) AS burn_1d,
           h.n_errors / CAST(h.n_events AS DOUBLE) / {SLO_ERROR_BUDGET}
               > {SLO_FAST_BURN}
           AND d.err_day / CAST(d.n_day AS DOUBLE) / {SLO_ERROR_BUDGET}
               > {SLO_SLOW_BURN} AS page
    FROM hourly h JOIN daily d ON date_trunc('day', h.hour) = d.day
"""


# ------------------------------------------- funnel conversion latency
#
# How long conversion takes, not just whether it happens (the
# complement of ev_funnel): per user, the first 'signup' and the first
# 'purchase' AT OR AFTER it; report the latency distribution
# (n, median/p90 minutes, fastest, slowest) per signup day. Two
# per-user min-aggregations (conditional min avoids a join between the
# stage streams — one shuffle on user_id), then a per-day exact
# percentile agg over the converted users. At 100 TB the percentile
# swaps to approx_percentile in the same plan (the registry's standard
# exact-twin convention).
def ev_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "MIN(CASE WHEN event_type = 'signup' THEN ts END)"
            ).alias("t_signup"),
        )
    )
    # the signup side is per-USER — unbounded, so it joins by hash on
    # user_id (never a forced broadcast, which would cap out at scale)
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.filter(F.col("t_signup").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        first_purchase
        .withColumn(
            "latency_min",
            F.expr(
                "CAST(unix_micros(t_purchase) - unix_micros(t_signup) "
                "AS DOUBLE) / 60e6"
            ),
        )
        .groupBy(F.date_trunc("day", "t_signup").alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr("CAST(ROUND(percentile(latency_min, 0.5) * 1e6) "
                   "AS BIGINT)").alias("p50_min"),
            F.expr("CAST(ROUND(percentile(latency_min, 0.9) * 1e6) "
                   "AS BIGINT)").alias("p90_min"),
            F.expr("CAST(ROUND(MIN(latency_min) * 1e6) AS BIGINT)")
            .alias("fastest_min"),
            F.expr("CAST(ROUND(MAX(latency_min) * 1e6) AS BIGINT)")
            .alias("slowest_min"),
        )
    )


QUERIES["ev_funnel_latency"] = ev_funnel_latency

ORACLES["ev_funnel_latency"] = """
    WITH signups AS (
        SELECT user_id, MIN(ts) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    conv AS (
        SELECT s.user_id, s.t_signup, MIN(e.ts) AS t_purchase
        FROM signups s
        JOIN events e ON e.user_id = s.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts >= s.t_signup
        GROUP BY s.user_id, s.t_signup
    )
    SELECT CAST(date_trunc('day', t_signup) AS TIMESTAMP) AS signup_day,
           COUNT(*) AS n_converted,
           CAST(ROUND(quantile_cont(CAST(epoch_us(t_purchase - t_signup)
                               AS DOUBLE) / 60e6, 0.5) * 1e6)
                AS BIGINT) AS p50_min,
           CAST(ROUND(quantile_cont(CAST(epoch_us(t_purchase - t_signup)
                               AS DOUBLE) / 60e6, 0.9) * 1e6)
                AS BIGINT) AS p90_min,
           CAST(ROUND(MIN(CAST(epoch_us(t_purchase - t_signup) AS DOUBLE)
                          / 60e6) * 1e6) AS BIGINT) AS fastest_min,
           CAST(ROUND(MAX(CAST(epoch_us(t_purchase - t_signup) AS DOUBLE)
                          / 60e6) * 1e6) AS BIGINT) AS slowest_min
    FROM conv GROUP BY 1
"""


# --------------------------------------------- inter-arrival analysis
#
# Inter-event-time distribution per event type: lag-diff within each
# (type, user) ordered stream — the telemetry readout behind rate
# limiting, heartbeat tuning, and bot detection. The window partitions
# by (event_type, user_id), so sorted runs are bounded by one user's
# activity (never a global sort); the percentile agg on top is exact
# for the oracle, approx at scale per the registry convention.
def ev_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # gap_us stays an exact BIGINT so the mean's cross-row sum is
    # integer (order-independent); gap_min is derived per-row for the
    # percentile/max, and every output lands on the ppm integer grid.
    gaps = (
        ev.select(
            "event_type",
            "user_id",
            F.expr(
                "unix_micros(ts) - unix_micros(LAG(ts) OVER ("
                "PARTITION BY event_type, user_id "
                "ORDER BY ts, event_id))"
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
        .withColumn("gap_min", F.expr("CAST(gap_us AS DOUBLE) / 60e6"))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("CAST(ROUND(percentile(gap_min, 0.5) * 1e6) AS BIGINT)")
        .alias("p50_min"),
        F.expr("CAST(ROUND(percentile(gap_min, 0.9) * 1e6) AS BIGINT)")
        .alias("p90_min"),
        # SUM(gap_us)/n/60 == mean-in-minutes on the ppm grid
        F.expr("CAST(ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 60) "
               "AS BIGINT)").alias("mean_min"),
        F.expr("CAST(ROUND(MAX(gap_min) * 1e6) AS BIGINT)")
        .alias("max_min"),
    )


QUERIES["ev_inter_arrival"] = ev_inter_arrival

ORACLES["ev_inter_arrival"] = """
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts - LAG(ts) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id)) AS gap_us
        FROM events
    ),
    g AS (
        SELECT event_type, gap_us,
               CAST(gap_us AS DOUBLE) / 60e6 AS gap_min
        FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(ROUND(quantile_cont(gap_min, 0.5) * 1e6) AS BIGINT) AS p50_min,
           CAST(ROUND(quantile_cont(gap_min, 0.9) * 1e6) AS BIGINT) AS p90_min,
           CAST(ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 60)
                AS BIGINT) AS mean_min,
           CAST(ROUND(MAX(gap_min) * 1e6) AS BIGINT) AS max_min
    FROM g GROUP BY 1
"""


# The runnable-at-100TB twin of ev_funnel_latency: approx_percentile's
# GK sketch replaces the exact percentile() whose single sorted agg
# buffer is the scale-killer. Statistical oracle per the registry
# convention (ev_percentiles_approx): the sketch value must land inside
# the exact p±0.02 rank bracket computed in the SAME plan, so the
# DuckDB side only re-derives the group structure and asserts TRUE.
def ev_funnel_latency_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "MIN(CASE WHEN event_type = 'signup' THEN ts END)"
            ).alias("t_signup"),
        )
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(per_user.filter(F.col("t_signup").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("ts").alias("t_purchase"))
    )
    agged = (
        first_purchase
        .withColumn(
            "latency_min",
            F.expr(
                "CAST(unix_micros(t_purchase) - unix_micros(t_signup) "
                "AS DOUBLE) / 60e6"
            ),
        )
        .groupBy(F.date_trunc("day", "t_signup").alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr(
                "approx_percentile(latency_min, array(0.5, 0.9), 10000)"
            ).alias("ap"),
            F.expr(
                "percentile(latency_min, array(0.48, 0.52, 0.88, 0.92))"
            ).alias("ex"),
        )
    )
    return agged.select(
        "signup_day",
        "n_converted",
        F.expr(
            f"n_converted < {_APPROX_MIN_N} OR ap[0] BETWEEN ex[0] AND ex[1]"
        ).alias("p50_ok"),
        F.expr(
            f"n_converted < {_APPROX_MIN_N} OR ap[1] BETWEEN ex[2] AND ex[3]"
        ).alias("p90_ok"),
    )


QUERIES["ev_funnel_latency_approx"] = ev_funnel_latency_approx

ORACLES["ev_funnel_latency_approx"] = """
    WITH signups AS (
        SELECT user_id, MIN(ts) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    conv AS (
        SELECT s.user_id, s.t_signup, MIN(e.ts) AS t_purchase
        FROM signups s
        JOIN events e ON e.user_id = s.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts >= s.t_signup
        GROUP BY s.user_id, s.t_signup
    )
    SELECT CAST(date_trunc('day', t_signup) AS TIMESTAMP) AS signup_day,
           COUNT(*) AS n_converted,
           TRUE AS p50_ok,
           TRUE AS p90_ok
    FROM conv GROUP BY 1
"""


# Runnable-at-100TB twin of ev_inter_arrival — same lag-diff stream,
# GK sketch percentiles with the in-plan exact rank-bracket gate.
def ev_inter_arrival_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    gaps = (
        ev.select(
            "event_type",
            F.expr(
                "CAST(unix_micros(ts) - unix_micros(LAG(ts) OVER ("
                "PARTITION BY event_type, user_id "
                "ORDER BY ts, event_id)) AS DOUBLE) / 60e6"
            ).alias("gap_min"),
        )
        .filter(F.col("gap_min").isNotNull())
    )
    agged = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr(
            "approx_percentile(gap_min, array(0.5, 0.9), 10000)"
        ).alias("ap"),
        F.expr(
            "percentile(gap_min, array(0.48, 0.52, 0.88, 0.92))"
        ).alias("ex"),
    )
    return agged.select(
        "event_type",
        "n_gaps",
        F.expr(
            f"n_gaps < {_APPROX_MIN_N} OR ap[0] BETWEEN ex[0] AND ex[1]"
        ).alias("p50_ok"),
        F.expr(
            f"n_gaps < {_APPROX_MIN_N} OR ap[1] BETWEEN ex[2] AND ex[3]"
        ).alias("p90_ok"),
    )


QUERIES["ev_inter_arrival_approx"] = ev_inter_arrival_approx

ORACLES["ev_inter_arrival_approx"] = """
    WITH gaps AS (
        SELECT event_type,
               CAST(epoch_us(ts - LAG(ts) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id)) AS DOUBLE) / 60e6 AS gap_min
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           TRUE AS p50_ok,
           TRUE AS p90_ok
    FROM gaps WHERE gap_min IS NOT NULL
    GROUP BY 1
"""


# --------------------------------------------- peak session concurrency
# Sweep-line interval counting: peak concurrent 30-min-gap sessions per
# day — the capacity-planning readout. Sessions are clipped to each
# day they span (a session is a bounded interval, so the explode is
# ≤ #days-touched per session), then the +1/−1 delta stream runs a
# running sum WINDOWED PER DAY — the sort is bounded by one day's
# deltas, never a global order-by (the 100 TB shape; a single global
# sweep would serialize the corpus through one task). Ends sort before
# starts at the same instant ([start, end) intervals: back-to-back
# sessions never overlap). All-integer arithmetic → exact oracle.
def ev_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
        )
    )
    clipped = (
        sess.select(
            "s_start",
            "s_end",
            F.explode(
                F.expr("sequence(CAST(s_start AS DATE), "
                       "CAST(s_end - INTERVAL 1 MICROSECOND AS DATE))")
            ).alias("day"),
        )
        .select(
            "day",
            F.expr("GREATEST(s_start, CAST(day AS TIMESTAMP))").alias("a"),
            F.expr("LEAST(s_end, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY)")
            .alias("b"),
        )
    )
    deltas = clipped.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("a").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("b").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select("day", F.col("e.t").alias("t"), F.col("e.d").alias("d"))
    w = Window.partitionBy("day").orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        deltas.withColumn("running", F.sum("d").over(w))
        .groupBy("day")
        .agg(
            F.expr("CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_sessions"),
            F.expr("CAST(MAX(running) AS BIGINT)").alias("peak_concurrency"),
        )
        .select(F.col("day").cast("timestamp").alias("day"),
                "n_sessions", "peak_concurrency")
    )


QUERIES["ev_concurrency_peak"] = ev_concurrency_peak

ORACLES["ev_concurrency_peak"] = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged
    ),
    sess AS (
        SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end
        FROM numbered GROUP BY user_id, seq
    ),
    clipped AS (
        SELECT unnest(generate_series(CAST(s_start AS DATE),
                      CAST(s_end - INTERVAL 1 MICROSECOND AS DATE),
                      INTERVAL 1 DAY))::DATE AS day,
               s_start, s_end
        FROM sess
    ),
    bounds AS (
        SELECT day,
               GREATEST(s_start, CAST(day AS TIMESTAMP)) AS a,
               LEAST(s_end, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY) AS b
        FROM clipped
    ),
    deltas AS (
        SELECT day, a AS t, 1 AS d FROM bounds
        UNION ALL
        SELECT day, b AS t, -1 AS d FROM bounds
    ),
    swept AS (
        SELECT day, d,
               sum(d) OVER (PARTITION BY day ORDER BY t, d
                            ROWS UNBOUNDED PRECEDING) AS running
        FROM deltas
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sessions,
           CAST(MAX(running) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY day
"""


# ---------------------------- exact audience-overlap Jaccard matrix
#
# Exact twin of ev_theta_audience_overlap: pairwise audience Jaccard
# across event types. The scalable shape: one distinct over
# (event_type, user_id), then each user's SORTED type set fans out its
# pairs ROW-LOCALLY (types-per-user choose 2 — bounded by the type
# vocabulary, never |users|²); intersections aggregate per pair, and
# per-type audience sizes broadcast-join onto the ≤ |types|² result.
# Jaccard lands on an integer ppm grid (DIV on both engines) — no
# doubles. At 100 TB the theta-sketch twin is the cheap first pass;
# this exact matrix runs on the shortlisted pairs.
def ev_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ut = ev.select("event_type", "user_id").distinct()
    per_user = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    pairs = (
        per_user.select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (x, i) -> "
                    "transform(slice(ts, i + 2, size(ts)), "
                    "y -> struct(x AS ta, y AS tb))))"
                )
            ).alias("p")
        )
        .select("p.ta", "p.tb")
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(F.broadcast(sizes.withColumnRenamed("event_type", "ta")
                               .withColumnRenamed("n", "n_a")), "ta")
        .join(F.broadcast(sizes.withColumnRenamed("event_type", "tb")
                          .withColumnRenamed("n", "n_b")), "tb")
        .select(
            "ta", "tb", "n_both", "n_a", "n_b",
            # audience counts are data-proportional (1e10+ users at
            # 100 TB), so the ppm product rides the DECIMAL(38,0) grid
            F.expr("CAST(n_both AS DECIMAL(38,0)) * 1000000 "
                   "DIV (n_a + n_b - n_both)")
            .cast("long").alias("jaccard_ppm"),
        )
    )


QUERIES["ev_audience_jaccard"] = ev_audience_jaccard

ORACLES["ev_audience_jaccard"] = """
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    pair_cnt AS (
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    ),
    sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
    SELECT ta, tb, n_both, sa.n AS n_a, sb.n AS n_b,
           CAST(CAST(n_both AS HUGEINT) * 1000000
               // (sa.n + sb.n - n_both) AS BIGINT)
               AS jaccard_ppm
    FROM pair_cnt
    JOIN sz sa ON sa.event_type = ta
    JOIN sz sb ON sb.event_type = tb
"""


# ------------------------------------ watermark / late-arrival audit
#
# How out-of-order is this stream? The question every Structured
# Streaming deployment must answer before picking a watermark delay
# (`withWatermark` drops events later than the chosen bound — too
# tight loses data, too loose bloats state). Arrival order is the
# ingest sequence (event_id, assigned by the producer); the event-time
# high-water-mark is a running MAX over all PRIOR arrivals, and an
# event is late by (hwm - ts) when it arrives behind it. Per type we
# report the late fraction (ppm grid), the worst case, and the exact
# p95 lateness via the house middle-row selection (no engine
# percentile call) — p95 is the number you'd set the watermark to.
# All math is integer microseconds (unix_micros, never second-
# truncating unix_timestamp). The hwm window sorts each type by
# arrival sequence — the same single-sort-per-group class as SCD2;
# the streaming runtime (streaming/jobs.py) maintains the same
# high-water-mark incrementally, so the batch audit is the planning
# tool, not the steady-state path.
def _lateness_by_type(ev: DataFrame) -> DataFrame:
    """(event_type, late_us) for every event: microseconds behind the
    running event-time high-water-mark over arrival order (event_id),
    0 for in-order rows. Shared by the audit and the delay sweep so
    the lateness definition lives in exactly one place."""
    wh = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts)").alias("ts_us"),
            "event_id",
        )
        .withColumn("hwm_us", F.max("ts_us").over(wh))
        .select(
            "event_type",
            F.expr(
                "CASE WHEN hwm_us IS NOT NULL AND hwm_us > ts_us "
                "THEN hwm_us - ts_us ELSE CAST(0 AS BIGINT) END"
            ).alias("late_us"),
        )
    )


#: the oracle twin of _lateness_by_type — prepend WITH and compose
_LATE_CTES_SQL = """t AS (
        SELECT event_type, epoch_us(ts) AS ts_us,
               max(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS hwm_us
        FROM events
    ),
    late AS (
        SELECT event_type,
               CASE WHEN hwm_us IS NOT NULL AND hwm_us > ts_us
                    THEN hwm_us - ts_us ELSE 0 END AS late_us
        FROM t
    )"""


def ev_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    late = _lateness_by_type(table(spark, sf_dir, "events"))
    agg = late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_late"),
        F.expr("CAST(MAX(late_us) AS BIGINT)").alias("max_late_us"),
    )
    wr = Window.partitionBy("event_type").orderBy("late_us")
    p95 = (
        late.filter("late_us > 0")
        .withColumn("rn", F.row_number().over(wr))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .filter("rn = (95 * n + 99) DIV 100")
        .select("event_type", F.col("late_us").alias("p95_late_us"))
    )
    return (
        agg.join(F.broadcast(p95), "event_type", "left")
        .select(
            "event_type",
            "n_events",
            "n_late",
            # n_late is data-proportional — DECIMAL(38,0) ppm grid
            F.expr("CAST(n_late AS DECIMAL(38,0)) * 1000000 "
                   "DIV n_events").cast("long").alias("late_ppm"),
            "max_late_us",
            "p95_late_us",
        )
    )


QUERIES["ev_late_arrival_audit"] = ev_late_arrival_audit

ORACLES["ev_late_arrival_audit"] = f"""
    WITH {_LATE_CTES_SQL},
    agg AS (
        SELECT event_type, count(*) AS n_events,
               CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_late,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us
        FROM late GROUP BY 1
    ),
    ranked AS (
        SELECT event_type, late_us,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY late_us) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM late WHERE late_us > 0
    ),
    p95 AS (
        SELECT event_type, late_us AS p95_late_us
        FROM ranked WHERE rn = (95 * n + 99) // 100
    )
    SELECT a.event_type, n_events, n_late,
           CAST(CAST(n_late AS HUGEINT) * 1000000 // n_events
               AS BIGINT) AS late_ppm,
           max_late_us, p95_late_us
    FROM agg a LEFT JOIN p95 p ON a.event_type = p.event_type
"""


# ------------------------------------- exact sliding 7-day median
#
# Trailing 7-day median of event value per day — the robust
# center-line ops teams plot against daily anomalies (the mean twin is
# ev_moving_avg_7d; the MAD variant is ev_daily_anomaly_mad on daily
# totals, while this is the event-level distribution). Exact, with no
# engine percentile call: each event contributes to the 7 target days
# it can influence (contribute-to-window explode, the ev_rolling_dau
# pattern — never a per-day self-join), and each day's lower median is
# selected by the house middle-row technique (row_number to the
# (n+1) DIV 2 row). med_lo is a raw input value passed through — the
# lower median is ALWAYS an actual observation, so no cross-engine
# averaging arithmetic exists at even counts. At 100 TB the 7× fanout
# shuffles once on day; the at-scale approx twin is the mergeable KLL
# sketch (ev_kll_quantile_merge).
def ev_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    contrib = (
        ev.select(F.to_date("ts").alias("d0"), "value", "event_id")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("day", F.expr("date_add(d0, i)"))
        .join(F.broadcast(days), "day")
    )
    wd = Window.partitionBy("day")
    ranked = (
        contrib.withColumn(
            "rn", F.row_number().over(wd.orderBy("value", "event_id"))
        )
        .withColumn("n", F.count(F.lit(1)).over(wd))
    )
    return ranked.filter("rn = (n + 1) DIV 2").select(
        "day",
        F.col("n").alias("n_in_window"),
        F.col("value").alias("med_lo"),
    )


QUERIES["ev_rolling_median_7d"] = ev_rolling_median_7d

ORACLES["ev_rolling_median_7d"] = """
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    contrib AS (
        SELECT d.day, e.value, e.event_id
        FROM events e
        JOIN days d
          ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
    ),
    ranked AS (
        SELECT day, value,
               row_number() OVER (PARTITION BY day
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY day) AS n
        FROM contrib
    )
    SELECT day, n AS n_in_window, value AS med_lo
    FROM ranked WHERE rn = (n + 1) // 2
"""


# ---------------------------- sliding 7-day DAU via mergeable sketches
#
# The at-scale twin of ev_rolling_dau_7d (exact): sliding windows are
# where mergeable sketches beat contribute-to-window on RAW rows —
# the exact path fans every (day, user) pair into 7 window copies,
# while this path reduces each day to ONE kilobyte HLL first
# (hll_sketch_agg, partial-aggregable map-side) and then fans out and
# unions 7 sketches per target day. At 100 TB that's the difference
# between shuffling 7× the distinct-pairs table and shuffling
# 7 × |days| kilobyte blobs. The estimate is gated against the exact
# sliding DAU in-plan (4σ-style bound as data, the
# ev_daily_active_approx/ev_hll_union_weekly house pattern), so the
# oracle checks the gate, not engine-specific sketch bits.
def ev_rolling_dau_7d_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d0")).agg(
        F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("sk")
    )
    days = daily.select(F.col("d0").alias("day"))
    est = (
        daily.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("day", F.expr("date_add(d0, i)"))
        .join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
            F.count(F.lit(1)).alias("n_days_in_window"),
        )
    )
    exact = (
        ev.select(F.to_date("ts").alias("d0"), "user_id")
        .distinct()
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("day", F.expr("date_add(d0, i)"))
        .join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("dau7_exact"))
    )
    return est.join(exact, "day").select(
        "day",
        "dau7_exact",
        "n_days_in_window",
        F.expr(
            "abs(est - dau7_exact) <= greatest(0.04 * dau7_exact, 4.0)"
        ).alias("sketch_ok"),
    )


QUERIES["ev_rolling_dau_7d_approx"] = ev_rolling_dau_7d_approx

ORACLES["ev_rolling_dau_7d_approx"] = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS d0, user_id FROM events),
    win AS (
        SELECT d.day, u.user_id, u.d0
        FROM du u JOIN days d ON u.d0 BETWEEN d.day - 6 AND d.day
    )
    SELECT day,
           COUNT(DISTINCT user_id) AS dau7_exact,
           COUNT(DISTINCT d0) AS n_days_in_window,
           TRUE AS sketch_ok
    FROM win GROUP BY day
"""


# --------------------------------------- watermark delay sweep
#
# The decision curve on top of ev_late_arrival_audit: for each
# candidate watermark delay, what fraction of events would a
# Structured Streaming job with `withWatermark(ts, delay)` drop?
# An event is dropped iff it arrives later than delay behind the
# event-time high-water-mark, so the lateness column (integer
# microseconds over arrival order, computed ONCE) answers the whole
# delay grid by conditional aggregation — the sweep-family shape
# (emb_threshold_sweep / emb_nprobe_sweep). Delays are labeled in
# seconds; drop rates land on the ppm grid. Read the row where
# drop_ppm crosses your loss budget and that's the watermark to ship.
WATERMARK_GRID_S = (60, 300, 900, 3600, 14400, 86400)


def ev_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    late = _lateness_by_type(table(spark, sf_dir, "events"))
    grid_arr = f"array({', '.join(str(s) for s in WATERMARK_GRID_S)})"
    grid = spark.range(1).selectExpr(f"explode({grid_arr}) AS delay_s")
    grid = grid.selectExpr("CAST(delay_s AS BIGINT) AS delay_s")
    return (
        F.broadcast(grid)
        .crossJoin(late)
        .groupBy("event_type", "delay_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CASE WHEN late_us > delay_s * 1000000 "
                "THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_dropped"),
        )
        .select(
            "event_type",
            F.col("delay_s").cast("int").alias("delay_s"),
            "n_events",
            "n_dropped",
            # n_dropped is data-proportional — DECIMAL(38,0) ppm grid
            # (delay_s*1e6 stays BIGINT: bounded by the 86400 s grid)
            F.expr("CAST(n_dropped AS DECIMAL(38,0)) * 1000000 "
                   "DIV n_events").cast("long").alias("drop_ppm"),
        )
    )


QUERIES["ev_watermark_sweep"] = ev_watermark_sweep

ORACLES["ev_watermark_sweep"] = f"""
    WITH {_LATE_CTES_SQL},
    g AS (SELECT CAST(unnest([{', '.join(str(s) for s in WATERMARK_GRID_S)}])
                      AS BIGINT) AS delay_s)
    SELECT event_type, CAST(delay_s AS INT) AS delay_s,
           count(*) AS n_events,
           CAST(SUM(CASE WHEN late_us > delay_s * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(CAST(SUM(CASE WHEN late_us > delay_s * 1000000
                    THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
               // count(*) AS BIGINT)
               AS drop_ppm
    FROM g CROSS JOIN late GROUP BY event_type, delay_s
"""


# ------------------------------------ process conformance checking
#
# Process-mining conformance: sessions are replayed against a declared
# transition model (the allowed happy-path edges of the
# signup→view→click→purchase lifecycle; error is reachable from
# anywhere but must recover through view) and every observed adjacent
# transition is classified allowed/violating. The report is the
# conformance evidence per edge: how often each transition occurs, in
# how many distinct sessions, and whether the model permits it —
# ev_transition_matrix gives the raw dynamics, this scores them
# against intent. Sessionization is the house 30-minute lag-gap (same
# definition as ev_sessionize), transitions pair up with one lag
# window per session, and the allowed set is a literal IN list — all
# JVM-side, two keyed window passes and one small groupBy.
_CONF_ALLOWED = (
    "signup>view", "view>view", "view>click", "click>view",
    "click>click", "click>purchase", "purchase>view",
    "view>error", "click>error", "signup>error", "purchase>error",
    "error>view",
)


def ev_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "new_session",
            F.expr(
                "CASE WHEN lag(ts) OVER (PARTITION BY user_id "
                "ORDER BY ts, event_id) IS NULL OR "
                "ts - lag(ts) OVER (PARTITION BY user_id "
                "ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
                "THEN 1 ELSE 0 END"
            ),
        )
        .withColumn(
            "sid",
            F.sum("new_session").over(
                wu.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    allowed_list = ", ".join(f"'{a}'" for a in _CONF_ALLOWED)
    trans = (
        sess.withColumn("prev_type", F.lag("event_type").over(ws))
        .filter("prev_type IS NOT NULL")
        .selectExpr(
            "prev_type",
            "event_type AS next_type",
            "CONCAT(user_id, ':', sid) AS sess_key",
            f"CONCAT(prev_type, '>', event_type) IN ({allowed_list}) "
            "AS is_allowed",
        )
    )
    return trans.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.expr("CAST(COUNT(DISTINCT sess_key) AS BIGINT)").alias(
            "n_sessions"
        ),
        F.expr("BOOL_OR(is_allowed)").alias("is_allowed"),
    )


QUERIES["ev_conformance"] = ev_conformance

ORACLES["ev_conformance"] = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    trans AS (
        SELECT lag(event_type) OVER ws AS prev_type,
               event_type AS next_type,
               user_id || ':' || sid AS sess_key
        FROM sess
        WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT prev_type, next_type,
           count(*) AS n_transitions,
           CAST(COUNT(DISTINCT sess_key) AS BIGINT) AS n_sessions,
           BOOL_OR(prev_type || '>' || next_type IN
                   ({', '.join(f"'{a}'" for a in _CONF_ALLOWED)}))
               AS is_allowed
    FROM trans WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
"""


# --------------------------------- VARIANT semi-structured extraction
#
# Spark 4's VARIANT type is the at-scale answer to JSON property
# columns: parse_json once into the binary variant encoding, then
# variant_get path extraction — an order of magnitude cheaper than
# re-parsing the JSON string per accessed field, and the storage shape
# the open-format warehouses (Delta/Iceberg v3) are standardizing on.
# ev_json_props keeps the classic get_json_object string path; this is
# its VARIANT twin over the same events.props column, rolled up as a
# per-(event_type, k-decade) histogram. k is non-negative in this
# corpus, so the decade bucket's integer division is DIV↔//-safe.
def ev_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            "user_id",
            F.expr(
                "variant_get(parse_json(props), '$.k', 'long')"
            ).alias("k"),
        )
        .groupBy(
            "event_type",
            F.expr("CAST(k DIV 10 AS BIGINT)").alias("k_decade"),
        )
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr("CAST(SUM(k) AS BIGINT)").alias("sum_k"),
            F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").alias(
                "n_users"
            ),
        )
    )


QUERIES["ev_props_variant"] = ev_props_variant
ORACLES["ev_props_variant"] = """
    SELECT event_type,
           CAST(k // 10 AS BIGINT) AS k_decade,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM (SELECT event_type, user_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY 1, 2
"""


# ------------------------------------- CUSUM sustained-shift detection
#
# CUSUM (cumulative sum control chart) detects SUSTAINED level shifts
# that per-day z-score/MAD anomaly flags miss: s_i = max(0, s_{i-1} +
# (x_i − μ − slack)) accumulates persistent small excess and alarms
# when it crosses h, while one-day spikes decay back to zero. The
# recurrence is inherently sequential IN DAYS, so like ev_exp_smoothing
# it folds row-locally over each type's collected daily series
# (O(days) per group — hundreds of elements, never corpus-sized); the
# corpus-scale work is only the daily count agg. Baseline μ = mean of
# the first 7 days, slack = μ/20, alarm threshold h = μ — all on a
# non-negative ×100 integer grid (counts are non-negative, and s is
# clamped at 0, so DIV↔// never sees a negative dividend).
def ev_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(F.expr("CAST(COUNT(*) * 100 AS BIGINT)").alias("xc"))
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, xc))), p -> p.xc)"
        ).alias("xs")
    ).selectExpr(
        "event_type",
        "xs",
        "aggregate(slice(xs, 1, 7), CAST(0 AS BIGINT), (a, x) -> a + x) "
        "DIV least(CAST(7 AS BIGINT), size(xs)) AS mu",
    ).selectExpr(
        "event_type", "xs", "mu",
        "mu DIV 20 AS slack",
        "mu AS h",
    )
    elem = ("named_struct("
            "'s', greatest(CAST(0 AS BIGINT), x - mu - slack), "
            "'mx', greatest(CAST(0 AS BIGINT), x - mu - slack), "
            "'alarms', CAST(CASE WHEN greatest(CAST(0 AS BIGINT), "
            "x - mu - slack) > h THEN 1 ELSE 0 END AS BIGINT), "
            "'xc', x)")
    step = ("named_struct("
            "'s', greatest(CAST(0 AS BIGINT), acc.s + e.xc - mu - slack), "
            "'mx', greatest(acc.mx, greatest(CAST(0 AS BIGINT), "
            "acc.s + e.xc - mu - slack)), "
            "'alarms', acc.alarms + CAST(CASE WHEN "
            "greatest(CAST(0 AS BIGINT), acc.s + e.xc - mu - slack) > h "
            "THEN 1 ELSE 0 END AS BIGINT), "
            "'xc', e.xc)")
    fold = (
        f"aggregate(slice(es, 2, size(es) - 1), element_at(es, 1), "
        f"(acc, e) -> {step})"
    )
    return series.selectExpr(
        "event_type", "mu", "slack", "h",
        f"transform(xs, x -> {elem}) AS es",
        "CAST(size(xs) AS BIGINT) AS n_days",
    ).selectExpr(
        "event_type", "n_days", "mu AS mu_c100",
        f"{fold}.s AS cusum_final_c100",
        f"{fold}.mx AS cusum_max_c100",
        f"{fold}.alarms AS n_alarm_days",
    )


QUERIES["ev_cusum_shift"] = ev_cusum_shift

ORACLES["ev_cusum_shift"] = """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) * 100 AS BIGINT) AS xc
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, list(xc ORDER BY day) AS xs FROM daily GROUP BY 1
    ),
    params AS (
        SELECT event_type, xs,
               CAST(list_sum(xs[1:7]) AS BIGINT)
                   // least(CAST(7 AS BIGINT), len(xs)) AS mu
        FROM series
    ),
    p2 AS (
        SELECT event_type, xs, mu, mu // 20 AS slack, mu AS h FROM params
    ),
    folded AS (
        -- Field ORDER in the step struct is load-bearing for DuckDB:
        -- its lambda evaluates struct fields sequentially and a later
        -- field referencing acc.s sees the value the 's' field just
        -- wrote (measured: putting 's' first inflated 'mx' by
        -- double-adding the day's excess). Dependent fields ('mx',
        -- 'alarms') therefore come BEFORE 's', so they read the
        -- PRE-step accumulator like Spark's side-effect-free
        -- named_struct does.
        SELECT event_type, mu, slack, h,
               CAST(len(xs) AS BIGINT) AS n_days,
               list_reduce(
                   list_transform(xs, x -> {
                       'mx': greatest(CAST(0 AS BIGINT), x - mu - slack),
                       'alarms': CAST(CASE WHEN greatest(CAST(0 AS BIGINT),
                                   x - mu - slack) > h
                                   THEN 1 ELSE 0 END AS BIGINT),
                       's': greatest(CAST(0 AS BIGINT), x - mu - slack),
                       'xc': x
                   }),
                   (acc, e) -> {
                       'mx': greatest(acc.mx,
                                      greatest(CAST(0 AS BIGINT),
                                               acc.s + e.xc - mu - slack)),
                       'alarms': acc.alarms + CAST(CASE WHEN
                                   greatest(CAST(0 AS BIGINT),
                                            acc.s + e.xc - mu - slack) > h
                                   THEN 1 ELSE 0 END AS BIGINT),
                       's': greatest(CAST(0 AS BIGINT),
                                     acc.s + e.xc - mu - slack),
                       'xc': e.xc
                   }) AS st
        FROM p2
    )
    SELECT event_type, n_days, mu AS mu_c100,
           st.s AS cusum_final_c100,
           st.mx AS cusum_max_c100,
           st.alarms AS n_alarm_days
    FROM folded
"""


# ------------------------------- autocorrelation diagnostics (ACF)
#
# The seasonality DETECTOR next to the forecasters that ASSUME a
# period (ev_holtwinters_forecast hard-codes 7): the sample
# autocorrelation function of the gap-filled hourly event-count
# series at lags 1..36 — the curve an analyst reads to pick the
# seasonal period (a daily cycle would surface as a lag-24 peak) and
# the watermark/window sizing evidence for everything downstream.
#
# Shape for 100 TB: ONE partial-agg shuffle rolls the raw events to
# O(hours) rows (720 here; a century of hours is <1M rows), and every
# step after — gap-fill spine, the ≤36·n lag self-join, the global
# moment row — runs on that tiny series with broadcast joins, nothing
# driver-side. Determinism: all cross-row sums (S, Σx², Σx·x_lag,
# boundary sums) are exact BIGINTs; the mean-centered ACF formula is
# then a single row-local double expression written identically in
# the oracle (identical IEEE tree => identical bits), exposed on the
# house ×1e6 ppm grid.
ACF_MAX_LAG = 36


def ev_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # localCheckpoint: three consumers (bounds, spine join, moments)
    # would each re-run the events scan through the shared lineage —
    # materializing the O(hours) rollup once makes the corpus scan
    # happen exactly once (the doc_pagerank lesson; measured 4.7→
    # ~1.5 s at sf0.1)
    hours = ev.groupBy(
        F.expr("CAST(date_trunc('hour', ts) AS TIMESTAMP)").alias("h")
    ).agg(F.count(F.lit(1)).alias("x")).localCheckpoint()
    bounds = hours.agg(
        F.expr("MIN(unix_timestamp(h)) DIV 3600").alias("t0"),
        F.expr("MAX(unix_timestamp(h)) DIV 3600").alias("t1"),
    )
    # gap-filled integer-indexed series: t = hours since the first hour
    xs = (
        bounds.select(
            F.explode(F.expr("sequence(CAST(0 AS BIGINT), t1 - t0)"))
            .alias("t")
        )
        .join(
            F.broadcast(
                hours.crossJoin(F.broadcast(bounds)).select(
                    F.expr("unix_timestamp(h) DIV 3600 - t0").alias("t"),
                    "x",
                )
            ),
            "t",
            "left",
        )
        .select("t", F.expr("COALESCE(x, CAST(0 AS BIGINT))").alias("x"))
    )
    # hourly counts are data-proportional (~4e8/hour at 100 TB), so
    # squares and their sums ride the DECIMAL(38,0) grid — Σx² over a
    # year of hours passes 2⁶³ long before the ppm projection does
    moments = xs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sx2"),
    )
    a = xs.alias("a")
    b = xs.alias("b")
    lagged = (
        a.join(
            b,
            (F.col("b.t") > F.col("a.t"))
            & (F.col("b.t") <= F.col("a.t") + ACF_MAX_LAG),
        )
        .select(
            (F.col("b.t") - F.col("a.t")).alias("lag"),
            F.expr("CAST(a.x AS DECIMAL(38,0)) * b.x").alias("xx"),
            F.col("a.x").alias("xa"),
            F.col("b.x").alias("xb"),
        )
        .groupBy("lag")
        .agg(
            F.sum("xx").alias("sxx"),
            F.sum("xa").alias("sa"),
            F.sum("xb").alias("sb"),
        )
    )
    # acf(L) = Σ(x_t−m)(x_{t+L}−m) / Σ(x_t−m)²
    #        = (Σxx − m(A+B) + (n−L)m²) / (Σx² − S²/n),  m = S/n
    return (
        lagged.crossJoin(F.broadcast(moments))
        .select(
            "lag",
            F.expr("n - lag").alias("n_pairs"),
            F.expr(
                "CAST(ROUND((CAST(sxx AS DOUBLE) "
                "- CAST(s AS DOUBLE) / n * CAST(sa + sb AS DOUBLE) "
                "+ CAST(n - lag AS DOUBLE) * (CAST(s AS DOUBLE) / n) "
                "* (CAST(s AS DOUBLE) / n)) "
                "/ NULLIF(CAST(sx2 AS DOUBLE) "
                "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 0) "
                "* 1e6) AS BIGINT)"
            ).alias("acf_ppm"),
        )
    )


QUERIES["ev_acf"] = ev_acf

ORACLES["ev_acf"] = f"""
    WITH hours AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    bounds AS (
        SELECT CAST(epoch(MIN(h)) AS BIGINT) // 3600 AS t0,
               CAST(epoch(MAX(h)) AS BIGINT) // 3600 AS t1
        FROM hours
    ),
    spine AS (
        SELECT unnest(range(0, t1 - t0 + 1)) AS t FROM bounds
    ),
    xs AS (
        SELECT s.t, COALESCE(hx.x, CAST(0 AS BIGINT)) AS x
        FROM spine s
        LEFT JOIN (
            SELECT CAST(epoch(h) AS BIGINT) // 3600 - t0 AS t, x
            FROM hours CROSS JOIN bounds
        ) hx ON hx.t = s.t
    ),
    moments AS (
        SELECT CAST(count(*) AS BIGINT) AS n, SUM(x) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS sx2
        FROM xs
    ),
    lagged AS (
        SELECT b.t - a.t AS lag,
               SUM(CAST(a.x AS HUGEINT) * b.x) AS sxx,
               SUM(a.x) AS sa, SUM(b.x) AS sb
        FROM xs a JOIN xs b
          ON b.t > a.t AND b.t <= a.t + {ACF_MAX_LAG}
        GROUP BY 1
    )
    SELECT lag, n - lag AS n_pairs,
           CAST(ROUND((CAST(sxx AS DOUBLE)
                 - CAST(s AS DOUBLE) / n * CAST(sa + sb AS DOUBLE)
                 + CAST(n - lag AS DOUBLE) * (CAST(s AS DOUBLE) / n)
                 * (CAST(s AS DOUBLE) / n))
                / NULLIF(CAST(sx2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 0)
                * 1e6) AS BIGINT) AS acf_ppm
    FROM lagged CROSS JOIN moments
"""


# ------------------------ Markov removal-effect attribution
#
# Data-driven multi-touch attribution (Anderl et al. 2014), the model
# that replaces last-touch heuristics (ev_attribution_revenue):
# journeys are per-user event sequences truncated at the first
# purchase; a first-order Markov chain over {start, view, click,
# signup, error, conv, null} is fitted from transition counts, and a
# channel's credit is its REMOVAL EFFECT — how much the start→conv
# absorption probability drops when every edge into the channel is
# redirected to the null absorber.
#
# Determinism discipline: the fitted chain lives on a ppm integer
# grid (row-normalized transition counts, DIV), and absorption is 60
# synchronized power-iteration steps folding a ×1e9 mass vector —
# m'[j] = Σ_i m[i]·T[i][j] DIV 1e6 — all BIGINT, truncation identical
# in both engines (the model IS the grid chain, as ev_cusum_shift's
# model IS the ×100 grid). The chain is 7×7 — the fold is one
# collected row; corpus work is ONE user-partitioned window pass plus
# a 49-key count, regardless of event volume.
_MK_STATES = ("start", "view", "click", "signup", "error")
_MK_K = 60  # power-iteration steps (journeys are short; geometric tail)


def _mk_fold(mat: str) -> str:
    """start→conv absorbed mass (×1e9) after _MK_K synchronized steps
    of the ppm-grid chain ``mat`` (flat 49-array, (i-1)*7+j)."""
    m0 = ("transform(sequence(1, 7), z -> "
          "CAST(IF(z = 1, 1000000000, 0) AS BIGINT))")
    step = (
        "transform(sequence(1, 7), j -> "
        "aggregate(sequence(1, 7), CAST(0 AS BIGINT), "
        f"(a, i) -> a + element_at(acc, i) "
        f"* element_at({mat}, (i - 1) * 7 + j)) DIV 1000000)"
    )
    return (
        f"element_at(aggregate(sequence(1, {_MK_K}), {m0}, "
        f"(acc, s) -> {step}), 6)"
    )


def ev_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = ev.select(
        "user_id", "event_type",
        F.row_number().over(w).cast("long").alias("rn"),
    ).withColumn(
        "p_rn",
        F.expr("MIN(CASE WHEN event_type = 'purchase' THEN rn END) "
               "OVER (PARTITION BY user_id)"),
    )
    kept = rn.filter("rn <= COALESCE(p_rn, CAST(9223372036854775807 AS BIGINT))")
    # ONE pass emits every edge a row owns: its (prev → cur) pair and,
    # on the last kept row of a non-converting user, the (cur → null)
    # tail — a row-local array explode, so the corpus is scanned once
    # (the earlier pairs-UNION-tails shape re-ran the whole window
    # lineage per branch: 8 scans in the executed plan). Kept rns are
    # contiguous from 1, so the last row is rn = count(*) over user.
    edges = kept.select(
        F.expr("COALESCE(LAG(event_type) OVER (PARTITION BY user_id "
               "ORDER BY rn), 'start')").alias("prev"),
        "event_type", "rn", "p_rn",
        F.expr("COUNT(*) OVER (PARTITION BY user_id)").alias("n_user"),
    ).select(
        F.explode(F.expr(
            "filter(array("
            "named_struct('src', prev, 'dst', event_type), "
            "IF(rn = n_user AND p_rn IS NULL, "
            "named_struct('src', event_type, 'dst', 'null'), NULL)"
            "), x -> x IS NOT NULL)"
        )).alias("e")
    ).select("e.src", "e.dst")
    sidx = ("CASE " + " ".join(
        "WHEN {c} = '%s' THEN %d" % (s, i + 1)
        for i, s in enumerate(_MK_STATES)
    ) + " WHEN {c} = 'purchase' THEN 6 ELSE 7 END")
    counts = (
        edges
        .selectExpr(
            sidx.replace("{c}", "src") + " AS i",
            sidx.replace("{c}", "dst") + " AS j",
        )
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = counts.groupBy("i").agg(F.sum("n").alias("tot"))
    sparse = (
        counts.join(row_tot, "i")
        # transition counts are data-proportional — DECIMAL(38,0) grid
        .selectExpr("i", "j", "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 "
                    "DIV tot AS BIGINT) AS ppm")
        .agg(F.expr("collect_list(named_struct('i', i, 'j', j, "
                    "'ppm', ppm))").alias("cts"))
    )
    # dense 49-array: absorbers (6=conv, 7=null) self-loop; a touch
    # state with no observed outgoing edges absorbs to null
    dense = (
        "transform(sequence(1, 49), k -> CAST(CASE "
        "WHEN (k - 1) DIV 7 + 1 IN (6, 7) "
        "THEN IF((k - 1) % 7 + 1 = (k - 1) DIV 7 + 1, 1000000, 0) "
        "WHEN NOT exists(cts, x -> x.i = (k - 1) DIV 7 + 1) "
        "THEN IF((k - 1) % 7 + 1 = 7, 1000000, 0) "
        "ELSE COALESCE(try_element_at(transform(filter(cts, "
        "x -> x.i = (k - 1) DIV 7 + 1 AND x.j = (k - 1) % 7 + 1), "
        "x -> x.ppm), 1), CAST(0 AS BIGINT)) END AS BIGINT))"
    )
    # per-channel removed matrix: edges into channel c go to null
    # instead; row c absorbs to null
    removed = (
        "transform(sequence(1, 49), k -> CAST(CASE "
        "WHEN (k - 1) DIV 7 + 1 = c "
        "THEN IF((k - 1) % 7 + 1 = 7, 1000000, 0) "
        "WHEN (k - 1) % 7 + 1 = c THEN 0 "
        "WHEN (k - 1) % 7 + 1 = 7 "
        "THEN element_at(t, k) + element_at(t, k - 7 + c) "
        "ELSE element_at(t, k) END AS BIGINT))"
    )
    per_channel = (
        sparse.withColumn("t", F.expr(dense))
        .withColumn("p_base", F.expr(_mk_fold("t")))
        .select(
            "t", "p_base",
            F.explode(F.expr("sequence(2, 5)")).alias("c"),
        )
        .withColumn("tc", F.expr(removed))
        .withColumn("p_removed", F.expr(_mk_fold("tc")))
        .selectExpr(
            "element_at(array(%s), CAST(c AS INT) - 1) AS channel"
            % ", ".join(f"'{s}'" for s in _MK_STATES[1:]),
            "p_base AS p_conv_base_ppb",
            "p_removed AS p_conv_removed_ppb",
            "GREATEST(p_base - p_removed, CAST(0 AS BIGINT)) "
            "AS removal_effect_ppb",
        )
    )
    # 4 rows; the effect-total branch would otherwise re-run the whole
    # fit+fold chain (one more corpus scan per consumer)
    per_channel = per_channel.localCheckpoint()
    tot_eff = per_channel.agg(
        F.sum("removal_effect_ppb").alias("eff_tot")
    )
    return per_channel.crossJoin(F.broadcast(tot_eff)).selectExpr(
        "channel", "p_conv_base_ppb", "p_conv_removed_ppb",
        "removal_effect_ppb",
        "CAST(ROUND(CAST(removal_effect_ppb AS DOUBLE) "
        "/ NULLIF(CAST(eff_tot AS DOUBLE), 0) * 1e6) AS BIGINT) "
        "AS attribution_ppm",
    )


QUERIES["ev_attribution_markov"] = ev_attribution_markov

_MK_SIDX_DUCK = ("CASE " + " ".join(
    f"WHEN {{c}} = '{s}' THEN {i + 1}" for i, s in enumerate(_MK_STATES)
) + " WHEN {c} = 'purchase' THEN 6 ELSE 7 END")
_MK_M0_DUCK = ("list_transform(range(1, 8), z -> "
               "CAST(CASE WHEN z = 1 THEN 1000000000 ELSE 0 END AS BIGINT))")


def _mk_fold_duck(mat: str) -> str:
    # list_reduce has no init arg: all K+1 elements are the m0 list and
    # the step ignores e, so element 1 seeds and K steps run
    step = (
        "list_transform(range(1, 8), j -> "
        "CAST(list_sum(list_transform(range(1, 8), i -> "
        f"acc[i] * {mat}[(i - 1) * 7 + j])) // 1000000 AS BIGINT))"
    )
    return (
        f"list_reduce(list_transform(range(0, {_MK_K + 1}), "
        f"s -> {_MK_M0_DUCK}), (acc, e) -> {step})[6]"
    )


ORACLES["ev_attribution_markov"] = f"""
    WITH rn_t AS (
        SELECT user_id, event_type,
               CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS BIGINT) AS rn
        FROM events
    ),
    prn AS (
        SELECT user_id, event_type, rn,
               MIN(CASE WHEN event_type = 'purchase' THEN rn END)
                   OVER (PARTITION BY user_id) AS p_rn
        FROM rn_t
    ),
    kept AS (
        SELECT * FROM prn
        WHERE rn <= COALESCE(p_rn, CAST(9223372036854775807 AS BIGINT))
    ),
    pairs AS (
        SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY rn), 'start') AS src,
               event_type AS dst
        FROM kept
    ),
    tails AS (
        SELECT MAX_BY(event_type, rn) AS src, 'null' AS dst
        FROM kept WHERE p_rn IS NULL GROUP BY user_id
    ),
    counts AS (
        SELECT {_MK_SIDX_DUCK.format(c='src')} AS i,
               {_MK_SIDX_DUCK.format(c='dst')} AS j,
               count(*) AS n
        FROM (SELECT src, dst FROM pairs
              UNION ALL SELECT src, dst FROM tails)
        GROUP BY 1, 2
    ),
    row_tot AS (SELECT i, SUM(n) AS tot FROM counts GROUP BY i),
    sparse AS (
        SELECT list(struct_pack(i := c.i, j := c.j,
                    ppm := CAST(CAST(c.n AS HUGEINT) * 1000000
                                // r.tot AS BIGINT))) AS cts
        FROM counts c JOIN row_tot r USING (i)
    ),
    densed AS (
        SELECT list_transform(range(1, 50), k -> CAST(CASE
            WHEN (k - 1) // 7 + 1 IN (6, 7)
            THEN CASE WHEN (k - 1) % 7 + 1 = (k - 1) // 7 + 1
                 THEN 1000000 ELSE 0 END
            WHEN len(list_filter(cts, x -> x.i = (k - 1) // 7 + 1)) = 0
            THEN CASE WHEN (k - 1) % 7 + 1 = 7 THEN 1000000 ELSE 0 END
            ELSE COALESCE(list_transform(list_filter(cts,
                 x -> x.i = (k - 1) // 7 + 1 AND x.j = (k - 1) % 7 + 1),
                 x -> x.ppm)[1], CAST(0 AS BIGINT)) END AS BIGINT)) AS t
        FROM sparse
    ),
    chans AS (
        SELECT t, {_mk_fold_duck('t')} AS p_base, unnest(range(2, 6)) AS c
        FROM densed
    ),
    rem AS (
        SELECT c, p_base,
               list_transform(range(1, 50), k -> CAST(CASE
                   WHEN (k - 1) // 7 + 1 = c
                   THEN CASE WHEN (k - 1) % 7 + 1 = 7
                        THEN 1000000 ELSE 0 END
                   WHEN (k - 1) % 7 + 1 = c THEN 0
                   WHEN (k - 1) % 7 + 1 = 7
                   THEN t[k] + t[k - 7 + c]
                   ELSE t[k] END AS BIGINT)) AS tc
        FROM chans
    ),
    eff AS (
        SELECT ['view', 'click', 'signup', 'error'][CAST(c AS INT) - 1]
                   AS channel,
               p_base AS p_conv_base_ppb,
               {_mk_fold_duck('tc')} AS p_conv_removed_ppb
        FROM rem
    ),
    eff2 AS (
        SELECT channel, p_conv_base_ppb, p_conv_removed_ppb,
               GREATEST(p_conv_base_ppb - p_conv_removed_ppb,
                        CAST(0 AS BIGINT)) AS removal_effect_ppb
        FROM eff
    )
    SELECT channel, p_conv_base_ppb, p_conv_removed_ppb,
           removal_effect_ppb,
           CAST(ROUND(CAST(removal_effect_ppb AS DOUBLE)
                / NULLIF(CAST((SELECT SUM(removal_effect_ppb) FROM eff2)
                    AS DOUBLE), 0) * 1e6) AS BIGINT) AS attribution_ppm
    FROM eff2
"""


# --------------------------------------------------------------------------
# Daily event-type diversity — the mix-shift monitor an operator
# watches next to raw volumes: a traffic incident that collapses the
# event mix to one type moves this long before volume does. Simpson's
# diversity (1 − Σ p_i²) instead of Shannon entropy BECAUSE it is
# exact integer math on the ppm grid (Σc², n² — no engine libm log
# whose last-ulp could differ between engines); top-type share rides
# along. One shuffle to (day, type) counts, then a tiny per-day
# re-aggregation — identical shape at any scale. Overflow headroom:
# a single day at 100 TB has ~1e10 events, so c² ≈ 1e20 and 1e6·Σc²
# ≈ 1e26 both blow past 2⁶³ — Σc² accumulates in DECIMAL(38,0) and
# the ppm projection stays on the DECIMAL(38,0) grid (DuckDB mirror:
# HUGEINT), exact to 1e38 ≫ any real day.
def ev_type_diversity_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("day")
        .agg(
            F.expr("SUM(c)").alias("n_events"),
            F.expr("COUNT(*)").alias("n_types"),
            F.expr("SUM(CAST(c AS DECIMAL(38,0)) * c)").alias("ss"),
            F.expr("MAX(c)").alias("top_c"),
        )
        .selectExpr(
            "day", "n_events", "n_types",
            "CAST(1000000 - 1000000 * ss "
            "DIV (CAST(n_events AS DECIMAL(38,0)) * n_events) "
            "AS BIGINT) AS simpson_ppm",
            "CAST(1000000 * CAST(top_c AS DECIMAL(38,0)) "
            "DIV n_events AS BIGINT) AS top_share_ppm",
        )
    )


QUERIES["ev_type_diversity_daily"] = ev_type_diversity_daily

ORACLES["ev_type_diversity_daily"] = """
    WITH counts AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    )
    SELECT day,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(1000000 - 1000000 * SUM(CAST(c AS HUGEINT) * c)
               // (CAST(SUM(c) AS HUGEINT) * SUM(c))
               AS BIGINT) AS simpson_ppm,
           CAST(1000000 * CAST(MAX(c) AS HUGEINT) // SUM(c)
               AS BIGINT) AS top_share_ppm
    FROM counts
    GROUP BY day
"""


# --------------------------------------------------------------------------
# Fano factor (variance-to-mean ratio) of daily event counts per type —
# the overdispersion dial: a Poisson-like arrival process reads ~1e6
# ppm; bursty/clumped traffic reads above, throttled/regular below.
# Exact integer end-to-end: F = σ²/μ = (n·Σx² − (Σx)²) / (n·Σx) on the
# ppm grid (x = daily count). The day table is tiny, but a 100 TB
# deployment sees ~1e10 events/day per dominant type, so x² ≈ 1e20 and
# the ×1e6 variance product ≈1e30 both blow past 2⁶³ — Σx² accumulates
# in DECIMAL(38,0) and the ppm projection stays on the DECIMAL(38,0)
# grid (DuckDB mirror: HUGEINT), exact to 1e38. One (day, type)
# shuffle, then a per-type re-agg over the small daily table.
def ev_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("x"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr("COUNT(*)").alias("n_days"),
            F.expr("SUM(x)").alias("total"),
            F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("ss"),
        )
        .selectExpr(
            "event_type", "n_days", "total",
            "CAST(1000000 * (n_days * ss "
            "- CAST(total AS DECIMAL(38,0)) * total) "
            "DIV (CAST(n_days AS DECIMAL(38,0)) * total) "
            "AS BIGINT) AS fano_ppm",
        )
    )


QUERIES["ev_fano_factor"] = ev_fano_factor

ORACLES["ev_fano_factor"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(x) AS BIGINT) AS total,
           CAST(1000000 * (COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                   - CAST(SUM(x) AS HUGEINT) * SUM(x))
               // (CAST(COUNT(*) AS HUGEINT) * SUM(x))
               AS BIGINT) AS fano_ppm
    FROM daily GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Day-of-week traffic profile per event type: each (type, dow) cell's
# exact ppm share of its type's weekly total — the seasonality
# fingerprint ops teams eyeball before alerting thresholds. Weekday
# numbering derives from the EPOCH-DAY count ((days % 7 + 7) % 7)
# rather than engine-local DOW functions, whose week-start conventions
# differ; the epoch-day is spelled per-engine (Spark unix_date, DuckDB
# date subtraction) but is the same integer.
_DOW_SPARK = "CAST((unix_date(CAST(ts AS DATE)) % 7 + 7) % 7 AS INT)"
_DOW_DUCK = ("CAST(((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) "
             "% 7 AS INT)")


def ev_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.expr(_DOW_SPARK).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = cells.groupBy("event_type").agg(
        F.expr("SUM(c)").alias("t"))
    return (
        cells.join(tot, "event_type")
        .selectExpr(
            "event_type", "dow", "c AS n_events",
            # cell counts are data-proportional (1e13+/cell possible
            # at 100 TB) — DECIMAL(38,0) ppm grid
            "CAST(1000000 * CAST(c AS DECIMAL(38,0)) DIV t AS BIGINT) "
            "AS share_ppm",
        )
    )


QUERIES["ev_weekday_profile"] = ev_weekday_profile

ORACLES["ev_weekday_profile"] = f"""
    WITH cells AS (
        SELECT event_type,
               {_DOW_DUCK} AS dow,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS t
        FROM cells GROUP BY event_type
    )
    SELECT cells.event_type, dow, c AS n_events,
           CAST(1000000 * CAST(c AS HUGEINT) // t AS BIGINT)
               AS share_ppm
    FROM cells JOIN tot USING (event_type)
"""


# --------------------------------------------------------------------------
# Inter-arrival burstiness per event type: the squared coefficient of
# variation CV² = Var(d)/E[d]² of the gaps between consecutive events
# of a (type, user) stream — the queueing-theory dial next to
# ev_fano_factor's count dispersion (Poisson reads ~1e6 ppm, heavier
# burst trains read above). Exact integer end-to-end on the µs grid:
# CV²·1e6 = (n·Σd² − (Σd)²)·1e6 / (Σd)², with Σd² and every cross
# product on DECIMAL(38,0)/HUGEINT (rule F — gaps reach 1e11 µs, so
# d² ≈ 1e22 alone passes 2⁶³). Gap extraction reuses the
# ev_inter_arrival windows (partitioned per (type, user) — no global
# sort); the re-agg runs over per-type scalars.
def ev_burstiness_cv2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    gaps = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(ts) - unix_micros(LAG(ts) OVER ("
                "PARTITION BY event_type, user_id "
                "ORDER BY ts, event_id))"
            ).alias("d"),
        )
        .filter(F.col("d").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.expr("COUNT(*)").alias("n_gaps"),
            F.expr("SUM(d)").alias("sum_us"),
            F.expr("SUM(CAST(d AS DECIMAL(38,0)) * d)").alias("ss"),
        )
        .filter("sum_us > 0")
        .selectExpr(
            "event_type", "n_gaps", "sum_us",
            "CAST((n_gaps * ss - CAST(sum_us AS DECIMAL(38,0)) "
            "* sum_us) * 1000000 "
            "DIV (CAST(sum_us AS DECIMAL(38,0)) * sum_us) "
            "AS BIGINT) AS cv2_ppm",
        )
    )


QUERIES["ev_burstiness_cv2"] = ev_burstiness_cv2

ORACLES["ev_burstiness_cv2"] = """
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS d
        FROM events
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(d) AS BIGINT) AS sum_us,
               SUM(CAST(d AS HUGEINT) * d) AS ss
        FROM gaps WHERE d IS NOT NULL
        GROUP BY 1
    )
    SELECT event_type, n_gaps, sum_us,
           CAST((n_gaps * ss - CAST(sum_us AS HUGEINT) * sum_us)
               * 1000000
               // (CAST(sum_us AS HUGEINT) * sum_us)
               AS BIGINT) AS cv2_ppm
    FROM agg WHERE sum_us > 0
"""


# --------------------------------------------------------------------------
# Day-over-day audience overlap — the retention dial an on-call growth
# analyst actually watches: for each consecutive day pair, the exact
# Jaccard of the two DAU sets and the share of yesterday's users who
# returned, on the ppm grid. The working set is the DISTINCT
# (day, user) table (one pre-aggregation, the DAU discipline), so the
# self-join matches users across adjacent days at O(distinct pairs),
# never O(events²); all counts are exact integers and every ppm
# division has a non-negative dividend (DIV↔// safe). At 100 TB the
# join keys on (user, day) — high-cardinality, skew-free after the
# distinct collapse.
def ev_dau_overlap_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    counts = du.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"))
    nxt = du.select(
        F.expr("day - INTERVAL 1 DAY").alias("day"),
        F.col("user_id"),
        F.col("day").alias("day_b"),
    )
    inter = (
        du.join(nxt, ["day", "user_id"])
        .groupBy("day").agg(F.count(F.lit(1)).alias("both"))
    )
    a = counts.select(F.col("day"), F.col("dau").alias("dau_a"))
    b = counts.select(
        F.expr("day - INTERVAL 1 DAY").alias("day"),
        F.col("dau").alias("dau_b"),
    )
    return (
        a.join(b, "day").join(inter, "day", "left")
        .selectExpr(
            "CAST(day AS DATE) AS day", "dau_a", "dau_b",
            "COALESCE(both, CAST(0 AS BIGINT)) AS n_both",
            "CAST(CAST(COALESCE(both, 0) AS DECIMAL(38,0)) * 1000000 "
            "DIV (dau_a + dau_b - COALESCE(both, 0)) AS BIGINT) "
            "AS jaccard_ppm",
            "CAST(CAST(COALESCE(both, 0) AS DECIMAL(38,0)) * 1000000 "
            "DIV dau_a AS BIGINT) AS retained_ppm",
        )
    )


QUERIES["ev_dau_overlap_dod"] = ev_dau_overlap_dod

ORACLES["ev_dau_overlap_dod"] = """
    WITH du AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        FROM events
    ),
    counts AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    inter AS (
        SELECT a.day, count(*) AS both
        FROM du a JOIN du b
          ON a.user_id = b.user_id
         AND b.day = a.day + INTERVAL 1 DAY
        GROUP BY a.day
    )
    SELECT CAST(ca.day AS DATE) AS day,
           ca.dau AS dau_a, cb.dau AS dau_b,
           COALESCE(i.both, 0) AS n_both,
           CAST(CAST(COALESCE(i.both, 0) AS HUGEINT) * 1000000
               // (ca.dau + cb.dau - COALESCE(i.both, 0)) AS BIGINT)
               AS jaccard_ppm,
           CAST(CAST(COALESCE(i.both, 0) AS HUGEINT) * 1000000
               // ca.dau AS BIGINT) AS retained_ppm
    FROM counts ca
    JOIN counts cb ON cb.day = ca.day + INTERVAL 1 DAY
    LEFT JOIN inter i ON i.day = ca.day
"""


# --------------------------------------------------------------------------
# Session depth histogram — the engagement-shape distribution next to
# ev_session_durations' time buckets: how many sessions are one-shot
# bounces vs multi-event journeys, as exact counts and ppm shares per
# depth bucket (1 / 2 / 3-5 / 6-10 / 11+ events — the standard product
# analytics cut). Rides the same sessionize pass (per-user window, one
# shuffle); the histogram is a 5-row re-agg with DECIMAL-widened ppm
# (session counts at 100 TB pass the bare ×1e6 budget).
def ev_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = ev_sessionize(spark, sf_dir)
    bucketed = sessions.selectExpr(
        "CASE WHEN n_events = 1 THEN '1' WHEN n_events = 2 THEN '2' "
        "WHEN n_events <= 5 THEN '3-5' WHEN n_events <= 10 THEN '6-10' "
        "ELSE '11+' END AS depth_bucket",
        "n_events",
    )
    return (
        bucketed.groupBy("depth_bucket")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_sessions"),
            F.expr("CAST(SUM(n_events) AS BIGINT)").alias("n_events"),
        )
        .selectExpr(
            "depth_bucket", "n_sessions", "n_events",
            "CAST(CAST(n_sessions AS DECIMAL(38,0)) * 1000000 "
            "DIV SUM(n_sessions) OVER () AS BIGINT) AS session_ppm",
            "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000 "
            "DIV SUM(n_events) OVER () AS BIGINT) AS event_ppm",
        )
    )


QUERIES["ev_session_depth_hist"] = ev_session_depth_hist

ORACLES["ev_session_depth_hist"] = f"""
    WITH sessions AS ({ORACLES["ev_sessionize"]}),
    bucketed AS (
        SELECT CASE WHEN n_events = 1 THEN '1'
                    WHEN n_events = 2 THEN '2'
                    WHEN n_events <= 5 THEN '3-5'
                    WHEN n_events <= 10 THEN '6-10'
                    ELSE '11+' END AS depth_bucket,
               n_events
        FROM sessions
    ),
    agg AS (
        SELECT depth_bucket,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM bucketed GROUP BY depth_bucket
    )
    SELECT depth_bucket, n_sessions, n_events,
           CAST(CAST(n_sessions AS HUGEINT) * 1000000
               // SUM(n_sessions) OVER () AS BIGINT) AS session_ppm,
           CAST(CAST(n_events AS HUGEINT) * 1000000
               // SUM(n_events) OVER () AS BIGINT) AS event_ppm
    FROM agg
"""


# -------------------------- changepoint localization (binary split)
#
# ev_cusum_shift DETECTS a level shift; this LOCALIZES it — binary
# segmentation's first split: the day t that minimizes SSE_left +
# SSE_right of the daily-count series, equivalently maximizes
# (Σ_left)²/n_left + (Σ_right)²/n_right (the variance-reduction form —
# no per-side Σx² needed, prefix sums suffice). Everything is exact
# integer arithmetic: one (type, day) shuffle, a cumulative-sum window
# over the TINY daily table per type, candidate scores on the
# DECIMAL(38,0) ×1e6 grid (identical truncation both engines — the
# score is self-consistently comparable), argmax by (score, earliest
# day). Daily sums ≤ ~1e12 at 100 TB → squares ≤ 1e24, ×1e6 ≤ 1e30,
# inside DECIMAL(38,0).
def ev_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # per-type totals as FULL-PARTITION windows over the tiny daily
    # table — one events scan, no second aggregate+join of the base
    w = Window.partitionBy("event_type").orderBy("day")
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cand = (
        daily
        .withColumn("tot", F.expr("SUM(c)").over(w_full))
        .withColumn("n", F.expr("COUNT(*)").over(w_full))
        .withColumn("i", F.row_number().over(w))
        .withColumn("cum", F.expr("SUM(c)").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter("i < n")  # split AFTER day i: both sides non-empty
        .selectExpr(
            "event_type", "day", "i", "n", "cum", "tot",
            "CAST(CAST(cum AS DECIMAL(38,0)) * cum * 1000000 DIV i "
            "+ CAST(tot - cum AS DECIMAL(38,0)) * (tot - cum) "
            "* 1000000 DIV (n - i) AS DECIMAL(38,0)) AS score",
        )
    )
    wb = Window.partitionBy("event_type").orderBy(
        F.col("score").desc(), F.col("day"))
    return (
        cand.withColumn("rn", F.row_number().over(wb))
        .filter("rn = 1")
        .selectExpr(
            "event_type",
            "day AS cp_day",
            "n AS n_days",
            "CAST(cum * 1000 DIV i AS BIGINT) AS pre_mean_milli",
            "CAST((tot - cum) * 1000 DIV (n - i) AS BIGINT) "
            "AS post_mean_milli",
        )
    )


QUERIES["ev_changepoint"] = ev_changepoint

ORACLES["ev_changepoint"] = """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    totals AS (
        SELECT event_type, SUM(c) AS tot, COUNT(*) AS n
        FROM daily GROUP BY 1
    ),
    cand AS (
        SELECT d.event_type, day,
               row_number() OVER w AS i, n,
               SUM(c) OVER w AS cum, tot
        FROM daily d JOIN totals USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
        SELECT event_type, day, i, n, cum, tot,
               CAST(CAST(cum AS HUGEINT) * cum * 1000000 // i
                    + CAST(tot - cum AS HUGEINT) * (tot - cum)
                    * 1000000 // (n - i) AS HUGEINT) AS score
        FROM cand WHERE i < n
    )
    SELECT event_type, day AS cp_day, n AS n_days,
           CAST(cum * 1000 // i AS BIGINT) AS pre_mean_milli,
           CAST((tot - cum) * 1000 // (n - i) AS BIGINT)
               AS post_mean_milli
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY score DESC, day) AS rn
          FROM scored)
    WHERE rn = 1
"""


# ------------------------------------------- daily peak detection
#
# Local-maximum peak detection over the daily event series — the ops
# dashboard's "spike marker" (which days stood out vs their immediate
# neighbors), complementing ev_daily_anomaly's distributional z-score
# and ev_changepoint's level-shift localization: a peak is a LOCAL
# shape feature both of those miss. A day is a peak when its count
# strictly exceeds both the previous and next OBSERVED day's counts
# (boundary days excluded — one-sided evidence isn't a peak);
# prominence = count − max(neighbors), an exact integer. The global
# lag/lead window runs over the calendar-bounded daily table (|days|
# rows, never the fact table) — the orders_backlog single-partition
# discipline, safe at any corpus size. All-integer: no grids needed.
def ev_daily_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy("day")
    return (
        daily
        .withColumn("prev_n", F.lag("n_events").over(w))
        .withColumn("next_n", F.lead("n_events").over(w))
        .filter("prev_n IS NOT NULL AND next_n IS NOT NULL "
                "AND n_events > prev_n AND n_events > next_n")
        .selectExpr(
            "day", "n_events",
            "CAST(n_events - GREATEST(prev_n, next_n) AS BIGINT) "
            "AS prominence",
        )
    )


QUERIES["ev_daily_peaks"] = ev_daily_peaks

ORACLES["ev_daily_peaks"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    ctx AS (
        SELECT day, n_events,
               lag(n_events) OVER (ORDER BY day) AS prev_n,
               lead(n_events) OVER (ORDER BY day) AS next_n
        FROM daily
    )
    SELECT day, n_events,
           CAST(n_events - GREATEST(prev_n, next_n) AS BIGINT)
               AS prominence
    FROM ctx
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n_events > prev_n AND n_events > next_n
"""

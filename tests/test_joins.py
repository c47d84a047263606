"""As-of and range join operators: correctness vs naive formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.joins import (
    asof_join,
    range_join,
)


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0), ("B", 5, 49.0)],
        "sym STRING, t LONG, px DOUBLE",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 99.5), ("A", 15, 100.5), ("B", 15, 49.9)],
        "sym STRING, t LONG, bid DOUBLE",
    )
    out = {
        (r["sym"], r["t"]): (r["t_asof"], r["bid_asof"])
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="t", right_ts="t"
        ).collect()
    }
    assert out[("A", 10)] == (8, 99.5)       # latest quote before t=10
    assert out[("A", 20)] == (15, 100.5)
    assert out[("B", 15)] == (15, 49.9)      # simultaneous quote visible
    assert out[("B", 5)] == (None, None)     # no prior quote


def test_asof_join_matches_naive(spark):
    import random

    rnd = random.Random(7)
    left = [(k, rnd.randrange(100), i) for i, k in
            enumerate(rnd.choices("xyz", k=60))]
    right = [(k, rnd.randrange(100), rnd.random()) for k in rnd.choices("xyz", k=40)]
    l_df = spark.createDataFrame(left, "k STRING, t LONG, rid LONG")
    r_df = spark.createDataFrame(right, "k STRING, t LONG, v DOUBLE")
    got = {
        (r["k"], r["rid"]): r["t_asof"]
        for r in asof_join(l_df, r_df, on=["k"], left_ts="t", right_ts="t").collect()
    }
    for k, t, rid in left:
        prior = [rt for rk, rt, _ in right if rk == k and rt <= t]
        assert got[(k, rid)] == (max(prior) if prior else None), (k, t)


def test_range_join_basic(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 99)], "pid LONG, x LONG"
    )
    ranges = spark.createDataFrame(
        [("r1", 0, 10), ("r2", 5, 30), ("r3", 90, 100)],
        "rid STRING, lo LONG, hi LONG",
    )
    out = sorted(
        (r["pid"], r["rid"])
        for r in range_join(points, ranges, "x", "lo", "hi", bucket_width=8).collect()
    )
    assert out == [(1, "r1"), (1, "r2"), (2, "r2"), (3, "r2"), (4, "r3")]


def test_range_join_matches_naive(spark):
    import random

    rnd = random.Random(3)
    pts = [(i, rnd.randrange(0, 200)) for i in range(80)]
    rgs = []
    for i in range(30):
        lo = rnd.randrange(0, 190)
        rgs.append((i, lo, lo + rnd.randrange(1, 40)))
    p_df = spark.createDataFrame(pts, "pid LONG, x LONG")
    r_df = spark.createDataFrame(rgs, "rid LONG, lo LONG, hi LONG")
    got = sorted(
        (r["pid"], r["rid"])
        for r in range_join(p_df, r_df, "x", "lo", "hi", bucket_width=16).collect()
    )
    want = sorted(
        (pid, rid) for pid, x in pts for rid, lo, hi in rgs if lo <= x < hi
    )
    assert got == want


def test_range_join_no_cartesian(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.plans import (
        assert_no_cartesian,
    )

    points = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 2).alias("x"))
    ranges = spark.createDataFrame([(1, 0, 50), (2, 50, 100)], "rid LONG, lo LONG, hi LONG")
    assert_no_cartesian(range_join(points, ranges, "x", "lo", "hi", 16), "range_join")

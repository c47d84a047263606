"""Iceberg-style hidden-partitioning transforms on the evolving hive
sink (sinks.py): days/hours/months/years, bucket(n), truncate(w),
spec evolution between transforms, and read-time partition-predicate
reconstruction (asserted in the physical plan, not just on results)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sinks import (
    _Transform,
    read_hidden_partitioned,
    write_hidden_partitioned,
)


def _events(spark, n=200):
    return spark.range(n).selectExpr(
        "id AS k",
        "CONCAT('u', id % 7) AS user",
        "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-03-01 00:00:00')"
        " AS ts",
        "CAST(id * 10 AS INT) AS amount",
    )


def test_transform_parsing_and_canonical():
    assert _Transform("days(ts)").hidden == "ts__days"
    assert _Transform(" bucket( 16 , k )").canonical == "bucket(16, k)"
    assert _Transform("plain").kind == "identity"
    with pytest.raises(ValueError):
        _Transform("bucket(k)")  # missing width
    with pytest.raises(ValueError):
        _Transform("days(3, ts)")  # spurious width
    with pytest.raises(ValueError):
        _Transform("median(ts)")  # unknown transform


def test_days_transform_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_hidden_partitioned(_events(spark), path, ["days(ts)"])
    # source schema intact, hidden column invisible
    df = read_hidden_partitioned(spark, path)
    assert set(df.columns) == {"k", "user", "ts", "amount"}
    assert df.count() == 200

    lo = datetime.datetime(2024, 3, 2, 0, 0)
    hi = datetime.datetime(2024, 3, 2, 23, 59)
    got = read_hidden_partitioned(spark, path, between={"ts": (lo, hi)})
    assert got.count() == 24  # hours 24..47
    # the derived predicate must reach the scan as a PARTITION filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ts__days" in plan and "PartitionFilters" in plan


def test_bucket_transform_equality_prunes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_hidden_partitioned(_events(spark), path, ["bucket(8, k)"])
    got = read_hidden_partitioned(spark, path, eq={"k": 42})
    rows = got.collect()
    assert [r.k for r in rows] == [42]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "k__bucket_8" in plan and "PartitionFilters" in plan
    # the hash must CONSTANT-FOLD so the scan prunes to one bucket dir:
    # the partition filter in the plan carries the folded bucket id,
    # not an unevaluated hash call
    expected = spark.sql("SELECT pmod(hash(CAST(42 AS BIGINT)), 8)").first()[0]
    assert f"= {expected})" in plan
    assert "hash(" not in plan.split("PartitionFilters")[1].split("]")[0]


def test_truncate_transform_string_and_numeric(spark, tmp_path):
    s_path = str(tmp_path / "s")
    write_hidden_partitioned(_events(spark), s_path, ["truncate(2, user)"])
    got = read_hidden_partitioned(spark, s_path, eq={"user": "u3"})
    assert {r.user for r in got.collect()} == {"u3"}

    n_path = str(tmp_path / "n")
    write_hidden_partitioned(_events(spark), n_path, ["truncate(500, amount)"])
    got = read_hidden_partitioned(spark, n_path,
                                  between={"amount": (500, 999)})
    vals = sorted(r.amount for r in got.collect())
    assert vals[0] >= 500 and vals[-1] <= 999 and len(vals) == 50
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "amount__truncate_500" in plan


def test_spec_evolution_days_to_hours_prunes_per_branch(spark, tmp_path):
    """History written under days(ts) keeps serving day-pruned scans
    while new data partitions by hours(ts) — the Iceberg evolution
    story on the hive layout."""
    path = str(tmp_path / "tbl")
    write_hidden_partitioned(_events(spark, 100), path, ["days(ts)"])
    later = _events(spark, 200).filter(F.col("k") >= 100)
    write_hidden_partitioned(later, path, ["hours(ts)"])

    df = read_hidden_partitioned(spark, path)
    assert df.count() == 200
    assert set(df.columns) == {"k", "user", "ts", "amount"}

    lo = datetime.datetime(2024, 3, 5, 0, 0)
    hi = datetime.datetime(2024, 3, 5, 5, 59)
    got = read_hidden_partitioned(spark, path, between={"ts": (lo, hi)})
    assert got.count() == 6  # hours 96..101 (spans both spec subtrees)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ts__days" in plan and "ts__hours" in plan


def test_months_years_range_values():
    t = _Transform("months(ts)")
    assert t.range_values(datetime.datetime(2024, 1, 15),
                          datetime.datetime(2024, 3, 2)) == ("2024-01",
                                                             "2024-03")
    y = _Transform("years(ts)")
    assert y.range_values(datetime.date(2023, 5, 1),
                          datetime.date(2024, 1, 1)) == ("2023", "2024")
    b = _Transform("bucket(4, k)")
    assert b.range_values(1, 9) is None  # buckets never range-prune

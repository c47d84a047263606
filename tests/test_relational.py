"""Per-suite invariants for the relational operators (SURVEY §5).

The oracle harness (test_oracle.py) carries value-exactness; these are
hand-checked semantic invariants that would survive an oracle rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import relational as R
from tests.conftest import SF_SMALL


def test_q1_groups_and_aggregate_sanity(spark):
    rows = {(r["l_returnflag"], r["l_linestatus"]): r
            for r in R.q1_pricing_summary(spark, SF_SMALL).collect()}
    assert len(rows) >= 4  # A/F, N/F, N/O, R/F at any SF
    for r in rows.values():
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["count_order"] > 0


def test_topk_orders_bounded_per_customer(spark):
    per_cust = (
        R.w_topk_orders_per_cust(spark, SF_SMALL)
        .groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    )
    assert per_cust <= 3


def test_running_totals_positive_and_complete(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    df = R.w_running_totals(spark, SF_SMALL)
    assert df.filter(F.col("running_total") <= 0).count() == 0
    assert df.count() == table(spark, SF_SMALL, "orders").count()
    # the running sum dominates the previous order's price
    assert df.filter(
        F.col("prev_price").isNotNull()
        & (F.col("running_total") < F.col("prev_price"))
    ).count() == 0


def test_orders_backlog_conserves_orders(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    out = R.orders_backlog(spark, SF_SMALL)
    n_orders = table(spark, SF_SMALL, "orders").count()
    assert out.agg(F.sum("n_opened")).first()[0] == n_orders


def test_pivot_row_counts_match_groupby(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    pv = R.pivot_order_status(spark, SF_SMALL)
    n_prio = (
        table(spark, SF_SMALL, "orders").select("o_orderpriority").distinct().count()
    )
    assert pv.count() == n_prio

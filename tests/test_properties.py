"""Property-based invariants (hypothesis): the skew rewrites must be
result-identical to their plain formulations on ARBITRARY data, not
just the fixtures — salting is physical, never semantic."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.skew import (
    salted_join,
    two_phase_agg,
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=1,
    max_size=50,
)

_SETTINGS = dict(
    max_examples=8,  # each example runs real Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@settings(**_SETTINGS)
def test_two_phase_agg_equals_plain(spark, data):
    df = spark.createDataFrame(data, "k INT, v INT")
    plain = {
        r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    two = {
        r["k"]: (r["s"], r["n"], r["lo"], r["hi"])
        for r in two_phase_agg(
            df, ["k"], {"s": "sum(v)", "n": "count(v)", "lo": "min(v)", "hi": "max(v)"},
            n_salts=4,
        ).collect()
    }
    assert plain == two


@given(facts=rows, dim=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)),
                                min_size=0, max_size=10, unique_by=lambda t: t[0]))
@settings(**_SETTINGS)
def test_salted_join_equals_plain(spark, facts, dim):
    f = spark.createDataFrame(facts, "k INT, v INT")
    d = spark.createDataFrame(dim, "k INT, attr INT") if dim else \
        spark.createDataFrame([], "k INT, attr INT")
    plain = sorted(tuple(r) for r in f.join(d, "k").collect())
    salted = sorted(
        tuple(r) for r in salted_join(f, d, "k", n_salts=3).select("k", "v", "attr").collect()
    )
    assert plain == salted


def test_pagerank_conserves_mass(spark):
    """Total rank stays ~1 (on the 1e12 grid): teleport + damped mass
    must re-sum to the node count × 1e12 within per-node rounding (±1
    per rounding site per iteration)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.dedup import PR_ITERS, doc_pagerank

    rows = doc_pagerank(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    assert n > 0
    total = sum(r["rank_micro"] for r in rows)
    # ranks are normalized to sum 1 (1e12 on the grid): teleport mass
    # 0.15 + damped mass 0.85·S has fixed point S = 1e12. Rounding
    # drifts ≤ ~1 per rounding site (teleport + damped sum per node,
    # one per edge contribution) per iteration.
    tolerance = 3 * n * (PR_ITERS + 1)
    assert abs(total - 10**12) <= tolerance


def test_exp_smoothing_bounds(spark):
    """EWMA output must lie within [min, max] of the daily series —
    the fold can't overshoot its inputs."""
    import duckdb
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.events import ev_exp_smoothing

    sf = "/root/testdata/sf0.001"
    out = {r["event_type"]: r["smoothed"] for r in ev_exp_smoothing(spark, sf).collect()}
    con = duckdb.connect()
    daily = con.execute(f"""
        SELECT event_type,
               MIN(v) AS lo, MAX(v) AS hi
        FROM (SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
              FROM '{sf}/events.parquet'
              GROUP BY event_type, date_trunc('day', ts))
        GROUP BY event_type
    """).fetchall()
    for et, lo, hi in daily:
        assert lo - 1e-6 <= out[et] <= hi + 1e-6, et

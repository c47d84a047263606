"""Salted join / two-phase agg must be result-identical to the plain
formulations — salting is a physical rewrite, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.skew import (
    salted_join,
    two_phase_agg,
    with_salt,
)

SF_DIR = "/root/testdata/sf0.001"


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_with_salt_deterministic_and_bounded(spark):
    df = spark.range(1000)
    s1 = with_salt(df, 8).collect()
    s2 = with_salt(df, 8).collect()
    assert s1 == s2
    vals = {r["__salt"] for r in s1}
    assert vals <= set(range(8)) and len(vals) > 1


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey", "p_brand")
    plain = li.join(p.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
    salted = salted_join(
        li, p.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", n_salts=4
    )
    assert _sorted(plain.collect()) == _sorted(salted.select(*plain.columns).collect())


def test_two_phase_agg_matches_plain_agg(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    ev = table(spark, SF_DIR, "events")
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("total"),
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    two = two_phase_agg(
        ev,
        ["event_type"],
        {"total": "sum(value)", "n": "count(value)", "lo": "min(value)", "hi": "max(value)"},
        n_salts=8,
    )
    got = {r["event_type"]: r for r in two.collect()}
    for r in plain.collect():
        g = got[r["event_type"]]
        assert (g["n"], g["lo"], g["hi"]) == (r["n"], r["lo"], r["hi"])
        assert abs(g["total"] - r["total"]) < 1e-6


def test_band_pairs_salted_identical_on_stuffed_bucket(spark):
    """The MinHash band join's hot-bucket salt is a physical rewrite:
    on a corpus with one STUFFED band bucket (300 docs sharing a band
    hash, far past the test threshold) plus scattered small buckets,
    the salted pair set must equal the plain join's exactly."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.dedup import _band_pairs

    bands = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "CAST(0 AS INT) AS band_idx",
        # docs 0..299 share one hot bucket; 300+ spread over tiny ones
        "CASE WHEN id < 300 THEN 'hot' ELSE concat('b', CAST(id % 350 AS STRING)) END AS band_hash",
    )
    plain = _sorted(_band_pairs(bands).collect())
    salted = _sorted(_band_pairs(bands, n_salts=8, hot=100).collect())
    assert salted == plain
    # the stuffed bucket alone contributes C(300,2) pairs
    assert len(plain) >= 300 * 299 // 2


def test_minhash_pairs_salted_identical_on_corpus(spark):
    """End-to-end: doc_minhash_pairs with the salt knob on returns the
    identical scored pair set on the real test corpus."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.dedup import doc_minhash_pairs

    plain = _sorted(doc_minhash_pairs(spark, SF_DIR).collect())
    # n_salts=4 routes through the sized/replicated join (buckets here
    # are all below the hot threshold, so g=1 — the degenerate path
    # must also be exact)
    salted = _sorted(doc_minhash_pairs(spark, SF_DIR, n_salts=4).collect())
    assert salted == plain


def test_aqe_splits_skewed_join(spark):
    """Pathological key distribution (one key owns half the rows) must
    trigger AQE's skew-join split when broadcast is off — the runtime
    behavior the 100 TB design leans on — and stay result-correct."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k",
            "id AS v",
        )
        dim = spark.range(0, 1000).selectExpr("id AS k", "id * 10 AS attr")
        joined = fact.join(dim, "k")
        # collect on the join itself so ITS adaptive plan finalizes
        # (count() would execute a different plan object)
        rows = len(joined.collect())
        # key 0: 100k fact rows match dim k=0; odd ids < 1000: 500 more
        assert rows == 100_000 + 500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

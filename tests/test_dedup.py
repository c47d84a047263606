"""Per-suite invariants for the dedup operators (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import dedup as D
from tests.conftest import SF_SMALL


def test_exact_dedup_conserves_docs(spark):
    n_docs = table(spark, SF_SMALL, "documents").count()
    agg = D.doc_exact_dedup(spark, SF_SMALL).agg(
        F.sum("n_copies").alias("total"), F.count(F.lit(1)).alias("groups")
    ).first()
    assert agg["total"] == n_docs
    assert agg["groups"] <= n_docs


def test_minhash_est_jaccard_in_unit_interval(spark):
    out = D.doc_minhash_pairs(spark, SF_SMALL)
    assert out.filter((F.col("est_jaccard") < 0) | (F.col("est_jaccard") > 1)).count() == 0
    assert out.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_minhash64_is_subset_quality(spark):
    """8x8 banding demands ~0.77 Jaccard — every 64-perm candidate pair
    should also estimate high similarity (precision, not recall)."""
    wide = D.doc_minhash64_pairs(spark, SF_SMALL)
    assert wide.filter(F.col("est_jaccard") < 0.5).count() == 0


def test_simhash64_halves_are_32bit(spark):
    out = D.doc_simhash64(spark, SF_SMALL)
    bad = out.filter(
        (F.col("simhash_hi") < 0) | (F.col("simhash_hi") >= 2**32)
        | (F.col("simhash_lo") < 0) | (F.col("simhash_lo") >= 2**32)
    ).count()
    assert bad == 0


def test_cluster_ids_are_component_minimum(spark):
    cc = D.doc_dedup_clusters(spark, SF_SMALL)
    assert cc.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0


def test_dedup_corpus_plus_dropped_equals_docs(spark):
    n_docs = table(spark, SF_SMALL, "documents").count()
    kept = D.doc_dedup_corpus(spark, SF_SMALL).count()
    dropped = (
        D.doc_dedup_clusters(spark, SF_SMALL)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .count()
    )
    assert kept + dropped == n_docs

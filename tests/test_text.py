"""Per-suite invariants for the text-analysis operators (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import text as T
from tests.conftest import SF_SMALL


def test_langid_covers_every_doc_once(spark):
    n_docs = table(spark, SF_SMALL, "documents").count()
    out = T.doc_langid(spark, SF_SMALL)
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_quality_scores_bounded(spark):
    out = T.doc_quality(spark, SF_SMALL)
    numeric = [f.name for f in out.schema.fields
               if f.dataType.typeName() in ("double", "float")]
    for c in numeric:
        assert out.filter(F.col(c).isNull()).count() == 0, c


def test_token_counts_positive(spark):
    out = T.doc_tokens(spark, SF_SMALL)
    cnt_col = [c for c in out.columns if "token" in c or c.startswith("n_")][0]
    assert out.filter(F.col(cnt_col) <= 0).count() == 0


def test_pack_sequences_chunks_are_contiguous(spark):
    out = T.doc_pack_sequences(spark, SF_SMALL)
    assert out.filter(F.col("chunk_offset") < 0).count() == 0
    assert out.filter(F.col("chunk_offset") >= T.PACK_CHUNK).count() == 0


def test_resample_mixture_downsamples_majority_sources(spark):
    docs = table(spark, SF_SMALL, "documents")
    before = {r["source"]: r["count"]
              for r in docs.groupBy("source").count().collect()}
    after = {r["source"]: r["count"]
             for r in T.doc_resample_mixture(spark, SF_SMALL)
             .groupBy("source").count().collect()}
    m = min(before.values())
    for src, n in after.items():
        assert n <= before[src]
        # each source lands near the minority count (hash thinning)
        assert n <= m * 1.5 + 10

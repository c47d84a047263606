"""Per-suite invariants for the similarity-search operators (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import similarity as S
from tests.conftest import SF_SMALL


def test_cosine_topk_shape_and_range(spark):
    out = S.emb_cosine_topk(spark, SF_SMALL).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
        assert -1.0001 <= r["sim"] <= 1.0001
    assert len(by_q) == S.N_QUERIES
    for rows in by_q.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, S.TOP_K + 1))
        # rank order agrees with sim order
        by_rank = sorted(rows, key=lambda r: r["rank"])
        sims = [r["sim"] for r in by_rank]
        assert sims == sorted(sims, reverse=True)


def test_ann_results_are_subset_of_corpus(spark):
    ann = S.emb_lsh_ann(spark, SF_SMALL)
    assert ann.filter(F.col("c_id") < S.N_QUERIES).count() == 0


def test_kmeans_ivf_rank_bounds(spark):
    out = S.emb_kmeans_ivf(spark, SF_SMALL)
    assert out.filter((F.col("rank") < 1) | (F.col("rank") > 3)).count() == 0
    assert out.groupBy("q_id", "rank").count().filter(F.col("count") > 1).count() == 0


def test_ann_recall_vs_bruteforce_nonzero(spark):
    """The sampled-trained quantizer must still find a nontrivial share
    of the exact top-3 (guards against a broken assignment path)."""
    exact = {(r["q_id"], r["c_id"])
             for r in S.emb_cosine_topk(spark, SF_SMALL).filter("rank <= 3").collect()}
    approx = {(r["q_id"], r["c_id"]) for r in S.emb_kmeans_ivf(spark, SF_SMALL).collect()}
    assert len(exact & approx) > 0


def test_sq8_dim_stats_match_embedding_width(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    dim = len(table(spark, SF_SMALL, "embeddings").first()["embedding"])
    assert S.emb_dim_stats(spark, SF_SMALL).count() == dim


def test_semdedup_adaptive_k_engages(spark):
    """The cluster count must GROW with the corpus (K = max(8, N div
    256)) so per-cluster candidate volume stays ~linear: a 5 120-vector
    corpus must spread over 20 clusters, and exact duplicates must
    still be dropped while the lowest-id copy survives."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import _semdedup

    n = 5120
    base = spark.range(n).selectExpr(
        "id AS vec_id",
        # deterministic hash-noise 64-dim vectors (fract(sin·K) noise —
        # decorrelated across ids, chance cosine ~1/√64, far under the
        # 0.35 threshold); vec_id 117 and 4017 are exact copies of
        # vec_id 100 (near-twins by construction, none of them seeds)
        """transform(sequence(0, 63), j ->
             CAST(((sin((CASE WHEN id IN (117, 4017) THEN 100 ELSE id END)
                         * 12.9898 + j * 78.233) * 43758.5453) % 1.0
                   + 1.0) % 1.0 - 0.5 AS FLOAT)
           ) AS embedding""",
    )
    out = _semdedup(base)
    clusters = out.select("cluster").distinct().count()
    # K = max(8, 5120 div 256) = 20 seeds; every NON-EMPTY cluster is
    # one of them, and far more than the fixed-K floor must be in use
    assert 8 < clusters <= 20
    kept = {r.vec_id: r.keep for r in out.collect()}
    # the two higher-id exact copies always have the lower-id copy as
    # a sim-1.0 neighbor, so they can never survive
    assert kept[117] is False
    assert kept[4017] is False
    # the corpus isn't degenerately flagged: a large share survives
    assert sum(kept.values()) > n * 0.4


def test_hybrid_rrf_fuses_both_sides(spark):
    """The fused top-10 must rank docs by RRF with contributions from
    BOTH retrieval sides: at least one result carries a text rank and
    at least one carries a vector rank; rank is dense 1..10; a doc
    present in both top-50 lists outscores one with a single equal
    rank."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    out = sorted(
        entrymod.queries()["hybrid_search_rrf"](spark, SF_SMALL).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in out] == list(range(1, 11))
    assert any(r.text_rank is not None for r in out)
    assert any(r.vec_rank is not None for r in out)
    # rrf monotone non-increasing with rank
    scores = [r.rrf_score for r in out]
    assert scores == sorted(scores, reverse=True)
    # both-sides doc (if any) beats a one-sided doc with the same
    # best-side rank
    both = [r for r in out if r.text_rank is not None and r.vec_rank is not None]
    if both:
        assert both[0].rrf_score > 1.0 / (60 + min(
            x for x in (both[0].text_rank, both[0].vec_rank)
        ))


def test_emb_incr_ivf_recurring_cost_is_corpus_free(spark):
    """r10 verdict item 6: the committed-IVF incremental entry's
    recurring plan reads the raw embeddings table exactly ONCE (the
    new batch, filter pushed) — corpus vectors come from the committed
    versioned index (centroids broadcast, assignments partition-laid
    by cluster), so the nightly cost is O(new batch), corpus-free."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ivf_index_paths, emb_incr_ivf,
    )

    sf = "/root/testdata/sf0.001"
    cent_path, asg_path = _ivf_index_paths(spark, sf)
    # the index is a real versioned table: v0 corpus build, v1 the
    # new batch's fast-append — and the append is load-bearing
    assert len(versioned.versions(asg_path)) == 2
    v0 = versioned.read_version(spark, asg_path, 0).count()
    v1 = versioned.read_version(spark, asg_path, 1).count()
    assert v1 > v0  # appended assignments, corpus rows untouched

    df = emb_incr_ivf(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("embeddings.parquet") == 1
    # corpus side reads the committed index files, not raw embeddings
    assert "ivf_assign" in plan
    # and the result is non-trivial (oracle equivalence is test_oracle's
    # job; this is the plan-shape gate)
    assert df.count() > 0


def test_ivf_maintenance_recluster_when_drifted(spark, tmp_path):
    """r11 verdict item 2 — the vector OPTIMIZE: fast-appended batches
    from a new data region land whole in one nearest cluster and skew
    the committed index; maintain_ivf_index reads the imbalance dial
    off the committed assignments and, past the threshold, re-trains
    from the current centroids and rewrites BOTH index tables as new
    versions. Queries stay answer-equivalent across the recluster, the
    imbalance measurably drops, old versions stay time-travelable, and
    a healthy index is a no-op."""
    from pyspark.sql.functions import broadcast

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ASSIGN_EXPR, _as_model, _qnorm, ivf_index_imbalance,
        ivf_query_topk, maintain_ivf_index,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    cent, asg = str(tmp_path / "cent"), str(tmp_path / "asg")
    A = [1000000, 0, 0, 0]          # corpus blob 1
    B = [980000, 199000, 0, 0]      # corpus blob 2, near A
    C = [0, 0, 1000000, 0]          # the appended new-region blob

    def blob(vec, ids):
        return spark.createDataFrame(
            [(i, vec) for i in ids], "c_id LONG, ca ARRAY<BIGINT>"
        ).withColumn("cn", F.expr(_qnorm("ca")))

    corpus = blob(A, range(80)).union(blob(B, range(100, 180)))
    cents0 = spark.createDataFrame(
        [(0, A), (1, B)], "cluster_id INT, sa ARRAY<BIGINT>"
    ).withColumn("sn", F.expr(_qnorm("sa")))
    versioned.write_version(cents0, cent)
    model = _as_model(versioned.read_version(spark, cent)
                      .select("cluster_id", "sa", "sn"))
    assign0 = corpus.crossJoin(broadcast(model)).select(
        F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn")
    versioned.write_version(assign0, asg, partition_by=["cluster_id"])
    assert ivf_index_imbalance(spark, asg) == 1_000_000  # balanced

    # nightly append: the whole new-region batch lands in ONE cluster
    spark.dataSource.register(VersionedDataSource)
    newa = blob(C, range(1000, 1240)).crossJoin(broadcast(model)).select(
        F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn")
    newa.write.format("versioned").mode("append").option("path", asg).save()
    drift = ivf_index_imbalance(spark, asg)
    assert drift > 1_200_000  # 320/80 split → 1.36

    q = (blob(A, [9000]).union(blob(C, [9001]))
         .selectExpr("c_id AS q_id", "ca AS qa", "cn AS qn"))
    before = sorted(tuple(r) for r in
                    ivf_query_topk(spark, cent, asg, q).collect())

    rep = maintain_ivf_index(spark, cent, asg)
    assert rep["reclustered"]
    assert rep["imbalance_before_ppm"] == drift
    assert rep["imbalance_after_ppm"] < drift  # measurably rebalanced
    after = sorted(tuple(r) for r in
                   ivf_query_topk(spark, cent, asg, q).collect())
    assert before == after  # answers equivalent across the recluster

    # the recluster is a COMMIT: history intact, old versions readable
    assert len(versioned.versions(asg)) == 3
    assert len(versioned.versions(cent)) == 2
    assert versioned.read_version(spark, asg, 1).count() == 400
    # a healthy index is a metadata-only no-op
    rep2 = maintain_ivf_index(spark, cent, asg)
    assert not rep2["reclustered"]
    assert len(versioned.versions(asg)) == 3


def test_emb_incr_semdedup_corpus_free_and_consistent(spark):
    """r12 verdict item 2 — incremental SemDeDup over the committed
    IVF index: the recurring plan never scans the corpus embeddings.
    The new batch is read ONCE (the assignment pass's single scan,
    materialized by localCheckpoint), so the triage plan contains
    ZERO embeddings scans and the corpus side reads the committed
    ivf_assign table at version 0
    (pre-append). Consistency: batch vectors the full-corpus
    emb_semdedup would keep are a superset sanity-checked by count,
    and every cluster id is a committed centroid."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ivf_index_paths, emb_incr_semdedup,
    )

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _incr_semdedup_assigned,
    )

    sf = "/root/testdata/sf0.001"
    # the assignment pass is the plan's ONE embeddings scan ...
    asg_plan = _incr_semdedup_assigned(spark, sf) \
        ._jdf.queryExecution().executedPlan().toString()
    assert asg_plan.count("embeddings.parquet") == 1
    # ... and the triage plan contains ZERO embeddings scans: the
    # assignment is materialized by localCheckpoint, the corpus side
    # reads the committed index
    df = emb_incr_semdedup(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("embeddings.parquet") == 0
    assert "ivf_assign" in plan        # corpus = committed index
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.keep in (True, False) for r in rows)
    assert 0 < sum(r.keep for r in rows) <= len(rows)
    # every assigned cluster is a committed centroid id
    cent_path, _ = _ivf_index_paths(spark, sf)
    cents = {r.cluster_id for r in
             versioned.read_version(spark, cent_path)
             .select("cluster_id").collect()}
    assert {r.cluster for r in rows} <= cents


def test_pca_moment_partials_match_expression_form(spark):
    """The Arrow/numpy moment pass (r14: batch X·Xᵀ partials per Arrow
    batch + per-dim column sums tagged j = -1) must reproduce, bit for
    bit, the r13 expression form (per-row upper-triangle explode) for
    both the cross-moment table AND the per-dimension sums — the
    integer-grid covariance is oracle-gated, so any drift here is a
    correctness bug, not a perf regression."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import _split

    _, c = _split(spark, SF_SMALL)
    c = c.localCheckpoint()
    ref_upper = {
        (r["i"], r["j"]): r["sxx"]
        for r in c.select(F.expr(
            "explode(flatten(transform(sequence(0, size(ca) - 1), i -> "
            "transform(sequence(i, size(ca) - 1), j -> "
            "named_struct('i', i, 'j', j, "
            "'p', element_at(ca, i + 1) * element_at(ca, j + 1)))))) AS e"
        )).selectExpr("e.i AS i", "e.j AS j", "e.p AS p")
        .groupBy("i", "j")
        .agg(F.expr("SUM(CAST(p AS DECIMAL(38,0)))").alias("sxx"))
        .collect()
    }
    ref_sums = {
        r["pos"]: r["sx"]
        for r in c.select(F.posexplode("ca").alias("pos", "x"))
        .groupBy("pos").agg(F.expr("SUM(x)").alias("sx")).collect()
    }
    # regenerate the partials exactly the way _pca_cov does
    from pyspark.sql import functions as FF

    gen_src = c.select("ca")

    def _partials(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            col = b.column(0)
            n = len(col)
            if n == 0:
                continue
            lens = col.value_lengths().to_numpy(zero_copy_only=False)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            x = np.ascontiguousarray(
                flat.reshape(n, lens[0]).astype(np.int64, copy=False))
            d = x.shape[1]
            m = x.T @ x
            iu, ju = np.triu_indices(d)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate([iu, np.arange(d)])
                          .astype(np.int64)),
                 pa.array(np.concatenate([ju, np.full(d, -1)])
                          .astype(np.int64)),
                 pa.array(np.concatenate([m[iu, ju], x.sum(axis=0)]))],
                names=["i", "j", "p"],
            )

    part = gen_src.mapInArrow(_partials, schema="i long, j long, p long")
    got_upper = {
        (r["i"], r["j"]): r["sxx"]
        for r in part.filter("j >= 0").groupBy("i", "j")
        .agg(FF.expr("SUM(CAST(p AS DECIMAL(38,0)))").alias("sxx"))
        .collect()
    }
    got_sums = {
        r["pos"]: r["sx"]
        for r in part.filter("j = -1").groupBy("i")
        .agg(FF.expr("SUM(p)").alias("sx"))
        .selectExpr("CAST(i AS INT) AS pos", "sx").collect()
    }
    assert got_upper == ref_upper
    assert got_sums == ref_sums

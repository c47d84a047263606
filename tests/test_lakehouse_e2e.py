"""End-to-end lakehouse flow: raw ND-JSON → quarantine → versioned
commit → copy-on-write MERGE → OPTIMIZE → time-travel reads → vacuum.
Each stage is covered unit-wise elsewhere; this test proves the
COMPOSITION — the artifact each stage hands the next is exactly what
the next stage expects."""

from __future__ import annotations

import json
import os

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sinks import (
    read_quarantine,
    write_quarantine,
)


def test_lakehouse_pipeline_end_to_end(spark, tmp_path):
    # 1. raw ND-JSON lands (two extract batches, some rows malformed)
    raw = tmp_path / "raw"
    raw.mkdir()
    rows = (
        [{"k": i, "amount": float(i), "day": i % 3} for i in range(40)]
        + [{"k": 100, "amount": -4.0, "day": 0},     # rule violation
           {"k": 101, "amount": None, "day": 1}]     # NULL → violation
    )
    (raw / "b0.ndjson").write_text("\n".join(json.dumps(r) for r in rows[:21]))
    (raw / "b1.ndjson").write_text("\n".join(json.dumps(r) for r in rows[21:]))
    src = spark.read.schema("k INT, amount DOUBLE, day INT").json(
        str(raw / "*.ndjson")
    )

    # 2. quarantine: bad rows split off with audit, good rows proceed
    qpath = str(tmp_path / "quarantine")
    counts = write_quarantine(src, {"amount_nonneg": "amount >= 0"}, qpath)
    assert counts == {"n_good": 40, "n_bad": 2}
    good = read_quarantine(spark, qpath, "good").drop("_violations")

    # 3. first versioned commit, range-laid-out with key stats
    table = str(tmp_path / "table")
    v0 = versioned.write_version(
        good.repartitionByRange(4, "k"), table, stats_col="k"
    )
    assert v0 == 0

    # 4. CDC batch → copy-on-write MERGE (upsert k=5, delete k=7)
    ch = spark.createDataFrame(
        [(5, 500.0, 2, False), (7, 0.0, 1, True), (200, 42.0, 0, False)],
        "k INT, amount DOUBLE, day INT, is_delete BOOLEAN",
    )
    mstats = versioned.merge_version_cow(spark, table, ch, "k")
    # change keys span the whole keyspace (200 is an insert above every
    # file's range), so stat-pruning can't exclude by span — the exact
    # touched-file scan still keeps the rewrite to the files actually
    # holding keys 5 and 7
    assert mstats["files_shared"] >= 2
    assert mstats["files_rewritten"] < mstats["files_total"]

    # 5. OPTIMIZE back to two tight files, history preserved
    ostats = versioned.optimize_version(spark, table, target_files=2,
                                        sort_col="k", stats_col="k")
    assert ostats["files_after"] == 2

    # 6. time travel: all three states remain readable and correct
    s0 = {r.k: r.amount for r in versioned.read_version(spark, table, 0).collect()}
    s1 = {r.k: r.amount for r in versioned.read_version(spark, table, 1).collect()}
    s2 = {r.k: r.amount for r in versioned.read_version(spark, table).collect()}
    assert len(s0) == 40 and s0[5] == 5.0 and 7 in s0
    assert s1[5] == 500.0 and 7 not in s1 and s1[200] == 42.0 and len(s1) == 40
    assert s2 == s1  # OPTIMIZE changed layout, not content

    # 7. schema-evolving MERGE: a CDC batch arrives with a new column
    ch2 = spark.createDataFrame(
        [(5, 555.0, 2, "EUR", False), (300, 7.0, 1, "USD", False)],
        "k INT, amount DOUBLE, day INT, currency STRING, is_delete BOOLEAN",
    )
    import pytest
    with pytest.raises(ValueError, match="evolve_schema"):
        versioned.merge_version_cow(spark, table, ch2, "k")
    estats = versioned.merge_version_cow(spark, table, ch2, "k",
                                         evolve_schema=True)
    assert estats["files_shared"] >= 1  # untouched files NOT rewritten
    s3 = {r.k: (r.amount, r.currency)
          for r in versioned.read_version(spark, table).collect()}
    assert s3[5] == (555.0, "EUR") and s3[300] == (7.0, "USD")
    # pre-evolution rows are NULL-backfilled, not rewritten
    assert s3[200] == (42.0, None) and len(s3) == 41
    # time travel ACROSS the schema change: old versions keep old schema
    assert "currency" not in versioned.read_version(spark, table, 1).columns
    assert s1 == {r.k: r.amount
                  for r in versioned.read_version(spark, table, 1).collect()}
    # the format("versioned") reader serves the evolved schema too
    spark.dataSource.register(
        __import__(
            "batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds",
            fromlist=["VersionedDataSource"],
        ).VersionedDataSource
    )
    ds = (spark.read.format("versioned").option("path", table).load()
          .collect())
    assert {r.k: (r.amount, r.currency) for r in ds} == s3

    # 8. DESCRIBE HISTORY reflects sharing, then vacuum retires v0-v2
    hist = {r.version: r for r in versioned.history(spark, table).collect()}
    assert hist[1].files_shared_with_prev >= 2
    dropped = versioned.vacuum(table, keep_last=1)
    assert dropped == [0, 1, 2]
    final = {r.k: (r.amount, r.currency)
             for r in versioned.read_version(spark, table).collect()}
    assert final == s3
    # everything not referenced by the surviving manifest is gone
    live = set(versioned._load_manifest(table, 3)["files"])
    on_disk = {
        f"{d}/{f}"
        for d in os.listdir(table)
        if os.path.isdir(os.path.join(table, d)) and d != "_manifest"
        for f in os.listdir(os.path.join(table, d))
        if not f.startswith(("_", "."))
    }
    assert on_disk == live


def test_lakehouse_sql_and_hidden_partition_composition(spark, tmp_path):
    """r5 surfaces composed end-to-end: land raw events into a
    hidden-partitioned (days→hours spec-evolved) hive table, curate a
    versioned dimension through the SQL MERGE INTO statement, and
    verify both read paths — source-predicate partition pruning and
    post-MERGE time travel — agree with the raw data."""
    import datetime

    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.merge_sql import merge_into
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sinks import (
        read_hidden_partitioned,
        write_hidden_partitioned,
    )

    # -- fact side: two eras of layout, one logical table
    facts = spark.range(96).selectExpr(
        "id AS k",
        "timestampadd(HOUR, CAST(id AS INT), "
        "TIMESTAMP '2024-05-01 00:00:00') AS ts",
        "CAST(id % 5 AS INT) AS dim_id",
    )
    fpath = str(tmp_path / "facts")
    write_hidden_partitioned(facts.filter("k < 48"), fpath, ["days(ts)"])
    write_hidden_partitioned(facts.filter("k >= 48"), fpath, ["hours(ts)"])

    day2 = (datetime.datetime(2024, 5, 2, 0, 0),
            datetime.datetime(2024, 5, 2, 23, 59))
    pruned = read_hidden_partitioned(spark, fpath, between={"ts": day2})
    assert pruned.count() == 24

    # -- dimension side: versioned table curated via SQL MERGE
    dpath = str(tmp_path / "dim")
    dim = spark.range(5).selectExpr("CAST(id AS INT) AS dim_id",
                                    "CONCAT('seg', id) AS segment")
    versioned.write_version(dim, dpath, stats_col="dim_id")
    spark.createDataFrame([(1, "gold", False), (4, None, True)],
                          "dim_id INT, segment STRING, dead BOOLEAN"
                          ).createOrReplaceTempView("dim_changes")
    merge_into(spark, f"""
        MERGE INTO versioned.`{dpath}` AS t USING dim_changes AS s
        ON t.dim_id = s.dim_id
        WHEN MATCHED AND s.dead THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)

    # -- join the pruned facts against the curated dimension
    joined = pruned.join(
        F.broadcast(versioned.read_version(spark, dpath)), "dim_id"
    )
    segs = {r.segment for r in joined.collect()}
    assert "gold" in segs and "seg1" not in segs and "seg4" not in segs
    # dim_id 4 was deleted by the MERGE: its fact rows drop from the join
    assert joined.count() == sum(
        1 for h in range(24, 48) if h % 5 != 4
    )
    # pre-MERGE snapshot still serves the old dimension
    old = {r.segment for r in versioned.read_version(spark, dpath, 0).collect()}
    assert old == {f"seg{i}" for i in range(5)}


def test_medallion_streaming_through_versioned_table(spark, tmp_path):
    """Bronze→silver medallion composition: a streaming JSON feed is
    fast-appended into a versioned table one version per micro-batch
    (append_stream_versioned), and the SILVER layer consumes that
    table AS A STREAM (readStream.format('versioned')) into an
    aggregation — the full lakehouse streaming handoff with exact
    per-version deltas and checkpointed resume on both legs."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        append_stream_versioned,
    )

    try:
        spark.dataSource.register(VersionedDataSource)
    except Exception:
        pass

    bronze = str(tmp_path / "bronze")
    src = tmp_path / "feed"
    src.mkdir()

    def feed(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    def ingest():
        stream = (
            spark.readStream.schema("user_id LONG, value LONG")
            .json(str(src))
        )
        q = append_stream_versioned(
            stream, bronze, checkpoint=str(tmp_path / "bronze_ckpt")
        )
        q.processAllAvailable()
        q.stop()

    feed("b1.json", [{"user_id": 1, "value": 10},
                     {"user_id": 2, "value": 20}])
    ingest()
    feed("b2.json", [{"user_id": 1, "value": 5}])
    ingest()
    assert versioned.versions(bronze) == [0, 1]
    # fast append: v1 shares v0's files
    m0 = versioned._load_manifest(bronze, 0)
    m1 = versioned._load_manifest(bronze, 1)
    assert set(m0["files"]) < set(m1["files"])

    silver_out = str(tmp_path / "silver")

    def drain_silver():
        q = (
            spark.readStream.format("versioned").option("path", bronze)
            .load()
            .writeStream.format("parquet").option("path", silver_out)
            .option("checkpointLocation", str(tmp_path / "silver_ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(silver_out).groupBy("user_id").sum("value")
        return {r["user_id"]: r["sum(value)"] for r in rows.collect()}

    assert drain_silver() == {1: 15, 2: 20}
    # another bronze batch; the silver stream resumes from its
    # checkpoint and consumes ONLY version 2's delta (no double count)
    feed("b3.json", [{"user_id": 2, "value": 7}])
    ingest()
    assert versioned.versions(bronze) == [0, 1, 2]
    assert drain_silver() == {1: 15, 2: 27}


def test_dedup_ingest_versioned_stream(spark, tmp_path):
    """Dedup-on-ingest: a streaming document feed lands in a versioned
    corpus with exact dedup against (a) everything already committed
    and (b) the batch itself; replayed/duplicate content commits
    nothing, so versions advance only when genuinely new rows arrive
    and the corpus never holds two copies of one text."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        dedup_ingest_versioned_stream,
    )

    try:
        spark.dataSource.register(VersionedDataSource)
    except Exception:
        pass

    corpus = str(tmp_path / "corpus")
    src = tmp_path / "feed"
    src.mkdir()

    def feed(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    def ingest():
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .json(str(src))
        )
        q = dedup_ingest_versioned_stream(
            stream, corpus, checkpoint=str(tmp_path / "ckpt")
        )
        q.processAllAvailable()
        q.stop()

    # batch 1: an intra-batch duplicate (docs 1 and 2 share text)
    feed("b1.json", [{"doc_id": 1, "text": "alpha beta"},
                     {"doc_id": 2, "text": "alpha beta"},
                     {"doc_id": 3, "text": "gamma"}])
    ingest()
    assert versioned.versions(corpus) == [0]
    got = {r.text for r in versioned.read_version(spark, corpus).collect()}
    assert got == {"alpha beta", "gamma"}

    # batch 2: one corpus duplicate + one new doc -> only the new row
    feed("b2.json", [{"doc_id": 4, "text": "gamma"},
                     {"doc_id": 5, "text": "delta"}])
    ingest()
    assert versioned.versions(corpus) == [0, 1]
    rows = versioned.read_version(spark, corpus).collect()
    assert {r.text for r in rows} == {"alpha beta", "gamma", "delta"}
    assert len(rows) == 3
    # fast append: v1 shares v0's files
    m0 = versioned._load_manifest(corpus, 0)
    m1 = versioned._load_manifest(corpus, 1)
    assert set(m0["files"]) < set(m1["files"])

    # batch 3: all duplicates -> NO new version
    feed("b3.json", [{"doc_id": 6, "text": "delta"},
                     {"doc_id": 7, "text": "alpha beta"}])
    ingest()
    assert versioned.versions(corpus) == [0, 1]

    # NULL content dedups like any other value (sentinel hash): two
    # null-text rows in one batch keep one; a later null-text row is a
    # corpus duplicate and commits nothing
    feed("b4.json", [{"doc_id": 8, "text": None},
                     {"doc_id": 9, "text": None}])
    ingest()
    assert versioned.versions(corpus) == [0, 1, 2]
    rows = versioned.read_version(spark, corpus).collect()
    assert sum(1 for r in rows if r.text is None) == 1
    feed("b5.json", [{"doc_id": 10, "text": None}])
    ingest()
    assert versioned.versions(corpus) == [0, 1, 2]


def test_streaming_mv_maintenance_equals_batch_rebuild(spark, tmp_path):
    """Streaming materialized-view maintenance (r10 verdict item 4):
    readStream CDF source → foreachBatch signed-delta MERGE into a
    versioned monthly rollup, asserted EQUAL to the batch rebuild at
    every source commit, incremental (merge touches only affected
    months) and exactly-once (a fresh-checkpoint replay is skipped by
    the mv_applied_src_version stamp)."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        maintain_monthly_rollup, mv_applied_source_version,
    )

    spark.dataSource.register(VersionedDataSource)
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")

    def mk_rows(ks):
        return [(k, f"2024-{1 + k % 3:02d}-{1 + k % 27:02d}",
                 round(100.0 + k, 2)) for k in ks]

    base = spark.createDataFrame(
        mk_rows(range(40)),
        "o_orderkey INT, d STRING, p DOUBLE",
    ).selectExpr("o_orderkey", "CAST(d AS DATE) AS o_orderdate",
                 "CAST(p AS DECIMAL(18,4)) AS o_totalprice")
    versioned.write_version(base.repartition(2), src)      # v0
    versioned.set_table_property(src, "cdf.enabled", "true")

    def drain(ck):
        q = maintain_monthly_rollup(spark, src, mv, str(tmp_path / ck))
        q.awaitTermination(180)

    def mv_rows():
        return sorted(tuple(r) for r in
                      versioned.read_version(spark, mv).collect())

    def rebuild():
        return sorted(tuple(r) for r in
                      versioned.read_version(spark, src)
                      .groupBy(F.date_trunc("month", "o_orderdate")
                               .alias("month"))
                      .agg(F.expr("CAST(SUM(o_totalprice) "
                                  "AS DECIMAL(18,4))").alias("total_sales"),
                           F.count(F.lit(1)).alias("n_orders"))
                      .collect())

    # bootstrap + v0 replayed as inserts
    drain("ck")
    assert mv_rows() == rebuild()

    # COW MERGE: update, insert, delete in one commit
    ch = spark.createDataFrame(
        [(3, "2024-01-05", 999.5, False),
         (100, "2024-02-09", 50.25, False),
         (7, None, None, True)],
        "o_orderkey INT, d STRING, p DOUBLE, is_delete BOOLEAN",
    ).selectExpr("o_orderkey", "CAST(d AS DATE) AS o_orderdate",
                 "CAST(p AS DECIMAL(18,4)) AS o_totalprice", "is_delete")
    versioned.merge_version_cow(spark, src, ch, "o_orderkey")
    drain("ck")
    assert mv_rows() == rebuild()

    # MOR DELETE of an entire month: the month must LEAVE the view
    versioned.set_table_property(src, "dv.enabled", "true")
    versioned.delete_where(spark, src, "month(o_orderdate) = 3")
    drain("ck")
    assert mv_rows() == rebuild()
    assert all(r[0].month != 3 for r in
               versioned.read_version(spark, mv).collect())

    # predicate UPDATE
    versioned.update_where(
        spark, src, {"o_totalprice": "o_totalprice + 1"},
        "o_orderkey % 5 = 0")
    drain("ck")
    assert mv_rows() == rebuild()

    # exactly-once: a FRESH checkpoint replays the whole feed, but the
    # mv_applied_src_version stamp says it's applied — no new MV commit
    n_versions = len(versioned.versions(mv))
    stamp = mv_applied_source_version(mv)
    drain("ck_fresh")
    assert len(versioned.versions(mv)) == n_versions
    assert mv_applied_source_version(mv) == stamp
    assert mv_rows() == rebuild()

    # MIXED replay: the source advances, THEN a fresh checkpoint
    # restarts the stream. availableNow delivers ONE batch holding
    # already-applied versions AND the new one — per-VERSION
    # idempotency must re-apply only rows past the stamp (a
    # whole-batch skip keyed on max(_commit_version) double-applies
    # every old delta here, silently corrupting the rollup).
    (spark.createDataFrame(
        [(200, "2024-02-20", 77.0), (201, "2024-03-21", 88.0)],
        "o_orderkey INT, d STRING, p DOUBLE",
    ).selectExpr("o_orderkey", "CAST(d AS DATE) AS o_orderdate",
                 "CAST(p AS DECIMAL(18,4)) AS o_totalprice")
     .write.format("versioned").mode("append").option("path", src)
     .save())
    drain("ck_mixed_fresh")
    assert mv_rows() == rebuild()
    assert mv_applied_source_version(mv) == versioned.versions(src)[-1]

    # O(1) stamp reads: the txn ledger rides every commit, so reading
    # the stamp costs ONE materialized manifest load — bounded by the
    # delta-chain checkpoint interval, independent of how many commits
    # the MV has accumulated.
    from unittest import mock

    real = versioned._read_raw_manifest
    with mock.patch.object(versioned, "_read_raw_manifest",
                           side_effect=real) as spy:
        assert mv_applied_source_version(mv) is not None
    assert spy.call_count <= versioned._CHECKPOINT_INTERVAL

    # the maintenance is incremental: the last delta commit shares all
    # untouched months' files (COW merge stats prove O(changes) work)
    # — read the operation trail instead of timing
    ops = [versioned._load_manifest(mv, v).get("operation")
           for v in versioned.versions(mv)]
    assert ops.count("MERGE") >= 4


def test_streaming_dedup_curation_loop(spark, tmp_path):
    """Streaming corpus curation over the committed dedup index (the
    r12 streaming twin of doc_incr_dedup): CDF feed → foreachBatch
    triage against the committed hash index → first-seen docs append
    to the curated table, their hashes to the index. Per-version
    exactly-once on BOTH tables via DS-writer txn stamps — a fresh
    checkpoint mixing replayed and new source versions re-applies only
    the new ones."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        maintain_dedup_corpus,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cur, idx = (str(tmp_path / n) for n in ("src", "cur", "idx"))

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    versioned.write_version(
        docs([(1, "alpha"), (2, "beta"), (3, "alpha")]), src)  # 3 dups 1
    versioned.set_table_property(src, "cdf.enabled", "true")

    def drain(ck):
        q = maintain_dedup_corpus(spark, src, cur, idx,
                                  str(tmp_path / ck))
        q.awaitTermination(180)

    def curated():
        return sorted(tuple(r) for r in
                      versioned.read_version(spark, cur).collect())

    drain("ck")
    assert curated() == [(1, "alpha"), (2, "beta")]

    # batch 2: a corpus dup, a new doc, an intra-batch dup of it
    (docs([(4, "beta"), (5, "gamma"), (6, "gamma")])
     .write.format("versioned").mode("append").option("path", src).save())
    drain("ck")
    assert curated() == [(1, "alpha"), (2, "beta"), (5, "gamma")]

    # MIXED fresh-checkpoint replay: new source version + old ones in
    # ONE availableNow batch — only the new version applies
    (docs([(7, "alpha"), (8, "delta")])
     .write.format("versioned").mode("append").option("path", src).save())
    drain("ck_fresh")
    assert curated() == [(1, "alpha"), (2, "beta"), (5, "gamma"),
                         (8, "delta")]
    # and a pure replay is a no-op on both tables
    n_cur, n_idx = (len(versioned.versions(p)) for p in (cur, idx))
    drain("ck_fresh2")
    assert (len(versioned.versions(cur)),
            len(versioned.versions(idx))) == (n_cur, n_idx)
    # index rows mirror the curated corpus exactly
    assert versioned.read_version(spark, idx).count() == 4


def test_streaming_vector_index_maintenance(spark, tmp_path):
    """Streaming twin #20 — the vector-index loop composed from the
    r12 pieces: CDF feed of a versioned embeddings table →
    foreachBatch assigns new vectors against the committed centroids,
    fast-appends txn-stamped per source version, and runs the
    recluster-when-drifted check. A new-region batch skews the index
    past the threshold → the recluster fires inside the stream, the
    imbalance drops, queries stay answer-equivalent, and a fresh-
    checkpoint mixed replay re-applies only unapplied versions."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ASSIGN_EXPR, _as_model, _qnorm, ivf_index_imbalance,
        ivf_query_topk,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        maintain_vector_index,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cent, asg = (str(tmp_path / n) for n in ("src", "cent", "asg"))
    A = [1000000, 0, 0, 0]
    B = [980000, 199000, 0, 0]
    C = [0, 0, 1000000, 0]

    def blob(vec, ids):
        return spark.createDataFrame(
            [(i, vec) for i in ids], "c_id LONG, ca ARRAY<BIGINT>"
        ).withColumn("cn", F.expr(_qnorm("ca")))

    # committed index over the corpus (blobs A + B), balanced
    corpus = blob(A, range(80)).union(blob(B, range(100, 180)))
    cents0 = spark.createDataFrame(
        [(0, A), (1, B)], "cluster_id INT, sa ARRAY<BIGINT>"
    ).withColumn("sn", F.expr(_qnorm("sa")))
    versioned.write_version(cents0, cent)
    model = _as_model(versioned.read_version(spark, cent)
                      .select("cluster_id", "sa", "sn"))
    versioned.write_version(
        corpus.crossJoin(broadcast(model)).select(
            F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn"),
        asg, partition_by=["cluster_id"])

    # the SOURCE stream: a versioned table of new vector batches
    versioned.write_version(blob(C, range(1000, 1100)), src)   # v0

    def drain(ck):
        q = maintain_vector_index(spark, src, cent, asg,
                                  str(tmp_path / ck))
        q.awaitTermination(180)

    drain("ck")  # 100 C-vectors land whole in one cluster: 260 rows,
    # imbalance 1.15 < 1.2 — healthy, no recluster yet
    n_after_first = versioned.read_version(spark, asg).count()
    assert n_after_first == 260
    assert len(versioned.versions(cent)) == 1

    # append a second C batch: drift passes 1.2 → recluster fires
    (blob(C, range(1100, 1240)).write.format("versioned")
     .mode("append").option("path", src).save())              # v1
    q = (blob(A, [9000]).union(blob(C, [9001]))
         .selectExpr("c_id AS q_id", "ca AS qa", "cn AS qn"))
    before = sorted(tuple(r) for r in
                    ivf_query_topk(spark, cent, asg, q).collect())
    drain("ck")
    assert versioned.read_version(spark, asg).count() == 400
    assert ivf_index_imbalance(spark, asg) <= 1_200_000  # reclustered
    assert len(versioned.versions(cent)) == 2             # new model
    after = sorted(tuple(r) for r in
                   ivf_query_topk(spark, cent, asg, q).collect())
    assert before == after  # answers equivalent across the recluster

    # mixed fresh-checkpoint replay: only the new version applies
    (blob(A, range(2000, 2010)).write.format("versioned")
     .mode("append").option("path", src).save())              # v2
    drain("ck_fresh")
    assert versioned.read_version(spark, asg).count() == 410
    # pure replay: no new commits on the index
    n_v = len(versioned.versions(asg))
    drain("ck_fresh2")
    assert len(versioned.versions(asg)) == n_v


def test_dedup_curation_crash_between_appends_with_new_versions(
        spark, tmp_path):
    """The one crash window the whole-batch curated guard got wrong
    (r12 ADVICE): the job dies AFTER the curated append (curated stamp
    = hi) but BEFORE the index append, and NEW source versions land
    before restart — so the replay batch spans old + new versions with
    hi2 > hi. The index never learned the old versions' hashes, so
    their docs reappear in `fresh`; per-row `_commit_version >
    <table's own stamp>` filtering must keep them OUT of the curated
    table (already there) while still landing them in the index."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        _CURATE_TXN_APP, maintain_dedup_corpus,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cur, idx = (str(tmp_path / n) for n in ("src", "cur", "idx"))

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    versioned.write_version(docs([(1, "alpha"), (2, "beta")]), src)
    versioned.set_table_property(src, "cdf.enabled", "true")
    q = maintain_dedup_corpus(spark, src, cur, idx, str(tmp_path / "ck"))
    q.awaitTermination(180)

    # a new source version lands; SIMULATE the crash: the curated
    # append for it committed (stamp = that source version) but the
    # index append never ran
    (docs([(3, "epsilon")]).write.format("versioned").mode("append")
     .option("path", src).save())
    v_eps = versioned.versions(src)[-1]
    (docs([(3, "epsilon")]).write.format("versioned").mode("append")
     .option("path", cur)
     .option("txnAppId", _CURATE_TXN_APP)
     .option("txnVersion", v_eps).save())
    assert versioned.txn_version(cur, _CURATE_TXN_APP) == v_eps
    assert versioned.txn_version(idx, _CURATE_TXN_APP) < v_eps

    # a NEW source version lands before the restart
    (docs([(4, "zeta")]).write.format("versioned").mode("append")
     .option("path", src).save())                              # v2

    # restart (fresh checkpoint: the replay batch spans v0+v1+v2)
    q = maintain_dedup_corpus(spark, src, cur, idx,
                              str(tmp_path / "ck_fresh"))
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in
                 versioned.read_version(spark, cur).collect())
    # epsilon exactly once — the whole-batch guard would duplicate it
    assert got == [(1, "alpha"), (2, "beta"), (3, "epsilon"),
                   (4, "zeta")]
    # the index caught up on BOTH the old and the new version's hashes
    assert versioned.read_version(spark, idx).count() == 4
    v_last = versioned.versions(src)[-1]
    assert versioned.txn_version(idx, _CURATE_TXN_APP) == v_last
    assert versioned.txn_version(cur, _CURATE_TXN_APP) == v_last


def test_vector_index_crash_before_recluster_repairs_on_replay(
        spark, tmp_path):
    """r12 ADVICE: a crash between the assignment append and the
    recluster used to leave the index drifted until genuinely NEW
    source data arrived — the replay batch filters empty under the txn
    stamp and returned before the drift check. The check now runs
    unconditionally, so a bare restart (no new data) repairs the
    index."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ASSIGN_EXPR, _as_model, _qnorm, ivf_index_imbalance,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        _VIDX_TXN_APP, maintain_vector_index,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cent, asg = (str(tmp_path / n) for n in ("src", "cent", "asg"))
    A = [1000000, 0, 0, 0]
    B = [980000, 199000, 0, 0]
    C = [0, 0, 1000000, 0]

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
    versioned.write_version(
        corpus.crossJoin(broadcast(model)).select(
            F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn"),
        asg, partition_by=["cluster_id"])

    # source v0: a skewing batch. SIMULATE the crash: the assignment
    # append committed (stamp 0) but maintain_ivf_index never ran.
    versioned.write_version(blob(C, range(1000, 1240)), src)
    new = versioned.read_version(spark, src)
    (new.crossJoin(broadcast(model)).select(
        F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn")
     .write.format("versioned").mode("append").option("path", asg)
     .option("txnAppId", _VIDX_TXN_APP)
     .option("txnVersion", 0).save())
    assert ivf_index_imbalance(spark, asg) > 1_200_000   # drifted
    assert len(versioned.versions(cent)) == 1

    # bare restart, NO new source data: the replay batch is empty
    # after the stamp filter, but the drift repair must still fire
    q = maintain_vector_index(spark, src, cent, asg,
                              str(tmp_path / "ck"))
    q.awaitTermination(180)
    assert len(versioned.versions(cent)) == 2            # reclustered
    assert ivf_index_imbalance(spark, asg) <= 1_200_000
    assert versioned.read_version(spark, asg).count() == 400


def test_streaming_semdedup_curation_loop(spark, tmp_path):
    """Streaming twin #21 — semantic-dedup curation over the committed
    IVF index (maintain_vector_index ∘ maintain_dedup_corpus): a CDF
    feed of raw embedding batches is assigned against committed
    centroids, near-twin-dropped within the assigned cluster (vs the
    committed survivors AND lower-id batch rows), and only SURVIVORS
    fast-append. Per-version exactly-once; a pure replay is a no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ASSIGN_EXPR, _as_model, _qnorm,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        maintain_semdedup_corpus,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cent, asg = (str(tmp_path / n) for n in ("src", "cent", "asg"))
    A = [1000000, 0, 0, 0]
    B = [0, 1000000, 0, 0]
    C = [0, 0, 1000000, 0]          # new region, orthogonal to A/B

    def blob(rows):
        return spark.createDataFrame(
            rows, "c_id LONG, ca ARRAY<BIGINT>"
        ).withColumn("cn", F.expr(_qnorm("ca")))

    # committed index: corpus = A-ish and B-ish vectors, 2 clusters
    corpus = blob([(i, A) for i in range(20)]
                  + [(i, B) for i in range(100, 120)])
    cents0 = spark.createDataFrame(
        [(0, A), (1, B)], "cluster_id INT, sa ARRAY<BIGINT>"
    ).withColumn("sn", F.expr(_qnorm("sa")))
    versioned.write_version(cents0, cent)
    model = _as_model(versioned.read_version(spark, cent)
                      .select("cluster_id", "sa", "sn"))
    versioned.write_version(
        corpus.crossJoin(broadcast(model)).select(
            F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn"),
        asg, partition_by=["cluster_id"])
    n0 = versioned.read_version(spark, asg).count()
    assert n0 == 40

    # batch v0: a corpus near-dup (A again → dropped), a genuinely new
    # direction C (kept — lands in cluster 0 or 1 but orthogonal to
    # both), and an intra-batch dup of C (dropped, lower id wins)
    versioned.write_version(
        blob([(1000, A), (1001, C), (1002, C)]), src)

    def drain(ck):
        q = maintain_semdedup_corpus(spark, src, cent, asg,
                                     str(tmp_path / ck))
        q.awaitTermination(180)

    drain("ck")
    got = {r.c_id for r in versioned.read_version(spark, asg)
           .select("c_id").collect()}
    assert 1000 not in got          # corpus near-dup dropped
    assert 1001 in got              # new direction survives
    assert 1002 not in got          # intra-batch dup dropped
    assert len(got) == 41

    # batch v1: a near-dup of the PREVIOUS batch's survivor (dropped —
    # the committed corpus includes survivors) and a fresh vector
    D = [707000, 707000, 0, 0]      # between A and B: sim ≈ .707 → dup
    (blob([(2000, C), (2001, D)])
     .write.format("versioned").mode("append").option("path", src).save())
    drain("ck")
    got2 = {r.c_id for r in versioned.read_version(spark, asg)
            .select("c_id").collect()}
    assert 2000 not in got2         # dups the committed survivor 1001
    assert 2001 not in got2         # sim(D, A) ≈ 0.707 ≥ 0.35
    # pure replay via a fresh checkpoint: writer no-ops on the stamp
    n_v = len(versioned.versions(asg))
    drain("ck_fresh")
    assert len(versioned.versions(asg)) == n_v


def test_curation_loop_vacuum_behind_checkpoint_recovery(spark, tmp_path):
    """r12 verdict item 5 — CDF-retention recovery: when VACUUM drops
    versions a curation stream has NOT yet consumed, the restarted
    stream must fail LOUDLY (silently skipping the missing versions
    would permanently lose their rows), and the documented re-bootstrap
    — snapshot re-seed + fresh checkpoint at the earliest retained
    version — must catch the consumer up without double-appending
    (txn stamps + committed-index anti-joins make it provable)."""
    import pytest

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        bootstrap_dedup_corpus, maintain_dedup_corpus,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cur, idx = (str(tmp_path / n) for n in ("src", "cur", "idx"))

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def append(rows):
        (docs(rows).write.format("versioned").mode("append")
         .option("path", src).save())

    versioned.write_version(docs([(1, "alpha"), (2, "beta")]), src)  # v0
    versioned.set_table_property(src, "cdf.enabled", "true")         # v1
    append([(3, "gamma")])                                           # v2
    q = maintain_dedup_corpus(spark, src, cur, idx, str(tmp_path / "ck"))
    q.awaitTermination(180)
    assert versioned.read_version(spark, cur).count() == 3

    # two more versions land UNCONSUMED, then vacuum drops all but the
    # head — the stream's unconsumed range now includes a dropped one
    append([(4, "delta")])                                           # v3
    append([(5, "epsilon"), (5000, "alpha")])                        # v4
    dropped = versioned.vacuum(src, keep_last=1)
    assert 3 in dropped
    with pytest.raises(Exception, match="vacuumed"):
        q = maintain_dedup_corpus(spark, src, cur, idx,
                                  str(tmp_path / "ck"))
        q.awaitTermination(180)
        if q.exception() is not None:       # surface the stream error
            raise Exception(str(q.exception()))

    # recovery: snapshot re-seed (docs 1-3 excluded by the committed
    # index; the corpus-dup 5000/'alpha' never enters), then a FRESH
    # checkpoint starting at the earliest retained version
    got = bootstrap_dedup_corpus(spark, src, cur, idx)
    assert got["head"] == versioned.versions(src)[-1]
    assert got["seeded_curated"] == got["seeded_index"] == 2  # 4, 5
    # re-running the bootstrap is a writer-level no-op on both tables
    n_cur, n_idx = (len(versioned.versions(p)) for p in (cur, idx))
    bootstrap_dedup_corpus(spark, src, cur, idx)
    assert (len(versioned.versions(cur)),
            len(versioned.versions(idx))) == (n_cur, n_idx)

    earliest = versioned.versions(src)[0]
    q = maintain_dedup_corpus(spark, src, cur, idx,
                              str(tmp_path / "ck_fresh"),
                              starting_version=earliest)
    q.awaitTermination(180)
    # nothing double-applied: the retained replay no-ops on the stamp
    curated = sorted(r.doc_id for r in
                     versioned.read_version(spark, cur).collect())
    assert curated == [1, 2, 3, 4, 5]

    # and the loop keeps working: a NEW version streams normally
    append([(6, "zeta"), (7, "alpha")])
    q = maintain_dedup_corpus(spark, src, cur, idx,
                              str(tmp_path / "ck_fresh"),
                              starting_version=earliest)
    q.awaitTermination(180)
    curated = sorted(r.doc_id for r in
                     versioned.read_version(spark, cur).collect())
    assert curated == [1, 2, 3, 4, 5, 6]    # 7 dups 'alpha'


def test_bootstrap_vector_index_reseeds_after_vacuum(spark, tmp_path):
    """The vector-loop sibling of the dedup re-bootstrap: snapshot
    vectors not in the committed assignment table (anti-join on c_id)
    are assigned against committed centroids and fast-appended at the
    snapshot-head stamp; re-running is a writer-level no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        _ASSIGN_EXPR, _as_model, _qnorm,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        bootstrap_vector_index,
    )

    spark.dataSource.register(VersionedDataSource)
    src, cent, asg = (str(tmp_path / n) for n in ("src", "cent", "asg"))
    A = [1000000, 0, 0, 0]
    B = [0, 1000000, 0, 0]

    def blob(rows):
        return spark.createDataFrame(
            rows, "c_id LONG, ca ARRAY<BIGINT>"
        ).withColumn("cn", F.expr(_qnorm("ca")))

    cents0 = spark.createDataFrame(
        [(0, A), (1, B)], "cluster_id INT, sa ARRAY<BIGINT>"
    ).withColumn("sn", F.expr(_qnorm("sa")))
    versioned.write_version(cents0, cent)
    # committed assignments know vectors 0 and 1 only
    model = _as_model(versioned.read_version(spark, cent)
                      .select("cluster_id", "sa", "sn"))
    versioned.write_version(
        blob([(0, A), (1, B)]).crossJoin(broadcast(model)).select(
            F.expr(_ASSIGN_EXPR).alias("cluster_id"), "c_id", "ca", "cn"),
        asg, partition_by=["cluster_id"])

    # the source snapshot holds 0..3 (2 and 3 were never consumed —
    # their change versions could have been vacuumed away)
    versioned.write_version(
        blob([(0, A), (1, B), (2, A), (3, B)]), src)
    got = bootstrap_vector_index(spark, src, cent, asg)
    assert got["seeded"] == 2
    assert versioned.read_version(spark, asg).count() == 4
    n_v = len(versioned.versions(asg))
    bootstrap_vector_index(spark, src, cent, asg)   # no-op re-run
    assert len(versioned.versions(asg)) == n_v
    assert versioned.read_version(spark, asg).count() == 4


def test_streaming_scd2_dimension_loop(spark, tmp_path):
    """Streaming twin #22 — SCD2 dimension history maintained from a
    CDF feed: every source change closes the key's open interval at
    its commit version and opens a new one (deletes only close); one
    COW MERGE per batch carries closes + opens + the txn stamp
    atomically. Point-in-time reads replay any historical snapshot;
    mixed fresh-checkpoint replays re-apply only unapplied versions."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        maintain_scd2_dimension,
    )

    spark.dataSource.register(VersionedDataSource)
    src, scd2 = str(tmp_path / "dim"), str(tmp_path / "scd2")

    versioned.write_version(
        spark.createDataFrame([(1, "gold"), (2, "silver")],
                              "k INT, segment STRING"), src)      # v0
    versioned.set_table_property(src, "cdf.enabled", "true")      # v1

    def drain(ck):
        q = maintain_scd2_dimension(spark, src, scd2,
                                    str(tmp_path / ck), "k")
        q.awaitTermination(180)

    def hist():
        return sorted(
            (r.k, r.valid_from, r.valid_to, r.is_current, r.segment)
            for r in versioned.read_version(spark, scd2).collect())

    drain("ck")
    assert hist() == [(1, 0, None, True, "gold"),
                      (2, 0, None, True, "silver")]

    # v2: update k=1, delete k=2 (one MERGE commit on the source)
    up = spark.createDataFrame([(1, "plat", False), (2, None, True)],
                               "k INT, segment STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, src, up, "k")              # v2
    drain("ck")
    assert hist() == [(1, 0, 2, False, "gold"),
                      (1, 2, None, True, "plat"),
                      (2, 0, 2, False, "silver")]

    # point-in-time: the snapshot current AT version 1 is the original
    asof = {r.k: r.segment for r in
            versioned.read_version(spark, scd2)
            .filter("valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)")
            .collect()}
    assert asof == {1: "gold", 2: "silver"}

    # mixed fresh-checkpoint replay + a new version: k=2 re-born, only
    # the NEW version applies (old intervals untouched)
    (spark.createDataFrame([(2, "bronze")], "k INT, segment STRING")
     .write.format("versioned").mode("append").option("path", src).save())
    drain("ck_fresh")                                             # v3
    assert hist() == [(1, 0, 2, False, "gold"),
                      (1, 2, None, True, "plat"),
                      (2, 0, 2, False, "silver"),
                      (2, 3, None, True, "bronze")]
    # pure replay is a no-op (stamp filters the batch empty)
    n_v = len(versioned.versions(scd2))
    drain("ck_fresh2")
    assert len(versioned.versions(scd2)) == n_v

"""Structured Streaming twins, driven through memory/file sources and
the memory sink with processAllAvailable."""

from __future__ import annotations

import json

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
    dedup_events,
    sessionize_events_stream,
    streaming_puzzle_pipeline,
    windowed_event_counts,
)


def _run_stream(df, name: str, mode: str = "append"):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()


def test_windowed_event_counts(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.5},
        {"event_id": 2, "ts": "2024-01-01 00:20:00", "event_type": "click", "value": 2.5},
        {"event_id": 3, "ts": "2024-01-01 01:10:00", "event_type": "view", "value": 1.0},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, event_type STRING, value DOUBLE")
        .json(str(src))
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    )
    _run_stream(windowed_event_counts(stream), "win_counts", mode="append")
    # Append mode only emits closed windows; advance the watermark with
    # a late batch, then re-run.
    (src / "batch2.json").write_text(json.dumps(
        {"event_id": 9, "ts": "2024-01-01 05:00:00", "event_type": "view", "value": 0.5}
    ))
    _run_stream(windowed_event_counts(stream), "win_counts2", mode="append")
    out = {(str(r["bucket"]), r["event_type"]): (r["n_events"], r["total_value"])
           for r in spark.sql("SELECT * FROM win_counts2").collect()}
    assert out[("2024-01-01 00:00:00", "click")] == (2, 4.0)
    assert out[("2024-01-01 01:00:00", "view")] == (1, 1.0)


def test_dedup_events_stream(spark, tmp_path):
    src = tmp_path / "dups_stream"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0},
        {"event_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:11:00", "event_type": "view", "value": 2.0},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, event_type STRING, value DOUBLE")
        .json(str(src))
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    )
    _run_stream(dedup_events(stream), "dedup_out")
    rows_out = spark.sql("SELECT event_id FROM dedup_out ORDER BY event_id").collect()
    assert [r["event_id"] for r in rows_out] == [1, 2]


def test_sessionize_events_stream(spark, tmp_path):
    src = tmp_path / "sess_stream"
    src.mkdir()
    # user 1: two events 5 min apart (one session), then a 2h gap opens
    # a second session; user 2: a single event.
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1},
        {"event_id": 2, "ts": "2024-01-01 00:05:00", "user_id": 1},
        {"event_id": 3, "ts": "2024-01-01 02:05:00", "user_id": 1},
        {"event_id": 4, "ts": "2024-01-01 00:00:00", "user_id": 2},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    sess = sessionize_events_stream(stream, gap_seconds=1800, watermark="10 minutes")
    _run_stream(sess, "sess_out")
    rows = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # The 2h-later event closed user 1's first session mid-batch.
    assert rows[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:05:00", 2)
    # Open sessions (u1's second, u2's only) are still in state — a
    # later batch advances the watermark past end+gap and times them out.
    (src / "b2.json").write_text(json.dumps(
        {"event_id": 9, "ts": "2024-01-01 09:00:00", "user_id": 3}
    ))
    _run_stream(sessionize_events_stream(stream, gap_seconds=1800,
                                         watermark="10 minutes"), "sess_out2")
    rows2 = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out2").collect()
    }
    assert rows2[(1, "2024-01-01 02:05:00")] == ("2024-01-01 02:05:00", 1)
    assert rows2[(2, "2024-01-01 00:00:00")] == ("2024-01-01 00:00:00", 1)


def test_funnel_events_stream(spark, tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        funnel_events_stream,
    )

    src = tmp_path / "funnel_stream"
    src.mkdir()
    # u1 converts across two batches; u2 clicks before viewing (no
    # conversion); u3 views only.
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "view"},
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "click"},
        {"event_id": 3, "ts": "2024-01-01 00:00:30", "user_id": 2, "event_type": "click"},
        {"event_id": 4, "ts": "2024-01-01 00:02:00", "user_id": 2, "event_type": "view"},
        {"event_id": 5, "ts": "2024-01-01 00:00:00", "user_id": 3, "event_type": "view"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG, event_type STRING")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    )
    _run_stream(funnel_events_stream(stream), "funnel_out")
    assert spark.sql("SELECT * FROM funnel_out").count() == 0  # nobody purchased yet
    (src / "b2.json").write_text(json.dumps(
        {"event_id": 9, "ts": "2024-01-01 00:05:00", "user_id": 1, "event_type": "purchase"}
    ))
    _run_stream(funnel_events_stream(stream), "funnel_out2")
    rows = spark.sql("SELECT * FROM funnel_out2").collect()
    assert [r["user_id"] for r in rows] == [1]
    r = rows[0]
    assert str(r["ts_view"]) == "2024-01-01 00:00:00"
    assert str(r["ts_click"]) == "2024-01-01 00:01:00"
    assert str(r["ts_purchase"]) == "2024-01-01 00:05:00"


def test_streaming_puzzle_pipeline(spark, tmp_path):
    from tests.test_chess import GAMES

    src = tmp_path / "games_stream"
    src.mkdir()
    (src / "g.ndjson").write_text("\n".join(json.dumps(g) for g in GAMES))
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.ndjson import (
        read_games_stream,
    )

    _run_stream(streaming_puzzle_pipeline(read_games_stream(spark, str(src))), "pgn_out")
    text = "".join(r["pgn"] for r in spark.sql("SELECT * FROM pgn_out").collect())
    assert '[Game ID "g1"]' in text and '[Game ID "g4"]' in text
    assert '[Game ID "g2"]' not in text


def test_attribute_purchases_stream(spark, tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import attribute_purchases_stream

    vdir, pdir = tmp_path / "views", tmp_path / "purchases"
    vdir.mkdir(); pdir.mkdir()
    views = [
        {"event_id": 1, "ts": "2024-01-01 00:10:00", "user_id": 7, "value": 0.0},
        {"event_id": 2, "ts": "2024-01-01 00:40:00", "user_id": 7, "value": 0.0},
        {"event_id": 3, "ts": "2024-01-01 00:10:00", "user_id": 8, "value": 0.0},
    ]
    purchases = [
        # in-window for views 1 and 2 (user 7); view 3 is user 8 — no match
        {"event_id": 10, "ts": "2024-01-01 00:50:00", "user_id": 7, "value": 9.99},
        # >1h after view 3 — outside the attribution window
        {"event_id": 11, "ts": "2024-01-01 02:30:00", "user_id": 8, "value": 5.0},
    ]
    (vdir / "v.json").write_text("\n".join(json.dumps(r) for r in views))
    (pdir / "p.json").write_text("\n".join(json.dumps(r) for r in purchases))
    schema = "event_id LONG, ts STRING, user_id LONG, value DOUBLE"

    def _src(d):
        return (spark.readStream.schema(schema).json(str(d))
                .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                            "user_id", "value"))

    _run_stream(attribute_purchases_stream(_src(vdir), _src(pdir)), "attrib")
    got = {(r["purchase_id"], r["view_id"]) for r in spark.sql("SELECT * FROM attrib").collect()}
    assert got == {(10, 1), (10, 2)}
    amounts = {r["amount"] for r in spark.sql("SELECT * FROM attrib").collect()}
    assert amounts == {9.99}


def test_apply_cdc_stream(spark, tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import apply_cdc_stream

    base_path = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "k LONG, v STRING, ts STRING",
    ).selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts").write.parquet(base_path)

    src = tmp_path / "changes"
    src.mkdir()
    rows = [
        # two versions of k=2 in one batch — latest (ts 02:00) wins
        {"k": 2, "v": "b1", "ts": "2024-01-01 01:00:00", "is_delete": False},
        {"k": 2, "v": "b2", "ts": "2024-01-01 02:00:00", "is_delete": False},
        {"k": 1, "v": "x", "ts": "2024-01-01 01:00:00", "is_delete": True},
        {"k": 3, "v": "c", "ts": "2024-01-01 01:00:00", "is_delete": False},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream
        .schema("k LONG, v STRING, ts STRING, is_delete BOOLEAN")
        .json(str(src))
        .selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts", "is_delete")
    )
    q = apply_cdc_stream(stream, base_path, key="k",
                         checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    got = {r.k: r.v for r in spark.read.parquet(base_path).collect()}
    assert got == {2: "b2", 3: "c"}  # 1 deleted, 2 updated to latest, 3 inserted


def test_apply_cdc_versioned_stream(spark, tmp_path):
    """Each micro-batch commits a new queryable version; history stays
    intact and the latest read reflects all merges."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        apply_cdc_versioned_stream,
    )

    table_path = str(tmp_path / "vtable")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "k LONG, v STRING, ts STRING",
    ).selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts")
    versioned.write_version(base, table_path)

    src = tmp_path / "vchanges"
    src.mkdir()
    batch1 = [
        {"k": 1, "v": "x", "ts": "2024-01-01 01:00:00", "is_delete": True},
        {"k": 3, "v": "c", "ts": "2024-01-01 01:00:00", "is_delete": False},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))

    def start():
        stream = (
            spark.readStream
            .schema("k LONG, v STRING, ts STRING, is_delete BOOLEAN")
            .json(str(src))
            .selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts", "is_delete")
        )
        q = apply_cdc_versioned_stream(
            stream, table_path, key="k", checkpoint=str(tmp_path / "vckpt")
        )
        q.processAllAvailable()
        q.stop()

    start()
    assert versioned.versions(table_path) == [0, 1]
    (src / "b2.json").write_text(json.dumps(
        {"k": 3, "v": "c2", "ts": "2024-01-01 02:00:00", "is_delete": False}
    ))
    start()
    assert versioned.versions(table_path) == [0, 1, 2]

    def snap(v):
        return {r.k: r.v for r in
                versioned.read_version(spark, table_path, v).collect()}

    assert snap(0) == {1: "a", 2: "b"}
    assert snap(1) == {2: "b", 3: "c"}
    assert snap(2) == {2: "b", 3: "c2"}
    assert {r.k: r.v for r in
            versioned.read_version(spark, table_path).collect()} == snap(2)


def test_apply_cdc_versioned_stream_bootstraps_unseeded_table(spark, tmp_path):
    """Starting the versioned CDC stream against a table with no
    committed versions must commit the first batch's upserts as v0
    instead of crashing on the missing base."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        apply_cdc_versioned_stream,
    )

    table_path = str(tmp_path / "fresh")
    src = tmp_path / "fresh_changes"
    src.mkdir()
    rows = [
        {"k": 1, "v": "a", "ts": "2024-01-01 00:00:00", "is_delete": False},
        {"k": 2, "v": "b", "ts": "2024-01-01 00:00:00", "is_delete": True},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream
        .schema("k LONG, v STRING, ts STRING, is_delete BOOLEAN")
        .json(str(src))
        .selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts", "is_delete")
    )
    q = apply_cdc_versioned_stream(
        stream, table_path, key="k", checkpoint=str(tmp_path / "fresh_ckpt")
    )
    q.processAllAvailable()
    q.stop()
    assert versioned.versions(table_path) == [0]
    got = {r.k: r.v for r in versioned.read_version(spark, table_path).collect()}
    assert got == {1: "a"}  # the delete row never lands


def test_funnel_stream_replays_out_of_order_stage(spark, tmp_path):
    """A later-stage event that ARRIVES before its prior stage completes
    must be buffered and replayed (r2 hardening), not dropped."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        funnel_events_stream,
    )

    src = tmp_path / "funnel_replay"
    src.mkdir()
    # Batch 1 delivers click+purchase (timestamps AFTER the view's) but
    # the view event itself arrives only in batch 2.
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 7, "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 7, "event_type": "purchase"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG, event_type STRING")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    )
    _run_stream(funnel_events_stream(stream), "funnel_replay1")
    assert spark.sql("SELECT * FROM funnel_replay1").count() == 0
    (src / "b2.json").write_text(json.dumps(
        {"event_id": 3, "ts": "2024-01-01 00:00:00", "user_id": 7, "event_type": "view"}
    ))
    _run_stream(funnel_events_stream(stream), "funnel_replay2")
    rows = spark.sql("SELECT * FROM funnel_replay2").collect()
    assert [r["user_id"] for r in rows] == [7]
    assert str(rows[0]["ts_view"]) == "2024-01-01 00:00:00"
    assert str(rows[0]["ts_click"]) == "2024-01-01 00:01:00"
    assert str(rows[0]["ts_purchase"]) == "2024-01-01 00:02:00"


def test_cms_sketch_stream_matches_batch_grid(spark, tmp_path):
    """The streaming CMS cells must equal the batch md5 grid's counts
    (sketch-add is associative, so micro-batching can't change them)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.events import (
        BLOOM_K,  # noqa: F401  (import exercises the module surface)
        CMS_D,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        cms_sketch_stream,
    )

    src = tmp_path / "cms_stream"
    src.mkdir()
    rows = [
        {"event_id": i, "ts": f"2024-01-01 00:{i % 50:02d}:00", "user_id": i % 5}
        for i in range(40)
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    q = (cms_sketch_stream(stream, window="1 hour").writeStream
         .format("memory").queryName("cms_out").outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM cms_out").collect()
    # All events fall in one window; every (d, bucket) cell total must
    # sum to D × n_events, and no cell exceeds the total event count.
    assert sum(r["cnt"] for r in got) == CMS_D * 40
    assert all(1 <= r["cnt"] <= 40 for r in got)
    assert len({r["d"] for r in got}) == CMS_D


def test_dau_sketch_stream_matches_batch_estimate(spark, tmp_path):
    """The streaming HLL DAU estimate must equal the batch
    approx_count_distinct on the same rows, even when the stream
    delivers them across several micro-batches — HLL merge is
    register-wise max, so micro-batch slicing can't change it."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        dau_sketch_stream,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "dau_stream"
    src.mkdir()
    # two days of events split across two micro-batch files, with
    # overlapping users so dedup-across-batches matters
    batches = [
        [(i, f"2024-01-0{1 + i % 2} 0{i % 9}:00:00", i % 37) for i in range(0, 60)],
        [(i, f"2024-01-0{1 + i % 2} 1{i % 9}:00:00", i % 23) for i in range(60, 120)],
    ]
    for bi, rows in enumerate(batches):
        (src / f"b{bi}.json").write_text("\n".join(
            json.dumps({"event_id": e, "ts": t, "user_id": u})
            for e, t, u in rows
        ))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    q = (dau_sketch_stream(stream).writeStream.format("memory")
         .queryName("dau_out").outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = {str(r["day"]): (r["dau_approx"], r["n_events"])
           for r in spark.sql("SELECT * FROM dau_out").collect()}
    batch = (
        spark.createDataFrame(
            [r for b in batches for r in b], "event_id LONG, ts STRING, user_id LONG"
        )
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("dau"),
             F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("day"), "dau", "n")
    )
    expect = {str(r["day"]): (r["dau"], r["n"]) for r in batch.collect()}
    assert got == expect
    assert len(got) == 2


def test_percentiles_sketch_stream_matches_batch(spark, tmp_path):
    """At n ≤ accuracy the GK summary holds every value, so the stream
    estimates must equal the batch approx_percentile on the same rows
    even across micro-batch boundaries."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        percentiles_sketch_stream,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "pct_stream"
    src.mkdir()
    batches = [
        [(i, f"2024-01-01 00:{i % 50:02d}:00",
          "click" if i % 3 else "view", float((i * 37) % 101)) for i in range(50)],
        [(i, f"2024-01-01 00:{i % 50:02d}:00",
          "click" if i % 2 else "view", float((i * 13) % 97)) for i in range(50, 100)],
    ]
    for bi, rows in enumerate(batches):
        (src / f"b{bi}.json").write_text("\n".join(
            json.dumps({"event_id": e, "ts": t, "event_type": et, "value": v})
            for e, t, et, v in rows
        ))
    stream = (
        spark.readStream
        .schema("event_id LONG, ts STRING, event_type STRING, value DOUBLE")
        .json(str(src))
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    )
    q = (percentiles_sketch_stream(stream).writeStream.format("memory")
         .queryName("pct_out").outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = {(str(r["bucket"]), r["event_type"]): (r["p50"], r["p90"], r["p99"], r["n"])
           for r in spark.sql("SELECT * FROM pct_out").collect()}
    batch = (
        spark.createDataFrame(
            [r for b in batches for r in b],
            "event_id LONG, ts STRING, event_type STRING, value DOUBLE",
        )
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.expr("approx_percentile(CAST(value AS DOUBLE), "
                    "array(0.5, 0.9, 0.99), 10000)").alias("ap"),
             F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("bucket"), "event_type",
                F.expr("ap[0]").alias("p50"), F.expr("ap[1]").alias("p90"),
                F.expr("ap[2]").alias("p99"), "n")
    )
    expect = {(str(r["bucket"]), r["event_type"]): (r["p50"], r["p90"], r["p99"], r["n"])
              for r in batch.collect()}
    assert got == expect
    assert len(got) >= 2


def test_funnel_stream_tombstone_dedups_replay(spark, tmp_path):
    """After a user converts, a replayed/late event for the same user
    must NOT re-open the funnel and emit a second conversion row."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        funnel_events_stream,
    )

    src = tmp_path / "funnel_tomb"
    src.mkdir()
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7, "event_type": "view"},
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 7, "event_type": "click"},
        {"event_id": 3, "ts": "2024-01-01 00:02:00", "user_id": 7, "event_type": "purchase"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG, event_type STRING")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    )
    _run_stream(funnel_events_stream(stream), "tomb1")
    assert spark.sql("SELECT * FROM tomb1").count() == 1
    # a full replay of the same funnel events (plus fresh activity)
    # arrives later — the tombstone must swallow it
    batch2 = [
        {"event_id": 4, "ts": "2024-01-01 00:10:00", "user_id": 7, "event_type": "view"},
        {"event_id": 5, "ts": "2024-01-01 00:11:00", "user_id": 7, "event_type": "click"},
        {"event_id": 6, "ts": "2024-01-01 00:12:00", "user_id": 7, "event_type": "purchase"},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    _run_stream(funnel_events_stream(stream), "tomb2")
    rows = spark.sql("SELECT * FROM tomb2").collect()
    assert len(rows) == 1, "tombstone failed: duplicate conversion emitted"
    assert str(rows[0]["ts_purchase"]) == "2024-01-01 00:02:00"


def test_bloom_bits_stream_matches_batch_bits(spark, tmp_path):
    """The streaming bit set must equal the batch md5 bit grid over the
    same users, and stay deduped across micro-batches."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.events import (
        BLOOM_K,
        BLOOM_M,
        _bloom_bit_spark,
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        bloom_bits_stream,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "bloom_stream"
    src.mkdir()
    for b, users in enumerate([[1, 2, 3], [2, 3, 4, 5]]):
        (src / f"b{b}.json").write_text("\n".join(
            json.dumps({"event_id": 10 * b + i, "ts": "2024-01-01 00:00:00",
                        "user_id": u})
            for i, u in enumerate(users)
        ))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    q = (bloom_bits_stream(stream).writeStream.format("memory")
         .queryName("bloom_bits").outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = sorted(r["bit"] for r in spark.sql("SELECT * FROM bloom_bits").collect())
    batch = (
        spark.createDataFrame([(u,) for u in [1, 2, 3, 4, 5]], "user_id LONG")
        .select(F.explode(F.array(
            *[F.expr(_bloom_bit_spark(k)) for k in range(BLOOM_K)]
        )).alias("bit"))
        .distinct()
    )
    expect = sorted(r["bit"] for r in batch.collect())
    assert got == expect
    assert all(0 <= b < BLOOM_M for b in got)


def test_wau_hll_union_stream_matches_batch_estimate(spark, tmp_path):
    """The streaming Datasketches-HLL WAU estimate must equal the
    batch hll_sketch_agg estimate on the same rows across micro-batch
    slicings (register-max union ⇒ slicing-invariant)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        wau_hll_union_stream,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "wau_stream"
    src.mkdir()
    # two ISO weeks, users overlapping across days AND batches
    batches = [
        [(i, f"2024-01-{1 + i % 10:02d} 03:00:00", i % 41) for i in range(0, 70)],
        [(i, f"2024-01-{1 + i % 10:02d} 15:00:00", i % 29) for i in range(70, 140)],
    ]
    for bi, rows in enumerate(batches):
        (src / f"b{bi}.json").write_text("\n".join(
            json.dumps({"event_id": e, "ts": t, "user_id": u})
            for e, t, u in rows
        ))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    q = (wau_hll_union_stream(stream).writeStream.format("memory")
         .queryName("wau_out").outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = {str(r["week"]): (r["wau_est"], r["n_events"])
           for r in spark.sql("SELECT * FROM wau_out").collect()}
    batch = (
        spark.createDataFrame(
            [r for b in batches for r in b], "event_id LONG, ts STRING, user_id LONG"
        )
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
        .groupBy(F.window("ts", "7 days").alias("win"))
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("e"),
             F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("week"), "e", "n")
    )
    expect = {str(r["week"]): (r["e"], r["n"]) for r in batch.collect()}
    assert got == expect and len(got) >= 2


def test_quarantine_stream_splits_across_batches(spark, tmp_path):
    """Each micro-batch routes its rows good/bad in append mode; both
    sides accumulate across batches with the violated-rule audit."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sinks import read_quarantine
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        quarantine_stream,
    )

    src = tmp_path / "q_stream"
    src.mkdir()
    batches = [
        [{"event_id": 1, "value": 2.0}, {"event_id": 2, "value": -1.0}],
        [{"event_id": 3, "value": None}, {"event_id": 4, "value": 7.0}],
    ]
    for bi, rows in enumerate(batches):
        (src / f"b{bi}.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("event_id LONG, value DOUBLE").json(str(src))
    q = quarantine_stream(
        stream, {"value_nonneg": "value >= 0"},
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    good = sorted(r.event_id for r in
                  read_quarantine(spark, str(tmp_path / "out"), "good").collect())
    bad = {r.event_id: r["_violations"] for r in
           read_quarantine(spark, str(tmp_path / "out"), "bad").collect()}
    assert good == [1, 4]
    assert set(bad) == {2, 3}  # NULL value rule → quarantined
    assert all(v == "value_nonneg" for v in bad.values())
    # replaying a micro-batch (at-least-once delivery) must NOT
    # duplicate output: the per-epoch dynamic partition overwrite makes
    # the sink idempotent, and other epochs' partitions are untouched
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sinks import write_quarantine
    p2 = str(tmp_path / "out2")
    b0 = spark.createDataFrame([(1, 2.0), (2, -1.0)],
                               "event_id LONG, value DOUBLE")
    b1 = spark.createDataFrame([(4, 7.0)], "event_id LONG, value DOUBLE")
    write_quarantine(b0, {"value_nonneg": "value >= 0"}, p2, epoch=0)
    write_quarantine(b1, {"value_nonneg": "value >= 0"}, p2, epoch=1)
    for _ in range(2):  # crash-replay of epoch 0
        write_quarantine(b0, {"value_nonneg": "value >= 0"}, p2, epoch=0)
    good2 = sorted(r.event_id for r in
                   read_quarantine(spark, p2, "good").collect())
    bad2 = sorted(r.event_id for r in
                  read_quarantine(spark, p2, "bad").collect())
    assert good2 == [1, 4] and bad2 == [2]


def test_session_window_counts_native_stream(spark, tmp_path):
    """Native session_window streaming aggregation: gap-merge happens
    in the engine, append mode emits a session once the watermark
    passes its close, and the result matches the batch
    F.session_window aggregation over the same rows."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        session_window_counts,
    )

    src = tmp_path / "sess_stream"
    src.mkdir()
    rows = [
        # user 7: two events 10 min apart (one session), then a 40-min
        # gap (second session)
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7, "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:10:00", "user_id": 7, "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:50:00", "user_id": 7, "value": 4.0},
        {"event_id": 4, "ts": "2024-01-01 00:05:00", "user_id": 8, "value": 8.0},
    ]
    (src / "b1.json").write_text("\n".join(__import__("json").dumps(r) for r in rows))

    def stream():
        return (
            spark.readStream
            .schema("event_id LONG, ts STRING, user_id LONG, value DOUBLE")
            .json(str(src))
            .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                        "user_id", "value")
        )

    # first pass: watermark hasn't passed the sessions' close yet →
    # append emits nothing (sessions still open to late data)
    _run_stream(session_window_counts(stream()), "sess_native1")
    assert spark.sql("SELECT * FROM sess_native1").count() == 0
    # late batch far in the future closes everything
    (src / "b2.json").write_text(__import__("json").dumps(
        {"event_id": 9, "ts": "2024-01-01 09:00:00", "user_id": 9, "value": 0.0}
    ))
    _run_stream(session_window_counts(stream()), "sess_native2")
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, float(r.session_value))
        for r in spark.sql("SELECT * FROM sess_native2").collect()
    }
    assert got[(7, "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[(7, "2024-01-01 00:50:00")] == (1, 4.0)
    assert got[(8, "2024-01-01 00:05:00")] == (1, 8.0)

    # equals the batch session_window agg over the same rows
    batch = (
        spark.read.schema("event_id LONG, ts STRING, user_id LONG, value DOUBLE")
        .json(str(src))
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id", "value")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = {(r.user_id, str(r.sw.start)): r.n for r in batch.collect()}
    assert {(u, s): n for (u, s), (n, _) in got.items()} == {
        k: v for k, v in b.items() if k[0] != 9
    }


def test_sessionize_tws_stream_matches_applyinpandas_twin(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas sessionizer emits the
    SAME session rows as the applyInPandasWithState twin on the same
    input — mid-batch closes and timer-driven closes both.

    Capability-probed like avro: the transformWithState runtime talks
    protobuf to its Python state server, and this sandbox has no
    google.protobuf wheel (and no network). The operator code is
    complete and exercised wherever the wheel exists."""
    import pytest as _pytest

    _pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (absent here)",
    )
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        sessionize_events_tws_stream,
    )

    src = tmp_path / "tws_stream"
    src.mkdir()
    batch1 = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1},
        {"event_id": 2, "ts": "2024-01-01 00:05:00", "user_id": 1},
        {"event_id": 3, "ts": "2024-01-01 02:05:00", "user_id": 1},
        {"event_id": 4, "ts": "2024-01-01 00:00:00", "user_id": 2},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    # watermark-advancing second batch times out the open sessions
    (src / "b2.json").write_text(json.dumps(
        {"event_id": 9, "ts": "2024-01-01 09:00:00", "user_id": 3}
    ))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    _run_stream(sessionize_events_tws_stream(stream, gap_seconds=1800,
                                             watermark="10 minutes"),
                "tws_out")
    got = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]),
                                                  r["n_events"])
        for r in spark.sql("SELECT * FROM tws_out").collect()
    }
    _run_stream(sessionize_events_stream(stream, gap_seconds=1800,
                                         watermark="10 minutes"),
                "tws_ref_out")
    want = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]),
                                                  r["n_events"])
        for r in spark.sql("SELECT * FROM tws_ref_out").collect()
    }
    assert got == want
    assert got[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:05:00", 2)
    assert got[(1, "2024-01-01 02:05:00")] == ("2024-01-01 02:05:00", 1)
    assert got[(2, "2024-01-01 00:00:00")] == ("2024-01-01 00:00:00", 1)


def test_type_diversity_stream_matches_batch(spark, tmp_path):
    """Chained stateful windowed aggregations: the streaming Simpson
    diversity equals the batch ev_type_diversity_daily formula over
    the same closed windows."""
    import json as _json

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        type_diversity_stream,
    )

    src = tmp_path / "ev_div"
    src.mkdir()
    rows = []
    eid = 0
    for h, t, n in [(0, "click", 6), (1, "view", 3), (2, "buy", 1),
                    (3, "click", 2)]:
        for i in range(n):
            eid += 1
            rows.append({"event_id": eid,
                         "ts": f"2024-01-01 0{h}:1{i % 6}:00",
                         "event_type": t, "value": 1.0})
    (src / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows))
    stream = (
        spark.readStream
        .schema("event_id LONG, ts STRING, event_type STRING, "
                "value DOUBLE")
        .json(str(src))
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "event_type", "value")
    )
    _run_stream(type_diversity_stream(stream), "div1", mode="append")
    # close the 2024-01-01 window with a far-future event
    (src / "b2.json").write_text(_json.dumps(
        {"event_id": 999, "ts": "2024-01-03 12:00:00",
         "event_type": "view", "value": 1.0}))
    _run_stream(type_diversity_stream(stream), "div2", mode="append")
    got = {str(r["day"]): (r["n_events"], r["n_types"], r["simpson_ppm"],
                           r["top_share_ppm"])
           for r in spark.sql("SELECT * FROM div2").collect()}
    # batch formula: counts 8 click, 3 view, 1 buy → n=12
    n, ss, top = 12, 8 * 8 + 3 * 3 + 1, 8
    want = (n, 3, 1000000 - 1000000 * ss // (n * n), 1000000 * top // n)
    assert got["2024-01-01 00:00:00"] == want


def test_dau_overlap_stream_matches_batch(spark, tmp_path):
    """Join-free day-over-day overlap: the self-union + chained
    stateful aggregation equals the batch ev_dau_overlap_dod formula
    over the same closed windows."""
    import json as _json

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        dau_overlap_stream,
    )

    src = tmp_path / "ev_dod"
    src.mkdir()
    # day 1: users {1,2,3}; day 2: users {2,3,4,5} → both=2,
    # jaccard = 2/5, retained = 2/3
    rows = []
    eid = 0
    for day, users in [("2024-01-01", [1, 2, 3, 2]),
                       ("2024-01-02", [2, 3, 4, 5])]:
        for u in users:
            eid += 1
            rows.append({"event_id": eid, "ts": f"{day} 0{u % 5}:00:00",
                         "user_id": u})
    (src / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows))
    stream = (
        spark.readStream
        .schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "user_id")
    )
    _run_stream(dau_overlap_stream(stream), "dod1", mode="append")
    # close both windows with a far-future event
    (src / "b2.json").write_text(_json.dumps(
        {"event_id": 999, "ts": "2024-01-05 12:00:00", "user_id": 9}))
    _run_stream(dau_overlap_stream(stream), "dod2", mode="append")
    got = {str(r["day"]): (r["dau_a"], r["dau_b"], r["n_both"],
                           r["jaccard_ppm"], r["retained_ppm"])
           for r in spark.sql("SELECT * FROM dod2").collect()}
    want = (3, 4, 2, 2 * 1000000 // 5, 2 * 1000000 // 3)
    assert got["2024-01-01 00:00:00"] == want
    # day 2 pairs with day 3 (no users) → filtered by dau_b > 0
    assert "2024-01-02 00:00:00" not in got


def test_dau_overlap_stream_multi_batch_late_next_day(spark, tmp_path):
    """Regression (r10 ADVICE): day d+1 arriving in a LATER micro-batch,
    after the watermark has already advanced past day d's window end,
    must still count toward day d's b-side. With only the lateness
    delay (not window + lateness), the unshifted a-side drives the
    watermark past day d ~2h into day d+1 and every remaining shifted
    b-copy is dropped as late, so day d emits early with dau_b
    undercounted. One long-lived query, three micro-batches."""
    import json as _json

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.streaming.jobs import (
        dau_overlap_stream,
    )

    src = tmp_path / "ev_dod_mb"
    src.mkdir()
    stream = (
        spark.readStream
        .schema("event_id LONG, ts STRING, user_id LONG")
        .json(str(src))
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "user_id")
    )
    q = (
        dau_overlap_stream(stream)
        .writeStream.format("memory").queryName("dod_mb")
        .outputMode("append").start()
    )
    try:
        # micro-batch 1: day-1 users {1,2,3} plus ONE early day-2
        # event (user 2 at 04:00) — under the buggy 2h-only delay
        # this alone advances the watermark to day-2 02:00, past
        # day 1's window end, closing day 1 with dau_b = 1.
        rows = [{"event_id": i + 1,
                 "ts": f"2024-01-01 0{u}:00:00", "user_id": u}
                for i, u in enumerate([1, 2, 3])]
        rows.append({"event_id": 10, "ts": "2024-01-02 04:00:00",
                     "user_id": 2})
        (src / "b1.json").write_text(
            "\n".join(_json.dumps(r) for r in rows))
        q.processAllAvailable()
        # micro-batch 2: the REST of day 2 ({3,4,5}) arrives after the
        # watermark moved — their shifted copies target day 1.
        rows = [{"event_id": 20 + u, "ts": f"2024-01-02 1{u}:00:00",
                 "user_id": u} for u in [3, 4, 5]]
        (src / "b2.json").write_text(
            "\n".join(_json.dumps(r) for r in rows))
        q.processAllAvailable()
        # micro-batch 3: far-future event closes everything
        # (needs ts > day-2 end + window + lateness = Jan 4 02:00).
        (src / "b3.json").write_text(_json.dumps(
            {"event_id": 999, "ts": "2024-01-06 12:00:00",
             "user_id": 9}))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {str(r["day"]): (r["dau_a"], r["dau_b"], r["n_both"])
           for r in spark.sql("SELECT * FROM dod_mb").collect()}
    # day 1: a = {1,2,3}, b = day-2 users {2,3,4,5}, both = {2,3}
    assert got["2024-01-01 00:00:00"] == (3, 4, 2)

"""Persisted Change Data Feed (Delta's enableChangeDataFeed /
_change_data analog): DML commits on a cdf.enabled table write their
row-level changes at COMMIT time (O(changed rows), no read-time
snapshot join); consumed by the streaming source
(.option('readChangeFeed', 'true')), the batch DS read, and the
library versioned.read_changes — all equivalent to the key-based
batch table_changes diff."""

from __future__ import annotations

import os

import pytest

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
    VersionedDataSource,
)


def _mk(spark, path, n=50, cdf=True):
    df = spark.range(n).selectExpr("CAST(id AS INT) AS k",
                                   "CONCAT('v', id) AS v")
    versioned.write_version(df.repartition(2), path)
    if cdf:
        versioned.set_table_property(path, "cdf.enabled", "true")
    return path


def _feed_rows(df):
    return sorted((r._change_type, r.k, r.v, r._commit_version)
                  for r in df.collect())


def _tc_rows(spark, path, v):
    return sorted((r._change_type, r.k, r.v)
                  for r in versioned.table_changes(
                      spark, path, ["k"], v - 1, v).collect())


def test_stream_cdf_consumes_dml_and_resumes(spark, tmp_path):
    """The verdict's done-criterion: COW MERGE + MOR DELETE commits
    consumed as insert/delete/update_pre/postimage rows,
    checkpoint-resumable, == batch table_changes."""
    spark.dataSource.register(VersionedDataSource)
    p = _mk(spark, str(tmp_path / "t"))                      # v0, v1
    ch = spark.createDataFrame(
        [(3, "u", False), (200, "new", False), (5, None, True)],
        "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, p, ch, "k")           # v2 COW MERGE
    versioned.set_table_property(p, "dv.enabled", "true")    # v3
    versioned.delete_where(spark, p, "k = 7")                # v4 MOR DELETE

    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (spark.readStream.format("versioned").option("path", p)
             .option("readChangeFeed", "true").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted((r._change_type, r.k, r.v, r._commit_version)
                      for r in spark.read.parquet(out).collect())

    got = drain()
    # v0 replays as inserts; the DML commits as row-level changes
    assert len([t for t in got if t[3] == 0]) == 50
    assert ("update_preimage", 3, "v3", 2) in got
    assert ("update_postimage", 3, "u", 2) in got
    assert ("insert", 200, "new", 2) in got
    assert ("delete", 5, "v5", 2) in got
    assert ("delete", 7, "v7", 4) in got

    # restart streams ONLY the new commit's delta (checkpoint resume)
    versioned.update_where(spark, p, {"v": "'zz'"}, "k = 9")  # v5 MOR UPDATE
    got2 = drain()
    assert sorted(set(got2) - set(got)) == [
        ("update_postimage", 9, "zz", 5),
        ("update_preimage", 9, "v9", 5),
    ]
    assert len(got2) == len(got) + 2  # nothing re-emitted

    # per-commit equivalence with the key-based batch diff
    for v in (2, 4, 5):
        assert _tc_rows(spark, p, v) == sorted(
            (c, k, val) for c, k, val, cv in got2 if cv == v)


def test_batch_ds_and_library_cdf_match(spark, tmp_path):
    spark.dataSource.register(VersionedDataSource)
    p = _mk(spark, str(tmp_path / "t"))
    versioned.update_where(spark, p, {"v": "concat(v, '!')"},
                           "k < 3")                          # v2
    versioned.delete_where(spark, p, "k = 10")               # v3

    b = (spark.read.format("versioned").option("path", p)
         .option("readChangeFeed", "true")
         .option("startingVersion", "2").load())
    got = _feed_rows(b)
    lib = _feed_rows(versioned.read_changes(spark, p, 1))
    assert got == lib
    want = []
    for v in (2, 3):
        want += [(c, k, val, v) for c, k, val in _tc_rows(spark, p, v)]
    assert got == sorted(want)
    # endingVersion bounds the range
    b2 = (spark.read.format("versioned").option("path", p)
          .option("readChangeFeed", "true")
          .option("startingVersion", "2")
          .option("endingVersion", "2").load())
    assert _feed_rows(b2) == sorted(
        (c, k, val, 2) for c, k, val in _tc_rows(spark, p, 2))


def test_cdf_requires_change_files_for_destructive_commits(spark, tmp_path):
    """A destructive commit made BEFORE cdf.enabled cannot be
    reconstructed: both the stream and the library raise with
    guidance; the plain append stream's error now also names
    readChangeFeed."""
    spark.dataSource.register(VersionedDataSource)
    p = _mk(spark, str(tmp_path / "t"), cdf=False)           # v0, no CDF
    versioned.delete_where(spark, p, "k = 1")                # v1 COW delete

    with pytest.raises(ValueError, match="cdf.enabled"):
        versioned.read_changes(spark, p, 0).collect()

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedStreamReader,
    )
    schema = versioned.read_version(spark, p).schema
    r = VersionedStreamReader(p, schema, None, change_feed=True)
    with pytest.raises(ValueError, match="cdf.enabled"):
        r._change_partitions(0, 1)
    # append-mode guidance names readChangeFeed
    r2 = VersionedStreamReader(p, schema, None)
    with pytest.raises(ValueError, match="readChangeFeed"):
        r2._added_files(0, 1)


def test_cdf_noop_update_and_optimize_emit_nothing(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    versioned.update_where(spark, p, {"v": "v"}, "k < 5")    # v2: no-op SET
    versioned.optimize_version(spark, p, target_files=1)     # v3
    feed = versioned.read_changes(spark, p, 1)
    assert feed.count() == 0


def test_cdf_restore_strips_change_files_and_fails_feed(spark, tmp_path):
    """RESTORE copies the target manifest but must NOT inherit its cdf
    files (they describe the ORIGINAL commit); reading changes across
    the restore fails — its row-level delta was never persisted."""
    p = _mk(spark, str(tmp_path / "t"))
    versioned.delete_where(spark, p, "k = 1")                # v2 (cdf)
    versioned.restore_version(p, 0)                          # v3
    assert "cdf" not in versioned._load_manifest(p, 3)
    with pytest.raises(ValueError, match="cdf.enabled"):
        versioned.read_changes(spark, p, 2).collect()
    # the pre-restore range still reads fine
    assert versioned.read_changes(spark, p, 1, 2).count() == 1


def test_vacuum_refcounts_cdf_files(spark, tmp_path):
    p = _mk(spark, str(tmp_path / "t"))
    versioned.delete_where(spark, p, "k = 1")                # v2
    m2 = versioned._load_manifest(p, 2)
    cdf_abs = [versioned._abs_file(p, f) for f in m2["cdf"]]
    assert cdf_abs and all(os.path.exists(f) for f in cdf_abs)
    versioned.write_version(
        spark.range(5).selectExpr("CAST(id AS INT) AS k",
                                  "CONCAT('v', id) AS v"), p)  # v3
    # v2 still live → its cdf files survive
    versioned.vacuum(p, keep_last=2)
    assert all(os.path.exists(f) for f in cdf_abs)
    # v2 dropped → cdf files swept
    versioned.write_version(
        spark.range(5).selectExpr("CAST(id AS INT) AS k",
                                  "CONCAT('v', id) AS v"), p)  # v4
    versioned.vacuum(p, keep_last=1)
    assert not any(os.path.exists(f) for f in cdf_abs)
    with pytest.raises(FileNotFoundError):
        versioned.read_changes(spark, p, 1, 2)


def test_cdf_mor_equals_cow_feed(spark, tmp_path):
    """The SAME MERGE through COW and MOR physics produces the SAME
    change feed (physical plan differs, logical changes identical)."""
    cow = _mk(spark, str(tmp_path / "cow"))
    mor = _mk(spark, str(tmp_path / "mor"))
    versioned.set_table_property(mor, "dv.enabled", "true")
    ch = spark.createDataFrame(
        [(2, "x", False), (300, "y", False), (4, None, True),
         (6, "v6", False)],  # last one is a no-op upsert
        "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, cow, ch, "k")
    versioned.merge_version_cow(spark, mor, ch, "k")  # routes MOR
    f_cow = sorted((r._change_type, r.k, r.v) for r in
                   versioned.read_changes(spark, cow, 1).collect())
    f_mor = sorted((r._change_type, r.k, r.v) for r in
                   versioned.read_changes(spark, mor, 1).collect())
    assert f_cow == f_mor
    assert ("insert", 300, "y") in f_cow and ("delete", 4, "v4") in f_cow
    # the no-op upsert k=6 is suppressed on both sides
    assert not any(k == 6 for _, k, _ in f_cow)

"""Versioned snapshot tables: commit protocol + time-travel reads."""

from __future__ import annotations

import os

import pytest

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import etl
from tests.conftest import SF_SMALL


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


def test_round_trip_three_versions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v0 = [(1, "a"), (2, "b")]
    v1 = [(1, "a2"), (3, "c")]
    v2 = [(3, "c")]
    assert versioned.write_version(_mk(spark, v0), path) == 0
    assert versioned.write_version(_mk(spark, v1), path) == 1
    assert versioned.write_version(_mk(spark, v2), path) == 2
    assert versioned.versions(path) == [0, 1, 2]
    for want, v in ((v0, 0), (v1, 1), (v2, 2)):
        got = sorted(
            tuple(r) for r in versioned.read_version(spark, path, v).collect()
        )
        assert got == sorted(want)
    # default read = latest
    latest = sorted(
        tuple(r) for r in versioned.read_version(spark, path).collect()
    )
    assert latest == sorted(v2)


def test_immutable_versions_and_bad_reads(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="already committed"):
        versioned.write_version(_mk(spark, [(9, "z")]), path, 0)
    with pytest.raises(ValueError, match="not in"):
        versioned.read_version(spark, path, 7)
    with pytest.raises(FileNotFoundError):
        versioned.read_version(spark, str(tmp_path / "missing"))


def test_staged_dirs_invisible(spark, tmp_path):
    """A crashed write (staged dir, no manifest) must not surface."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    # simulate a crash after the data rename but before manifest publish
    os.makedirs(os.path.join(path, "v_1"))
    os.makedirs(os.path.join(path, "_staged_2"))
    assert versioned.versions(path) == [0]
    latest = versioned.read_version(spark, path)
    assert [tuple(r) for r in latest.collect()] == [(1, "a")]


def test_read_version_scans_only_its_dir(spark, tmp_path):
    """A pinned read must plan a scan of exactly its version's
    directory — later versions' files never enter the plan (the
    snapshot-isolation property)."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    versioned.write_version(_mk(spark, [(2, "b")]), path)
    d0 = versioned._load_manifest(path, 0)["dir"]
    d1 = versioned._load_manifest(path, 1)["dir"]
    files = versioned.read_version(spark, path, 0).inputFiles()
    assert files and all(f"/{d0}/" in f for f in files)
    assert not any(f"/{d1}/" in f for f in files)


def test_write_recovers_from_crash_orphan(spark, tmp_path):
    """A writer that died between the data rename and the manifest
    publish must not wedge the NEXT writer: data dirs are per-writer
    unique, so version N commits cleanly alongside the orphan, which
    vacuum's sweep then reclaims."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    orphan = os.path.join(path, "v_1_deadbeef0000")
    os.makedirs(os.path.join(orphan, "junk"))
    v = versioned.write_version(_mk(spark, [(2, "b")]), path)
    assert v == 1
    got = [tuple(r) for r in versioned.read_version(spark, path, 1).collect()]
    assert got == [(2, "b")]
    versioned.vacuum(path, keep_last=2)
    assert not os.path.exists(orphan)
    # the live version is untouched by the sweep
    got = [tuple(r) for r in versioned.read_version(spark, path, 1).collect()]
    assert got == [(2, "b")]


def test_vacuum_retention(spark, tmp_path):
    """vacuum drops old versions (manifest first), keeps the newest
    keep_last readable, and sweeps crash orphans."""
    path = str(tmp_path / "tbl")
    for i in range(4):
        versioned.write_version(_mk(spark, [(i, "x")]), path)
    v0_dir = os.path.join(path, versioned._load_manifest(path, 0)["dir"])
    assert os.path.isdir(v0_dir)
    # crash orphans: staged dir + data dir without manifest
    os.makedirs(os.path.join(path, "_staged_9"))
    os.makedirs(os.path.join(path, "v_9"))
    dropped = versioned.vacuum(path, keep_last=2)
    assert dropped == [0, 1]
    assert versioned.versions(path) == [2, 3]
    assert not os.path.exists(v0_dir)
    assert not os.path.exists(os.path.join(path, "_staged_9"))
    assert not os.path.exists(os.path.join(path, "v_9"))
    with pytest.raises(ValueError, match="not in"):
        versioned.read_version(spark, path, 0)
    got = [tuple(r) for r in versioned.read_version(spark, path, 3).collect()]
    assert got == [(3, "x")]
    # vacuum with fewer versions than keep_last is a no-op
    assert versioned.vacuum(path, keep_last=5) == []
    assert versioned.versions(path) == [2, 3]
    # history stays append-only past vacuum: a dropped number can't be
    # silently re-committed with different data, and auto-versioning
    # continues above the high-water mark
    with pytest.raises(ValueError, match="append-only"):
        versioned.write_version(_mk(spark, [(9, "z")]), path, 0)
    assert versioned.write_version(_mk(spark, [(4, "y")]), path) == 4
    # non-numeric v_* dirs don't wedge the orphan sweep
    os.makedirs(os.path.join(path, "v_backup"))
    versioned.vacuum(path, keep_last=2)
    assert os.path.isdir(os.path.join(path, "v_backup"))


def test_snapshot_read_version_time_travels(spark):
    """The registry query reads three distinct committed states, and
    version 0 equals a direct aggregate of the base table."""
    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table

    out = etl.snapshot_read_version(spark, SF_SMALL).collect()
    by_version = {}
    for r in out:
        by_version.setdefault(r.version, {})[r.o_orderstatus] = (
            r.n_orders, r.total_sales
        )
    assert sorted(by_version) == [0, 1, 2]
    # three genuinely different states
    totals = [
        sum(n for n, _ in by_version[v].values()) for v in (0, 1, 2)
    ]
    assert len(set(totals)) == 3
    base = (
        table(spark, SF_SMALL, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("t"),
        )
        .collect()
    )
    assert {r.o_orderstatus: (r.n, r.t) for r in base} == by_version[0]


# ---------------------------------------- file-level manifests / COW


def _mk_ranged(spark, n, parts):
    """n rows keyed 0..n-1, range-partitioned into ``parts`` files."""
    df = spark.range(n).selectExpr("CAST(id AS INT) AS k",
                                   "CONCAT('v', id) AS v")
    return df.repartitionByRange(parts, "k")


def test_cow_merge_shares_untouched_files(spark, tmp_path):
    """A COW merge whose changes hit one key range must rewrite only
    the file(s) holding that range, share every other parent file
    byte-identically, and stat-prune non-intersecting files without
    scanning them."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 800, 8), path, stats_col="k")
    ch = spark.createDataFrame(
        [(5, "upd5", False), (7, None, True), (9, "upd9", False)],
        "k INT, v STRING, is_delete BOOLEAN",
    )
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["version"] == 1
    assert stats["files_rewritten"] >= 1
    assert stats["files_shared"] >= stats["files_total"] - 2
    # stat-pruning actually skipped most parent files
    assert stats["files_pruned_by_stats"] >= 5
    m0 = versioned._load_manifest(path, 0)
    m1 = versioned._load_manifest(path, 1)
    shared = set(m0["files"]) & set(m1["files"])
    assert len(shared) == stats["files_shared"] and shared
    # content is the merged state
    got = {r.k: r.v for r in versioned.read_version(spark, path, 1).collect()}
    assert got[5] == "upd5" and got[9] == "upd9"
    assert 7 not in got
    assert len(got) == 800 - 1  # one delete
    # parent snapshot untouched
    v0 = {r.k: r.v for r in versioned.read_version(spark, path, 0).collect()}
    assert v0[5] == "v5" and 7 in v0 and len(v0) == 800


def test_cow_read_plans_shared_plus_new_files(spark, tmp_path):
    """The child's scan must contain parent (shared) files AND its own
    d_1 rewrites — proof the manifest, not a dir copy, drives the
    read."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 400, 4), path, stats_col="k")
    ch = spark.createDataFrame([(1, "x", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    d0 = versioned._load_manifest(path, 0)["dir"]
    files = versioned.read_version(spark, path, 1).inputFiles()
    assert any(f"/{d0}/" in f for f in files)
    assert any("/d_1_" in f for f in files)


def test_cow_vacuum_refcounts_shared_files(spark, tmp_path):
    """Vacuuming the parent must delete ONLY parent files the child
    does not reference; the child stays fully readable."""
    import os as _os

    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 800, 8), path, stats_col="k")
    ch = spark.createDataFrame([(3, "x", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    m0 = versioned._load_manifest(path, 0)
    m1 = versioned._load_manifest(path, 1)
    only_v0 = set(m0["files"]) - set(m1["files"])
    assert only_v0  # the rewritten file's original
    dropped = versioned.vacuum(path, keep_last=1)
    assert dropped == [0]
    # unshared parent files gone, shared ones alive
    for f in only_v0:
        assert not _os.path.exists(_os.path.join(path, f))
    for f in set(m1["files"]) & set(m0["files"]):
        assert _os.path.exists(_os.path.join(path, f))
    got = {r.k: r.v for r in versioned.read_version(spark, path).collect()}
    assert got[3] == "x" and len(got) == 800
    assert stats["files_shared"] == len(set(m1["files"]) & set(m0["files"]))


def test_cow_without_stats_still_correct(spark, tmp_path):
    """No stats on the parent → no pruning (all files are candidates)
    but the merge result is identical."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 200, 4), path)  # no stats_col
    ch = spark.createDataFrame([(0, "z", False), (199, None, True)],
                               "k INT, v STRING, is_delete BOOLEAN")
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_pruned_by_stats"] == 0
    got = {r.k: r.v for r in versioned.read_version(spark, path, 1).collect()}
    assert got[0] == "z" and 199 not in got and len(got) == 199


def test_cow_insert_only_changes(spark, tmp_path):
    """Changes whose keys miss every parent file (pure inserts) rewrite
    nothing: the child = all parent files + one new file."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 2), path, stats_col="k")
    ch = spark.createDataFrame([(1000, "new", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_rewritten"] == 0
    assert stats["files_shared"] == 2
    got = versioned.read_version(spark, path, 1)
    assert got.count() == 101
    assert got.filter("k = 1000").first().v == "new"


def test_optimize_version_compacts_preserving_history(spark, tmp_path):
    """OPTIMIZE commits a content-identical compacted version; the
    pre-optimize version still time-travels; vacuum then reclaims the
    fragmented files once that version is retired."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 400, 8), path, stats_col="k")
    # a couple of COW merges fragment the table with small d_N files
    for i, k in enumerate((3, 397)):
        ch = spark.createDataFrame([(k, f"u{k}", False)],
                                   "k INT, v STRING, is_delete BOOLEAN")
        versioned.merge_version_cow(spark, path, ch, "k")
    frag = versioned._load_manifest(path, 2)
    stats = versioned.optimize_version(spark, path, target_files=2,
                                       sort_col="k", stats_col="k")
    assert stats["files_before"] == len(frag["files"]) >= 8
    assert stats["files_after"] == 2
    # content identical to pre-optimize latest
    want = sorted((r.k, r.v) for r in
                  versioned.read_version(spark, path, 2).collect())
    got = sorted((r.k, r.v) for r in
                 versioned.read_version(spark, path, stats["version"]).collect())
    assert got == want
    assert got[3][1] == "u3"
    # optimized manifest carries fresh range stats for future pruning
    m = versioned._load_manifest(path, stats["version"])
    assert m["stats_col"] == "k" and len(m["stats"]) == 2
    # retiring every pre-optimize version reclaims the fragments
    versioned.vacuum(path, keep_last=1)
    import os as _os
    for f in frag["files"]:
        assert not _os.path.exists(_os.path.join(path, f))
    assert sorted((r.k, r.v) for r in
                  versioned.read_version(spark, path).collect()) == want


def test_history_reports_sharing_and_sizes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 400, 4), path, stats_col="k")
    ch = spark.createDataFrame([(1, "x", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    versioned.optimize_version(spark, path, target_files=1,
                               sort_col="k", stats_col="k")
    h = {r.version: r for r in versioned.history(spark, path).collect()}
    assert sorted(h) == [0, 1, 2]
    assert h[0].n_files == 4 and h[0].files_shared_with_prev == 0
    assert h[1].files_shared_with_prev == 3  # COW shared 3 of 4
    assert h[2].n_files == 1 and h[2].files_shared_with_prev == 0
    assert all(r.total_bytes > 0 for r in h.values())
    assert h[0].stats_col == "k"


def test_cow_merge_tolerates_all_null_stats_file(spark, tmp_path):
    """A parent file whose key column is entirely NULL records stats
    [None, None]; the stat-prune must keep it as a candidate instead
    of crashing on a None comparison."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(None, "n1"), (None, "n2"), (5, "a"), (9, "b")],
        "k INT, v STRING",
    ).repartitionByRange(2, "k")  # nulls-first range → one all-null file
    versioned.write_version(base, path, stats_col="k")
    m0 = versioned._load_manifest(path, 0)
    assert any(s == [None, None] for s in m0["stats"].values())
    ch = spark.createDataFrame([(5, "upd", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    got = sorted(
        ((r.k, r.v) for r in versioned.read_version(spark, path, 1).collect()),
        key=str,
    )
    assert (5, "upd") in got and len(got) == 4


def test_cow_null_delete_flag_is_upsert(spark, tmp_path):
    """A NULL is_delete must behave as an upsert — never silently drop
    the row (the ~NULL trap)."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 10, 1), path, stats_col="k")
    ch = spark.createDataFrame([(3, "upd", None)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    got = {r.k: r.v for r in versioned.read_version(spark, path, 1).collect()}
    assert got[3] == "upd" and len(got) == 10


def test_stats_col_date_and_decimal_supported_binary_rejected(
        spark, tmp_path):
    """Date stats serialize as ISO strings, decimal stats as the
    order-preserving fixed-point form — both prune; BINARY stats are
    rejected BEFORE any data is written."""
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(f"2024-0{m}-01", m) for m in range(1, 9)],
        "d STRING, m INT",
    ).selectExpr("CAST(d AS DATE) AS d", "m").repartitionByRange(4, "d")
    versioned.write_version(base, path, stats_col="d")
    m0 = versioned._load_manifest(path, 0)
    assert all(isinstance(s[0], str) for s in m0["stats"].values())
    ch = spark.createDataFrame([("2024-08-01", 99, False)],
                               "d STRING, m INT, is_delete BOOLEAN") \
        .selectExpr("CAST(d AS DATE) AS d", "m", "is_delete")
    stats = versioned.merge_version_cow(spark, path, ch, "d")
    assert stats["files_pruned_by_stats"] >= 2  # ISO order prunes
    got = {str(r.d): r.m for r in
           versioned.read_version(spark, path, 1).collect()}
    assert got["2024-08-01"] == 99 and len(got) == 8
    # decimal accepted: fixed-point encoded, order-preserving
    dec_path = str(tmp_path / "dec")
    dec = spark.createDataFrame([(i,) for i in range(8)], "k INT") \
        .selectExpr("CAST(k - 4 AS DECIMAL(10,2)) AS k") \
        .repartitionByRange(4, "k")
    versioned.write_version(dec, dec_path, stats_col="k")
    dm = versioned._load_manifest(dec_path, 0)
    spans = sorted(dm["stats"].values())
    assert all(versioned._is_decimal_stat(s[0]) for s in spans)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # encoded order == numeric order
    # binary rejected up front: nothing staged, nothing committed
    bin_path = str(tmp_path / "bin")
    binv = spark.createDataFrame([(1,)], "k INT").selectExpr(
        "CAST(CAST(k AS STRING) AS BINARY) AS k"
    )
    with _pytest.raises(TypeError, match="not order-preserving"):
        versioned.write_version(binv, bin_path, stats_col="k")
    assert versioned.versions(bin_path) == []
    import os as _os
    assert not _os.path.exists(bin_path) or not [
        d for d in _os.listdir(bin_path) if d.startswith(("v_", "_staged_"))
    ]


def test_vacuum_preserves_markers_in_live_dirs(spark, tmp_path):
    """vacuum must not strip _SUCCESS / checksum files from LIVE
    version directories — immutability means untouched, not cleaned."""
    import os as _os

    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 20, 1), path)
    versioned.write_version(_mk_ranged(spark, 20, 1), path)
    success = _os.path.join(
        path, versioned._load_manifest(path, 1)["dir"], "_SUCCESS"
    )
    assert _os.path.exists(success)
    versioned.vacuum(path, keep_last=1)
    assert _os.path.exists(success)
    assert versioned.versions(path) == [1]


def test_cow_merge_nan_stats_never_prune(spark, tmp_path):
    """NaN in a file's double-key stats (NaN sorts greatest, so max =
    NaN) defeats interval tests; such files must stay candidates or a
    merge would duplicate keys."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(5.0, "a"), (float("nan"), "n"), (9.0, "b"), (1.0, "c")],
        "k DOUBLE, v STRING",
    ).repartitionByRange(2, "k")
    versioned.write_version(base, path, stats_col="k")
    ch = spark.createDataFrame([(5.0, "upd", False)],
                               "k DOUBLE, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    vals = [r.v for r in versioned.read_version(spark, path, 1).collect()
            if r.k == 5.0]
    assert vals == ["upd"]  # exactly once — no duplicate from a bad prune


def test_cow_merge_decimal_key_prunes_and_merges(spark, tmp_path):
    """DECIMAL merge keys stat-prune via the fixed-point col_stats
    encoding AND merge correctly (pre-r9 they were unindexed and every
    file was a candidate)."""
    path = str(tmp_path / "tbl")
    base = spark.range(100).selectExpr(
        "CAST(id AS DECIMAL(10,2)) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(4, "k")
    versioned.write_version(base, path)  # no stats_col: col_stats only
    ch = spark.createDataFrame([(2, "upd", False)],
                               "k INT, v STRING, is_delete BOOLEAN") \
        .selectExpr("CAST(k AS DECIMAL(10,2)) AS k", "v", "is_delete")
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_pruned_by_stats"] >= 3
    assert stats["files_rewritten"] == 1
    got = {str(r.k): r.v for r in
           versioned.read_version(spark, path, 1).collect()}
    assert got["2.00"] == "upd" and len(got) == 100


def test_publish_cas_rejects_concurrent_commit(spark, tmp_path):
    """The manifest publish is a compare-and-swap: when two writers
    race the same version number, exactly one wins and the other gets
    CommitConflict — never a silent overwrite of the winner's commit.
    (The race window is between both writers passing the high-water
    check and publishing; we drive _publish directly to hit it.)"""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    manifest = versioned._load_manifest(path, 0)
    winner = dict(manifest, version=1, files=manifest["files"])
    loser = dict(manifest, version=1, files=[])
    assert versioned._publish(path, winner) == 1
    with pytest.raises(versioned.CommitConflict, match="concurrent"):
        versioned._publish(path, loser)
    # the winner's manifest is intact, not clobbered by the loser
    assert versioned._load_manifest(path, 1)["files"] == manifest["files"]
    # no stray tmp file wedges the manifest dir
    mdir = os.path.join(path, "_manifest")
    assert not any(f.endswith(".tmp") for f in os.listdir(mdir))


def test_optimize_zorder_tightens_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER must produce files whose [min,max] spans are
    narrow on BOTH columns; a plain range sort on x leaves every file
    spanning the full y range. Content must be unchanged."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    grid = spark.range(32 * 32).selectExpr(
        "CAST(id % 32 AS INT) AS x",
        "CAST(id DIV 32 AS INT) AS y",
    )
    versioned.write_version(grid.coalesce(1), path)

    def spans(version):
        m = versioned._load_manifest(path, version)
        df = spark.read.parquet(
            *[f"{path}/{f}" for f in m["files"]]
        ).groupBy(F.input_file_name()).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        return [(r.sx, r.sy) for r in df.collect()]

    sv = versioned.optimize_version(spark, path, target_files=4,
                                    sort_col="x")
    zv = versioned.optimize_version(spark, path, target_files=4,
                                    zorder_cols=("x", "y"), zorder_bits=5)
    sort_spans = spans(sv["version"])
    z_spans = spans(zv["version"])
    assert len(z_spans) == 4
    # plain x-sort: every file spans all of y (31)
    assert all(sy == 31 for _, sy in sort_spans)
    # z-order: every file covers about half of each dimension — range
    # predicates on EITHER column prune files
    assert all(sy <= 20 and sx <= 20 for sx, sy in z_spans)
    # content identical
    got = sorted((r.x, r.y) for r in
                 versioned.read_version(spark, path, zv["version"]).collect())
    want = sorted((r.x, r.y) for r in grid.collect())
    assert got == want


def test_versioned_python_datasource_time_travels(spark, tmp_path):
    """spark.read.format('versioned') resolves the manifest like
    read_version: pinned versions, latest default, COW children with
    shared files, schema from the manifest (no data file opened at
    planning)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    spark.dataSource.register(VersionedDataSource)
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 4), path, stats_col="k")
    ch = spark.createDataFrame([(3, "upd", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")

    def rd(version=None):
        r = spark.read.format("versioned").option("path", path)
        if version is not None:
            r = r.option("version", version)
        return r.load()

    v0 = {r.k: r.v for r in rd(0).collect()}
    v1 = {r.k: r.v for r in rd(1).collect()}
    latest = {r.k: r.v for r in rd().collect()}
    assert v0[3] == "v3" and len(v0) == 100
    assert v1[3] == "upd" and len(v1) == 100
    assert latest == v1
    # manifest schema preserves the writer's nullability; the native
    # parquet scan relaxes to nullable — names/types must agree
    assert [(f.name, f.dataType) for f in rd(0).schema.fields] == \
        [(f.name, f.dataType)
         for f in versioned.read_version(spark, path, 0).schema.fields]
    import pytest as _p
    with _p.raises(Exception, match="not in"):
        rd(9).collect()


def test_optimize_zorder_rejects_reserved_columns(spark, tmp_path):
    """A table whose columns collide with the ZORDER bookkeeping names
    must be rejected up front — never silently corrupted."""
    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("CAST(id AS INT) AS x",
                                    "CAST(id AS INT) AS y",
                                    "CAST(id AS INT) AS _zk")
    versioned.write_version(df, path)
    with pytest.raises(ValueError, match="_zk"):
        versioned.optimize_version(spark, path, target_files=2,
                                   zorder_cols=("x", "y"))
    # nothing was committed by the failed OPTIMIZE
    assert versioned.versions(path) == [0]


def test_losing_concurrent_writer_cannot_clobber_winner(spark, tmp_path,
                                                        monkeypatch):
    """Two writers race version 1: B resolves the version number, A
    commits it first. B must get CommitConflict AND the winner's data
    must stay readable — a shared final dir name would let B delete
    A's committed files before its own publish fails."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)  # v0

    real_next = versioned._next_version

    def racing_next(table_path, version):
        v = real_next(table_path, version)
        monkeypatch.undo()  # writer A below uses the real resolver
        versioned.write_version(_mk(spark, [(2, "A")]), table_path,
                                version=v)
        return v

    monkeypatch.setattr(versioned, "_next_version", racing_next)
    with pytest.raises(versioned.CommitConflict):
        versioned.write_version(_mk(spark, [(3, "B")]), path)
    got = [tuple(r) for r in versioned.read_version(spark, path, 1).collect()]
    assert got == [(2, "A")]
    # the loser's staged data did not linger as a visible or orphan dir
    lingering = [d for d in os.listdir(path)
                 if d.startswith(("_staged_", "v_1"))
                 and d != versioned._load_manifest(path, 1)["dir"]]
    assert lingering == []


def test_losing_concurrent_merge_cannot_clobber_winner(spark, tmp_path,
                                                       monkeypatch):
    """Same race through merge_version_cow: writer A commits version 1
    AFTER the merge has taken its table snapshot. The merge must
    collide on the version number (CommitConflict) — publishing one
    number higher with the stale parent would silently drop A's rows —
    and A's v1 must stay intact."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a"), (2, "b")]), path)

    real_load = versioned._load_manifest

    def racing_load(table_path, version):
        # fires inside the merge's snapshot window, right after
        # versions() resolved [0]: A lands v1 now
        monkeypatch.undo()
        versioned.write_version(_mk(spark, [(9, "A")]), table_path)
        return real_load(table_path, version)

    monkeypatch.setattr(versioned, "_load_manifest", racing_load)
    ch = spark.createDataFrame([(1, "B", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    with pytest.raises(versioned.CommitConflict):
        versioned.merge_version_cow(spark, path, ch, "k")
    got = [tuple(r) for r in versioned.read_version(spark, path, 1).collect()]
    assert got == [(9, "A")]


def test_merge_on_empty_table_raises_filenotfound(spark, tmp_path):
    """MERGE against a table with no committed versions follows the
    read_version contract (FileNotFoundError, not IndexError)."""
    ch = spark.createDataFrame([(1, "x", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    with pytest.raises(FileNotFoundError):
        versioned.merge_version_cow(spark, str(tmp_path / "nope"), ch, "k")


def _register_ds(spark):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    try:
        spark.dataSource.register(VersionedDataSource)
    except Exception:
        pass  # already registered in this session


def test_versioned_writer_append_and_overwrite(spark, tmp_path):
    """df.write.format('versioned'): append commits a new version that
    SHARES every parent file (fast append, nothing rewritten);
    overwrite commits a fresh-content version; history stays
    time-travelable; a mismatched append schema is rejected."""
    import pytest

    _register_ds(spark)
    path = str(tmp_path / "tbl")
    df0 = spark.range(10).selectExpr("id AS k", "CAST(id * 2 AS LONG) AS v")
    df0.write.format("versioned").mode("overwrite").option("path", path).save()
    assert versioned.versions(path) == [0]

    df1 = spark.range(10, 15).selectExpr("id AS k", "CAST(id * 2 AS LONG) AS v")
    df1.write.format("versioned").mode("append").option("path", path).save()
    assert versioned.versions(path) == [0, 1]
    m0 = versioned._load_manifest(path, 0)
    m1 = versioned._load_manifest(path, 1)
    # fast append: every v0 file is shared byte-identically by v1
    assert set(m0["files"]) <= set(m1["files"])
    assert len(m1["files"]) > len(m0["files"])

    got = {r.k: r.v for r in versioned.read_version(spark, path).collect()}
    assert got == {i: 2 * i for i in range(15)}
    # the DS read path sees the same latest version
    ds = {r.k: r.v for r in spark.read.format("versioned")
          .option("path", path).load().collect()}
    assert ds == got
    # time travel to the pre-append state
    v0 = {r.k: r.v for r in versioned.read_version(spark, path, 0).collect()}
    assert v0 == {i: 2 * i for i in range(10)}

    # overwrite replaces content in a NEW version; v1 stays readable
    df2 = spark.range(3).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
    df2.write.format("versioned").mode("overwrite").option("path", path).save()
    assert versioned.versions(path) == [0, 1, 2]
    assert {r.k for r in versioned.read_version(spark, path).collect()} == {0, 1, 2}
    assert len({r.k for r in versioned.read_version(spark, path, 1).collect()}) == 15

    # append with a different schema is rejected loudly
    bad = spark.range(2).selectExpr("id AS k", "CAST(id AS STRING) AS w")
    with pytest.raises(Exception, match="schema"):
        bad.write.format("versioned").mode("append").option("path", path).save()
    assert versioned.versions(path) == [0, 1, 2]
    # no stray staged dirs survive the failed append
    assert not [d for d in os.listdir(path) if d.startswith("_staged_w_")]


def test_purge_then_vacuum_physically_erases(spark, tmp_path):
    """Right-to-be-forgotten through the lakehouse: a MERGE delete
    removes the rows logically; after vacuum retires the pre-delete
    versions, NO surviving data file contains the purged key — the
    bytes are gone, not just unreferenced."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"user{i}@example.test") for i in range(100)], "k INT, pii STRING"
    ).repartitionByRange(4, "k")
    versioned.write_version(df, path, stats_col="k")
    ch = spark.createDataFrame([(42, None, True)],
                               "k INT, pii STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    # logically gone at latest, still present via time travel
    assert 42 not in {r.k for r in versioned.read_version(spark, path).collect()}
    assert 42 in {r.k for r in versioned.read_version(spark, path, 0).collect()}
    # retire history → physical erasure
    versioned.vacuum(path, keep_last=1)
    leftovers = []
    for root, _dirs, files in os.walk(path):
        if versioned._MANIFEST_DIR in root:
            continue
        for f in files:
            if f.startswith(("_", ".")):
                continue
            blob = open(os.path.join(root, f), "rb").read()
            if b"user42@example.test" in blob:
                leftovers.append(os.path.join(root, f))
    assert leftovers == []
    # and the table still serves the 99 survivors
    assert len(versioned.read_version(spark, path).collect()) == 99


def test_ds_writer_commit_messages_and_stale_snapshot(spark, tmp_path,
                                                       monkeypatch):
    """Direct unit test of VersionedWriter.commit (a real save() runs
    it in a separate Python worker, out of monkeypatch reach):
    (1) only files named by task commit messages are manifested — a
    half-written stray from a failed attempt is discarded; (2) a
    commit whose table snapshot went stale collides on the version
    number (CommitConflict) instead of silently dropping the
    interleaved version's files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedWriter,
        _WrotePart,
    )

    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)  # v0
    schema = _mk(spark, [(1, "a")]).schema

    # ---- (1) stray files without a commit message never get manifested
    w = VersionedWriter(path, schema, overwrite=False)
    os.makedirs(w.staged)
    pq.write_table(pa.table({"k": pa.array([5], pa.int32()),
                             "v": ["z"]}), os.path.join(w.staged, "part-good.parquet"))
    open(os.path.join(w.staged, "part-halfwritten.parquet"), "wb").write(b"PAR1junk")
    w.commit([_WrotePart(filename="part-good.parquet", n_rows=1), None])
    m1 = versioned._load_manifest(path, 1)
    assert [f for f in m1["files"] if "halfwritten" in f] == []
    got = sorted(tuple(r) for r in versioned.read_version(spark, path).collect())
    assert got == [(1, "a"), (5, "z")]
    assert not os.path.exists(w.staged)

    # ---- (2) stale snapshot -> CommitConflict, winner intact
    w2 = VersionedWriter(path, schema, overwrite=False)
    os.makedirs(w2.staged)
    pq.write_table(pa.table({"k": pa.array([7], pa.int32()), "v": ["B"]}),
                   os.path.join(w2.staged, "part-b.parquet"))
    real_load = versioned._load_manifest

    def racing_load(tp, v):
        monkeypatch.undo()
        versioned.write_version(_mk(spark, [(9, "A")]), tp)  # v2 lands
        return real_load(tp, v)

    monkeypatch.setattr(versioned, "_load_manifest", racing_load)
    # r8: blind appends AUTO-RETRY on CommitConflict (Delta's conflict
    # protocol) — the loser re-resolves the new parent and republishes,
    # so BOTH writers' rows land, serialized, nothing lost
    w2.commit([_WrotePart(filename="part-b.parquet", n_rows=1)])
    assert versioned.versions(path) == [0, 1, 2, 3]
    got = [tuple(r) for r in versioned.read_version(spark, path, 2).collect()]
    assert got == [(9, "A")]  # the interleaved winner is intact at v2
    # v2 was an overwrite snapshot, so latest = its content + this append
    latest = sorted(tuple(r)
                    for r in versioned.read_version(spark, path).collect())
    assert latest == [(7, "B"), (9, "A")]


def test_ds_fresh_table_race_collides_instead_of_dropping_v0(spark, tmp_path,
                                                             monkeypatch):
    """ADVICE r4 (medium): an append to a FRESH table whose snapshot
    goes stale — a concurrent writer commits v0 between versions() and
    publish — must raise CommitConflict, not publish v1 with
    parent_files=[] (which would drop v0's rows from latest). The
    version number must derive from the same empty snapshot as the
    (empty) parent file list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedWriter,
        _WrotePart,
    )

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    schema = _mk(spark, [(1, "a")]).schema
    w = VersionedWriter(path, schema, overwrite=False)
    os.makedirs(w.staged)
    pq.write_table(pa.table({"k": pa.array([5], pa.int32()), "v": ["z"]}),
                   os.path.join(w.staged, "part-z.parquet"))
    real_versions = versioned.versions

    def racing_versions(tp):
        snap = real_versions(tp)
        if snap == []:
            monkeypatch.undo()
            versioned.write_version(_mk(spark, [(9, "A")]), tp)  # v0 lands
        return snap

    monkeypatch.setattr(versioned, "versions", racing_versions)
    # r8 blind-append retry: the loser re-resolves, sees the
    # interleaved v0, and publishes v1 SHARING v0's files — v0's rows
    # are never dropped from latest
    w.commit([_WrotePart(filename="part-z.parquet", n_rows=1)])
    assert versioned.versions(path) == [0, 1]
    got = [tuple(r) for r in versioned.read_version(spark, path, 0).collect()]
    assert got == [(9, "A")]
    latest = sorted(tuple(r)
                    for r in versioned.read_version(spark, path).collect())
    assert latest == [(5, "z"), (9, "A")]


def test_ds_append_carries_stats_forward(spark, tmp_path):
    """ADVICE r4 (low): a DS append on a table written with stats_col
    must carry the parent's per-file stats forward (files are
    immutable) and give its own part files footer-derived stats — so a
    subsequent merge_version_cow still data-skips instead of scanning
    every candidate file."""
    _register_ds(spark)
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 800, 8), path, stats_col="k")
    m0 = versioned._load_manifest(path, 0)

    extra = spark.range(900, 905).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('n', id) AS v").coalesce(1)
    extra.write.format("versioned").mode("append").option("path", path).save()

    m1 = versioned._load_manifest(path, 1)
    assert m1["stats_col"] == "k"
    # parent entries verbatim
    for f in m0["files"]:
        assert m1["stats"][f] == m0["stats"][f]
    # the appended file got exact footer stats
    new = [f for f in m1["files"] if f not in set(m0["files"])]
    assert new
    for f in new:
        assert m1["stats"][f] == [900, 904]
    # and the pruning still works end-to-end after the DS append
    ch = spark.createDataFrame([(3, "upd", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_pruned_by_stats"] >= 7


def test_ds_overwrite_keeps_stats_col_with_footer_stats(spark, tmp_path):
    """Overwrite replaces content, so no parent entries carry over —
    but the table's stats_col discipline survives via footer stats on
    the new files."""
    _register_ds(spark)
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 2), path, stats_col="k")
    fresh = spark.createDataFrame([(i, "w") for i in range(50, 60)],
                                  "k INT, v STRING").coalesce(1)
    fresh.write.format("versioned").mode("overwrite").option("path", path).save()
    m1 = versioned._load_manifest(path, 1)
    assert m1["stats_col"] == "k"
    assert set(m1["stats"]) == set(m1["files"])
    assert all(s == [50, 59] for s in m1["stats"].values())


def test_file_stats_keyed_by_relpath_not_basename(spark, tmp_path):
    """VERDICT r4 item 5: _file_stats must key by table-relative path.
    Two files in different version dirs sharing a basename must keep
    DISTINCT stats — a basename-keyed map silently merged them
    (pruning-pessimal)."""
    import shutil

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(i, "a") for i in range(10)],
                          "k INT, v STRING").coalesce(1) \
        .write.parquet(os.path.join(path, "dir_a"))
    spark.createDataFrame([(i, "b") for i in range(1000, 1010)],
                          "k INT, v STRING").coalesce(1) \
        .write.parquet(os.path.join(path, "dir_b"))
    # force a basename collision across the dirs
    for d in ("dir_a", "dir_b"):
        src = [f for f in os.listdir(os.path.join(path, d))
               if f.endswith(".parquet")][0]
        shutil.move(os.path.join(path, d, src),
                    os.path.join(path, d, "part-same.parquet"))
    rel = ["dir_a/part-same.parquet", "dir_b/part-same.parquet"]
    stats = versioned._file_stats(spark, path, rel, "k")
    assert stats["dir_a/part-same.parquet"] == [0, 9]
    assert stats["dir_b/part-same.parquet"] == [1000, 1009]


def test_merge_rejects_non_next_explicit_version(spark, tmp_path):
    """ADVICE r4 (low): a merge pinned above avail[-1]+1 would publish
    from a stale parent without ever colliding with an interleaved
    commit at avail[-1]+1 — explicit merge versions must be exactly
    the next slot."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 2), path, stats_col="k")
    ch = spark.createDataFrame([(1, "x", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    with pytest.raises(ValueError, match="next version"):
        versioned.merge_version_cow(spark, path, ch, "k", version=4)
    assert versioned.versions(path) == [0]  # nothing published
    # the exact next slot is still accepted
    stats = versioned.merge_version_cow(spark, path, ch, "k", version=1)
    assert stats["version"] == 1


def test_table_changes_cdf_classifies_all_types(spark, tmp_path):
    """table_changes emits insert/delete/update pre+post images between
    two snapshots, keyed diff, unchanged keys dropped."""
    path = str(tmp_path / "tbl")
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k INT, s STRING, v INT"
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], "k INT, s STRING, v INT"
    )
    versioned.write_version(v0, path, 0)
    versioned.write_version(v1, path, 1)
    feed = versioned.table_changes(spark, path, ["k"], 0, 1)
    got = {(r["_change_type"], r["k"]) for r in feed.collect()}
    assert got == {
        ("insert", 4), ("delete", 3),
        ("update_preimage", 2), ("update_postimage", 2),
    }
    row = {r["_change_type"]: r for r in feed.collect()}
    assert row["update_preimage"]["v"] == 20
    assert row["update_postimage"]["v"] == 99
    assert row["insert"]["_from_version"] == 0
    assert row["insert"]["_to_version"] == 1


def test_table_changes_cdf_schema_evolution(spark, tmp_path):
    """A column added between the versions reads as NULL on the pre
    side; the widened row classifies as an update."""
    path = str(tmp_path / "tbl")
    versioned.write_version(
        spark.createDataFrame([(1, "a")], "k INT, s STRING"), path, 0
    )
    versioned.write_version(
        spark.createDataFrame([(1, "a", 7)], "k INT, s STRING, extra INT"),
        path, 1,
    )
    feed = versioned.table_changes(spark, path, ["k"], 0, 1)
    rows = {r["_change_type"]: r for r in feed.collect()}
    assert set(rows) == {"update_preimage", "update_postimage"}
    assert rows["update_preimage"]["extra"] is None
    assert rows["update_postimage"]["extra"] == 7


def test_table_changes_cdf_identical_versions_empty(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, s STRING")
    versioned.write_version(df, path, 0)
    versioned.write_version(df, path, 1)
    assert versioned.table_changes(spark, path, ["k"], 0, 1).count() == 0


def test_files_metadata_table(spark, tmp_path):
    """versioned.files: one row per data file with size + manifest
    [min,max] stats — the Iceberg table.files analog."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 4), path, stats_col="k")
    meta = versioned.files(spark, path)
    rows = meta.collect()
    assert len(rows) == 4
    assert all(r["size_bytes"] > 0 for r in rows)
    assert all(r["stats_col"] == "k" for r in rows)
    assert all(r["version"] == 0 for r in rows)
    los = sorted(int(r["stats_min"]) for r in rows)
    his = sorted(int(r["stats_max"]) for r in rows)
    assert los[0] == 0 and his[-1] == 99
    # a version without stats still lists files, stats NULL
    versioned.write_version(_mk_ranged(spark, 10, 1), path, 1)
    meta1 = versioned.files(spark, path, 1)
    r1 = meta1.collect()
    assert len(r1) == 1 and r1[0]["stats_min"] is None
    with pytest.raises(ValueError):
        versioned.files(spark, path, 9)


def test_versioned_stream_source_replays_and_resumes(spark, tmp_path):
    """readStream.format('versioned'): every committed version is a
    micro-batch of its ADDED files; a checkpointed restart resumes
    from the last committed version and streams only new commits."""
    _register_ds(spark)
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    spark.range(5).selectExpr("id AS k").write.format("versioned") \
        .mode("overwrite").option("path", path).save()
    spark.range(5, 8).selectExpr("id AS k").write.format("versioned") \
        .mode("append").option("path", path).save()

    out = str(tmp_path / "out")

    def _drain():
        q = (
            spark.readStream.format("versioned").option("path", path).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    # first run replays the full history (v0's files + v1's delta)
    assert _drain() == list(range(8))

    # new commit after the stream stopped; resume streams ONLY v2's
    # added files (checkpointed offset = version 1): the sink grows by
    # exactly {8, 9} with NO re-emitted rows — duplicates would show
    # as a longer list
    spark.range(8, 10).selectExpr("id AS k").write.format("versioned") \
        .mode("append").option("path", path).save()
    assert _drain() == list(range(10))


def test_versioned_stream_source_starting_version(spark, tmp_path):
    _register_ds(spark)
    path = str(tmp_path / "tbl")
    spark.range(3).selectExpr("id AS k").write.format("versioned") \
        .mode("overwrite").option("path", path).save()
    spark.range(3, 5).selectExpr("id AS k").write.format("versioned") \
        .mode("append").option("path", path).save()
    q = (
        spark.readStream.format("versioned").option("path", path)
        .option("startingVersion", 1).load()
        .writeStream.format("memory").queryName("vs_sv")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["k"] for r in spark.sql("SELECT k FROM vs_sv").collect()}
    assert got == {3, 4}  # only version 1's added files


def test_table_changes_feed_reconstructs_target(spark, tmp_path):
    """CDF soundness invariant: v_from − deletes − update_preimages
    + inserts + update_postimages == v_to, row for row. This is the
    contract a downstream incremental consumer relies on."""
    path = str(tmp_path / "tbl")
    v0 = spark.range(0, 40).selectExpr(
        "id AS k", "CAST(id % 7 AS STRING) AS s", "id * 3 AS v")
    # v1: drop k%5==0, rewrite v for k%3==0, add 5 new keys
    v1 = (
        spark.range(0, 40).filter("id % 5 != 0")
        .selectExpr("id AS k", "CAST(id % 7 AS STRING) AS s",
                    "IF(id % 3 = 0, id * 100, id * 3) AS v")
        .unionByName(spark.range(100, 105).selectExpr(
            "id AS k", "'new' AS s", "id AS v"))
    )
    versioned.write_version(v0, path, 0)
    versioned.write_version(v1, path, 1)
    feed = versioned.table_changes(spark, path, ["k"], 0, 1)
    feed.createOrReplaceTempView("cdf_feed")
    versioned.read_version(spark, path, 0).createOrReplaceTempView("cdf_v0")
    rebuilt = spark.sql("""
        SELECT k, s, v FROM cdf_v0
        WHERE k NOT IN (SELECT k FROM cdf_feed
                        WHERE _change_type IN ('delete', 'update_preimage'))
        UNION ALL
        SELECT k, s, v FROM cdf_feed
        WHERE _change_type IN ('insert', 'update_postimage')
    """)
    got = sorted(tuple(r) for r in rebuilt.collect())
    want = sorted(tuple(r) for r in
                  versioned.read_version(spark, path, 1).collect())
    assert got == want


def test_backfill_stats_enables_pruning(spark, tmp_path):
    """A table written WITHOUT stats_col gains data skipping after a
    metadata-only footer backfill: same files, new version, and the
    next COW merge prunes non-intersecting files just like a table
    born with stats. Footer stats must equal the scanning path's."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 800, 8), path)  # no stats
    v1 = versioned.backfill_stats(path, "k")
    assert v1 == 1
    m0 = versioned._load_manifest(path, 0)
    m1 = versioned._load_manifest(path, 1)
    assert m0.get("stats_col") is None
    assert m1["stats_col"] == "k"
    assert m1["files"] == m0["files"]          # no data rewritten
    assert m1["backfilled_from"] == 0
    # footer stats == what a full scan would have recorded
    assert m1["stats"] == versioned._file_stats(spark, path, m1["files"], "k")
    ch = spark.createDataFrame(
        [(5, "upd5", False)], "k INT, v STRING, is_delete BOOLEAN"
    )
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_pruned_by_stats"] >= 5
    got = {r.k: r.v for r in versioned.read_version(spark, path).collect()}
    assert got[5] == "upd5" and len(got) == 800


def test_backfill_stats_rejects_missing_column(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 20, 2), path)
    import pytest as _pytest
    with _pytest.raises(KeyError):
        versioned.backfill_stats(path, "nope")


def test_restore_version_rolls_back_without_losing_history(spark, tmp_path):
    """RESTORE publishes a metadata-only copy of an old state as the
    new latest: no data rewritten (same file set), the bad version
    stays time-travelable, and a subsequent merge builds on the
    restored state."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 100, 2), path, stats_col="k")
    bad = spark.createDataFrame(
        [(k, "oops", False) for k in range(50)],
        "k INT, v STRING, is_delete BOOLEAN",
    )
    versioned.merge_version_cow(spark, path, bad, "k")      # v1: bad write
    v2 = versioned.restore_version(path, 0)
    assert v2 == 2
    m0 = versioned._load_manifest(path, 0)
    m2 = versioned._load_manifest(path, 2)
    assert m2["files"] == m0["files"]           # zero-copy rollback
    assert m2["restored_from"] == 0
    assert m2.get("stats_col") == "k"           # stats survive restore
    # latest == v0 state; the bad v1 still queryable for post-mortem
    got = {r.k: r.v for r in versioned.read_version(spark, path).collect()}
    assert got[5] == "v5"
    bad1 = {r.k: r.v for r in versioned.read_version(spark, path, 1).collect()}
    assert bad1[5] == "oops"
    # forward progress on top of the restore, with stats pruning alive
    ch = spark.createDataFrame(
        [(7, "post", False)], "k INT, v STRING, is_delete BOOLEAN"
    )
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["version"] == 3
    got3 = {r.k: r.v for r in versioned.read_version(spark, path).collect()}
    assert got3[7] == "post" and got3[5] == "v5"


def test_restore_rejects_vacuumed_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for i in range(4):
        versioned.write_version(_mk_ranged(spark, 20 + i, 2), path)
    versioned.vacuum(path, keep_last=2)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        versioned.restore_version(path, 0)


def test_backfill_stats_legacy_dir_manifest(spark, tmp_path):
    """A legacy {version, dir} manifest (no files/schema keys) gains
    stats without changing shape: reads still resolve through the dir
    branch and the next merge consumes the stats via its legacy file
    listing."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 200, 4), path)
    m0 = versioned._load_manifest(path, 0)
    import json as _json
    import os as _os
    legacy = {"version": 0, "dir": m0["dir"]}
    with open(_os.path.join(versioned._manifest_path(path), "0.json"),
              "w") as fh:
        _json.dump(legacy, fh)
    v1 = versioned.backfill_stats(path, "k")
    m1 = versioned._load_manifest(path, v1)
    assert "files" not in m1 and m1["dir"] == m0["dir"]
    assert m1["stats_col"] == "k" and len(m1["stats"]) == 4
    assert versioned.read_version(spark, path).count() == 200
    ch = spark.createDataFrame(
        [(3, "u", False)], "k INT, v STRING, is_delete BOOLEAN"
    )
    stats = versioned.merge_version_cow(spark, path, ch, "k")
    assert stats["files_pruned_by_stats"] >= 2


def test_backfill_timestamp_stats_prune_is_tz_safe(spark, tmp_path):
    """Footer timestamp stats are tz-AWARE UTC while scan/collect
    paths render naive DRIVER-LOCAL datetimes — the manifest encoding
    must canonicalize both to one representation or the interval prune
    compares shifted strings (wrong prune = silent row duplication).
    Run under a skewed session zone to prove session-tz immunity; all
    instants are epoch-anchored so expectations are rendering-free."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        path = str(tmp_path / "tbl")
        df = spark.range(200).selectExpr(
            "timestamp_seconds(id * 3600) AS ts",
            "CONCAT('v', id) AS v",
        ).repartitionByRange(4, "ts")
        versioned.write_version(df, path)
        versioned.backfill_stats(path, "ts")
        m1 = versioned._load_manifest(path, 1)
        # canonical: naive isoformat, no UTC offset suffix
        for lohi in m1["stats"].values():
            assert lohi is not None and "+" not in lohi[0]
        ch = spark.range(1).selectExpr(
            "timestamp_seconds(5 * 3600) AS ts",
            "'upd' AS v",
            "false AS is_delete",
        )
        stats = versioned.merge_version_cow(spark, path, ch, "ts")
        assert stats["files_pruned_by_stats"] >= 2      # pruning alive
        got = {r.v for r in versioned.read_version(spark, path).collect()}
        assert "upd" in got and "v5" not in got          # upsert landed
        assert versioned.read_version(spark, path).count() == 200
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_shallow_clone_zero_copy_and_independent(spark, tmp_path):
    """SHALLOW CLONE: manifest-only (no data copied), reads equal the
    source snapshot, and post-clone DML rewrites only touched files
    into the CLONE's directory — the source stays byte-identical and
    the clone's vacuum never reclaims source-owned files."""
    import os

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(400).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(4, "k")
    versioned.write_version(df, src, stats_col="k")

    v = versioned.clone_table(src, dst)
    assert v == 0
    # zero copy: no parquet landed under dst
    assert not [f for _, _, fs in os.walk(dst) for f in fs
                if f.endswith(".parquet")]
    got = versioned.read_version(spark, dst)
    assert got.count() == 400
    # stats carried under the absolute keys -> merges can still prune
    m = versioned._load_manifest(dst, 0)
    assert m["stats_col"] == "k"
    assert all(k.startswith("/") and s is not None
               for k, s in m["stats"].items())

    # DML on the clone: the fully-matched shared file DROPS from the
    # clone's manifest metadata-only (nothing rewritten, nothing local)
    stats = versioned.delete_where(spark, dst, "k >= 300")
    assert stats["files_dropped"] == 1 and stats["files_rewritten"] == 0
    assert stats["files_shared"] == 3
    assert versioned.read_version(spark, dst).count() == 300
    # source untouched
    assert versioned.read_version(spark, src).count() == 400
    assert versioned.versions(src) == [0]

    # clone vacuum drops its own stale version but never source files
    src_files_before = sorted(
        f for _, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    versioned.vacuum(dst, keep_last=1)
    src_files_after = sorted(
        f for _, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert src_files_before == src_files_after
    assert versioned.read_version(spark, dst).count() == 300


def test_shallow_clone_time_travel_and_guards(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    versioned.write_version(
        spark.range(10).selectExpr("id AS k", "id * 2 AS v"), src
    )
    versioned.write_version(
        spark.range(20).selectExpr("id AS k", "id * 2 AS v"), src
    )
    versioned.clone_table(src, dst, version=0)
    assert versioned.read_version(spark, dst).count() == 10
    with pytest.raises(ValueError, match="never clobbers"):
        versioned.clone_table(src, dst)
    with pytest.raises(ValueError, match="not in"):
        versioned.clone_table(src, str(tmp_path / "d2"), version=9)


def test_predicate_dml_concurrent_commit_conflicts(spark, tmp_path, monkeypatch):
    """Predicate DELETE rides the same manifest CAS as MERGE: if
    another writer commits between the snapshot read and the publish,
    the DML must raise CommitConflict and clean up its staged data —
    never silently drop the interleaved commit."""
    import os

    path = str(tmp_path / "tbl")
    versioned.write_version(
        spark.range(100).selectExpr("id AS k", "id * 2 AS v"), path
    )

    real_publish = versioned._publish
    fired = {"done": False}

    def interleaving_publish(table_path, manifest):
        # the first publish attempt (the DML's) gets beaten to the
        # version slot by a competing append
        if not fired["done"] and manifest.get("version") == 1:
            fired["done"] = True
            versioned.write_version(  # a competing FULL snapshot
                spark.range(105).selectExpr("id AS k", "id * 3 AS v"),
                table_path,
            )
        return real_publish(table_path, manifest)

    monkeypatch.setattr(versioned, "_publish", interleaving_publish)
    with pytest.raises(versioned.CommitConflict):
        versioned.delete_where(spark, path, "k < 10")
    monkeypatch.setattr(versioned, "_publish", real_publish)

    # the interleaved append won; nothing was lost, nothing staged left
    assert versioned.versions(path) == [0, 1]
    assert versioned.read_version(spark, path).count() == 105
    assert not [d for d in os.listdir(path) if d.startswith("_staged_")]
    # retry against the new snapshot succeeds
    stats = versioned.delete_where(spark, path, "k < 10")
    assert stats["version"] == 2
    assert versioned.read_version(spark, path).count() == 95


def test_clone_breaks_if_source_vacuums_referenced_files(spark, tmp_path):
    """The documented SHALLOW CLONE sharp edge (same as Delta's): the
    source's vacuum does not know about clones, so retiring source
    versions a clone references breaks the clone. Pin the failure
    mode so the contract stays honest."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    versioned.write_version(
        spark.range(50).selectExpr("id AS k", "id AS v"), src
    )
    versioned.clone_table(src, dst)
    # source rewrites everything (optimize), then vacuums the old version
    versioned.optimize_version(spark, src)
    versioned.vacuum(src, keep_last=1)
    with pytest.raises(Exception):
        versioned.read_version(spark, dst).collect()


def test_clone_of_restored_snapshot(spark, tmp_path):
    """RESTORE × CLONE interaction (r5 verdict #6): a clone taken
    AFTER a restore must reference the restored (old) file set, not
    the rolled-back bad version; and cloning the bad version
    explicitly still works for post-mortems — the two commits expose
    different file sets of the same source table."""
    src = str(tmp_path / "src")
    versioned.write_version(_mk_ranged(spark, 40, 2), src, stats_col="k")
    bad = spark.createDataFrame(
        [(k, "oops", False) for k in range(40)],
        "k INT, v STRING, is_delete BOOLEAN",
    )
    versioned.merge_version_cow(spark, src, bad, "k")       # v1: bad
    versioned.restore_version(src, 0)                       # v2 == v0

    good = str(tmp_path / "good")
    versioned.clone_table(src, good)                        # clone latest
    got = {r.k: r.v for r in versioned.read_version(spark, good).collect()}
    assert got[5] == "v5"
    # the clone's manifest points at the SAME files the restore re-published
    m_src0 = versioned._load_manifest(src, 0)
    m_good = versioned._load_manifest(good, 0)
    assert {f.split("/")[-1] for f in m_good["files"]} == \
        {f.split("/")[-1] for f in m_src0["files"]}

    # explicit clone of the bad version for post-mortem
    post = str(tmp_path / "post")
    versioned.clone_table(src, post, version=1)
    assert versioned.read_version(spark, post).filter("v = 'oops'").count() == 40

    # the clone is independent: DML on it never disturbs the source
    ch = spark.createDataFrame(
        [(3, "patched", False)], "k INT, v STRING, is_delete BOOLEAN"
    )
    versioned.merge_version_cow(spark, good, ch, "k")
    assert {r.v for r in versioned.read_version(spark, src)
            .filter("k = 3").collect()} == {"v3"}
    assert {r.v for r in versioned.read_version(spark, good)
            .filter("k = 3").collect()} == {"patched"}


def test_versioned_stream_writer_sink(spark, tmp_path):
    """writeStream.format('versioned'): each micro-batch commits one
    fast-append version (manifest CAS, parent files shared); the
    manifest records the micro-batch id, and a checkpoint-replayed
    commit publishes nothing (exactly-once)."""
    _register_ds(spark)
    src = tmp_path / "sw_src"
    src.mkdir()
    (src / "a.json").write_text('{"k": 0}\n{"k": 1}\n{"k": 2}')
    (src / "b.json").write_text('{"k": 3}\n{"k": 4}')
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    q = (
        spark.readStream.schema("k LONG").option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.format("versioned").option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    vs = versioned.versions(path)
    assert len(vs) == 2  # one version per micro-batch
    got = sorted(r.k for r in versioned.read_version(spark, path).collect())
    assert got == [0, 1, 2, 3, 4]
    # v1 shares v0's files (fast append, nothing rewritten)
    m0 = versioned._load_manifest(path, 0)
    m1 = versioned._load_manifest(path, 1)
    assert set(m0["files"]) < set(m1["files"])
    assert m0["stream_batch_id"] == 0 and m1["stream_batch_id"] == 1

    # a replayed commit (same query id + batch id) is a no-op: nothing
    # published, staged files discarded
    import hashlib
    import os as _os

    import pyarrow as pa

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedStreamWriter,
        _write_arrow_part,
    )

    # the sink derives the query id from the checkpoint location — it
    # must have been recorded in the stream commits' manifests
    qkey = hashlib.md5(_os.path.normpath(ckpt).encode()).hexdigest()[:16]
    assert m1.get("stream_query_id") == qkey

    w = VersionedStreamWriter(path, spark.read.json(str(src)).schema, qkey)
    w.commit([], batchId=1)
    assert versioned.versions(path) == vs

    # a NEW query with a FRESH checkpoint restarts batch ids at 0 — its
    # commit must NOT be mistaken for a replay (batch-id-only guards
    # silently discard the new query's entire output)
    w2 = VersionedStreamWriter(
        path, spark.read.json(str(src)).schema, "fresh-query-id"
    )
    msg = _write_arrow_part(
        w2.staged, iter([pa.record_batch({"k": pa.array([77], pa.int64())})])
    )
    w2.commit([msg], batchId=0)
    assert len(versioned.versions(path)) == len(vs) + 1
    assert versioned.read_version(spark, path).filter("k = 77").count() == 1

    # the stream resumes from the checkpoint: a third file commits
    # exactly one more version with only the new rows
    (src / "c.json").write_text('{"k": 9}')
    q2 = (
        spark.readStream.schema("k LONG").option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.format("versioned").option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    assert len(versioned.versions(path)) == 4  # + w2's commit above
    got = sorted(r.k for r in versioned.read_version(spark, path).collect())
    assert got == [0, 1, 2, 3, 4, 9, 77]


def test_check_constraints_lifecycle(spark, tmp_path):
    """CHECK constraints (Delta ADD CONSTRAINT analog): declared as a
    metadata-only commit after validating current data; enforced on
    every library write path's NEW files; carried forward by the DS
    writer; droppable."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk_ranged(spark, 30, 2), path, stats_col="k")
    v = versioned.add_constraint(spark, path, "k_nonneg", "k >= 0")
    assert v == 1
    # declaring a constraint existing data violates must fail
    with pytest.raises(versioned.ConstraintViolation):
        versioned.add_constraint(spark, path, "impossible", "k > 5")
    with pytest.raises(ValueError):
        versioned.add_constraint(spark, path, "k_nonneg", "k >= 0")

    # write_version: violating data is rejected, no version published
    bad = spark.createDataFrame([(-1, "x", False)],
                                "k INT, v STRING, is_delete BOOLEAN")
    n_before = versioned.versions(path)
    with pytest.raises(versioned.ConstraintViolation):
        versioned.write_version(
            bad.select("k", "v"), path)
    assert versioned.versions(path) == n_before

    # merge: violating upsert rejected; valid upsert commits and the
    # constraint carries forward
    with pytest.raises(versioned.ConstraintViolation):
        versioned.merge_version_cow(spark, path, bad, "k")
    ok = spark.createDataFrame([(3, "patched", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ok, "k")
    m = versioned._load_manifest(path, versioned.versions(path)[-1])
    assert m["constraints"] == {"k_nonneg": "k >= 0"}

    # UPDATE that would break the constraint is rejected
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.merge_sql import sql as vsql
    with pytest.raises(versioned.ConstraintViolation):
        vsql(spark, f"UPDATE versioned.`{path}` SET k = -5 WHERE k = 3")

    # NULL in the checked expression counts as a violation (strict)
    null_row = spark.createDataFrame([(None, "n", False)],
                                     "k INT, v STRING, is_delete BOOLEAN")
    with pytest.raises(versioned.ConstraintViolation):
        versioned.merge_version_cow(spark, path, null_row, "k")

    # DS append carries the constraint metadata forward
    _register_ds(spark)
    spark.range(99, 100).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('ds', id) AS v"
    ).write.format("versioned").mode("append").option("path", path).save()
    m2 = versioned._load_manifest(path, versioned.versions(path)[-1])
    assert m2["constraints"] == {"k_nonneg": "k >= 0"}

    # drop: subsequent writes accept previously-violating rows
    versioned.drop_constraint(path, "k_nonneg")
    versioned.merge_version_cow(spark, path, bad, "k")
    got = {r.k for r in versioned.read_version(spark, path).collect()}
    assert -1 in got
    with pytest.raises(KeyError):
        versioned.drop_constraint(path, "nope")


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: library read, Data Source option, and SQL
    route all resolve to the latest version committed at or before the
    instant — cross-checked against VERSION AS OF for every commit."""
    import datetime

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.merge_sql import sql as vsql
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    path = str(tmp_path / "t")
    for i in range(3):
        versioned.write_version(
            spark.range(10 * (i + 1)).selectExpr("id AS k"), path
        )
    ts = [versioned._commit_ts(path, v) for v in (0, 1, 2)]
    assert ts == sorted(ts) and len(set(ts)) == 3

    # cross-check: the commit instant itself (and any moment before
    # the NEXT commit) serves exactly that version's rows
    for v in (0, 1, 2):
        want = sorted(r.k for r in
                      versioned.read_version(spark, path, v).collect())
        got = sorted(r.k for r in versioned.read_version(
            spark, path, timestamp=ts[v]).collect())
        assert got == want
        if v < 2:
            mid = (ts[v] + ts[v + 1]) / 2
            assert versioned.resolve_timestamp(path, mid) == v
    assert versioned.resolve_timestamp(path, ts[2] + 3600) == 2
    with pytest.raises(ValueError):
        versioned.resolve_timestamp(path, ts[0] - 10)
    with pytest.raises(ValueError):
        versioned.read_version(spark, path, version=1, timestamp=ts[1])

    # ISO-string form (naive = local time, like a SQL literal) — a
    # millisecond past the commit, clear of float→µs rounding
    iso = datetime.datetime.fromtimestamp(ts[1] + 0.001).isoformat()
    assert versioned.resolve_timestamp(path, iso) == 1

    # Data Source option
    spark.dataSource.register(VersionedDataSource)
    n = (spark.read.format("versioned").option("path", path)
         .option("timestampAsOf", str(ts[0])).load().count())
    assert n == 10
    with pytest.raises(Exception):
        (spark.read.format("versioned").option("path", path)
         .option("version", 1).option("timestampAsOf", str(ts[0]))
         .load().count())

    # SQL surface: TIMESTAMP AS OF in a SELECT (self-join of two
    # moments of the same table — the ad-hoc diff pattern)
    row = vsql(spark, f"""
        SELECT (SELECT count(*) FROM versioned.`{path}`
                TIMESTAMP AS OF '{iso}') AS then_n,
               (SELECT count(*) FROM versioned.`{path}`) AS now_n
    """).collect()[0]
    assert row.then_n == 20 and row.now_n == 30

    # history() surfaces the commit instants the resolution uses
    h = versioned.history(spark, path).orderBy("version").collect()
    assert [round(r.committed_at, 3) for r in h] == \
        [round(t, 3) for t in ts]


def test_snapshots_metadata_table_records_operations(spark, tmp_path):
    """snapshots() (Iceberg table.snapshots analog): one row per live
    version with the stamped operation, commit instant, and DV file
    count — the audit-first metadata table."""
    path = str(tmp_path / "t")
    df = spark.range(200).selectExpr("CAST(id AS INT) AS k",
                                     "CONCAT('v', id) AS v")
    versioned.write_version(df.repartition(4), path, stats_col="k")
    versioned.set_table_property(path, "dv.enabled", "true")
    versioned.delete_where(spark, path, "k < 10")          # DV delete
    versioned.update_where(spark, path, {"v": "'u'"}, "k = 50")
    ch = spark.createDataFrame([(300, "new", False)],
                               "k INT, v STRING, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch, "k")
    versioned.optimize_version(spark, path, target_files=1, stats_col="k")
    versioned.restore_version(path, 4)

    snaps = {r.version: r for r in
             versioned.snapshots(spark, path).collect()}
    assert [snaps[v].operation for v in sorted(snaps)] == [
        "WRITE", "SET TBLPROPERTIES", "DELETE (DV)", "UPDATE (DV)",
        "MERGE (DV)",  # dv.enabled routes MERGE merge-on-read too
        "OPTIMIZE", "RESTORE",
    ]
    # DV bookkeeping visible where vectors live; commit times monotone
    assert snaps[2].n_dv_files >= 1
    assert snaps[5].n_dv_files == 0  # OPTIMIZE compacted them away
    ts = [snaps[v].committed_at for v in sorted(snaps)]
    assert ts == sorted(ts)
    assert not any(r.is_stream_commit for r in snaps.values())


def test_optimize_incremental_compacts_only_debt(spark, tmp_path):
    """Incremental OPTIMIZE (Delta bin-packing analog): only small and
    DV-laden files compact; healthy files are SHARED byte-identically;
    DV sidecars of compacted files retire; content identical."""
    path = str(tmp_path / "t")
    # one big healthy file + a trail of tiny appends
    big = spark.range(50_000).selectExpr("CAST(id AS BIGINT) AS k",
                                         "CONCAT('v', id) AS v")
    versioned.write_version(big.coalesce(1), path, stats_col="k")
    for i in range(3):
        extra = spark.range(100_000 + i, 100_001 + i).selectExpr(
            "CAST(id AS BIGINT) AS k", "CONCAT('v', id) AS v")
        versioned.merge_version_cow(spark, path, extra.selectExpr(
            "k", "v", "CAST(false AS BOOLEAN) AS is_delete"), "k")
    versioned.set_table_property(path, "dv.enabled", "true")
    versioned.delete_where(spark, path, "k = 7")   # DV on the big file
    want = sorted(r.k for r in versioned.read_version(spark, path).collect())

    parent = versioned._load_manifest(
        path, versioned.versions(path)[-1])
    stats = versioned.optimize_incremental(
        spark, path, min_file_bytes=64 * 1024, sort_col="k")
    # the big file has a DV → compacts too; every file qualified here,
    # so run the interesting assertion on a second round: after the
    # compaction, one big healthy file remains and a new tiny append
    # is the only thing a second incremental pass rewrites
    assert stats["files_compacted"] >= 4
    assert stats["dv_files_retired"] == 1
    m = versioned._load_manifest(path, stats["version"])
    assert not versioned._dv_map(m)
    got = sorted(r.k for r in versioned.read_version(spark, path).collect())
    assert got == want

    for i in range(2):  # two tiny appends = compactable debt
        extra = spark.range(200_000 + i, 200_001 + i).selectExpr(
            "CAST(id AS BIGINT) AS k", "CONCAT('v', id) AS v")
        versioned.merge_version_cow(spark, path, extra.selectExpr(
            "k", "v", "CAST(false AS BOOLEAN) AS is_delete"), "k")
    s2 = versioned.optimize_incremental(
        spark, path, min_file_bytes=64 * 1024, sort_col="k")
    assert s2["files_shared"] >= 1      # the big compacted file shared
    assert s2["files_compacted"] == 2   # only the tiny appends rewrote
    m2 = versioned._load_manifest(path, s2["version"])
    prev = versioned._load_manifest(path, s2["version"] - 1)
    shared = set(m2["files"]) & set(prev["files"])
    assert shared                        # byte-identical sharing
    got = sorted(r.k for r in versioned.read_version(spark, path).collect())
    assert got == sorted(want + [200_000, 200_001])
    # a table with nothing to compact commits nothing
    s3 = versioned.optimize_incremental(spark, path,
                                        min_file_bytes=64 * 1024)
    # (the compacted output may itself be under the threshold at this
    # toy size; accept either a no-op or a single-file fold)
    assert s3["version"] is None or s3["files_compacted"] >= 1


def test_vacuum_retain_hours(spark, tmp_path):
    """Time-based retention: versions older than the horizon drop,
    the latest NEVER drops; the SQL RETAIN n HOURS route parses."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.merge_sql import sql as vsql

    path = str(tmp_path / "t")
    for i in range(3):
        versioned.write_version(
            spark.range(i + 1).selectExpr("id AS k"), path)
    # horizon in the future: everything but the latest is older
    dropped = versioned.vacuum(path, retain_hours=-1.0)
    assert dropped == [0, 1]
    assert versioned.versions(path) == [2]
    assert versioned.read_version(spark, path).count() == 3
    # a generous horizon drops nothing
    versioned.write_version(spark.range(9).selectExpr("id AS k"), path)
    assert vsql(spark, f"VACUUM versioned.`{path}` RETAIN 168 HOURS") == []
    assert versioned.versions(path) == [2, 3]


def test_stream_source_fails_on_changes_unless_opted_in(spark, tmp_path):
    """The streaming source FAILS on a data-changing commit (COW
    delete removes files) unless ignoreChanges is set; OPTIMIZE
    commits are data-neutral and never re-emit."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedStreamReader,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("CAST(id AS INT) AS k")
    versioned.write_version(df.repartition(4), path, stats_col="k")
    versioned.delete_where(spark, path, "k = 5")        # v1: COW delete
    versioned.optimize_version(spark, path, target_files=1)  # v2
    schema = versioned.read_version(spark, path).schema

    r = VersionedStreamReader(path, schema, None)
    with pytest.raises(ValueError, match="ignoreChanges"):
        r._added_files(0, 1)
    r_ic = VersionedStreamReader(path, schema, None, ignore_changes=True)
    assert len(r_ic._added_files(0, 1)) >= 1  # rewritten file re-emits
    # OPTIMIZE is data-neutral: no failure, nothing re-emitted — for
    # BOTH readers
    assert r._added_files(1, 2) == []
    assert r_ic._added_files(1, 2) == []


def test_resolve_timestamp_prefers_iso_over_epoch(spark, tmp_path):
    """Code-review regression: compact all-digit ISO dates ('20990101')
    must parse as dates, not epoch seconds;真 epoch strings still work."""
    path = str(tmp_path / "t")
    versioned.write_version(spark.range(3).selectExpr("id AS k"), path)
    assert versioned.resolve_timestamp(path, "2099-01-01T00:00:00") == 0
    assert versioned.resolve_timestamp(path, "20990101") == 0
    ts = versioned._commit_ts(path, 0)
    assert versioned.resolve_timestamp(path, str(ts + 1)) == 0
    with pytest.raises(ValueError):
        versioned.resolve_timestamp(path, "1999-01-01")


def test_set_table_property_drops_per_commit_stamps(spark, tmp_path):
    """Advice regression (r7): a SET TBLPROPERTIES commit copies its
    parent manifest, but per-commit provenance stamps (stream batch
    ids, backfill markers) must NOT ride along — snapshots() would
    misreport the metadata-only commit as a stream/backfill commit."""
    path = str(tmp_path / "t")
    versioned.write_version(spark.range(5).selectExpr("id AS k"), path)
    # simulate a streaming-sink + backfill parent commit
    parent = versioned._load_manifest(path, 0)
    m = dict(parent)
    m.update(version=1, stream_batch_id=7, stream_query_id="q-1",
             backfilled_from="/tmp/elsewhere", operation="STREAMING APPEND")
    versioned._publish(path, m)

    versioned.set_table_property(path, "dv.enabled", "true")
    prop_m = versioned._load_manifest(path, 2)
    assert prop_m["operation"] == "SET TBLPROPERTIES"
    for stamp in ("stream_batch_id", "stream_query_id",
                  "backfilled_from", "restored_from"):
        assert stamp not in prop_m
    snaps = {r.version: r for r in
             versioned.snapshots(spark, path).collect()}
    assert snaps[1].is_stream_commit is True
    assert snaps[2].is_stream_commit is False


def test_stream_reader_partitions_are_absolute(spark, tmp_path):
    """Advice regression (r7): stream partitions joined the raw option
    path, unlike the batch reader's _abs_file route — a relative
    .option('path', …) leaked relative paths into executor reads."""
    import os as _os

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedStreamReader,
    )

    abs_path = str(tmp_path / "t_stream_rel")
    versioned.write_version(
        spark.range(6).selectExpr("id AS k"), abs_path)
    schema = versioned.read_version(spark, abs_path).schema
    old_cwd = _os.getcwd()
    _os.chdir(str(tmp_path))
    try:
        r = VersionedStreamReader("t_stream_rel", schema, None)
        parts = r.partitions({"version": -1}, {"version": 0})
        assert parts and all(
            p.path is None or _os.path.isabs(p.path) for p in parts)
        got = sorted(
            row["k"]
            for p in parts if p.path is not None
            for batch in r.read(p)
            for row in batch.to_pylist()
        )
        assert got == list(range(6))
    finally:
        _os.chdir(old_cwd)


def test_concurrent_blind_appends_both_commit(spark, tmp_path):
    """r8 (verdict #4): two concurrent DS appends BOTH commit,
    serialized by the manifest CAS with the loser auto-retrying — no
    lost rows, no raised conflict."""
    import threading

    _register_ds(spark)
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(0, "base")]), path)

    errs = []

    def _append(tag):
        try:
            spark.createDataFrame(
                [(i, tag) for i in range(1, 6)], "k INT, v STRING"
            ).coalesce(1).write.format("versioned").mode("append") \
                .option("path", path).save()
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=_append, args=(t,))
               for t in ("A", "B")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert errs == []
    assert versioned.versions(path) == [0, 1, 2]
    rows = [tuple(r) for r in versioned.read_version(spark, path).collect()]
    assert len(rows) == 11  # base + 2×5, nothing lost or doubled
    tags = {v for _, v in rows}
    assert tags == {"base", "A", "B"}


def test_overwrite_conflict_still_raises(spark, tmp_path, monkeypatch):
    """The append retry must NOT extend to overwrites: whether
    last-writer-wins is acceptable is the caller's decision, so a
    stale-snapshot OVERWRITE still raises CommitConflict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedWriter,
        _WrotePart,
    )

    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)  # v0
    schema = _mk(spark, [(1, "a")]).schema
    w = VersionedWriter(path, schema, overwrite=True)
    os.makedirs(w.staged)
    pq.write_table(pa.table({"k": pa.array([7], pa.int32()), "v": ["B"]}),
                   os.path.join(w.staged, "part-b.parquet"))
    real_load = versioned._load_manifest

    def racing_load(tp, v):
        monkeypatch.undo()
        versioned.write_version(_mk(spark, [(9, "A")]), tp)  # v1 lands
        return real_load(tp, v)

    monkeypatch.setattr(versioned, "_load_manifest", racing_load)
    with pytest.raises(versioned.CommitConflict):
        w.commit([_WrotePart(filename="part-b.parquet", n_rows=1)])
    got = [tuple(r) for r in versioned.read_version(spark, path).collect()]
    assert got == [(9, "A")]  # the interleaved winner stays latest


def test_concurrent_disjoint_dml_both_commit(spark, tmp_path,
                                             monkeypatch):
    """File-level DML conflict resolution (Delta WriteSerializable):
    two predicate DELETEs whose touched files are DISJOINT both
    commit — the CAS loser rebases onto the winner's manifest and
    republishes its already-written rewrite. A barrier inside
    _publish forces both discoveries to complete before either
    publishes, so the race is deterministic."""
    import threading

    path = str(tmp_path / "tbl")
    df = spark.range(600).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(6, "k")
    versioned.write_version(df, path, stats_col="k")

    real = versioned._publish
    bar = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    calls = []

    def gated(tp, m):
        with lock:
            n = len(calls)
            calls.append(1)
        if n < 2:  # gate only each thread's FIRST publish attempt
            bar.wait()
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", gated)
    errs, stats = [], {}

    def _delete(tag, pred):
        try:
            stats[tag] = versioned.delete_where(spark, path, pred)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    # k<150 touches files 1-2; k>=450 touches files 5-6: disjoint
    threads = [threading.Thread(target=_delete, args=("a", "k < 150")),
               threading.Thread(target=_delete, args=("b", "k >= 450"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert errs == []
    assert stats["a"]["version"] is not None
    assert stats["b"]["version"] is not None
    assert sorted(versioned.versions(path)) == [0, 1, 2]
    rows = sorted(r.k for r in versioned.read_version(spark, path).collect())
    assert rows == list(range(150, 450))  # both deletes applied


def test_concurrent_overlapping_dml_conflicts(spark, tmp_path,
                                              monkeypatch):
    """The rebase must NOT extend to overlapping DML: when both
    predicates touch the SAME file, the CAS loser raises
    CommitConflict (publishing would double-delete / resurrect)."""
    import threading

    path = str(tmp_path / "tbl")
    df = spark.range(600).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(6, "k")
    versioned.write_version(df, path, stats_col="k")

    real = versioned._publish
    bar = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    calls = []

    def gated(tp, m):
        with lock:
            n = len(calls)
            calls.append(1)
        if n < 2:
            bar.wait()
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", gated)
    errs = []

    def _delete(pred):
        try:
            versioned.delete_where(spark, path, pred)
        except versioned.CommitConflict as e:
            errs.append(e)

    # both predicates hit file 1 (k 0..99)
    threads = [threading.Thread(target=_delete, args=("k < 50",)),
               threading.Thread(target=_delete, args=("k < 80",))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert len(errs) == 1  # exactly one loser, loudly
    assert sorted(versioned.versions(path)) == [0, 1]
    # the surviving table reflects exactly ONE of the deletes
    n = versioned.read_version(spark, path).count()
    assert n in (550, 520)


def test_concurrent_disjoint_mor_dml_both_commit(spark, tmp_path,
                                                 monkeypatch):
    """The MOR twin of the COW disjoint-DML rebase: two deletion-vector
    DELETEs on disjoint files both commit; the loser rebases, keeping
    its already-written sidecar."""
    import threading

    path = str(tmp_path / "tbl")
    df = spark.range(600).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(6, "k")
    versioned.write_version(df, path, stats_col="k")
    versioned.set_table_property(path, "dv.enabled", "true")

    real = versioned._publish
    bar = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    calls = []

    def gated(tp, m):
        with lock:
            n = len(calls)
            calls.append(1)
        if n < 2:
            bar.wait()
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", gated)
    errs = []

    def _delete(pred):
        try:
            versioned.delete_where(spark, path, pred)  # routes MOR
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    # partial-touch predicates (no whole-file drop): disjoint files
    threads = [
        threading.Thread(target=_delete, args=("k < 150 AND k % 2 = 0",)),
        threading.Thread(target=_delete, args=("k >= 450 AND k % 2 = 0",)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert errs == []
    assert sorted(versioned.versions(path)) == [0, 1, 2, 3]  # prop + 2
    rows = sorted(r.k for r in versioned.read_version(spark, path).collect())
    want = [k for k in range(600)
            if not (k < 150 and k % 2 == 0)
            and not (k >= 450 and k % 2 == 0)]
    assert rows == want
    assert versioned.count_rows(spark, path) == len(want)


def test_concurrent_overlapping_mor_dml_conflicts(spark, tmp_path,
                                                  monkeypatch):
    """Two DV DMLs vectoring the SAME file must not both commit: the
    loser's sidecar replaced the PARENT vector whole, so publishing
    over the winner's would lose the winner's deletes."""
    import threading

    path = str(tmp_path / "tbl")
    df = spark.range(600).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(6, "k")
    versioned.write_version(df, path, stats_col="k")
    versioned.set_table_property(path, "dv.enabled", "true")

    real = versioned._publish
    bar = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    calls = []

    def gated(tp, m):
        with lock:
            n = len(calls)
            calls.append(1)
        if n < 2:
            bar.wait()
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", gated)
    errs = []

    def _delete(pred):
        try:
            versioned.delete_where(spark, path, pred)
        except versioned.CommitConflict as e:
            errs.append(e)

    threads = [
        threading.Thread(target=_delete, args=("k < 50 AND k % 2 = 0",)),
        threading.Thread(target=_delete, args=("k < 80 AND k % 3 = 0",)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert len(errs) == 1
    n = versioned.read_version(spark, path).count()
    assert n in (575, 573)  # exactly one delete applied
    assert versioned.count_rows(spark, path) == n


def test_racing_property_flip_conflicts_dml(spark, tmp_path,
                                            monkeypatch):
    """r10 advice fix: the DML rebase compares schema/constraints/
    mapping/partitioning/generated/identity but previously NOT table
    properties — a racing set_table_property flipping cdf.enabled
    would rebase a DML that computed its CDF routing from the
    pre-race parent, committing e.g. a cdf-enabled version with no
    feed entry. Property changes must conflict loudly."""
    path = str(tmp_path / "tbl")
    df = spark.range(600).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(6, "k")
    versioned.write_version(df, path, stats_col="k")

    real = versioned._publish
    state = {"armed": True}

    def sneaky(tp, m):
        # on the DML's first publish attempt, land a property flip
        # FIRST (through the real path), then let the DML's CAS lose
        if state["armed"] and "DELETE" in (m.get("operation") or ""):
            state["armed"] = False
            versioned.set_table_property(path, "cdf.enabled", "true")
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", sneaky)
    with pytest.raises(versioned.CommitConflict):
        versioned.delete_where(spark, path, "k < 50 AND k % 2 = 0")
    # the property commit survived; the DML did not publish
    assert versioned.table_properties(path) == {"cdf.enabled": "true"}
    assert versioned.read_version(spark, path).count() == 600


def test_string_lookalike_stats_not_decimal_decoded(spark, tmp_path):
    """r10 advice fix: decimal stat decoding is decided by the
    manifest SCHEMA type, not by string shape — a STRING column whose
    values happen to match the 78-char fixed-point encoding must come
    back from min_max as strings, and DS filter pruning must keep
    treating probes as strings."""
    path = str(tmp_path / "tbl")
    # values shaped exactly like _encode_decimal output
    mk = ("CONCAT('1', LPAD(CAST(id + 10 AS STRING), 38, '0'), '.',"
          " REPEAT('0', 38))")
    df = spark.range(20).selectExpr(
        "CAST(id AS INT) AS k", f"{mk} AS s")
    versioned.write_version(df, path, stats_col="s")
    lo, hi = versioned.min_max(spark, path, "s")
    assert isinstance(lo, str) and isinstance(hi, str)
    assert lo.startswith("1") and "." in lo
    # a genuinely DECIMAL column still decodes
    path2 = str(tmp_path / "tbl2")
    df2 = spark.range(20).selectExpr(
        "CAST(id AS INT) AS k",
        "CAST(id AS DECIMAL(10,2)) AS d")
    versioned.write_version(df2, path2, stats_col="d")
    import decimal
    lo2, hi2 = versioned.min_max(spark, path2, "d")
    assert isinstance(lo2, decimal.Decimal) and lo2 == 0
    assert hi2 == 19
    # DS read with a string filter on the look-alike column returns
    # the exact rows (no decimal-probe mis-prune)
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )
    spark.dataSource.register(VersionedDataSource)
    probe = "1" + str(15).zfill(38) + "." + "0" * 38
    got = (spark.read.format("versioned").option("path", path)
           .option("filter", f"s = '{probe}'").load().collect())
    assert len(got) == 1 and got[0].k == 5


def test_identity_allocation_overflow_refused(spark, tmp_path):
    """r10 advice fix: sparse per-partition identity allocation
    (base + mono_id*step, mono jumping 2^33 per partition) must
    refuse BEFORE writing when the worst-case value could pass
    2^63-1, instead of wrapping (non-ANSI) or dying mid-write."""
    df = spark.range(10).selectExpr("CONCAT('v', id) AS v")
    with pytest.raises(ValueError, match="BIGINT range"):
        versioned.write_version(
            df, str(tmp_path / "t"),
            identity={"rid": {"start": 2**62, "step": 2**29}})
    # sane specs still commit
    versioned.write_version(
        df, str(tmp_path / "t2"),
        identity={"rid": {"start": 1, "step": 1}})


def test_replace_where_partition_drop_and_insert(spark, tmp_path):
    """REPLACE WHERE on a hive-aligned table: the matched partition's
    files DROP metadata-only (never read), the replacement lands
    aligned, and every non-matching file is shared byte-identically
    (same manifest entries = same physical files)."""
    path = str(tmp_path / "t")
    df = spark.range(300).selectExpr(
        "CAST(id AS INT) AS k",
        "CAST(id % 3 AS INT) AS day",
        "CONCAT('v', id) AS v")
    versioned.write_version(df, path, partition_by=["day"])
    parent = versioned._load_manifest(path, 0)
    repl = spark.range(1000, 1010).selectExpr(
        "CAST(id AS INT) AS k", "CAST(1 AS INT) AS day",
        "CONCAT('r', id) AS v")
    st = versioned.replace_where(spark, path, repl, "day = 1")
    assert st["files_dropped"] >= 1
    assert st["files_rewritten"] == 0  # aligned: no partial files
    child = versioned._load_manifest(path, 1)
    # non-matching parent files are shared byte-identically
    kept_parent = [f for f in parent["files"] if f in child["files"]]
    dropped_parent = [f for f in parent["files"]
                      if f not in child["files"]]
    assert kept_parent and dropped_parent
    got = versioned.read_version(spark, path)
    assert got.filter("day = 1").count() == 10
    assert got.filter("day = 1 AND v NOT LIKE 'r%'").count() == 0
    assert got.filter("day <> 1").count() == 200
    assert got.count() == 210


def test_replace_where_rejects_out_of_region_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned.write_version(
        spark.range(30).selectExpr("CAST(id AS INT) AS k",
                                   "CAST(id % 3 AS INT) AS day"), path)
    bad = spark.createDataFrame([(99, 2)], "k INT, day INT")
    with pytest.raises(ValueError, match="REPLACE WHERE"):
        versioned.replace_where(spark, path, bad, "day = 1")
    assert versioned.versions(path) == [0]  # nothing committed


def test_replace_where_partial_files_and_cdf(spark, tmp_path):
    """Unaligned layout: partially-matching files rewrite keeping only
    non-matching rows; with cdf.enabled the feed records the deletes
    AND the inserts of the single commit."""
    path = str(tmp_path / "t")
    df = spark.range(200).selectExpr(
        "CAST(id AS INT) AS k", "CONCAT('v', id) AS v"
    ).repartitionByRange(4, "k")
    versioned.write_version(df, path, stats_col="k")
    versioned.set_table_property(path, "cdf.enabled", "true")
    repl = spark.createDataFrame(
        [(k, f"r{k}") for k in range(40, 60)], "k INT, v STRING")
    st = versioned.replace_where(
        spark, path, repl, "k >= 40 AND k < 60")
    assert st["files_rewritten"] >= 1
    got = versioned.read_version(spark, path)
    assert got.count() == 200
    assert got.filter("k >= 40 AND k < 60 AND v NOT LIKE 'r%'").count() == 0
    assert got.filter("(k < 40 OR k >= 60) AND v NOT LIKE 'v%'").count() == 0
    last = versioned.versions(path)[-1]
    feed = versioned.read_changes(spark, path, last - 1, last)
    kinds = {r._change_type: 0 for r in feed.collect()}
    for r in feed.collect():
        kinds[r._change_type] += 1
    assert kinds.get("delete") == 20 and kinds.get("insert") == 20


def test_replace_where_generated_identity_and_noop_region(spark,
                                                          tmp_path):
    """Inserts compute generated columns and allocate identity values;
    replacing an EMPTY region still commits the inserts (Delta: the
    delete side may match nothing)."""
    path = str(tmp_path / "t")
    versioned.write_version(
        spark.range(20).selectExpr("CAST(id AS INT) AS a",
                                   "CAST(id * 3 AS INT) AS b"),
        path, generated={"total": "a + b"},
        identity={"rid": {"start": 1, "step": 1}})
    repl = spark.createDataFrame([(1000, 3000)], "a INT, b INT")
    st = versioned.replace_where(spark, path, repl, "a >= 1000")
    assert st["version"] == 1 and st["files_dropped"] == 0
    got = versioned.read_version(spark, path)
    assert got.count() == 21
    row = got.filter("a = 1000").collect()[0]
    assert row.total == 4000
    assert row.rid is not None
    ids = [r.rid for r in got.collect()]
    assert len(set(ids)) == 21


def test_copy_into_idempotent_file_ingestion(spark, tmp_path):
    """COPY INTO (Delta analog): each source file loads AT MOST once —
    re-running skips already-loaded files; a re-dropped file with new
    bytes reloads; CDF records the inserts; the commit is a pure
    append (every parent file shared)."""
    import os as _os
    import time as _time

    src = tmp_path / "landing"
    src.mkdir()
    path = str(tmp_path / "t")
    versioned.write_version(
        spark.createDataFrame([(0, "seed")], "k INT, v STRING"), path)
    versioned.set_table_property(path, "cdf.enabled", "true")

    def drop_file(name, rows):
        spark.createDataFrame(rows, "k INT, v STRING") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / "stage"))
        part = [f for f in _os.listdir(tmp_path / "stage")
                if f.endswith(".parquet")][0]
        _os.rename(tmp_path / "stage" / part, src / name)

    drop_file("a.parquet", [(1, "a"), (2, "a")])
    drop_file("b.parquet", [(3, "b")])
    parent = versioned._load_manifest(
        path, versioned.versions(path)[-1])
    st = versioned.copy_into(spark, path, str(src))
    assert st["files_loaded"] == 2 and st["files_skipped"] == 0
    assert versioned.read_version(spark, path).count() == 4
    child = versioned._load_manifest(path, versioned.versions(path)[-1])
    assert set(parent["files"]) <= set(child["files"])  # pure append
    # re-run: everything skipped, no commit
    st2 = versioned.copy_into(spark, path, str(src))
    assert st2 == {"version": None, "files_loaded": 0,
                   "files_skipped": 2}
    assert versioned.read_version(spark, path).count() == 4
    # a new file plus an UNCHANGED old one: only the new one loads
    drop_file("c.parquet", [(4, "c")])
    st3 = versioned.copy_into(spark, path, str(src))
    assert st3["files_loaded"] == 1 and st3["files_skipped"] == 2
    assert versioned.read_version(spark, path).count() == 5
    # re-dropping a file with NEW bytes reloads it (identity = path,
    # size, mtime)
    _time.sleep(0.01)
    drop_file("b.parquet", [(30, "b2"), (31, "b2")])
    st4 = versioned.copy_into(spark, path, str(src))
    assert st4["files_loaded"] == 1
    got = versioned.read_version(spark, path)
    assert got.count() == 7
    assert got.filter("v = 'b2'").count() == 2
    # CDF recorded the inserts of the first load
    feed = versioned.read_changes(spark, path, st["version"] - 1,
                                  st["version"])
    assert feed.filter("_change_type = 'insert'").count() == 3
    # SQL route
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import merge_sql
    st5 = merge_sql.sql(
        spark, f"COPY INTO versioned.`{path}` FROM '{src}'")
    assert st5["files_loaded"] == 0 and st5["files_skipped"] == 3

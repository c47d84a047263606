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
    files = versioned.read_version(spark, path, 0).inputFiles()
    assert files and all("/v_0/" in f for f in files)
    assert not any("/v_1/" in f for f in files)


def test_write_recovers_from_crash_orphan(spark, tmp_path):
    """A writer that died between the data rename and the manifest
    publish must not wedge the NEXT writer: the orphaned v_N dir is
    cleared and version N commits cleanly."""
    path = str(tmp_path / "tbl")
    versioned.write_version(_mk(spark, [(1, "a")]), path)
    os.makedirs(os.path.join(path, "v_1", "junk"))
    v = versioned.write_version(_mk(spark, [(2, "b")]), path)
    assert v == 1
    got = [tuple(r) for r in versioned.read_version(spark, path, 1).collect()]
    assert got == [(2, "b")]


def test_vacuum_retention(spark, tmp_path):
    """vacuum drops old versions (manifest first), keeps the newest
    keep_last readable, and sweeps crash orphans."""
    path = str(tmp_path / "tbl")
    for i in range(4):
        versioned.write_version(_mk(spark, [(i, "x")]), path)
    # crash orphans: staged dir + data dir without manifest
    os.makedirs(os.path.join(path, "_staged_9"))
    os.makedirs(os.path.join(path, "v_9"))
    dropped = versioned.vacuum(path, keep_last=2)
    assert dropped == [0, 1]
    assert versioned.versions(path) == [2, 3]
    assert not os.path.exists(os.path.join(path, "v_0"))
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

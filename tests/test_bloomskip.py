"""Bloom-filter file skipping (functions/bloomskip.py): metadata-only
bloom backfill, no-false-negative pruning, point-lookup equivalence."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions import bloomskip


def _mk_table(spark, tmp_path, n=400, files=4):
    path = str(tmp_path / "tbl")
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id % 97 AS STRING) AS v"
    ).repartition(files)
    versioned.write_version(df, path)
    return path


def test_backfill_bloom_is_metadata_only_commit(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    files0 = versioned._load_manifest(path, 0)["files"]
    v = bloomskip.backfill_bloom(spark, path, "k")
    assert v == 1
    m = versioned._load_manifest(path, 1)
    assert m["files"] == files0                  # same data, no rewrite
    assert m["bloom"]["col"] == "k"
    assert set(m["bloom"]["filters"]) == set(files0)
    assert m["bloom_backfilled_from"] == 0


def test_point_lookup_prunes_and_matches_full_scan(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    bloomskip.backfill_bloom(spark, path, "k")
    for key in (0, 7, 399):
        kept, allf = bloomskip.prune_files(path, key)
        # the key lives in exactly one file; bloom keeps that file and
        # (with 8192 bits over ~100 keys/file) essentially nothing else
        assert 1 <= len(kept) < len(allf)
        got = bloomskip.read_point_lookup(spark, path, "k", key).collect()
        want = versioned.read_version(spark, path).filter(
            f"k = {key}"
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # absent key: pruned to nothing, empty result with the table schema
    kept, _ = bloomskip.prune_files(path, 10**9)
    df = bloomskip.read_point_lookup(spark, path, "k", 10**9)
    assert df.count() == 0
    assert df.columns == ["k", "v"]


def test_string_column_and_unindexed_table(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    # without a bloom backfill nothing prunes (correct, just unskipped)
    kept, allf = bloomskip.prune_files(path, "42")
    assert kept == allf
    bloomskip.backfill_bloom(spark, path, "v")
    got = sorted(
        r.k for r in bloomskip.read_point_lookup(spark, path, "v", "42")
        .collect()
    )
    assert got == [42, 139, 236, 333]


def test_file_added_after_backfill_is_never_pruned(spark, tmp_path):
    path = _mk_table(spark, tmp_path)
    bloomskip.backfill_bloom(spark, path, "k")
    extra = spark.createDataFrame([(10_000, "x")], "k LONG, v STRING")
    versioned.merge_version_cow(spark, path, extra.selectExpr(
        "k", "v", "CAST(false AS BOOLEAN) AS is_delete"), "k")
    kept, allf = bloomskip.prune_files(path, 10_000)
    got = bloomskip.read_point_lookup(spark, path, "k", 10_000).collect()
    assert len(got) == 1 and got[0].v == "x"


@given(keys=st.lists(st.integers(0, 10**6), min_size=1, max_size=60,
                     unique=True))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_never_false_negative(spark, tmp_path_factory, keys):
    """Every key written into the table is found through the pruned
    scan — the Bloom no-false-negative property on arbitrary data."""
    tmp = tmp_path_factory.mktemp("bloomprop")
    path = str(tmp / "tbl")
    df = spark.createDataFrame([(k,) for k in keys], "k LONG") \
        .repartition(3)
    versioned.write_version(df, path)
    bloomskip.backfill_bloom(spark, path, "k")
    for k in keys[:5]:
        got = bloomskip.read_point_lookup(spark, path, "k", k).collect()
        assert len(got) == 1 and got[0].k == k


def test_lookup_on_unindexed_column_never_prunes(spark, tmp_path):
    """A point lookup on a column OTHER than the indexed one must not
    prune: hashing the probe against bitmaps built from a different
    column's values would drop files that do hold matching rows."""
    path = _mk_table(spark, tmp_path)
    bloomskip.backfill_bloom(spark, path, "k")   # index on k ...
    kept, allf = bloomskip.prune_files(path, "42", col="v")  # ... probe v
    assert kept == allf
    got = sorted(
        r.k for r in bloomskip.read_point_lookup(spark, path, "v", "42")
        .collect()
    )
    want = sorted(
        r.k for r in versioned.read_version(spark, path)
        .filter("v = '42'").collect()
    )
    assert got == want and got


def test_unsupported_types_raise_loudly(spark, tmp_path):
    """The INT/BIGINT/STRING restriction is ENFORCED, not documented:
    backfill on a type whose str()/CAST renderings diverge raises, and
    so does probing with a non-int/str value."""
    path = str(tmp_path / "dbl")
    df = spark.range(20).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS x", "id % 2 = 0 AS b"
    )
    versioned.write_version(df, path)
    with pytest.raises(TypeError):
        bloomskip.backfill_bloom(spark, path, "x")
    with pytest.raises(TypeError):
        bloomskip.backfill_bloom(spark, path, "b")
    with pytest.raises(KeyError):
        bloomskip.backfill_bloom(spark, path, "nope")
    bloomskip.backfill_bloom(spark, path, "k")
    with pytest.raises(TypeError):
        bloomskip.read_point_lookup(spark, path, "k", 1.5)
    with pytest.raises(TypeError):
        bloomskip.read_point_lookup(spark, path, "k", True)


def test_point_lookup_reads_with_manifest_schema(spark, tmp_path):
    """On a schema-evolved table the pruned read must NULL-backfill
    pre-evolution files and pin column order, exactly like
    read_version — inference over the kept subset would break the
    documented equivalence."""
    path = _mk_table(spark, tmp_path)
    bloomskip.backfill_bloom(spark, path, "k")
    ch = spark.createDataFrame(
        [(9000, "new", "extra", False)],
        "k LONG, v STRING, w STRING, is_delete BOOLEAN",
    )
    versioned.merge_version_cow(spark, path, ch, "k", evolve_schema=True)
    for key in (7, 9000):
        got = bloomskip.read_point_lookup(spark, path, "k", key)
        want = versioned.read_version(spark, path).filter(f"k = {key}")
        assert got.columns == want.columns
        assert [tuple(r) for r in got.collect()] == \
            [tuple(r) for r in want.collect()]

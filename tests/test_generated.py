"""GENERATED ALWAYS AS columns (Delta analog): declared at
write_version as {col: sql_expr}, computed when absent, ENFORCED
value-by-value when supplied (NULL-safe equality through the CHECK
machinery), recomputed by predicate UPDATE on both physics, refused as
a direct assignment target, and carried through every file-sharing
commit. Combined with partition_by on the generated column this is
hidden partitioning with metadata-only retention."""

import os

import pytest

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import versioned


def _mk(spark, n=100):
    return spark.range(n).selectExpr(
        "CAST(id AS INT) AS a", "CAST(id * 3 AS INT) AS b",
        "CONCAT('v', id) AS v")


def test_generated_computed_when_absent(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned.write_version(_mk(spark), path,
                            generated={"total": "a + b"})
    m = versioned._load_manifest(path, 0)
    assert m["generated"] == {"total": "a + b"}
    got = versioned.read_version(spark, path)
    assert "total" in got.columns
    assert got.filter("total <> a + b").count() == 0
    assert got.count() == 100


def test_generated_supplied_values_enforced(spark, tmp_path):
    path = str(tmp_path / "t")
    ok = _mk(spark).selectExpr("a", "b", "v", "a + b AS total")
    versioned.write_version(ok, path, generated={"total": "a + b"})
    # wrong supplied values refuse the NEXT full write too
    bad = _mk(spark).selectExpr("a", "b", "v", "a + b + 1 AS total")
    with pytest.raises(versioned.ConstraintViolation,
                       match="generated:total"):
        versioned.write_version(bad, path, generated={"total": "a + b"})
    assert versioned.versions(path) == [0]
    # and a MERGE whose change rows lie about the generated value
    ch = spark.createDataFrame(
        [(5, 15, "u", 999, False)],
        "a INT, b INT, v STRING, total INT, is_delete BOOLEAN")
    with pytest.raises(versioned.ConstraintViolation,
                       match="generated:total"):
        versioned.merge_version_cow(spark, path, ch, "a")
    # a truthful MERGE commits
    ch2 = spark.createDataFrame(
        [(5, 15, "u", 20, False)],
        "a INT, b INT, v STRING, total INT, is_delete BOOLEAN")
    versioned.merge_version_cow(spark, path, ch2, "a")
    got = {r.a: (r.v, r.total) for r in
           versioned.read_version(spark, path).collect()}
    assert got[5] == ("u", 20)


@pytest.mark.parametrize("dv", [False, True])
def test_update_recomputes_generated(spark, tmp_path, dv):
    path = str(tmp_path / f"t{dv}")
    versioned.write_version(_mk(spark), path,
                            generated={"total": "a + b"})
    if dv:
        versioned.set_table_property(path, "dv.enabled", "true")
    # updating a SOURCE column recomputes the generated one
    versioned.update_where(spark, path, {"b": "b + 100"}, "a < 10")
    got = versioned.read_version(spark, path)
    assert got.filter("total <> a + b").count() == 0
    assert got.filter("a < 10 AND b < 100").count() == 0
    # direct assignment refused
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        versioned.update_where(spark, path, {"total": "1"}, "a = 0")


def test_generated_rides_commits_and_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    versioned.write_version(_mk(spark), path,
                            generated={"total": "a + b"})
    versioned.delete_where(spark, path, "a >= 90")
    m = versioned._load_manifest(path, 1)
    assert m["generated"] == {"total": "a + b"}
    assert versioned.read_version(spark, path).count() == 90


def test_hidden_partitioning_metadata_retention(spark, tmp_path):
    """The marquee composition: partition_by a GENERATED day column →
    `DELETE WHERE day = d` is metadata-only, and stays so after an
    UPDATE (alignment-preserving rewrites recompute the generated
    column too)."""
    path = str(tmp_path / "t")
    df = spark.range(300).selectExpr(
        "CAST(id AS INT) AS k",
        # three distinct days (id % 3 DAYS past 2026-01-01), plus an
        # intra-day hour so day really is derived, not stored
        "TIMESTAMP '2026-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, CAST(id % 3 AS INT), "
        "CAST(id % 24 AS INT), 0, 0) AS ts",
        "CONCAT('v', id) AS v")
    versioned.write_version(
        df, path,
        generated={"day": "CAST(date_trunc('day', ts) AS DATE)"},
        partition_by=["day"])
    m = versioned._load_manifest(path, 0)
    assert m["partition_by"] == ["day"]
    days = set()
    for f, per in m["col_stats"].items():
        assert per["day"] is not None and per["day"][0] == per["day"][1]
        days.add(per["day"][0])
    assert len(days) == 3
    st = versioned.update_where(spark, path, {"v": "CONCAT('u', k)"},
                                "k % 7 = 0")
    assert st["files_rewritten"] >= 1
    st2 = versioned.delete_where(
        spark, path, "day = DATE '2026-01-01'")
    assert st2["files_dropped"] >= 1 and st2["files_rewritten"] == 0
    got = versioned.read_version(spark, path)
    assert got.count() == 200
    assert got.filter("day = DATE '2026-01-01'").count() == 0
    assert got.filter("k % 7 = 0 AND v NOT LIKE 'u%'").count() == 0


def test_ds_append_carries_generated(spark, tmp_path):
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    spark.dataSource.register(VersionedDataSource)
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, i * 3, f"v{i}") for i in range(20)],
        "a INT, b INT, v STRING")
    versioned.write_version(base, path, generated={"total": "a + b"})
    app = spark.createDataFrame(
        [(200, 600, "x", 800)], "a INT, b INT, v STRING, total INT")
    app.write.format("versioned").mode("append") \
        .option("path", path).save()
    m = versioned._load_manifest(path, versioned.versions(path)[-1])
    assert m["generated"] == {"total": "a + b"}


# ------------------------- GENERATED ALWAYS AS IDENTITY --------------


def test_identity_assigned_unique_and_monotonic(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("CONCAT('v', id) AS v",
                                     "CAST(id AS INT) AS k")
    versioned.write_version(df.repartition(4), path,
                            identity={"row_id": {"start": 1, "step": 1}})
    m = versioned._load_manifest(path, 0)
    assert m["identity"] == {"row_id": {"start": 1, "step": 1}}
    got = versioned.read_version(spark, path)
    ids = [r.row_id for r in got.select("row_id").collect()]
    assert len(ids) == 100 and len(set(ids)) == 100
    assert min(ids) >= 1
    # supplying the column is refused
    bad = spark.range(5).selectExpr("CONCAT('x', id) AS v",
                                    "CAST(id AS INT) AS k",
                                    "id AS row_id")
    with pytest.raises(ValueError, match="IDENTITY"):
        versioned.write_version(bad, str(tmp_path / "t2"),
                                identity={"row_id": {"start": 1,
                                                     "step": 1}})
    with pytest.raises(ValueError, match="step"):
        versioned.write_version(df, str(tmp_path / "t3"),
                                identity={"row_id": {"step": 0}})


def test_identity_merge_keeps_matched_generates_new(spark, tmp_path):
    """MERGE: an updated key KEEPS its identity value; a new key gets
    one past the high-water mark. Both physics."""
    for dv in (False, True):
        path = str(tmp_path / f"t{dv}")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(50)], "k INT, v STRING")
        versioned.write_version(
            df, path, identity={"row_id": {"start": 1, "step": 1}})
        if dv:
            versioned.set_table_property(path, "dv.enabled", "true")
        before = {r.k: r.row_id for r in
                  versioned.read_version(spark, path).collect()}
        hw = max(before.values())
        ch = spark.createDataFrame(
            [(3, "upd", False), (999, "new", False), (7, None, True)],
            "k INT, v STRING, is_delete BOOLEAN")
        merge = (versioned.merge_version_mor if dv
                 else versioned.merge_version_cow)
        merge(spark, path, ch, "k")
        after = {r.k: (r.v, r.row_id) for r in
                 versioned.read_version(spark, path).collect()}
        assert after[3] == ("upd", before[3])      # kept
        assert after[999][1] > hw                  # fresh, past hw
        assert 7 not in after
        ids = [i for _, i in after.values()]
        assert len(ids) == len(set(ids))
        # supplying identity in changes is refused
        bad = spark.createDataFrame(
            [(4, "x", 123, False)],
            "k INT, v STRING, row_id BIGINT, is_delete BOOLEAN")
        with pytest.raises(ValueError, match="IDENTITY"):
            merge(spark, path, bad, "k")


def test_identity_update_refused_delete_fine(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "k INT, v STRING")
    versioned.write_version(
        df, path, identity={"row_id": {"start": 100, "step": 2}})
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        versioned.update_where(spark, path, {"row_id": "1"}, "k = 0")
    # updating other columns keeps identity values intact
    before = {r.k: r.row_id for r in
              versioned.read_version(spark, path).collect()}
    versioned.update_where(spark, path, {"v": "'u'"}, "k < 5")
    after = {r.k: r.row_id for r in
             versioned.read_version(spark, path).collect()}
    assert after == before
    versioned.delete_where(spark, path, "k >= 20")
    assert versioned.read_version(spark, path).count() == 20


def test_identity_ds_append_allocates_in_reserved_block(spark, tmp_path):
    """r10: DS appends to an identity table now ALLOCATE instead of
    refusing — a plan-time CAS'd reservation commit records
    identity.reserve.<col> in the properties, and each executor task
    assigns base + (pid<<33 + row)·step inside the block (Delta's
    non-consecutive identity contract). Supplying the column is still
    refused, and library writes allocate PAST the reservation."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    spark.dataSource.register(VersionedDataSource)
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(i, f"a{i}") for i in range(10)],
                               "k INT, v STRING")
    versioned.write_version(
        df, path, identity={"row_id": {"start": 1, "step": 1}})
    base_ids = {r.row_id for r in
                versioned.read_version(spark, path).collect()}
    # supplying the column is still refused (GENERATED ALWAYS)
    bad = spark.createDataFrame(
        [(2, "b", 99)], "k INT, v STRING, row_id BIGINT")
    with pytest.raises(Exception, match="IDENTITY"):
        bad.write.format("versioned").mode("append") \
            .option("path", path).save()
    # a clean append commits with unique increasing ids
    app = spark.createDataFrame(
        [(100 + i, f"b{i}") for i in range(20)],
        "k INT, v STRING").repartition(3)
    app.write.format("versioned").mode("append") \
        .option("path", path).save()
    got = versioned.read_version(spark, path)
    assert got.count() == 30
    ids = [r.row_id for r in got.collect()]
    assert len(set(ids)) == 30 and None not in ids
    new_ids = set(ids) - base_ids
    assert len(new_ids) == 20
    assert min(new_ids) > max(base_ids)  # past the high-water
    # a SUBSEQUENT library write allocates past the reservation, not
    # inside it (the reserve property floors the high-water)
    m = versioned._load_manifest(path, versioned.versions(path)[-1])
    reserve = int(m["properties"]["identity.reserve.row_id"])
    versioned.write_version(
        spark.createDataFrame([(500, "z")], "k INT, v STRING"), path,
        _operation="WRITE")  # append-style overwrite: inherits spec
    # (overwrite replaces rows; the new allocation must clear reserve)
    last = versioned.read_version(spark, path).collect()
    assert all(r.row_id > reserve for r in last)


def test_identity_ds_racing_appends_get_disjoint_blocks(spark, tmp_path,
                                                        monkeypatch):
    """Two DS appends racing on the same identity table must land
    DISJOINT id blocks: the reservation commit is CAS-serialized, so
    the loser re-reads and reserves past the winner; both data
    commits then ride the blind-append retry loop. No duplicate ids,
    both row sets present."""
    import threading

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
        VersionedDataSource,
    )

    spark.dataSource.register(VersionedDataSource)
    path = str(tmp_path / "t")
    versioned.write_version(
        spark.createDataFrame([(0, "seed")], "k INT, v STRING"),
        path, identity={"row_id": {"start": 1, "step": 1}})

    real = versioned._publish
    bar = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    seen = []

    def gated(tp, m):
        # rendezvous the two RESERVATION commits so both writers have
        # read the same parent before either publishes
        if m.get("operation") == "IDENTITY RESERVE":
            with lock:
                n = len(seen)
                seen.append(1)
            if n < 2:
                try:
                    bar.wait()
                except threading.BrokenBarrierError:
                    pass
        return real(tp, m)

    monkeypatch.setattr(versioned, "_publish", gated)
    errs = []

    def _append(lo):
        try:
            df = spark.createDataFrame(
                [(lo + i, f"x{i}") for i in range(15)],
                "k INT, v STRING").repartition(2)
            df.write.format("versioned").mode("append") \
                .option("path", path).save()
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=_append, args=(100,)),
               threading.Thread(target=_append, args=(200,))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(240)
    assert errs == []
    got = versioned.read_version(spark, path)
    assert got.count() == 31
    ids = [r.row_id for r in got.collect()]
    assert len(set(ids)) == 31, "identity collision across racers"


def test_overwrite_inherits_generated_and_identity_spec(spark, tmp_path):
    """r10 advice fix: a routine write_version overwrite that omits
    generated=/identity= must INHERIT the latest manifest's spec
    (Delta: column metadata survives INSERT OVERWRITE) — before the
    fix the spec silently vanished, after which DML stopped
    recomputing/enforcing and supplying an identity column was no
    longer refused. Passing {} explicitly still drops the spec."""
    path = str(tmp_path / "t")
    versioned.write_version(_mk(spark), path,
                            generated={"total": "a + b"})
    # overwrite WITHOUT re-passing the spec
    versioned.write_version(_mk(spark, 50), path)
    m = versioned._load_manifest(path, 1)
    assert m["generated"] == {"total": "a + b"}
    got = versioned.read_version(spark, path)
    assert got.count() == 50 and "total" in got.columns
    assert got.filter("total <> a + b").count() == 0
    # enforcement survives the overwrite: lying values refuse
    bad = _mk(spark).selectExpr("a", "b", "v", "a + b + 1 AS total")
    with pytest.raises(versioned.ConstraintViolation,
                       match="generated:total"):
        versioned.write_version(bad, path)
    # explicit {} drops the spec
    versioned.write_version(_mk(spark, 10), path, generated={})
    assert "generated" not in versioned._load_manifest(
        path, versioned.versions(path)[-1])

    # identity: same inheritance contract
    ipath = str(tmp_path / "ti")
    versioned.write_version(
        _mk(spark), ipath, identity={"rid": {"start": 1, "step": 1}})
    versioned.write_version(_mk(spark, 20), ipath)  # spec omitted
    m2 = versioned._load_manifest(ipath, 1)
    assert m2["identity"] == {"rid": {"start": 1, "step": 1}}
    rows = versioned.read_version(spark, ipath).select("rid").collect()
    assert len({r.rid for r in rows}) == 20  # still allocated, unique
    # supplying the inherited identity column is still refused
    with_rid = _mk(spark, 5).selectExpr(
        "a", "b", "v", "CAST(a * 0 AS LONG) AS rid")
    with pytest.raises(ValueError, match="IDENTITY"):
        versioned.write_version(with_rid, ipath)


@pytest.mark.parametrize("physics", ["cow", "mor"])
def test_identity_cdf_feed_matches_committed_data(spark, tmp_path,
                                                  physics):
    """r10 advice fix: on an identity table with cdf.enabled, the
    persisted change feed must record the SAME identity values the
    data commit wrote. monotonically_increasing_id() is
    nondeterministic across jobs, and the feed classification runs as
    a separate job from the rewrite — without the localCheckpoint pin
    on the assigned upserts, fresh inserts can get one id in the data
    and another in the feed whenever the two jobs plan different
    partition layouts. (The drift depends on layout, so this test
    documents the contract; the pin makes it hold by construction.)"""
    path = str(tmp_path / "t")
    versioned.write_version(
        _mk(spark, 30), path,
        identity={"rid": {"start": 100, "step": 3}})
    versioned.set_table_property(path, "cdf.enabled", "true")
    if physics == "mor":
        versioned.set_table_property(path, "dv.enabled", "true")
    # many-partition change set: mono ids differ wildly across
    # partition layouts, so any re-evaluation drift is visible
    ch = (spark.range(200, 240).repartition(8).selectExpr(
        "CAST(id AS INT) AS a", "CAST(id * 3 AS INT) AS b",
        "CONCAT('new', id) AS v", "CAST(false AS BOOLEAN) AS is_delete"))
    if physics == "mor":
        versioned.merge_version_mor(spark, path, ch, "a")
    else:
        versioned.merge_version_cow(spark, path, ch, "a")
    data = {r.a: r.rid for r in
            versioned.read_version(spark, path).collect()}
    last = versioned.versions(path)[-1]
    feed = versioned.read_changes(spark, path, last - 1, last)
    ins = {r.a: r.rid for r in
           feed.filter("_change_type = 'insert'").collect()}
    assert len(ins) == 40
    for a, rid in ins.items():
        assert data[a] == rid, f"feed rid {rid} != data rid {data[a]}"

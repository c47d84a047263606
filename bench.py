"""Benchmark harness: runs the full query registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is planned + executed + collected (results are small by
construction — aggregates and top-ks), so the measured time covers the
full Catalyst plan, shuffles, and result materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # --streams N: TPC-H-style throughput test — N concurrent query
    # streams on ONE session, each running the full registry in a
    # stream-specific rotation, under FAIR scheduling so no stream
    # starves (the multi-tenant contention a shared cluster actually
    # sees; single-stream latency is the plain path below). Prints one
    # JSON line with per-stream walls and the aggregate queries/sec.
    if "--streams" in sys.argv:
        _run_streams(int(sys.argv[sys.argv.index("--streams") + 1]))
        return
    # --check: gate mode — run the full registry once and exit NONZERO
    # if any query errors. The r9 lesson: orders_gini_by_nation threw
    # ARITHMETIC_OVERFLOW at sf0.1, bench recorded it in the errors
    # dict, and nothing failed — the crash was first seen in the
    # driver's own artifact. preflight runs `bench.py --check` at
    # sf0.1 so a scale-only crash can never again ship silently.
    if "--check" in sys.argv:
        n_err = _run_one()
        if n_err:
            print(f"bench --check: {n_err} query error(s) — see the "
                  "errors dict above", file=sys.stderr)
        raise SystemExit(1 if n_err else 0)
    # --sweep: one JSON line per SF (scaling evidence); the driver's
    # plain `python bench.py` path is unchanged.
    if "--sweep" in sys.argv:
        base = os.path.dirname(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
        )
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            d = os.path.join(base, sf)
            if os.path.isdir(d):
                os.environ["SPARK_GRAFT_SF_DIR"] = d
                _run_one()
        return
    _run_one()


def _run_one() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/executors and the parquet footer cache so the first
    # timed query doesn't pay session spin-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # ... and the PYTHON worker pool: the first Arrow task on each of
    # the N cores forks a worker that imports pandas/pyarrow (~0.5 s
    # each, contending) — without this the first multimodal query of
    # the TIMED pass pays ~3-4 s of simultaneous cold imports instead
    # of decode work (r13; the sf0.001 warm pass below no longer warms
    # them since tiny inputs skip the spread fan-out).
    n_cores = spark.sparkContext.defaultParallelism

    def _noop(batches):
        import pandas  # noqa: F401 — the import IS the warmup
        yield from batches

    (spark.range(n_cores * 4, numPartitions=n_cores)
     .mapInPandas(_noop, schema="id long").count())

    qs = entrymod.queries()

    # Steady-state measurement (standard TPC-style warmup run): execute
    # the registry once at the smallest SF so whole-stage-codegen classes
    # are compiled and JIT'd before the timed pass — ALSO when the bench
    # SF is sf0.001 itself, so every SF's timed pass measures the same
    # steady state (a cold sf0.001 pass is ~2× its warm wall, all of it
    # one-time codegen compilation). The timed pass below still runs
    # every plan end-to-end (scan → shuffle → collect) at the bench SF.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for fn in qs.values():
            try:
                fn(spark, warm_dir).collect()
            except Exception:  # noqa: BLE001 — warmup must never fail the bench
                pass
    # Fixture-cost attribution: session-cached fixture builds (the
    # snapshot_* versioned tables with DML histories) land inside
    # whichever entry runs first. The warmup above built the sf0.001
    # copies; reset so the timed pass records exactly the sf_dir
    # builds, and per-entry fixture_s separates one-time build cost
    # from operator cost for round-over-round comparisons.
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import fixtures

    fixtures.reset()
    timings: dict[str, float] = {}
    fixture_s: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        fx0 = fixtures.total()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — one bad query must not
            # lose the whole benchmark record; surface it in the JSON.
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        fx = fixtures.total() - fx0
        if fx >= 0.001:
            fixture_s[name] = round(fx, 3)
    total = round(time.perf_counter() - t_all, 3)

    out = {
        "metric": "full-registry wall clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # per-entry seconds spent INSIDE fixture builders (subtract
        # from queries[name] for the operator's own cost), plus the
        # per-fixture breakdown and session total
        "fixture_s": fixture_s,
        "fixtures": {k: round(v, 3)
                     for k, v in fixtures.snapshot().items()},
        "fixture_total_s": round(fixtures.total(), 3),
    }
    if errors:
        out["errors"] = errors
    # Full per-query record: sidecar file + first stdout line (humans,
    # sweep tooling). The driver only keeps the last ~2000 stdout chars,
    # so a 175-entry dict as the final line parses as null.
    full = json.dumps(out)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full.json"), "a") as fh:
            fh.write(full + "\n")
    except OSError:
        pass
    print(full)

    # FINAL stdout line: the same schema, with `queries` trimmed to the
    # slowest entries so the whole line fits the driver's 2000-char tail.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    compact = dict(out)
    compact["n_queries"] = len(timings)
    compact["n_errors"] = len(errors)
    compact.pop("errors", None)
    compact.pop("fixture_s", None)  # full record keeps the per-entry map
    line = json.dumps(compact)
    for keep in range(len(slowest), -1, -5):
        compact["queries"] = dict(list(slowest.items())[:keep])
        line = json.dumps(compact)
        if len(line) <= 1800:
            break
    if len(line) > 1800:
        compact["queries"] = {}
        line = json.dumps(compact)
    print(line)
    return len(errors)


def _run_streams(n_streams: int) -> None:
    import concurrent.futures as cf

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import get_spark

    # FAIR mode must be set before the context starts; without an
    # allocation file every job lands in one fair-shared default pool,
    # which is exactly the no-starvation behavior the test wants.
    # APPEND to any user-supplied extra conf — setdefault would
    # silently run FIFO (and report it as FAIR) whenever the user
    # already set the documented tuning knob.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    if "spark.scheduler.mode" not in extra:
        os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
            (extra + "," if extra else "") + "spark.scheduler.mode=FAIR"
        )
    spark = get_spark("bench-streams")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Fixture PREBUILD (r12 verdict item 3): under N streams a cold
    # session fixture builds inside whichever stream reaches it first
    # while the other N-1 serialize on fixtures.BUILD_LOCK — measured
    # as the 2.8× (vs 3.2×) 4-stream scaling in r12. Building every
    # session-cached fixture serially BEFORE the clock starts lets all
    # streams run warm; the build wall is reported separately.
    t_fix = time.perf_counter()
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import (
        dedup as _dd, etl as _etl, similarity as _sim,
    )

    for build in (
        lambda: _dd._dedup_index_paths(spark, sf_dir),
        lambda: _sim._ivf_index_paths(spark, sf_dir),
        lambda: _sim._pca_cov(spark, sf_dir),
        lambda: _etl._versioned_orders_path(spark, sf_dir),
        lambda: _etl._cow_orders_path(spark, sf_dir),
        lambda: _etl._hidden_events_path(spark, sf_dir),
        lambda: _etl._dv_orders_paths(spark, sf_dir),
        lambda: _etl._partitioned_orders_path(spark, sf_dir),
        lambda: _etl._generated_orders_path(spark, sf_dir),
        lambda: _etl._replace_where_path(spark, sf_dir),
        lambda: _etl._default_columns_path(spark, sf_dir),
    ):
        build()
    prebuild_s = round(time.perf_counter() - t_fix, 3)

    qs = list(entrymod.queries().items())

    def stream(i: int) -> tuple[float, int]:
        # per-stream rotation: stream i starts at query i·|Q|/N, so the
        # streams hit different plans at any instant (the TPC-H
        # throughput-test shuffle) while every stream still runs ALL
        # queries.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
                                            f"stream-{i}")
        # pin the JVM-thread-local active session for this stream
        # thread — Python-DS saves resolve through it (see
        # sources/versioned_ds.ensure_registered)
        from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.sources.versioned_ds import (
            ensure_registered,
        )
        ensure_registered(spark)
        order = qs[i * len(qs) // n_streams:] + qs[:i * len(qs) // n_streams]
        t0 = time.perf_counter()
        errs: dict[str, str] = {}
        for name, fn in order:
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001 — same contract as
                # _run_one: one bad query must not lose the whole
                # throughput record; the NAME must not be lost either
                errs[name] = f"{type(exc).__name__}: {exc}"[:160]
        return round(time.perf_counter() - t0, 3), errs

    t_all = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=n_streams) as pool:
        results = list(pool.map(stream, range(n_streams)))
    total = round(time.perf_counter() - t_all, 3)
    walls = [w for w, _ in results]
    n_errors = sum(len(e) for _, e in results)
    errors = {f"s{i}:{k}": v for i, (_, e) in enumerate(results)
              for k, v in e.items()}
    print(json.dumps({
        "metric": f"{n_streams}-stream throughput",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stream_walls": walls,
        "queries_per_sec": round(n_streams * len(qs) / total, 2),
        "n_queries_per_stream": len(qs),
        "fixture_prebuild_s": prebuild_s,
        "n_errors": n_errors,
        **({"errors": errors} if errors else {}),
    }))


if __name__ == "__main__":
    main()

"""Config-driven setup (reference's etl_config.yml shape, extended)."""

from __future__ import annotations

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.config import PipelineConfig

YAML = """\
pyspark:
  master: "local[4]"
  executor_memory: "4g"
  num_executors: 4
  conf:
    spark.sql.shuffle.partitions: 12
data:
  raw_data_path: "data/raw/"
  transformed_data_path: "data/out/"
telemetry:
  log_row_counts: true
"""


def test_from_yaml_parses_reference_shape(tmp_path):
    p = tmp_path / "etl_config.yml"
    p.write_text(YAML)
    cfg = PipelineConfig.from_yaml(str(p))
    assert cfg.master == "local[4]"
    assert cfg.executor_memory == "4g"
    assert cfg.num_executors == 4
    assert cfg.conf["spark.sql.shuffle.partitions"] == 12
    assert cfg.transformed_data_path == "data/out/"
    assert cfg.extra["telemetry"]["log_row_counts"] is True


def test_build_session_applies_conf(tmp_path, spark):
    p = tmp_path / "etl_config.yml"
    p.write_text(YAML)
    cfg = PipelineConfig.from_yaml(str(p))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = cfg.build_session("cfg-test")
        # getOrCreate reuses the live session; runtime confs applied.
        assert s.conf.get("spark.sql.shuffle.partitions") == "12"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_defaults_when_sections_missing(tmp_path):
    p = tmp_path / "min.yml"
    p.write_text("pyspark:\n  master: yarn\n")
    cfg = PipelineConfig.from_yaml(str(p))
    assert cfg.master == "yarn"
    assert cfg.raw_data_path == "data/raw/"
    assert cfg.conf == {} and cfg.extra == {}


def test_register_views_scoped_per_session(spark, monkeypatch):
    """The register_views memo must not skip a sibling session (temp
    views are per-SparkSession even though applicationId is shared),
    and must actually short-circuit a repeat call per session."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import catalog
    from tests.conftest import SF_SMALL

    calls = []
    real_table = catalog.table
    monkeypatch.setattr(
        catalog, "table",
        lambda sp, sf, name: (calls.append(name), real_table(sp, sf, name))[1],
    )
    catalog.register_views(spark, SF_SMALL)
    assert spark.sql("SELECT count(*) FROM region").collect()[0][0] > 0
    sibling = spark.newSession()
    n_before = len(calls)
    catalog.register_views(sibling, SF_SMALL)
    assert len(calls) == n_before + len(catalog.TABLES), \
        "sibling session must register its own views"
    assert sibling.sql("SELECT count(*) FROM region").collect()[0][0] > 0
    n_before = len(calls)
    catalog.register_views(sibling, SF_SMALL)
    assert len(calls) == n_before, "repeat call must short-circuit"


def test_sql_function_library(spark):
    """Spark 4 SQL-defined functions (CREATE FUNCTION ... RETURN):
    scalar cents/share_ppm/stable_hash plus the ws_tokens table
    function, registered by catalog.register_sql_functions and
    inlined by Catalyst (SQL bodies, no Python UDF). Each is checked
    against the expression it wraps on real testdata."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import (
        register_sql_functions,
        register_views,
    )
    from tests.conftest import SF_SMALL

    register_sql_functions(spark)
    register_views(spark, SF_SMALL)

    got = spark.sql("""
        SELECT cents(o_totalprice) AS c,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c_ref,
               stable_hash(o_orderstatus) AS h,
               CAST(CONV(SUBSTRING(MD5(o_orderstatus), 1, 15), 16, 10)
                    AS BIGINT) AS h_ref
        FROM orders LIMIT 200
    """).collect()
    assert got and all(r.c == r.c_ref and r.h == r.h_ref for r in got)

    r = spark.sql(
        "SELECT share_ppm(1, 4) AS a, share_ppm(5, 0) AS b"
    ).first()
    assert r.a == 250000 and r.b is None

    toks = spark.sql("SELECT * FROM ws_tokens('spark sql udf')").collect()
    assert [t.w for t in toks] == ["spark", "sql", "udf"]

    # registration is idempotent (CREATE OR REPLACE)
    register_sql_functions(spark)
    assert spark.sql("SELECT cents(1.5) AS c").first().c == 150

    # the scalar body INLINES into the calling plan: no python worker,
    # no BatchEvalPython node
    plan = spark.sql(
        "SELECT cents(o_totalprice) FROM orders"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_extra_conf_lenient_commas():
    """SPARK_GRAFT_EXTRA_CONF parsing: comma-separated k=v pairs, with
    a no-'=' fragment CONTINUING the previous value (Spark confs like
    spark.sql.extensions are themselves comma-lists)."""
    import pytest as _pytest

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.session import (
        _parse_extra_conf,
    )

    assert _parse_extra_conf("") == []
    assert _parse_extra_conf("a=1, b=2") == [("a", "1"), ("b", "2")]
    assert _parse_extra_conf(
        "spark.sql.extensions=com.A$Ext,com.B$Ext,x=y"
    ) == [("spark.sql.extensions", "com.A$Ext,com.B$Ext"), ("x", "y")]
    with _pytest.raises(ValueError, match="not k=v"):
        _parse_extra_conf("a=")
    with _pytest.raises(ValueError, match="not k=v"):
        _parse_extra_conf("=v")
    with _pytest.raises(ValueError, match="starts with"):
        _parse_extra_conf("loosefrag,a=1")

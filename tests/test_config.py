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

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` enumerate every implemented operator
from SURVEY.md §2 with its DuckDB-oracle twin. The registries live next
to the operators (each operator module exposes QUERIES/ORACLES) — this
file only aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: q5 local-supplier-volume (6-way join + agg)."""
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import relational

    return relational.q5_local_supplier_volume(spark, _SF0001)


def _registries():
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators import (
        dedup,
        etl,
        events,
        joins,
        multimodal,
        relational,
        similarity,
        text,
    )

    return (relational, events, dedup, similarity, text, joins, etl, multimodal)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _registries():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _registries():
        out.update(getattr(mod, "ORACLES", {}))
    return out

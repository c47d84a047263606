"""PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capability surface of
the reference batch ETL pipeline (Data-Bishop/
Batch-Processing-ETL-Pipeline-for-Chess-Puzzle-Generator), widened into
a full analytics + LLM-data-pipeline engine:

- relational analytics (joins/aggs/windows/rollup/pivot),
- event/log analytics (sessionization, funnels, tumbling windows) with
  Structured Streaming twins,
- large-scale training-data ops (exact + MinHash/SimHash/Jaccard dedup,
  ANN similarity search, text quality/language analysis),
- the reference's own chess ETL surface (ND-JSON ingest, incremental
  ledger, puzzle filtering, PGN sink) rebuilt DataFrame-first.

Everything is DataFrame/Catalyst-native: explicit schemas, broadcast
hints for dims, md5-based hashing that a DuckDB oracle can replay
bit-for-bit, and no Python UDFs in any hot path.
"""

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.session import get_spark
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

"""ND-JSON game ingestion with an explicit nested schema.

Replaces the reference's schema-on-read ``spark.read.json(file)``
(reference: etl/transform.py:94) with an explicit StructType: at 100 TB
schema inference is a full extra pass over the data, and a malformed
line silently changes the inferred schema. PERMISSIVE mode routes bad
records to ``_corrupt_record`` instead of failing the job.

The schema mirrors the Lichess game-export shape the reference consumes
(reference: etl/extract.py:41-66 fetches
players.white.user.name / opening.eco / status / variant / winner /
moves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

USER_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("id", T.StringType()),
])

PLAYER_SCHEMA = T.StructType([
    T.StructField("user", USER_SCHEMA),
    T.StructField("rating", T.IntegerType()),
])

GAME_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("rated", T.BooleanType()),
    T.StructField("variant", T.StringType()),
    T.StructField("speed", T.StringType()),
    T.StructField("perf", T.StringType()),
    T.StructField("createdAt", T.LongType()),
    T.StructField("lastMoveAt", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("winner", T.StringType()),
    T.StructField("players", T.StructType([
        T.StructField("white", PLAYER_SCHEMA),
        T.StructField("black", PLAYER_SCHEMA),
    ])),
    T.StructField("opening", T.StructType([
        T.StructField("eco", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ply", T.IntegerType()),
    ])),
    T.StructField("moves", T.StringType()),
    T.StructField("clock", T.StructType([
        T.StructField("initial", T.IntegerType()),
        T.StructField("increment", T.IntegerType()),
        T.StructField("totalTime", T.IntegerType()),
    ])),
    T.StructField("_corrupt_record", T.StringType()),
])


def read_games(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read Lichess-export ND-JSON into the typed game schema."""
    return (
        spark.read.schema(GAME_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(paths)
    )


def read_games_stream(spark: SparkSession, directory: str) -> DataFrame:
    """Streaming twin: continuously ingest ND-JSON files landing in a
    directory. With a checkpoint this IS the incremental-processing
    ledger (reference: etl/transform.py:24-34 tracked processed files
    by hand in a txt file) — exactly-once, driver-restart safe.
    """
    return (
        spark.readStream.schema(GAME_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(directory)
    )

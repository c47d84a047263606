"""Structured Streaming twins of the batch operators.

Each builder takes an unbounded DataFrame (readStream source) and
returns the transformed streaming DataFrame; callers attach the sink
(`writeStream` + checkpoint). Watermarks bound state so these run
indefinitely on a real cluster:

- windowed_event_counts ≡ operators/events.py::ev_tumbling_window
- dedup_events          ≡ operators/events.py::ev_dedup_latest (first-wins
  under streaming semantics — state eviction needs the watermark)
- streaming_puzzle_pipeline ≡ the reference's whole transform job as one
  continuous query: the file source + checkpoint subsumes the manual
  processed-files ledger (reference: etl/transform.py:24-34,91-119).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.chess import (
    pgn_block,
    puzzle_pipeline,
)


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    State is dropped once the watermark passes a window's end — memory
    is O(open windows × event types) regardless of stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids. The
    watermark bounds the dedup state — ids older than it are evicted."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def streaming_puzzle_pipeline(games: DataFrame) -> DataFrame:
    """The reference's full ETL as one continuous query: typed ND-JSON
    stream → mate filter → nested projection → PGN text column.
    Attach ``.writeStream.format('text')`` + checkpoint; the source's
    file tracking replaces the hand-rolled ledger with exactly-once
    semantics. (Unnumbered blocks: a global [Game N] counter is
    meaningless on an unbounded stream.)
    """
    return puzzle_pipeline(games).select(pgn_block(None).alias("pgn"))

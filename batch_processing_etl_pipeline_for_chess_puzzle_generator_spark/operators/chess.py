"""Chess puzzle-candidate ETL — the reference pipeline, Spark-first.

The reference (etl/transform.py:99-117) filters mate games, projects
nested fields, then drops to ``.rdd.map`` + ``foreachPartition`` with a
driver-written PGN file per input. Every step here stays a Column
expression inside whole-stage codegen, and the sink is a distributed
``df.write.text`` — no RDDs, no Python row functions, no driver loop:

- filter_puzzle_candidates ≡ transform.py:100 (status/variant filter)
- extract_game_fields      ≡ transform.py:103-111 (nested projection)
- to_pgn                   ≡ transform.py:36-54 (PGN text serialization)
- write_pgn                ≡ transform.py:117 (sink; distributed here)

At 100 TB of games the reference design is a driver bottleneck twice
over (per-file loop + Python serializers); this one is a single
declarative plan per directory of files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def filter_puzzle_candidates(games: DataFrame,
                             statuses: tuple[str, ...] = ("mate",),
                             variant: str = "standard") -> DataFrame:
    """Games that ended in (by default) mate, standard rules — the
    puzzle-candidate predicate. Pure Column filter → lands in the scan
    as a pushed/codegen'd predicate."""
    return games.filter(
        F.col("status").isin(*statuses) & (F.col("variant") == variant)
    )


def extract_game_fields(games: DataFrame) -> DataFrame:
    """Nested-struct projection to the flat puzzle-candidate schema."""
    return games.select(
        F.col("id").alias("game_id"),
        F.col("players.white.user.name").alias("white_name"),
        F.col("players.black.user.name").alias("black_name"),
        F.col("opening.eco").alias("opening_eco"),
        F.col("opening.name").alias("opening_name"),
        F.col("winner"),
        F.col("moves"),
    )


def pgn_block(game_number: Column | None = None) -> Column:
    """PGN text block for one flattened game row (same tag layout the
    reference emits). Null-safe: missing tags render as '?'."""
    q = lambda c: F.coalesce(F.col(c).cast("string"), F.lit("?"))  # noqa: E731
    parts = [
        F.lit("["), F.lit("Game "), game_number.cast("string") if game_number is not None else F.lit("?"),
        F.lit("]\n"),
        F.lit('[Game ID "'), q("game_id"), F.lit('"]\n'),
        F.lit('[White "'), q("white_name"), F.lit('"]\n'),
        F.lit('[Black "'), q("black_name"), F.lit('"]\n'),
        F.lit('[Opening Eco "'), q("opening_eco"), F.lit('"]\n'),
        F.lit('[Opening Name "'), q("opening_name"), F.lit('"]\n'),
        F.lit('[Game Winner "'), q("winner"), F.lit('"]\n'),
        F.lit("\n"), q("moves"), F.lit("\n"),
    ]
    return F.concat(*parts)


def to_pgn(flat: DataFrame, numbered: bool = True) -> DataFrame:
    """Single-column DataFrame of PGN text blocks.

    ``numbered=True`` ranks games by game_id for stable [Game N]
    headers, computed DISTRIBUTED: range-partition on game_id, take a
    per-partition row_number, and add broadcast prefix-sum offsets of
    the per-partition counts. Equal keys land in one range partition,
    so the result is identical to a global ``row_number() OVER (ORDER
    BY game_id)`` — without the single-partition sort that would
    serialize the whole corpus through one task at 100 TB. The only
    single-partition window runs over n_partitions count rows.

    Caller contract (numbered=True): the returned plan reads a
    persisted frame exposed as ``out._pgn_persisted``; ``write_pgn``
    releases it after its write action, and any OTHER caller that runs
    an action directly must ``out._pgn_persisted.unpersist()`` when
    done (the attribute lives on THIS DataFrame — further
    transformations return new objects without it).
    """
    if not numbered:
        return flat.select(pgn_block(None).alias("pgn"))
    # persist(): the offsets branch and the data branch below both read
    # ``part``. Without a materialization point they'd only agree on
    # partition ids because Spark's ReuseExchange dedupes the identical
    # range exchange — if the exchange were ever computed twice, the
    # RangePartitioner's SAMPLED boundaries could differ between
    # branches and mis-number games. Persisting pins one physical
    # partitioning both branches observe, making the invariant explicit
    # rather than an optimizer accident.
    part = flat.repartitionByRange(F.col("game_id")).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    wl = Window.partitionBy("_pid").orderBy("game_id")
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(wo), F.lit(0)).alias("_off"),
        )
    )
    out = (
        part.withColumn("_ln", F.row_number().over(wl))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_n", F.col("_off") + F.col("_ln"))
        .select(pgn_block(F.col("_n")).alias("pgn"))
    )
    # The returned plan lazily reads the persisted frame; the caller
    # releases it after the terminal action (write_pgn does). Exposed
    # as an attribute because the persist must outlive this function
    # but not the consuming action — otherwise every numbered to_pgn
    # call would pin one cached copy of the corpus for the session.
    out._pgn_persisted = part
    return out


def write_pgn(flat: DataFrame, output_path: str, numbered: bool = True,
              per_source_col: str | None = None) -> None:
    """Distributed PGN sink: every executor writes its own split —
    the Spark-native replacement for the reference's foreachPartition
    with driver-side file appends. Releases to_pgn's numbering persist
    once the write lands.

    ``per_source_col`` reproduces the reference's one-PGN-per-input-
    file layout (etl/transform.py:36-54 writes ``{source}.pgn`` per raw
    file): rows land under ``<col>=<source>/`` via ``partitionBy`` and
    [Game N] numbering RESTARTS per source, exactly the reference's
    per-file ``count`` — still one distributed plan, no driver loop."""
    if per_source_col is not None:
        # ONE shuffle: repartition the narrow input on the source key
        # BEFORE rendering; the numbering window requires the same
        # hash distribution, so it reuses this exchange, and the
        # partitionBy writer then sees co-located rows — repartitioning
        # after the window would shuffle the rendered PGN text blocks
        # (the widest column) a second time.
        w = Window.partitionBy(per_source_col).orderBy("game_id")
        df = flat.repartition(F.col(per_source_col)).select(
            F.col(per_source_col),
            pgn_block(F.row_number().over(w) if numbered else None)
            .alias("pgn"),
        )
        (
            df.write.mode("overwrite")
            .partitionBy(per_source_col)
            .text(output_path)
        )
        return
    df = to_pgn(flat, numbered=numbered)
    try:
        df.write.mode("overwrite").text(output_path)
    finally:
        cached = getattr(df, "_pgn_persisted", None)
        if cached is not None:
            cached.unpersist()


def puzzle_pipeline(games: DataFrame) -> DataFrame:
    """extract → filter → flatten, one declarative plan."""
    return extract_game_fields(filter_puzzle_candidates(games))

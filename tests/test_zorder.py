"""Z-order layout: key math golden values + sorted-layout write."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.zorder import (
    morton_sql,
    with_zorder_key,
    write_zordered,
)

SF = "/root/testdata/sf0.001"


def test_morton_golden(spark):
    # x=3 (011b), y=5 (101b) interleave → 100111b = 39
    row = spark.sql(f"SELECT {morton_sql('3', '5', bits=3)} AS k").collect()[0]
    assert row.k == 39
    # symmetry: swapping x/y swaps odd/even bit planes → different key
    row2 = spark.sql(f"SELECT {morton_sql('5', '3', bits=3)} AS k").collect()[0]
    assert row2.k == 27


def test_morton_matches_duckdb(spark):
    import duckdb

    s = [r.k for r in spark.sql(
        f"SELECT {morton_sql('id % 16', 'id % 7', 4, div='div')} AS k "
        "FROM range(100) ORDER BY id").collect()]
    d = [r[0] for r in duckdb.connect().execute(
        f"SELECT {morton_sql('(i % 16)', '(i % 7)', 4, div='//')} AS k "
        "FROM range(100) t(i) ORDER BY i").fetchall()]
    assert s == d


def test_write_zordered_sorted_files(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/part.parquet")
    path = str(tmp_path / "part_z")
    write_zordered(df, path, "p_partkey % 256", "p_size % 256")
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # within every output file, rows must be nondecreasing in z_key
    keyed = with_zorder_key(back, "p_partkey % 256", "p_size % 256")
    bad = (
        keyed.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("z_key").over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter("prev IS NOT NULL AND z_key < prev")
        .count()
    )
    assert bad == 0

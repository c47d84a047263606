"""One-off analysis for RECALL.md: SemDeDup drop-set agreement between
RAW 64-d vectors and PCA-reduced vectors (top-2 components from
emb_pca_topk) at a given sf_dir — the SemDeDup paper's actual recipe
runs in a PCA-reduced space; this quantifies what that costs/buys on
the synthetic (uniform-random) corpus.

Usage: python tools/semdedup_pca_note.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark import get_spark
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.catalog import table
    from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        _semdedup,
        emb_pca_topk,
        emb_semdedup,
    )

    spark = get_spark("semdedup-pca-note")
    spark.sparkContext.setLogLevel("ERROR")

    raw_drop = {
        r.vec_id for r in emb_semdedup(spark, sf_dir)
        .filter("NOT keep").collect()
    }

    # project every embedding onto the top-2 ppm-grid loadings, rescale
    # to the same ±1e6 component grid _semdedup quantizes from, and
    # run the IDENTICAL operator on the 2-d frame
    load = emb_pca_topk(spark, sf_dir)
    v = {(int(r.component), int(r.pos)): int(r.loading_ppm)
         for r in load.collect()}
    d = max(p for _, p in v) + 1
    arr1 = [v[(1, p)] for p in range(d)]
    arr2 = [v[(2, p)] for p in range(d)]
    emb = table(spark, sf_dir, "embeddings")
    proj = emb.select(
        "vec_id",
        F.expr(
            "transform(array(" +
            ",".join(
                "aggregate(zip_with(embedding, array({w}), (x, w) -> "
                "CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), "
                "(acc, t) -> acc + t)".format(w=",".join(map(str, ws)))
                for ws in (arr1, arr2)
            ) + "), z -> CAST(z / 1e6 AS FLOAT))"
        ).alias("embedding"),
    )
    red_drop = {
        r.vec_id for r in _semdedup(proj).filter("NOT keep").collect()
    }

    inter = raw_drop & red_drop
    union = raw_drop | red_drop
    print(f"sf_dir={sf_dir} threshold={SEMDEDUP_THRESHOLD}")
    print(f"raw drops:     {len(raw_drop)}")
    print(f"pca-2 drops:   {len(red_drop)}")
    print(f"intersection:  {len(inter)}")
    print(f"jaccard:       {len(inter) / max(1, len(union)):.3f}")
    print(f"raw kept by pca-2 (recall of raw drops): "
          f"{len(inter) / max(1, len(raw_drop)):.3f}")


if __name__ == "__main__":
    main()

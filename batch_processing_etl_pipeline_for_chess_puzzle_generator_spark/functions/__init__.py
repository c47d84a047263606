from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.hashing import (
    stable_hash64,
    stable_hash64_seeded,
    STABLE_HASH_SQL,
)
from batch_processing_etl_pipeline_for_chess_puzzle_generator_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "stable_hash64",
    "stable_hash64_seeded",
    "STABLE_HASH_SQL",
    "cosine_similarity",
    "dot",
    "l2_norm",
]

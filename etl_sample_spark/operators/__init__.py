"""Composite operators Spark lacks as single built-ins (SURVEY §2.6 J6,
§2.12): as-of join, dedup family, similarity search, multimodal columns.

Each is a library function over DataFrames — no custom Catalyst rules
needed (SURVEY §4 conclusion): semantics compose from existing operators,
so the optimizer still sees a fully declarative plan.
"""

from etl_sample_spark.operators.joins import asof_join
from etl_sample_spark.operators.dedup import (
    exact_dedup,
    minhash_signature_df,
    minhash_lsh_candidates,
    simhash_df,
    simhash_near_duplicates,
    ngram_jaccard_pairs,
)
from etl_sample_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_bucketed_topk,
)

__all__ = [
    "asof_join",
    "exact_dedup",
    "minhash_signature_df",
    "minhash_lsh_candidates",
    "simhash_df",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "embedding_near_duplicates",
    "lsh_bucketed_topk",
]

"""Scalar/column function library — all built on pyspark.sql.functions
(JVM-side, codegen-friendly); no row-at-a-time Python UDFs."""

from etl_sample_spark.functions.scalar import (
    coalesce_chain,
    mask_account,
    reassemble_compact_timestamp,
)
from etl_sample_spark.functions.text import (
    doc_fingerprint,
    lang_id_heuristic,
    quality_score,
    token_count,
    tokens,
)
from etl_sample_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "coalesce_chain",
    "mask_account",
    "reassemble_compact_timestamp",
    "tokens",
    "token_count",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]

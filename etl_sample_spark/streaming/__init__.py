"""Structured Streaming surface (SURVEY §2.10 T1-T6)."""

from etl_sample_spark.streaming.ingest import (
    foreach_batch_normalize,
    run_ingest_available_now,
    stream_documents,
)
from etl_sample_spark.streaming.windows import (
    dedup_within_watermark,
    sessionized_user_activity,
    watermarked_window_counts,
)

__all__ = [
    "stream_documents",
    "foreach_batch_normalize",
    "run_ingest_available_now",
    "watermarked_window_counts",
    "sessionized_user_activity",
    "dedup_within_watermark",
]

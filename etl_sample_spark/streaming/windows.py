"""Event-time streaming operators (SURVEY §2.10 T2-T5): watermarked
tumbling windows, session windows, stateful dedup.

The reference has no event-time handling at all — a file arriving
mid-run is "simply picked up next run" (SURVEY §2.10). These operators
give the engine principled late-data semantics; their batch twins (same
expressions, no watermark) are oracle-checked in plans/temporal.py.

State-size note (100 TB): every operator here keys its state (window ×
group, or dedup key) and bounds it with a watermark — unbounded state is
the streaming equivalent of the unpartitioned shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T2+T4: tumbling event-time window agg; rows later than the
    watermark are dropped and window state is evicted once the watermark
    passes the window end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "total_value")
    )


def sessionized_user_activity(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3: session windows (gap-merged) per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5: stateful exactly-once-per-key dedup with bounded state — the
    streaming fix for the reference's duplicate-on-retry appends."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))

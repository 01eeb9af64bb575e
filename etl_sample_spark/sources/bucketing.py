"""Bucketed tables: pre-shuffled, co-located joins (100-TB scale path).

At cluster scale the dominant cost of a fact⋈fact join (orders⋈lineitem)
is shuffling both sides on the join key for every query. Bucketing pays
that shuffle ONCE at write time: both tables are hash-partitioned into
the same number of buckets on the join key and sorted within buckets, so
every subsequent join or aggregation on that key runs with zero
Exchange — Spark's SortMergeJoin reads matching buckets directly
(verified mechanically in tests/test_bucketing.py by asserting the
joined plan contains no Exchange).

This is the Spark-native answer to the reference's star-schema
FK-stamping (SURVEY §2.6 J7): the keys it stamps
(``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:47-49``) are
exactly the columns to bucket the output tables by.

Bucket-count sizing at 100 TB: target ~128 MB of post-compression data
per bucket per table; more buckets → more parallelism but smaller files.
The count must be identical on both sides of a co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, sorted managed table. One-time
    shuffle; every later join/groupBy on ``bucket_col`` is exchange-free.

    The repartition below IS that one-time shuffle (r11 review:
    ``bucketBy`` alone does NOT shuffle — each input task hash-splits
    its rows locally, writing up to tasks x n_buckets files, a
    small-file explosion at any real scale). Repartitioned on the
    bucket expression first, every bucket is written by exactly one
    task: n_buckets files total, and the write matches the docstring's
    'pays the shuffle once' contract."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    writer = writer.sortBy(sort_col or bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two tables bucketed on their join keys with the same bucket
    count. Catalyst recognizes the matching hash distribution and plans
    a SortMergeJoin with no Exchange on either side.

    ``force_sort_merge`` adds a MERGE hint — needed when one side is
    small enough that the planner would broadcast instead (broadcast
    disables bucket pruning; at real scale both sides are far over the
    broadcast threshold and the hint is unnecessary)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(right, left[left_key] == right[right_key], how)

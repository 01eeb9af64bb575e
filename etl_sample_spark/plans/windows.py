"""Window functions (SURVEY §2.8, W1-W4) plus sort/limit (§2.9 O1-O2).

All orderings include a unique tie-break key so results are deterministic
across engines — window frames over non-unique orderings are the classic
cross-engine flake.

Scale note: every window here partitions by a key (custkey / user_id), so
the shuffle is a hash exchange on that key and state per partition stays
bounded. Un-partitioned global windows are avoided except on provably
small inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "win_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="W1/W4: row_number top-k per group (tie-break on unique orderkey)",
)
def win_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "win_rank_dense_rank_suppliers",
    """
    SELECT s_nationkey, s_suppkey,
           RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
           NTILE(2)     OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS half
    FROM supplier
    ORDER BY s_nationkey, rnk, s_suppkey
    """,
    doc="W1: rank / dense_rank / ntile in one pass (single window exchange)",
)
def win_rank_dense_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        _t(spark, sf_dir, "supplier")
        .select(
            "s_nationkey",
            "s_suppkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(2).over(w).alias("half"),
        )
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    )


@register(
    "win_lag_lead_event_values",
    """
    SELECT user_id, event_id,
           ROUND(value, 4) AS value,
           ROUND(value - LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta_prev,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)          AS next_value
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="W2: lag/lead over event time per user",
)
def win_lag_lead_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
            F.round(F.lead("value").over(w), 4).alias("next_value"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "win_running_sum_customer_spend",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="W3: running sum, deterministic ROWS frame with unique tie-break. "
    "Double sum is grid-safe here (unlike unordered groupBy money sums): "
    "per-customer frames are small, so accumulated FP error (~1e-9) "
    "cannot cross the 0.005 ROUND boundary of a 2-dp-grid sum.",
)
def win_running_sum_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_moving_avg_event_value",
    """
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="W3: 3-row moving average per user",
)
def win_moving_avg_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("moving_avg3"))
        .orderBy("user_id", "event_id")
    )


@register(
    "topk_global_orders",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="O2: global top-k — Spark plans TakeOrderedAndProject (no full sort)",
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_orderpriority")
    )

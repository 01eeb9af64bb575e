"""Set operations (SURVEY §2.9 O3-O5).

O3 union is the reference's only set op (``DataFrame.append``
accumulation at ``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:119,496``)
— re-expressed as ``unionByName(allowMissingColumns=True)``, which also
covers its ragged-schema tolerance. Intersect/except are [EXT].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "set_union_all_entities",
    """
    SELECT c_custkey AS entity_id, c_name AS name, ROUND(c_acctbal, 2) AS acctbal, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, NULL, 'supplier' FROM supplier
    ORDER BY kind, entity_id
    """,
    doc="O3/E3: unionByName with allowMissingColumns — the reference's "
    "append-accumulation with ragged schemas (pipeline.py:119,496)",
)
def set_union_all_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp, allowMissingColumns=True).orderBy("kind", "entity_id")


@register(
    "set_intersect_nationkeys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="O4: INTERSECT (distinct semantics both engines)",
)
def set_intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "set_except_nationkeys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="O4: EXCEPT — nations with customers but no suppliers",
)
def set_except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # DataFrame.subtract == EXCEPT DISTINCT (matches the SQL oracle).
    return c.subtract(s).orderBy("nationkey")


@register(
    "dedup_drop_duplicates_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="O5: deterministic dedup — keep min key per (status, priority); "
    "fixes the reference's duplicate-on-retry gap (append-only sinks, "
    "pipeline.py:28 'if_exists=append')",
)
def dedup_drop_duplicates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.min("o_orderkey").cast("bigint").alias("first_orderkey"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )

"""Bucketed co-located join: the one-time-shuffle contract, verified on
the executed plan — the join itself must contain no Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.sources.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # A managed table's location can survive a previous session that
    # never registered it in this metastore — clear both table and dir.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=4)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey", force_sort_merge=True)
    joined.collect()
    executed = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in executed
    assert "Exchange" not in executed, "bucketed join still shuffles"


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert joined.count() == plain.count()
    a = joined.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).head()["s"]
    b = plain.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).head()["s"]
    assert a == b

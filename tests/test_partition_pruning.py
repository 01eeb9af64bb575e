"""Partition pruning + shuffle budgets: the two cheapest scale levers,
asserted mechanically."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.plans import REGISTRY
from etl_sample_spark.plans.inspect import count_exchanges, formatted_plan
from etl_sample_spark.sources.sinks import write_partitioned


def test_partitioned_write_prunes_on_filter(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = catalog.table(spark, sf_dir, "events")
    write_partitioned(ev, out, ["event_type"])

    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = formatted_plan(back)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, "no PartitionFilters in plan"
    assert "event_type" in pf[0], f"filter not pushed to partitions: {pf[0]}"
    # pruning is also semantically right
    assert back.count() == ev.where(F.col("event_type") == "purchase").count()


def test_shuffle_budget_q1(spark, sf_dir):
    """Q1: one hash-partition exchange for the agg + one range exchange
    for the sort. A third shuffle means partial aggregation broke."""
    df = REGISTRY["q1_pricing_summary"].spark(spark, sf_dir)
    assert count_exchanges(df) <= 2


def test_shuffle_budget_q6(spark, sf_dir):
    """Q6 is scan+filter+1-row agg: zero shuffles (AQE folds the final
    single-partition agg; anything more means the filter didn't push)."""
    df = REGISTRY["q6_forecast_revenue"].spark(spark, sf_dir)
    assert count_exchanges(df) <= 1


def test_shuffle_budget_q5_star_join(spark, sf_dir):
    """Q5's dims ride broadcast; only the fact⋈fact join and the agg may
    shuffle. Budget: ≤ 4 exchanges (2 join inputs + agg + sort)."""
    df = REGISTRY["q5_local_supplier_volume"].spark(spark, sf_dir)
    assert count_exchanges(df) <= 4


def test_window_group_limit_optimizes_topk(spark, sf_dir):
    """Top-k-per-group must plan a WindowGroupLimit (per-partition k-row
    pre-filter BEFORE the window shuffle, Spark 3.5+ optimizer rule) —
    the difference between sorting k rows per group and sorting every
    row at 100 TB. Pinned so a query rewrite or version change that
    silently drops the rule fails loudly."""
    from etl_sample_spark.plans import REGISTRY
    from etl_sample_spark.plans.inspect import executed_plan

    plan = executed_plan(REGISTRY["win_top3_orders_per_customer"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Star-join against a Hive-partitioned fact: the filtered dimension
    must inject a dynamicpruning subquery into the fact scan's partition
    filters so only matching directories are read — the 100 TB lever
    where the partition column arrives via a join, not a literal."""
    from pyspark.sql import functions as F

    from etl_sample_spark import catalog

    fact_path = str(tmp_path / "orders_by_priority")
    orders = catalog.table(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    # The dim filter must be on a NON-join column: a literal filter on
    # the join key itself propagates through join constraints as a
    # static partition filter (no DPP needed — verified the hard way).
    dim = spark.createDataFrame(
        [("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop")],
        ["o_orderpriority", "tag"],
    ).where(F.col("tag") == "keep")
    joined = fact.join(dim, "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in the fact scan"
    n = joined.collect()[0]["n"]
    expect = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert n == expect

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

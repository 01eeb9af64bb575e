"""Runtime (bloom) filter injection: the shuffle-join analog of
broadcast-side pruning.

At 100 TB the big win on fact-fact joins is never shuffling rows the
other side will drop: Spark's runtime bloom filter builds a sketch of
the (filtered) creation side's join keys and installs a might_contain
pre-filter on the application side's SCAN — rows die before the
exchange. This works only when the plan stays a shuffle join and the
size thresholds admit the creation side; the test pins both the
injection and result-equivalence so a config or Spark-version change
that silently drops the filter fails loudly.

(sf0.1 sizes sit below the default application-side threshold, so the
test lowers it — at production scale the defaults engage on their own;
see SCALE.md.)
"""

from __future__ import annotations

from contextlib import contextmanager

from etl_sample_spark import catalog


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            spark.conf.set(key, v)


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    orders = catalog.table(spark, sf_dir, "orders")
    lineitem = catalog.table(spark, sf_dir, "lineitem")

    def q():
        urgent = orders.where("o_orderpriority = '1-URGENT'")
        return (
            lineitem.join(urgent, lineitem.l_orderkey == urgent.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",  # keep it a shuffle join
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
    ):
        plan = _executed(q())
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
        filtered = q().collect()

    # Result-equivalence vs the plain (broadcastable) plan.
    plain = {tuple(r) for r in q().collect()}
    assert {tuple(r) for r in filtered} == plain


def test_hll_sketches_merge_across_shards(spark, sf_dir):
    """Distributed-sketch contract: per-shard HLL sketches unioned with
    hll_union_agg estimate the SAME cardinality as one global sketch —
    the property that lets 1000 executors sketch locally and merge a
    few KB each instead of shuffling raw keys (and lets sketches be
    stored per-partition and re-merged at query time)."""
    from pyspark.sql import functions as F

    orders = catalog.table(spark, sf_dir, "orders")
    global_est = orders.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).collect()[0]["e"]
    sharded = (
        orders.groupBy(F.col("o_orderkey") % 7)  # arbitrary shards
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert sharded == global_est, "sketch merge is not lossless"
    exact = orders.select("o_custkey").distinct().count()
    assert abs(global_est - exact) / exact < 0.05

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


def test_kll_sketches_merge_across_shards(spark, sf_dir):
    """Datasketches KLL (Spark 4.1): per-shard quantile sketches merged
    with kll_merge_agg_double must (a) preserve the EXACT item count and
    (b) land every probed quantile within the sketch's normalized rank
    error (k=200 → ~1.65% two-sided) of the exact percentile — the
    mergeable-quantiles contract that replaces a global sort at 100 TB
    (histogram_quantile_prices is the exact-twin counterpart)."""
    from pyspark.sql import functions as F

    orders = catalog.table(spark, sf_dir, "orders")
    n = orders.count()
    merged = (
        orders.groupBy(F.col("o_orderkey") % 7)
        .agg(F.expr("kll_sketch_agg_double(o_totalprice)").alias("sk"))
        .agg(F.expr("kll_merge_agg_double(sk)").alias("sk"))
    )
    got_n = merged.select(F.expr("kll_sketch_get_n_double(sk)").alias("n")).collect()[0]["n"]
    assert got_n == n, "merge lost items"

    probes = [0.1, 0.5, 0.9]
    row = merged.select(
        *[
            F.expr(f"kll_sketch_get_quantile_double(sk, {q}d)").alias(f"q{i}")
            for i, q in enumerate(probes)
        ]
    ).collect()[0]
    exact = orders.select(
        F.expr(f"percentile(o_totalprice, array({', '.join(str(q) for q in probes)}))").alias("p")
    ).collect()[0]["p"]
    # rank-error bound: the sketch value's true rank is within eps of q;
    # translate to a value bound via the exact quantiles at q±eps.
    eps = 0.0165 * 2  # headroom over the one-sided 1.65% for k=200
    lo_hi = orders.select(
        F.expr(
            "percentile(o_totalprice, array("
            + ", ".join(f"{max(q - eps, 0.0)}, {min(q + eps, 1.0)}" for q in probes)
            + "))"
        ).alias("b")
    ).collect()[0]["b"]
    for i, q in enumerate(probes):
        lo, hi = lo_hi[2 * i], lo_hi[2 * i + 1]
        got = row[f"q{i}"]
        assert lo <= got <= hi, (q, got, (lo, hi), exact[i])


def test_theta_sketch_set_algebra_exact_below_k(spark, sf_dir):
    """Datasketches Theta (Spark 4.1): union / intersection / difference
    of per-predicate distinct-customer sketches. Below the sketch's
    nominal entries (4096) theta is EXACT, so the estimates must equal
    the true set cardinalities computed relationally — the set-algebra-
    on-sketches contract (HLL can union but cannot intersect)."""
    from pyspark.sql import functions as F

    orders = catalog.table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    big = orders.where(F.col("o_totalprice") > 200000)

    a = {r["o_custkey"] for r in urgent.select("o_custkey").distinct().collect()}
    b = {r["o_custkey"] for r in big.select("o_custkey").distinct().collect()}
    assert 0 < len(a) < 4096 and 0 < len(b) < 4096 and len(a | b) < 4096, (
        "testdata outgrew exact-mode premise (theta goes approximate past "
        "4096 nominal entries — including in the UNION)"
    )

    ska = urgent.select(F.expr("theta_sketch_agg(o_custkey)").alias("sk"))
    skb = big.select(F.expr("theta_sketch_agg(o_custkey)").alias("sk"))
    both = ska.crossJoin(skb.select(F.col("sk").alias("sk2")))
    got = both.select(
        F.expr("theta_sketch_estimate(theta_union(sk, sk2))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(sk, sk2))").alias("i"),
        F.expr("theta_sketch_estimate(theta_difference(sk, sk2))").alias("d"),
    ).collect()[0]
    assert got["u"] == len(a | b)
    assert got["i"] == len(a & b)
    assert got["d"] == len(a - b)

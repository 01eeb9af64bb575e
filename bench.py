"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one query per operator family, weighted toward the
shuffle-heavy shapes that dominate at 100 TB (fact-fact join+agg, windows,
signature dedup, similarity scan).

Each query runs REPS times warm (first rep discarded as warm-up for that
query's codegen/classload) and reports the MEDIAN; per-query IQR and the
rep count ride along in "spread"/"reps" so round-over-round deltas can be
judged against measured noise instead of single-shot luck. "value" is the
sum of per-query medians. Set SPARK_GRAFT_BENCH_REPS to override (min 1;
1 reproduces the old single-shot behavior).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_quantity_orders",
    "join_left_outer_customer_orders",
    "skewjoin_revenue_by_priority",
    "interval_join_clicks_after_purchase",
    "win_top3_orders_per_customer",
    "win_running_sum_customer_spend",
    "window_tumbling_hourly",
    "window_session_30m",
    "asof_join_purchase_to_click",
    "dedup_exact_keep_first",
    "minhash_signatures",
    "simhash_signatures",
    "similarity_bruteforce_top10",
    "text_stats",
    "doc_fingerprints",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_sample_spark import get_spark
    from etl_sample_spark.plans import REGISTRY

    spark = get_spark("etl-sample-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so the per-query timings measure
    # execution, not first-touch JIT/classloading.
    REGISTRY["q3_shipping_priority"].spark(spark, sf_dir).collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    # reps>1: one untimed per-query warm-up first (codegen compiles and
    # broadcast builds for THIS plan, not just the suite-global warm).
    # reps==1 skips it so the single timed run really is the old
    # single-shot behavior the docstring promises.
    warmups = 1 if reps > 1 else 0
    for name in HEADLINE:
        spec = REGISTRY[name]
        samples: list[float] = []
        n = -1
        for rep in range(reps + warmups):
            t0 = time.perf_counter()
            n = spec.spark(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if rep >= warmups:
                samples.append(dt)
        med = statistics.median(samples)
        if len(samples) >= 4:
            q = statistics.quantiles(samples, n=4)
            iqr = q[2] - q[0]
        else:
            iqr = max(samples) - min(samples)
        timings[name] = round(med, 3)
        spread[name] = round(iqr, 3)
        total += med
        print(
            f"  {name}: median {med:.2f}s IQR {iqr:.2f}s over {len(samples)} reps ({n} rows)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "reps": reps,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

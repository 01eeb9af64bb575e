"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one query per operator family, weighted toward the
shuffle-heavy shapes that dominate at 100 TB (fact-fact join+agg, windows,
signature dedup, similarity scan).
"""

from __future__ import annotations

import json
import os
import re
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

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        n = spec.spark(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"  {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

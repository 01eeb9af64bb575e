"""Measure the pin() mode decision (r16; r15 VERDICT item 2).

Times representative multi-branch pinned queries under
SPARK_GRAFT_PIN_MODE=checkpoint vs =persist (and the unpinned baseline)
so the default in etl_sample_spark/pinning.py is a measured choice, not
a guess. persist reps clear the session cache between reps — the
CacheManager would otherwise serve rep N from rep 1's cache and time a
no-op (a real session runs each query once).

Usage: python tools/pin_mode_bench.py [sf_dir] [reps]
Prints one JSON line per query: medians per mode.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

QUERIES = (
    "rfm_customer_scores",
    "hybrid_rrf_rerank",
    "simhash_cluster_assign",
    "minhash_jaccard_estimate_audit",
)

MODES = ("checkpoint", "persist", "nopin")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from etl_sample_spark import get_spark
    from etl_sample_spark.plans import REGISTRY

    spark = get_spark("pin-mode-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": sf, "reps": reps, "queries": {}}
    for name in QUERIES:
        spec = REGISTRY[name]
        res: dict = {}
        for mode in MODES:
            os.environ.pop("SPARK_GRAFT_NO_PIN", None)
            os.environ.pop("SPARK_GRAFT_PIN_MODE", None)
            if mode == "nopin":
                os.environ["SPARK_GRAFT_NO_PIN"] = "1"
            else:
                os.environ["SPARK_GRAFT_PIN_MODE"] = mode
            samples = []
            for rep in range(reps + 1):  # first rep = warm-up
                t0 = time.perf_counter()
                spec.spark(spark, sf).count()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                if rep > 0:
                    samples.append(dt)
            res[mode] = {
                "median": round(statistics.median(samples), 3),
                "min": round(min(samples), 3),
                "max": round(max(samples), 3),
            }
        out["queries"][name] = res
        print(f"  {name}: " + ", ".join(
            f"{m} {v['median']}s" for m, v in res.items()
        ), file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Isolated per-query timing sweep over the WHOLE registry (r16).

For every registered query: build the DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.1) and time a noop-sink write (guide §1.4 — eagerly
computes every column of every row, no driver collect, no optimizer
count() shortcut), one untimed warm rep then ``--reps`` timed reps
(median). Jobs are labelled with the query name so a UI/event-log read
maps stages back to queries.

This is the measurement backbone for the optimization round's
every-operator checklist: the bench covers the 31 headline queries;
this sweep puts a number and a rank on the other ~208 so "optimized /
left alone" decisions are grounded in measured cost, not guesses.

Usage:
    python tools/time_registry.py [out.json] [--reps N] [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main() -> int:
    out_path = None
    reps = 3
    only: list[str] | None = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--only":
            only = args.pop(0).split(",")
        else:
            out_path = a
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_sample_spark import get_spark
    from etl_sample_spark.plans import REGISTRY

    spark = get_spark("time-registry")
    spark.sparkContext.setLogLevel("ERROR")

    names = only if only is not None else list(REGISTRY)
    # Validate --only up front (r16 ADVICE): a typo'd name would
    # otherwise KeyError mid-sweep and lose every prior sample.
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    results: dict[str, dict] = {}

    def _flush() -> str:
        ranked = dict(sorted(results.items(), key=lambda kv: -(kv[1]["sec"] or 0)))
        line = json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": ranked})
        if out_path:
            with open(out_path, "w") as f:
                f.write(line + "\n")
        return line

    for i, name in enumerate(names):
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"time_registry: {name}")
        try:
            samples: list[float] = []
            for rep in range(reps + 1):
                t0 = time.perf_counter()
                df = spec.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if rep > 0:
                    samples.append(dt)
            results[name] = {
                "sec": round(statistics.median(samples), 3),
                "spread": round(max(samples) - min(samples), 3),
            }
            print(
                f"[{i + 1}/{len(names)}] {name}: {results[name]['sec']:.2f}s",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — sweep must cover the rest
            results[name] = {"sec": None, "err": f"{type(e).__name__}: {e}"[:200]}
            print(f"[{i + 1}/{len(names)}] {name}: ERR {e}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)
            # Incremental flush (r16 ADVICE): a multi-hour sweep killed
            # near the end keeps every completed row on disk.
            _flush()

    print(_flush())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

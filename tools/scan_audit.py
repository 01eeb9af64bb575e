"""Registry-wide redundant-scan audit (r15).

Spark re-executes a DataFrame's lineage once PER downstream plan branch
(no automatic common-subtree materialization), so a query that fans a
derived relation into several joins/aggregates silently re-scans its
source table — and re-runs every map in between — once per branch. At
bench scale that is DAG overhead; at 100 TB it multiplies the dominant
cost. This audit makes the pattern mechanical to find:

For every registry query, run it at sf0.01, parse the EXECUTED plan,
and report `Scan parquet` count vs the set of distinct tables read.
scans >> tables flags a multi-branch re-execution. Found in r15:
97/239 queries re-branched; the worst seven (hybrid_rrf 21 scans of
documents, scd2 19, minhash_jaccard_audit 16, rfm 15, dsir 12,
bm25 10, ks_two_sample 8) were fixed by localCheckpointing the SMALL
derived relations each branch consumes (never anything
token-stream-sized); rfm's isolated sf0.1 median halved.

Interpretation guide — a high count is NOT automatically a defect:
- TPC-H-style plans re-reading pruned DIMENSION tables per branch are
  usually the right trade (re-scan beats materialize for small reads).
- The defect shape is a FACT-table scan + expensive map (tokenize,
  shingle, window) repeated per branch. Fix by localCheckpointing the
  smallest bounded relation downstream of the expensive work.

Usage: python tools/scan_audit.py [sf_dir] [out.json]
Prints the flagged queries (scans > tables + 1) ranked by scan count.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scan_audit.json"

    from etl_sample_spark import session
    from etl_sample_spark.plans import REGISTRY

    spark = session.get_spark("scan-audit")
    out: dict = {}
    for name, spec in REGISTRY.items():
        try:
            df = spec.spark(spark, sf)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            scans = len(re.findall(r"Scan parquet", plan))
            tables = sorted(set(re.findall(r"/(\w+)\.parquet", plan)))
            out[name] = {"scans": scans, "tables": tables}
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            out[name] = {"err": str(e)[:200]}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)

    flagged = sorted(
        (
            (v["scans"], len(v["tables"]), k)
            for k, v in out.items()
            if "scans" in v and v["scans"] > max(1, len(v["tables"])) + 1
        ),
        reverse=True,
    )
    for scans, n_tables, name in flagged:
        print(f"{scans:3d} scans / {n_tables} tables  {name}")
    print(f"\n{len(flagged)} flagged of {len(out)}; full map in {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

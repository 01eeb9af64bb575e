"""Registry-wide redundant-scan audit (r15; committed gate since r16).

Spark re-executes a DataFrame's lineage once PER downstream plan branch
(no automatic common-subtree materialization), so a query that fans a
derived relation into several joins/aggregates silently re-scans its
source table — and re-runs every map in between — once per branch. At
bench scale that is DAG overhead; at 100 TB it multiplies the dominant
cost. This audit makes the pattern mechanical to find:

For every registry query, run it at sf0.01, parse the EXECUTED plan,
and report `Scan parquet` count vs the set of distinct tables read.
scans >> tables flags a multi-branch re-execution. Found in r15:
97/239 queries re-branched; the worst shapes were fixed by pinning the
SMALL derived relations each branch consumes (etl_sample_spark/
pinning.py — bounded aggregates only; r16's measurement showed pinning
corpus-linear relations can LOSE through broadcast degradation, see
SCALE.md r16).

Interpretation guide — a high count is NOT automatically a defect:
- TPC-H-style plans re-reading pruned DIMENSION tables per branch are
  usually the right trade (re-scan beats materialize for small reads).
- The defect shape is a FACT-table scan + expensive map (tokenize,
  shingle, window) repeated per branch. Fix by pinning the smallest
  bounded relation downstream of the expensive work.

Since r16 the audit is a REGRESSION GATE, not a one-shot: the accepted
per-query scan counts live in SCANAUDIT_r{N}.json at the repo root
(committed), and tests/test_scan_audit.py re-runs the audit (opt-in
tier, SPARK_GRAFT_SCANAUDIT_TEST=1) asserting no query's scan count
exceeds its recorded adjudication — a new query or a refactor that
silently re-branches a fact table fails the gate instead of waiting for
the next manual audit.

Usage:
  python tools/scan_audit.py [sf_dir] [out.json]
  python tools/scan_audit.py [sf_dir] [out.json] --check BASELINE.json
With --check, exits 1 if any query's scans exceed the baseline's (or a
query is missing from the baseline), printing the offenders.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def audit_query(df) -> dict:
    """Run one DataFrame and report its executed plan's parquet scans.

    Counts DISTINCT scan node instances, not textual occurrences: AQE
    reprints a reused query stage's subtree at every branch that
    references it (the stage executes once — ReusedExchange /
    stage-reuse), but a reprint carries the SAME expression ids while a
    genuinely re-executed branch gets fresh ones, so deduping the scan
    lines by their post-'Scan parquet' text is exactly the executed
    count (r16; the raw regex over-counted triangle_census 52 vs 45)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = {
        line[line.index("Scan parquet") :]
        for line in plan.splitlines()
        if "Scan parquet" in line
    }
    tables = sorted(set(re.findall(r"/(\w+)\.parquet", plan)))
    return {"scans": len(scan_lines), "tables": tables}


def audit_registry(spark, sf: str) -> dict:
    from etl_sample_spark.plans import REGISTRY

    out: dict = {}
    for name, spec in REGISTRY.items():
        try:
            out[name] = audit_query(spec.spark(spark, sf))
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            out[name] = {"err": str(e)[:200]}
    return out


def check_against(current: dict, baseline: dict) -> list[str]:
    """Regressions: queries whose scan count exceeds the committed
    adjudication, plus queries the baseline has never adjudicated."""
    problems = []
    for name, row in sorted(current.items()):
        if "err" in row:
            problems.append(f"{name}: audit error: {row['err']}")
            continue
        base = baseline.get(name)
        if base is None or "scans" not in base:
            problems.append(
                f"{name}: not in the committed scan-audit baseline — "
                "regenerate SCANAUDIT_r{N}.json and adjudicate the counts"
            )
        elif row["scans"] > base["scans"]:
            problems.append(
                f"{name}: {row['scans']} scans > adjudicated {base['scans']} "
                f"(tables {row['tables']}) — a new plan branch re-scans"
            )
    return problems


def main() -> int:
    argv = sys.argv[1:]
    check_path = None
    if "--check" in argv:
        i = argv.index("--check")
        check_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_path = argv[1] if len(argv) > 1 else "/tmp/scan_audit.json"

    from etl_sample_spark import session

    spark = session.get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = audit_registry(spark, sf)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")

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

    if check_path:
        baseline = json.load(open(check_path))
        problems = check_against(out, baseline)
        if problems:
            print(f"\nREGRESSIONS vs {check_path}:")
            for p in problems:
                print(f"  - {p}")
            return 1
        print(f"\nOK vs {check_path}: no query exceeds its adjudicated scan count")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

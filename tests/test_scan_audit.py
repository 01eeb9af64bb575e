"""The committed scan-count adjudication gate (r16; r15 VERDICT item 3).

r15's scan audit found 97/239 queries re-branching their lineage (some
re-scanning fact tables once per plan branch) and fixed the worst 25 —
but the audit was a one-shot whose adjudication lived in commit
messages. The accepted per-query scan counts now live in a COMMITTED
artifact (SCANAUDIT_r{N}.json at the repo root, newest wins), and:

- always on: the artifact must exist, cover the registry exactly, and
  contain no audit errors — a new registration cannot land without an
  adjudicated scan count;
- opt-in (SPARK_GRAFT_SCANAUDIT_TEST=1, ~driver-sim cost — run once per
  round): re-run the full audit at sf0.01 and assert no query's scan
  count exceeds its adjudication, so a refactor that silently
  re-branches a fact table fails here instead of waiting for the next
  manual audit.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_baseline() -> tuple[str, dict]:
    paths = sorted(
        glob.glob(os.path.join(ROOT, "SCANAUDIT_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    assert paths, (
        "no SCANAUDIT_r{N}.json committed — run "
        "`python tools/scan_audit.py /root/testdata/sf0.01 SCANAUDIT_r{N}.json` "
        "and commit the adjudicated counts"
    )
    return paths[-1], json.load(open(paths[-1]))


def test_scan_audit_baseline_covers_registry():
    from etl_sample_spark.plans import REGISTRY

    path, base = _latest_baseline()
    missing = sorted(set(REGISTRY) - set(base))
    assert not missing, (
        f"queries with no adjudicated scan count in {os.path.basename(path)}: "
        f"{missing} — regenerate the artifact so the new plans are adjudicated"
    )
    stale = sorted(set(base) - set(REGISTRY))
    assert not stale, f"baseline rows for unknown queries: {stale}"
    errs = {n: r["err"] for n, r in base.items() if "err" in r}
    assert not errs, f"baseline recorded audit errors: {errs}"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCANAUDIT_TEST") != "1",
    reason="full-registry executed-plan audit (~minutes); opt in with "
    "SPARK_GRAFT_SCANAUDIT_TEST=1 once per round",
)
def test_no_query_exceeds_adjudicated_scan_count(spark):
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from tools.scan_audit import audit_registry, check_against

    path, base = _latest_baseline()
    current = audit_registry(spark, "/root/testdata/sf0.01")
    problems = check_against(current, base)
    assert not problems, (
        f"scan-count regressions vs {os.path.basename(path)}:\n  "
        + "\n  ".join(problems)
    )

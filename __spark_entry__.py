"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``etl_sample_spark.plans`` (one module per SURVEY §2
operator family); this file is just the adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_sample_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-shaped: scan → filter → join → agg → sort → limit
    (SURVEY §7's minimum end-to-end slice).
    """
    return REGISTRY["q3_shipping_priority"].spark(spark, SMOKE_SF_DIR)


# The driver's CORRECTNESS run covers the first 50 queries() entries per
# round. Ordering policy (r7 VERDICT items 4+5, mechanized):
#   1. _FRONT_PINS — every query whose reachable code changed since its
#      last driver-grade check (enforced by tools/update_pin_manifest.py
#      + tests/test_pin_policy.py, which refuse dirty-but-unpinned
#      queries), plus never-checked new registrations.
#   2. The rest, OLDEST DRIVER ROW FIRST — computed from the
#      CORRECTNESS_r*.json artifacts at the repo root, so the whole
#      registry's driver evidence converges to recent rounds instead of
#      37 queries sitting on their r1 rows forever.
_FRONT_PINS = [
    # r7's one red driver row: pct_of_first was DECIMAL (stack() '1.0'
    # literal parses as DECIMAL in Spark SQL) vs the oracle's DOUBLE —
    # value-equal, hash FAIL. Fixed with CAST(... AS DOUBLE); re-pinned.
    "funnel_conversion_steps",
    # r7 pin-policy miss: operators/layout.py gained the 63-bit guard
    # but the query was not re-pinned (behavior-neutral, pytest-covered;
    # re-pinned per policy — and the policy itself is now mechanical).
    "zorder_curve_rank_parts",
    # r8 ADVICE fix: empty-graph guard + backslash escaping in the
    # VALUES emit (plans/analytics.py) — fingerprint-dirty, re-pinned.
    "pagerank_trade_network",
    # new in r8 — first driver rows
    "rolling_zscore_anomalies",
    "bpe_merge_learning",
    "similarity_pq_adc_top10",
    "similarity_pq_rerank_top10",
    "cdc_upsert_apply_customers",
    "histogram_quantile_prices",
    "user_path_analysis_daily",
    "twap_event_value_daily",
    "cross_doc_span_audit",
    "multimodal_video_delta_decode",
    "holt_linear_forecast_by_type",
    "bounded_running_balance_customers",
    "active_users_dau_wau_mau",
    "yoy_monthly_revenue",
    "new_vs_returning_weekly",
    "market_basket_part_pairs",
    "time_to_convert_distribution",
    "classifier_auc_mann_whitney",
    "classifier_decile_lift",
    # r8 review fix: classifier score/z expression deduplicated into
    # shared helpers (_qc_z_col/_qc_score_col) — value-identical,
    # fingerprint-dirty, re-pinned per policy.
    "quality_classifier_score",
    "dsir_importance_weights",
    "bpe_apply_fertility",
]


def _last_checked_rounds() -> dict[str, int]:
    """name -> latest round with a driver CORRECTNESS row (0 = never)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered() -> list[str]:
    names = list(REGISTRY)
    order = {n: i for i, n in enumerate(names)}
    pins = [n for n in _FRONT_PINS if n in names]
    last = _last_checked_rounds()
    rest = sorted(
        (n for n in names if n not in pins),
        key=lambda n: (last.get(n, 0), order[n]),
    )
    return pins + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].spark for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query.

    Queries registered with ``oracle=None`` (LSH approximate search —
    genuinely non-SQL-expressible) are omitted → driver records the
    weaker rows-only check.
    """
    return {name: REGISTRY[name].oracle for name in _ordered() if REGISTRY[name].oracle is not None}

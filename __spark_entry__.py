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
    # r12 scale-shaping of the three DIMENSION-global windows (r11
    # VERDICT item 1): RFM's three NTILEs, the Gini rank pass, and the
    # Pareto running share now go through operators/ranks.py's
    # deterministic bucketed global rank (partitioned windows only; the
    # customer/part dimension never sorts on one task). Result-invariant
    # by construction — exact ranks with the same tie-breaks, NTILE via
    # the SQL-standard formula pinned against F.ntile in test_ranks.py;
    # strict-sim green at sf0.01 + sf0.1 before pinning — but reachable
    # code changed, so they re-earn driver rows.
    "rfm_customer_scores",
    "gini_revenue_concentration",
    "abc_pareto_classification",
    # r12 mechanical re-pins (r11 ADVICE fixes, result-invariant):
    # salted_join's salt is now a deterministic function of the row
    # (pmod(xxhash64(salt_from), n) — the positional salt could re-deal
    # rows across a shuffle-fetch retry and lose/duplicate join rows);
    # the registry query salts on the (l_orderkey, l_linenumber) unique
    # key. normalize's spec compiler (_ansi_safe) became string-literal
    # aware — no current spec contains a quoted bracket, so compiled SQL
    # is unchanged, but reachable code moved.
    "skewjoin_revenue_by_priority",
    "normalize_star_rebuild",
    # r12 mechanical re-pin: bloom_probe learned to reuse an
    # already-local bitmap (bloom_build_local amortized path, r11
    # VERDICT item 4). The registry query still demonstrates the honest
    # per-invocation build — same bits, same joins, result-invariant —
    # but its reachable code changed.
    "bloom_semi_join_orders_customers",
    # r12 scale-shaping, self-found: the KS ECDF window ran over the
    # DISTINCT values of a CONTINUOUS double — jump points grow ~with
    # the event count, i.e. the corpus-global-window class mislabeled
    # as bounded. Both ECDFs now come from bucketed_global_rank
    # cumulative sums over the fixed 0.25-wide value grid.
    # Result-invariant (identical exact-integer cums, identical final
    # division); strict-sim green at sf0.01 + sf0.1 before pinning.
    "ks_two_sample_click_vs_purchase",
    # r12 broadcast audit (self-found, SCALE.md "forced hints" note):
    # F.broadcast hints are kept ONLY on relations whose size is
    # constant in SF (nation/region, 1-row scalars, fixed grids,
    # bounded shortlists). These 15 queries force-broadcast relations
    # that GROW with the data — part/supplier/customer(-derived)
    # dims, per-part aggregates, per-doc signature frames, candidate
    # pairs, name-cluster maps — i.e. guaranteed driver OOMs at the
    # 100 TB design point. The hints are removed; size statistics/AQE
    # still pick broadcast-hash joins at bench SF (plan tests pin it),
    # so join RESULTS and bench-scale plans are unchanged.
    "q2_min_cost_supplier_per_part",
    "q5_local_supplier_volume",
    "q7_volume_shipping_pairs",
    "q8_market_share",
    "q9_product_profit",
    "q14_promo_revenue_ratio",
    "q15_top_revenue_suppliers",
    "q16_supplier_count_by_part_attrs",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_suppliers_with_excess_stock",
    "q21_suppliers_kept_waiting",
    "join_theta_customer_outbalances_supplier",
    "minhash_jaccard_estimate_audit",
    "entity_resolution_part_names",
    # r12 review re-pin: asof_join gained a deterministic tie-break for
    # right rows sharing (key, ts) — partition-order pick before, the
    # cdc_apply seq-tie class. The registry query's event timestamps
    # are tie-free, so the result is invariant; reachable code changed.
    "asof_join_purchase_to_click",
]
# r11's 30 pins all landed green rows in CORRECTNESS_r11.json — cleared
# for rotation. Window math at this HEAD, recomputed from _ordered() +
# the CORRECTNESS artifacts (the r11 verdict's item 3 asked that this
# comment always match a recomputation): latest driver rows are
# 25×r6 / 31×r7 / 40×r8 / 46×r9 / 46×r10 / 50×r11. With the 23 pins
# above (one of which, rfm_customer_scores, itself sits on an r6 row),
# the 27 rotation slots retire the remaining 24 r6 rows plus 3 r7 rows:
# ALL 25 r6 rows get fresh r12 evidence and the oldest row left OUTSIDE
# the r12 window is r7 — meeting r11 VERDICT item 2's "oldest ≥ r7".
# tools/update_pin_manifest.py enforces that every further r12 code
# change either lands here or leaves its queries' fingerprints alone.


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

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
    # r10: operators/bloom.py fixed (F.shiftleft/shiftright only take a
    # Python-int shift; routed through F.call_function) and wired into
    # its first registry consumer — never driver-checked, so pinned.
    # Oracle is the plain EXISTS semi join (the bloom stage is
    # result-invariant by construction; equivalence + FP-rate + zero-
    # added-Exchange pinned in tests/test_bloom.py).
    "bloom_semi_join_orders_customers",
    # r10: Spark 4 VariantType shred (parse_json → variant_get) — new
    # registration, oracle computes the same aggregates from the base
    # columns so an encode→shred corruption hash-diverges.
    "variant_shred_events",
    # r10: Spark 4 native recursion + SQL-standard lateral correlate —
    # new registrations (engine surfaces the registry lacked: WITH
    # RECURSIVE and LATERAL ... LIMIT, both identical-SQL on DuckDB).
    "recursive_cte_trade_reachability",
    "lateral_top2_orders_per_customer",
    # r10 batch 4: Spark 4 SQL surface — pipe syntax (|> operators,
    # lowered by Catalyst to the identical nested plan), SQL UDFs
    # (scalar + composed scalar + table function, all inlined at
    # analysis time), and UTF8_LCASE collated grouping. Never
    # driver-checked, so pinned.
    "pipe_syntax_yearly_orders",
    "sql_udf_net_revenue_bands",
    "collation_ci_brand_rollup",
    # r10 batch 4 (cont.): session variables + EXECUTE IMMEDIATE INTO +
    # named-parameter SQL; SQL scripting (WHILE-loop sigma clipping,
    # oracle unrolls the identical iterations as chained CTEs).
    "session_vars_above_avg_orders",
    "sql_scripting_sigma_clip_prices",
    # r10 batch 5: continuous-ingestion + training-run plumbing (new
    # registrations): cross-snapshot dedup verdicts, deterministic
    # epoch shuffle, Spark 4 native XML round-trip, and the zero-cost
    # Observation quality gate.
    "incremental_dedup_new_vs_corpus",
    "epoch_shuffle_assignments",
    "xml_roundtrip_events",
    "observe_quality_gate_orders",
    # r10 batch 5: ANSI-mode error-safe scalar lane (try_cast /
    # try_divide / try_to_timestamp over deterministically dirty input).
    "try_functions_dirty_inputs",
    # r10 batch 5: IDENTIFIER(:name) dynamic-identifier binding +
    # GROUP BY ALL (analysis-time features; oracle is the constant-
    # inlined ANSI form).
    "identifier_group_by_all_orders",
    # r10 batch 6: exact distinct via mergeable bitmap pages
    # (construct -> shard OR-merge -> popcount; oracle COUNT DISTINCT)
    # and SQL:2023 listagg WITHIN GROUP (oracle string_agg ORDER BY).
    "bitmap_exact_distinct_customers",
    "listagg_nations_per_region",
    # r10 batch 7: MAD robust outliers (50% breakdown point vs the
    # sigma-clip family) and positional phrase retrieval (zip_with
    # bigram postings, broadcast phrase probe).
    "mad_outlier_prices_by_brand",
    "phrase_search_top_bigram",
    # r10 batch 7: single-pass Deequ-class column profiling (oracle is
    # deliberately per-column UNION ALL; engine fuses to one scan).
    "profile_columns_orders",
    # r10 batch 7: gaps-and-islands streak detection (date minus dense
    # row number is constant within a consecutive run).
    "longest_daily_streak_per_user",
    # r10 batch 8: order-dependent clamped recurrence as a JVM
    # higher-order fold (sort_array + F.aggregate; oracle list_reduce).
    "clamped_inventory_balance_suppliers",
    # r10 batch 9: exact-sum proportional allocation (largest
    # remainder, pure integer math) and change-point run-length
    # timeline compaction (lag + cumulative change flags).
    "largest_remainder_allocation",
    "state_runs_per_user",
    # r10 batch 10: period-over-period revenue bridge (exact decimal,
    # foots to the total net change by construction).
    "revenue_bridge_customers",
    # r10 batch 11: exact two-sample KS drift statistic (integer-ratio
    # ECDFs at every jump point; the shape-sensitive tier above PSI).
    "ks_two_sample_click_vs_purchase",
    # r10 batch 11: Kaplan-Meier survival over customer lifetime with
    # proper right-censoring (exp of running LN-sum = distributed
    # cumulative product).
    "kaplan_meier_customer_lifetime",
    # r10 batch 11: closed-form per-group OLS from exact moments
    # (slope/intercept/r2; normal equations, zero residual passes).
    "ols_price_on_quantity_by_flag",
    # r10 batch 12: corpus-mix diagnostics — per-doc Shannon token
    # entropy (distributional-collapse spam signal) and the Gini
    # concentration coefficient (exact-decimal Lorenz summary).
    "token_entropy_per_doc",
    "gini_revenue_concentration",
    # r10 batch 12: lag-1/lag-7 autocorrelation of daily revenue
    # (exact-moment Pearson over lagged pairs; forecasting diagnostic).
    "acf_daily_revenue",
    # r10 batch 12: chi-square independence test + Cramér's V (the
    # significance layer over the crosstab tier).
    "chi2_event_type_by_user_band",
    # r10 batch 13: exact CUSUM changepoint (n·S_k rescaling — zero
    # floats until the emitted magnitude) and Theil-Sen robust trend
    # (median of calendar-grid pairwise slopes).
    "cusum_changepoint_daily_revenue",
    "theil_sen_monthly_trend",
    # r10 batch 5 mechanical re-pins: minhash_lsh_candidates' band
    # construction was factored into minhash_band_frame (shared with the
    # incremental dedup probe) — result-invariant, but the reachable
    # code of these four changed, so they go back through the driver.
    "minhash_lsh_candidate_pairs",
    "neardup_clusters_documents",
    "semantic_dedup_keep_best",
    "minhash_jaccard_estimate_audit",
]
# r9 pins (yoy_monthly_revenue, PQ pair, video delta, twap) all landed
# green driver rows in CORRECTNESS_r09.json — cleared for rotation.


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

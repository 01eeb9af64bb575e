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
    # r16 mechanical re-pins (r15 VERDICT items 1-2): every
    # branch-sharing localCheckpoint now routes through ONE helper —
    # etl_sample_spark/pinning.py's pin() — with a SPARK_GRAFT_NO_PIN
    # guard bypass (the registry-wide plan guards build pin-free) and a
    # measured localCheckpoint/persist/reliable mode decision (SCALE.md
    # r16). Results are mode-invariant (tests/test_pinning.py asserts
    # it; strict driver-sim re-verified at sf0.01), but the refactor
    # reaches each pinned query's code closure, so the whole set
    # re-enters the driver window. The r15 pins that did NOT change
    # (revenue_bridge one-pass pivot, the seven multimodal decoder
    # queries) rotate out on their green r15 rows.
    "abc_pareto_classification",
    "active_users_dau_wau_mau",
    "bigram_lm_interpolated_score",
    "bigram_pmi_collocations",
    "bm25_score_query",
    "chi2_event_type_by_user_band",
    "classifier_decile_lift",
    "cohort_retention_matrix",
    "cohort_weekly_retention",
    "countmin_token_estimate",
    "dsir_importance_weights",
    "gapfill_hourly_interpolate",
    "gini_revenue_concentration",
    "heavy_hitters_tokens",
    # reaches the pointer-jumping loop whose truncation comment gained
    # the "deliberately NOT pinning.pin()" cross-reference (comment-only
    # for semantics, but the closure fingerprint is source-exact)
    "hierarchy_rollup_suppliers",
    "hybrid_rrf_rerank",
    "kaplan_meier_customer_lifetime",
    "ks_two_sample_click_vs_purchase",
    "mad_outlier_prices_by_brand",
    "market_basket_part_pairs",
    "minhash_jaccard_estimate_audit",
    # r16 optimization: corpus assembly now repartitions by the
    # grouping key before the collect_list groupBy (normcore.py) —
    # strict-sim re-verified at sf0.01 AND sf0.1 this round.
    "normalize_star_rebuild",
    # r16 optimization: higher-order-function subtree re-evaluation
    # fixes (zip-built _shingles, staged simhash votes, staged
    # line-dedup tokens, hoisted per-vector norms) — every query below
    # strict-sim re-verified at sf0.01 AND sf0.1 this round.
    "contamination_3gram_vs_benchmark",
    "decontaminated_split_audit",
    "entity_resolution_part_names",
    "embedding_neardup_clusters",
    "embedding_neardup_pairs",
    "incremental_dedup_new_vs_corpus",
    "line_dedup_boilerplate",
    "minhash_lsh_candidate_pairs",
    "minhash_signatures",
    "neardup_clusters_documents",
    "ngram_jaccard_sample_pairs",
    "semantic_dedup_keep_best",
    "similarity_ivf_indexed_top10",
    "similarity_ivf_top10",
    "simhash_neardup_pairs",
    "simhash_signatures",
    "text_repetition_ratio",
    "new_vs_returning_weekly",
    "rfm_customer_scores",
    "scd2_customer_segment_migration",
    "simhash_cluster_assign",
    "triangle_census_trade_network",
    "unigram_logprob_score",
]
# r14's 8 pins all landed green rows in CORRECTNESS_r14.json (50/50
# green) — skewjoin_revenue_by_priority rotates out (its r14 fix is
# green and untouched this round); the 7 multimodal pins carry over
# because this round's ADVICE fixes re-dirty them. Window math at this
# HEAD, recomputed from _ordered() + the CORRECTNESS artifacts:
# front-50 = 1 new registration + 32 pins (ADVICE re-pins + three
# scan-audit batches) + ALL 14 remaining r9 rows + the 3 stalest r10
# rows; the oldest driver row OUTSIDE the window is r10 — so after
# r15's driver run the registry's oldest row anywhere is r10, meeting
# r14 VERDICT item 4. The scan-audit pins were capped here precisely
# so every r9 row still fits in the window.
# tools/update_pin_manifest.py enforces that every further r15 code
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

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
    # r11 fix of the r10 round's one red driver row: the KS oracle left
    # n1/n2 as DuckDB HUGEINT and widened the ECDF division through
    # DECIMAL(38,1) — equal values, driver-hash divergence. Both sides
    # now CAST BIGINT + explicit DOUBLE division + ROUND(,6); must
    # re-earn a green rows+schema+hash row.
    "ks_two_sample_click_vs_purchase",
    # r11 scale-shaping of the three corpus-global windows the r10
    # verdict flagged (result-invariant by construction — exact .5-grid
    # rank sums / identical NTILE bucket arithmetic / identical
    # count-greater rank — but reachable code changed, so they go back
    # through the driver): AUC rank-sum now built from the bounded
    # 1e-6 score grid; decile lift reconstructs positions from grid
    # offsets + per-score tiebreak rank; RRF ranks via TakeOrdered
    # top-50 + broadcast count-greater instead of two corpus windows.
    "classifier_auc_mann_whitney",
    "classifier_decile_lift",
    "hybrid_rrf_rerank",
    # r11 mechanical re-pin: operators/scd.py grew the per-key
    # effective_col grain (r10 ADVICE fix for the streaming CDC path);
    # this batch query still uses the scalar grain and is
    # result-invariant, but its reachable code changed.
    "scd2_customer_segment_migration",
    # r11 mechanical re-pin: bloom_probe now materializes the bitmap
    # into a local relation instead of caching it (r10 ADVICE — the
    # cache leaked a session-lifetime InMemoryRelation per invocation).
    # Result-invariant (same bits, same joins), reachable code changed.
    "bloom_semi_join_orders_customers",
    # r11 mechanical re-pin: cdc_apply gained a deterministic tie-break
    # beyond the sequence column (review finding — seq ties were picked
    # by partition order). The registry query's seq is o_orderkey,
    # which is UNIQUE, so the result is invariant; reachable code
    # changed, so it re-earns its driver row.
    "cdc_upsert_apply_customers",
    # r11 mechanical re-pins from the layout-tier review: salted_join's
    # salt is now positional (whole-row-hash salting degenerated to one
    # reducer on byte-identical hot-key rows) plus n_salts/_salt guards
    # — join results invariant, the salt never survives the join;
    # pagerank gained empty-graph and stale-edge guards around the
    # unchanged iteration math.
    "skewjoin_revenue_by_priority",
    "pagerank_trade_network",
    # r11 semantic-core review re-pins (21 queries, all strict-sim
    # green at sf0.01 + sf0.1 before pinning): ANSI-crash hardening
    # made reachable code change under them — try_to_timestamp in the
    # compact reassembly (ts_reassemble + normalize consumers),
    # bigint-safe fingerprint arithmetic (doc_fingerprints + every
    # fingerprint-gated split/sample/pack query), the zero-vector
    # cosine guard (all similarity/semantic-dedup queries), the
    # 10-digit phone redaction pattern (pii queries — the PATTERN
    # constant feeds Spark and oracle alike, so both sides moved
    # together), and the [0]→try_element_at spec compilation
    # (normalize_star_rebuild). All result-invariant on the driver
    # data except the pii pair, where both engines changed identically.
    "ts_reassemble_compact",
    "text_stats",
    "text_quality_and_lang",
    "doc_fingerprints",
    "similarity_bruteforce_top10",
    "similarity_lsh_top10",
    "embedding_neardup_pairs",
    "similarity_ivf_top10",
    "similarity_ivf_indexed_top10",
    "similarity_batch_top5",
    "embedding_neardup_clusters",
    "semantic_dedup_keep_best",
    "corpus_curation_pipeline",
    "train_val_test_split",
    "hash_stratified_sample_by_lang",
    "sequence_packing_512",
    "text_scrub_pii",
    "corpus_prep_end_to_end",
    "decontaminated_split_audit",
    "lang_confusion_matrix",
    "normalize_star_rebuild",
]
# r10 pins (bloom join, variant shred, the Spark 4 SQL-surface batch,
# the batch 5-13 registrations, and the four minhash re-pins) all landed
# green driver rows in CORRECTNESS_r10.json — cleared for rotation.
# With 9 pins (one of which itself sits on an r6 row) the 50-slot
# window covers ALL remaining r5 and r6 rows this round — verified by
# recomputing _ordered() against the CORRECTNESS artifacts: the window
# holds 9 r5 + 33 r6 + the pins, and the oldest row left OUTSIDE is r7,
# exceeding r10 VERDICT item 3's "oldest ≥ r6".


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

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
    # r13 mechanical re-pins — the four r12 ADVICE fixes, each
    # result-invariant for the registered query but reachable-code
    # dirty (strict-sim green at sf0.01 + sf0.1 before pinning):
    # - skew.py now WARNS when falling back to the whole-row salt hash
    #   (byte-identical duplicates degrade the spread silently); the
    #   registry query passes salt_from, so only the docstring/guard
    #   moved.
    "skewjoin_revenue_by_priority",
    # - normalize's _ansi_safe literal guard extended to double-quoted
    #   and backslash-escaped literals and backtick identifiers; no
    #   current spec contains any quoted bracket, compiled SQL is
    #   unchanged.
    "normalize_star_rebuild",
    # - bloom_probe's local-bitmap fast path now requires the
    #   bloom_build_local schema tag (an arbitrary caller LogicalRDD
    #   re-evaluated per hash position before) and bound-checks the
    #   collect at num_bits/64 rows; the registry query builds lazily,
    #   so it exercises the bounded-collect path as before.
    "bloom_semi_join_orders_customers",
    # - asof_join carries the right row's value columns as ONE struct
    #   through last(ignorenulls) — per-column carry could mix columns
    #   from different tied right rows when the winner held a null; the
    #   registry query carries a single non-null column and its (key,
    #   ts) ties are value-identical, so results are unchanged.
    "asof_join_purchase_to_click",
    # r13 decoder swap-in (r12 VERDICT item 5): _decode_png now
    # dispatches to a numpy-vectorized unfilter twin (bit-identical
    # output, pinned byte-for-byte in tests; Pillow hook wired but
    # absent in-container). All queries reaching operators/multimodal.py
    # re-earn driver rows; four of the six sit on r7 evidence and were
    # rotating into this window regardless.
    "multimodal_bmp_decode",
    "multimodal_png_decode",
    "multimodal_jpeg_decode",
    "multimodal_jpeg_color_decode",
    "multimodal_gif_decode",
    "multimodal_resize_stats",
    # r13 JPEG decoder swap-in (extends the PNG demonstration to the
    # worst documented multimodal constant): _decode_jpeg now dispatches
    # to a numpy twin (LUT Huffman + exact-order vectorized IDCT,
    # bit-identical, test-pinned). The MJPEG framesample query reaches
    # _decode_jpeg via the AVI path; the jpeg/resize queries above were
    # already pinned.
    "multimodal_mjpeg_framesample",
]
# r12's 23 pins all landed green rows in CORRECTNESS_r12.json (verified
# by recomputation this round) — cleared for rotation. Window math at
# this HEAD, recomputed from _ordered() + the CORRECTNESS artifacts:
# latest driver rows are 26×r7 / 39×r8 / 34×r9 / 44×r10 / 45×r11 /
# 50×r12 (+ the demoted, unregistered stratified_sample_by_lang on r5).
# With the 11 pins above (4 mechanical re-pins on r12 rows + 7
# decoder-swap pins, of which 4 themselves sit on r7 rows), the 39
# rotation slots retire the remaining 22 r7 rows plus the 17 stalest
# r8 rows. Recomputed window mix: 26×r7 + 17×r8 + 1×r10 + 1×r11 +
# 5×r12; ALL 26 r7 rows are inside and the oldest row left OUTSIDE
# the r13 window is r8 — meeting r12 VERDICT item 3's "oldest ≥ r8".
# tools/update_pin_manifest.py enforces that every further r13 code
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

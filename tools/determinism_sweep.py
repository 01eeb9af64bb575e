"""Registry-wide retry/partitioning determinism sweep.

The one bug class the per-round reviews kept finding by hand — results
that depend on physical partitioning rather than data (the r11
cdc_apply seq-tie, the r12 as-of right-timestamp tie) — is mechanical
to detect: run every registry query under two DELIBERATELY different
physical layouts and require bit-identical normalized output.

Two layout levers, both needed (r13 negative control: a deliberately
planted row_number-over-ties bug SURVIVED partition-count variation
alone — local-mode shuffles fetch map outputs in reproducible order
and the small test parquet is one row group, unsplittable by
maxPartitionBytes, so counts alone never vary row ARRIVAL order):

1. Physical confs: 32 vs 7 shuffle partitions, 128 MB vs 64 KB scan
   splits, different default parallelism.
2. A seeded SCAN SCRAMBLE, injected by monkeypatching catalog.table
   (every registry query routes through it via each module's ``_t``):
   each scan is dealt across partitions and reordered within them by
   xxhash64(seed, *row) — deterministic given the seed, different
   between layouts — the local-mode stand-in for cross-executor fetch
   races and retry re-deals.

Anything partition-order-dependent — a window ordering that is not a
TOTAL order on ties, an unsorted collect_list surfaced to output, a
first()/last() over an under-specified frame, a nondeterministic join
key — shows up as a value diff. The planted bug above IS caught under
the scramble (verified before trusting a green sweep).

Float caveat handled head-on, not waved off: double SUM/AVG across
partitions is legitimately order-dependent in the last ulps, so a
strict bit-compare would cry wolf on well-designed queries. The repo's
oracle discipline already forces exact types (DECIMAL sums, exact-int
ratios) wherever the driver hash needs stability, so this sweep
compares at full float repr EXCEPT a relative 1e-9 tolerance applied
only when both sides are floats — tighter than the driver's 9dp
normalization, loose enough to ignore summation-order ulps. Everything
non-float must match EXACTLY.

Usage:
    python tools/determinism_sweep.py                  # all, sf0.001
    python tools/determinism_sweep.py name1 name2 ...  # subset
    python tools/determinism_sweep.py --selftest       # harness soundness
    SWEEP_SF_DIR=/root/testdata/sf0.01 python tools/determinism_sweep.py

--selftest proves the harness is not vacuously green: a planted
row_number-over-ties bug must DIFF between layouts and its
totally-ordered twin must not. Run it whenever the layout levers
change.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")
ONLY = set(sys.argv[1:])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # Row (nested struct)
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    return v


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()]
    out.sort(key=repr)
    return cols, out


def _cells_equal(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) == 2 and a[0] == "f" and b[0] == "f":
            x, y = a[1], b[1]
            if x == y:
                return True
            return abs(x - y) <= 1e-9 * max(abs(x), abs(y))
        if len(a) != len(b):
            return False
        return all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def _diff(rows_a, rows_b) -> str | None:
    if len(rows_a) != len(rows_b):
        return f"row count {len(rows_a)} vs {len(rows_b)}"
    for i, (ra, rb) in enumerate(zip(rows_a, rows_b)):
        if not _cells_equal(ra, rb):
            return f"row {i}: {ra!r} vs {rb!r}"
    return None


def _install_scramble(seed: int) -> None:
    """Monkeypatch catalog.table so every scan arrives deterministically
    scrambled by `seed`: dealt over 5 partitions and sorted within them
    by a seeded whole-row hash. Different seeds → genuinely different
    row orders into every downstream sort/window/aggregate."""
    from pyspark.sql import functions as F

    from etl_sample_spark import catalog

    base = getattr(catalog, "_sweep_base_table", None) or catalog.table
    catalog._sweep_base_table = base

    def scrambled(spark, sf_dir, name):
        df = base(spark, sf_dir, name)
        h = F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
        return df.repartition(5, F.pmod(h, F.lit(64))).sortWithinPartitions(
            F.pmod(h, F.lit(997))
        )

    catalog.table = scrambled


def _selftest() -> int:
    """Planted-bug control: the harness must flag a window whose ordering
    is not total on ties, and must NOT flag its totally-ordered twin."""
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    def planted(spark, sf_dir):
        from etl_sample_spark import catalog

        ev = catalog.table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("event_type")  # all ties
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("event_type", "event_id")
        )

    def sound(spark, sf_dir):
        from etl_sample_spark import catalog

        ev = catalog.table(spark, sf_dir, "events")
        w = Window.partitionBy("event_type").orderBy("event_type", "event_id")
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("event_type", "event_id")
        )

    res = {}
    for tag, seed, sp in (("A", 11, "32"), ("B", 977, "7")):
        _install_scramble(seed)
        spark = (
            SparkSession.builder.master("local[8]")
            .appName(f"sweep-selftest-{tag}")
            .config("spark.sql.shuffle.partitions", sp)
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        res[tag] = (_rows(planted(spark, SF_DIR)), _rows(sound(spark, SF_DIR)))
        spark.stop()
    d_bug = _diff(res["A"][0][1], res["B"][0][1])
    d_ok = _diff(res["A"][1][1], res["B"][1][1])
    print("planted tie bug:", f"DETECTED ({d_bug})" if d_bug else "NOT DETECTED")
    print("totally-ordered twin:", f"FALSE POSITIVE ({d_ok})" if d_ok else "clean")
    return 0 if (d_bug and not d_ok) else 1


def main() -> int:
    from pyspark.sql import SparkSession

    from etl_sample_spark.plans import REGISTRY

    if "--selftest" in sys.argv:
        return _selftest()

    names = [n for n in sorted(REGISTRY) if not ONLY or n in ONLY]

    layouts = {
        "A": (
            11,
            {
                "spark.sql.shuffle.partitions": "32",
                "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
                "spark.default.parallelism": "32",
            },
        ),
        "B": (
            977,
            {
                "spark.sql.shuffle.partitions": "7",
                "spark.sql.files.maxPartitionBytes": str(64 * 1024),
                "spark.default.parallelism": "5",
            },
        ),
    }

    results: dict[str, dict[str, tuple]] = {}
    for tag, (seed, confs) in layouts.items():
        _install_scramble(seed)
        builder = (
            SparkSession.builder.master("local[8]")
            .appName(f"determinism-sweep-{tag}")
        )
        for k, v in confs.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        for name in names:
            try:
                cols, rows = _rows(REGISTRY[name].spark(spark, SF_DIR))
                results.setdefault(name, {})[tag] = (cols, rows)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                results.setdefault(name, {})[tag] = ("<error>", repr(exc))
        spark.stop()

    failures = []
    for name in names:
        a = results[name].get("A")
        b = results[name].get("B")
        if a is None or b is None or a[0] == "<error>" or b[0] == "<error>":
            failures.append((name, f"error: A={a!r:.200s} B={b!r:.200s}"))
            continue
        if a[0] != b[0]:
            failures.append((name, f"columns {a[0]} vs {b[0]}"))
            continue
        d = _diff(a[1], b[1])
        if d:
            failures.append((name, d))
        else:
            print(f"[ok] {name}: {len(a[1])} rows layout-invariant")
    for name, why in failures:
        print(f"[DIFF] {name}: {why}")
    print(f"==> {len(names) - len(failures)}/{len(names)} layout-invariant; "
          f"failures: {[n for n, _ in failures]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

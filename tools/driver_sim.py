"""Driver simulator: vanilla SparkSession + DuckDB oracle comparison.

Mirrors the grading driver: imports __spark_entry__, runs entry() plus
every queries() entry at SF_DIR, compares against oracle_sql() via
DuckDB — row count + sorted column names + per-column TYPE CATEGORY
(the driver's hash is type-sensitive: DECIMAL vs DOUBLE fails on equal
values) + order-insensitive normalized value multiset.

Usage:
    python tools/driver_sim.py                    # all queries, sf0.01
    python tools/driver_sim.py q1 q2 ...          # only these queries
    DRIVE_SF_DIR=/root/testdata/sf0.1 python tools/driver_sim.py

(The verify skill historically recreated this at /tmp, which is wiped
between rounds — this in-repo copy is the durable one.)
"""
from __future__ import annotations

import datetime
import math
import os
import sys
import traceback

import duckdb

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
# Strict mode (DRIVE_STRICT=1): bit-level float comparison via repr()
# plus a type tag on every value, mirroring the grading driver's hash
# being stricter than the default 9dp normalization. The r10 escape:
# ks_two_sample's oracle emitted a DECIMAL(38,1)-intermediate double
# that agreed to 9dp but not to the last ulp — default sim green,
# driver red. Run strict on every NEW registration before pinning.
STRICT = os.environ.get("DRIVE_STRICT", "") == "1"
ONLY = set(sys.argv[1:])  # optional: query names to restrict to

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if STRICT:
            return f"float:{v!r}"  # repr round-trips the exact double
        return f"{round(v, 9):.9f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        if STRICT:
            # A Decimal reaching the hash at all is a seam: the engines
            # sum/divide to different precisions. Tag it so it can never
            # string-equal a float from the other engine.
            return f"decimal:{v}"
        return f"{round(float(v), 9):.9f}"
    if STRICT and isinstance(v, int):
        return f"int:{v}"
    return str(v)


_CAT_SPARK = None  # lazy import guard


def spark_cat(dt):
    # Decimal is compared PRECISION-EXACT, not as a category: the driver
    # hash is dtype-exact — r8's yoy_monthly_revenue failed with equal
    # values because Spark sums DECIMAL(18,2) to decimal(28,2) while
    # DuckDB sums to DECIMAL(38,2). Repo convention: never emit raw
    # decimal driver-facing; cast to DOUBLE (oracle side via VARCHAR
    # round-trip, q1 precedent).
    from pyspark.sql import types as T
    if isinstance(dt, T.DecimalType): return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, (T.DoubleType, T.FloatType)): return "float"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)): return "int"
    if isinstance(dt, T.BooleanType): return "bool"
    if isinstance(dt, T.TimestampType): return "timestamp"
    if isinstance(dt, T.DateType): return "date"
    if isinstance(dt, T.StringType): return "string"
    return type(dt).__name__


def duck_cat(t):
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal" + t[len("DECIMAL"):].replace(" ", "")
    if t in ("DOUBLE", "FLOAT", "REAL"): return "float"
    if t in ("TINYINT","SMALLINT","INTEGER","BIGINT","HUGEINT","UTINYINT","USMALLINT","UINTEGER","UBIGINT"): return "int"
    if t == "BOOLEAN": return "bool"
    if t.startswith("TIMESTAMP"): return "timestamp"
    if t == "DATE": return "date"
    if t == "VARCHAR": return "string"
    return t


def canon(cols, rows):
    import pandas as pd

    # pandas canonicalization, like the driver: DataFrame -> sort columns
    # by name -> sort_values over all columns -> normalized tuples.
    df = pd.DataFrame(rows, columns=cols)[sorted(cols)]
    df = df.sort_values(by=sorted(cols), kind="mergesort").reset_index(drop=True)
    out = []
    for t in df.itertuples(index=False):
        out.append(tuple(norm(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NaT else v) for v in t))
    return sorted(out)


def main():
    builder = SparkSession.builder.master("local[8]").appName("drive-driver-contract")
    # Off-SF tiers (the 10x heavy-tail slice) collect multi-million-row
    # results for the value comparison; the grading contract itself runs
    # at sf0.01 where the vanilla default suffices. Opt-in only — unset
    # keeps the session exactly driver-vanilla.
    if os.environ.get("DRIVE_DRIVER_MEM"):
        builder = builder.config("spark.driver.memory", os.environ["DRIVE_DRIVER_MEM"])
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written tables (e.g. the synthesized 10x dataset)
            # are directories of part files; driver parquet is a file.
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    ent = e.entry(spark)
    n = len(ent.collect())
    print(f"entry(): {n} rows, schema={ent.columns}")
    assert n >= 0

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    ok = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"[rows-only] {name}: {len(rows)} rows OK")
                ok += 1
                continue
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
            assert sorted(cols) == sorted(dcols), f"schema {sorted(cols)} != {sorted(dcols)}"
            scat = {f.name: spark_cat(f.dataType) for f in df.schema.fields}
            dcat = {c: duck_cat(t) for c, t in zip(dcols, rel.types)}
            mism = {c: (scat[c], dcat[c]) for c in scat if scat[c] != dcat.get(c)}
            assert not mism, f"type-category mismatch {mism} (driver hash is type-sensitive)"
            if STRICT:
                # Width-exact integer check: the r10 KS red row had equal
                # values and matching categories but DuckDB HUGEINT vs
                # Spark BIGINT — the driver hash distinguishes them.
                # Spark can't emit a 128-bit int, so any DuckDB HUGEINT/
                # UBIGINT reaching the oracle output is an unCASTed SUM().
                wide = [c for c, t in zip(dcols, rel.types)
                        if str(t).upper() in ("HUGEINT", "UBIGINT")]
                assert not wide, (
                    f"oracle emits 128-bit/unsigned int column(s) {wide}: "
                    "CAST(... AS BIGINT) in the oracle (driver hash is "
                    "width-exact; r10 ks_two_sample precedent)"
                )
            decs = [c for c, v in scat.items() if v.startswith("decimal")]
            assert not decs, (
                f"raw decimal output column(s) {decs}: banned driver-facing "
                "(engines sum to different precisions; cast to DOUBLE, "
                "oracle via VARCHAR round-trip — q1 precedent)"
            )
            assert len(rows) == len(drows), f"rows {len(rows)} != {len(drows)}"
            s = canon(cols, rows)
            d = canon(dcols, drows)
            bad = [(a, b) for a, b in zip(s, d) if a != b]
            assert not bad, f"value mismatch (first 3): {bad[:3]}"
            print(f"[ok] {name}: {len(rows)} rows")
            ok += 1
        except Exception as ex:
            traceback.print_exc()
            failures.append((name, str(ex)[:200]))
    print(f"==> {ok}/{ok + len(failures)} OK; failures: {failures}")
    spark.stop()


if __name__ == "__main__":
    main()

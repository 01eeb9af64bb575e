"""Single-pass column profiling — the Deequ/Great-Expectations-class
data-profile report as one Spark aggregate.

For every column: row count, null count, EXACT distinct count, and
type-appropriate min/max (numerics in a double column, strings/dates as
ISO strings). Everything is computed in ONE scan — the per-column
aggregates land in one wide row (Catalyst plans the multi-countDistinct
via Expand, still a single pass over the data) which is then unpivoted
to the long report with ``stack`` — so profiling a 100 TB table costs
one read, not one read per column. Scale caveat (r12 review): the
Expand duplicates each input row once per distinct-aggregate, so the
shuffle INTO the aggregation is ~n_cols× the scan — exact NDV is the
point of this report, but for routine monitoring of very wide tables
swap ``countDistinct`` for ``approx_count_distinct`` (HLL, no Expand)
and keep the exact form for audits.

[EXT] engine utility; the reference has no profiling surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, spark min/max builder) — numerics report through min_num/max_num
# (rounded to 2dp on the exact decimal-ish grids used here), strings
# compare lexicographically, dates/timestamps report as ISO date strings.


def _agg_exprs(col: str, kind: str) -> list[Column]:
    c = F.col(col)
    # count() is 0 (never NULL) over zero rows — matches the oracle's
    # COUNT(*) - COUNT(col) on empty input, where SUM would yield NULL.
    n_null = F.count(F.when(c.isNull(), F.lit(1))).cast("bigint").alias(f"{col}__nn")
    ndv = F.countDistinct(c).cast("bigint").alias(f"{col}__ndv")
    if kind == "num":
        lo = F.round(F.min(c).cast("double"), 2).alias(f"{col}__lo")
        hi = F.round(F.max(c).cast("double"), 2).alias(f"{col}__hi")
        los = F.lit(None).cast("string").alias(f"{col}__los")
        his = F.lit(None).cast("string").alias(f"{col}__his")
    elif kind == "str":
        lo = F.lit(None).cast("double").alias(f"{col}__lo")
        hi = F.lit(None).cast("double").alias(f"{col}__hi")
        los = F.min(c).alias(f"{col}__los")
        his = F.max(c).alias(f"{col}__his")
    elif kind == "date":
        lo = F.lit(None).cast("double").alias(f"{col}__lo")
        hi = F.lit(None).cast("double").alias(f"{col}__hi")
        los = F.min(c.cast("date")).cast("string").alias(f"{col}__los")
        his = F.max(c.cast("date")).cast("string").alias(f"{col}__his")
    else:
        raise ValueError(f"unknown profile kind {kind!r} for column {col!r}")
    return [n_null, ndv, lo, hi, los, his]


def profile_columns(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Long-format profile of ``specs`` = [(column, kind)] with kind in
    {'num', 'str', 'date'}: one row per column with
    (column_name, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str). One scan regardless of column count."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for col, kind in specs:
        aggs.extend(_agg_exprs(col, kind))
    wide = df.agg(*aggs)
    groups = ", ".join(
        f"'{col}', {col}__nn, {col}__ndv, {col}__lo, {col}__hi, {col}__los, {col}__his"
        for col, _ in specs
    )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(specs)}, {groups}) AS "
            "(column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("column_name")


def profile_oracle_sql(table: str, specs: list[tuple[str, str]]) -> str:
    """The DuckDB twin: one UNION ALL branch per column (the oracle is
    allowed to be multi-pass; the ENGINE side is what must be one scan)."""
    parts = []
    for col, kind in specs:
        if kind == "num":
            lo = f"ROUND(CAST(MIN({col}) AS DOUBLE), 2)"
            hi = f"ROUND(CAST(MAX({col}) AS DOUBLE), 2)"
            los, his = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            lo, hi = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            los, his = f"MIN({col})", f"MAX({col})"
        else:
            lo, hi = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            los = f"CAST(MIN(CAST({col} AS DATE)) AS VARCHAR)"
            his = f"CAST(MAX(CAST({col} AS DATE)) AS VARCHAR)"
        parts.append(
            f"SELECT '{col}' AS column_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({col}) AS n_null, "
            f"COUNT(DISTINCT {col}) AS n_distinct, "
            f"{lo} AS min_num, {hi} AS max_num, {los} AS min_str, {his} AS max_str "
            f"FROM {table}"
        )
    return "\n    UNION ALL\n    ".join(parts) + "\n    ORDER BY column_name"

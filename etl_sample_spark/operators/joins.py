"""As-of join (SURVEY §2.6 J6) — nearest-prior-event join.

Spark has no built-in as-of join. The naive formulation (range join +
``row_number() == 1``) explodes to O(|L|·|R| / keys) intermediate rows —
fatal at 100 TB. This implementation uses the union-sort trick instead:

1. tag both sides and union them (no join at all),
2. one shuffle: hash-partition by key, sort by (ts, side) within
   partitions,
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding window
   propagates the most recent right-side value onto every left row,
4. filter back to left rows.

Cost: a single exchange + in-partition sort — the same shape as a
sort-merge join, with no row multiplication. Skewed keys are handled by
AQE; ties at equal timestamps resolve right-before-left, matching the
inclusive (``left.ts >= right.ts``) as-of convention used by DuckDB's
ASOF JOIN and pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` and the same ``on`` key.

    ``value_cols`` are the right-side columns to carry; they appear in the
    output as ``<col><suffix>`` (null when no prior right row exists).
    """
    carried = [f"{c}{suffix}" for c in value_cols]

    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(cc) for c, cc in zip(value_cols, carried)],
    )
    rhs = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
    )

    # Right rows sort before left rows at the same timestamp so an exact-ts
    # match is visible to the left row (inclusive as-of). Among RIGHT rows
    # sharing (key, ts) the carried tuple itself is the final tie-break
    # (ascending, nulls first → ``last`` picks the lexicographically
    # GREATEST tuple): without it the pick is partition-order-dependent —
    # the same silent nondeterminism class as the r11 cdc_apply seq-tie
    # finding (r12 review). Order among LEFT ties is irrelevant: their
    # carried columns are all-null and ignorenulls skips them.
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            *[F.col(cc).asc_nulls_first() for cc in carried],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).select(
        "__is_left",
        "__left_row",
        *[F.last(cc, ignorenulls=True).over(w).alias(cc) for cc in carried],
    )
    out = merged.where(F.col("__is_left") == 1).select("__left_row.*", *carried)
    return out

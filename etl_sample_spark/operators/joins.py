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

    # The carried columns travel as ONE struct, not per-column: per-column
    # last(ignorenulls=True) could assemble an output mixing values from
    # DIFFERENT right rows when the tie-winning row has a null in some
    # carried column (the null is skipped for that column only — r12
    # ADVICE). The struct is non-null for every right row (even when all
    # its fields are null) and null for left rows, so one
    # last(ignorenulls) picks the winning right row ATOMICALLY.
    vals_t = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals")
    ).schema["__vals"].dataType

    lhs = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left_row"),
        F.lit(None).cast(vals_t).alias("__vals"),
    )
    rhs = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
    )

    # Right rows sort before left rows at the same timestamp so an exact-ts
    # match is visible to the left row (inclusive as-of). Among RIGHT rows
    # sharing (key, ts) the carried struct itself is the final tie-break
    # (Spark orders structs field-by-field, nulls first under asc →
    # ``last`` picks the greatest tuple, field-lexicographically, null
    # fields lowest): without it the pick is partition-order-dependent —
    # the same silent nondeterminism class as the r11 cdc_apply seq-tie
    # finding (r12 review). Order among LEFT ties is irrelevant: their
    # __vals struct is null and ignorenulls skips them.
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            F.col("__vals").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).select(
        "__is_left",
        "__left_row",
        F.last("__vals", ignorenulls=True).over(w).alias("__vals"),
    )
    out = merged.where(F.col("__is_left") == 1).select(
        "__left_row.*",
        *[
            F.col("__vals").getField(c).alias(cc)
            for c, cc in zip(value_cols, carried)
        ],
    )
    return out

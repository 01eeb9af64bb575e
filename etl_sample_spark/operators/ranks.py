"""Scale-shaped exact global ranks: ROW_NUMBER / running sums over a
total order WITHOUT an unpartitioned window.

``Window.orderBy(...)`` with no partitionBy moves the ENTIRE input to
one partition — fine for a bounded grid, a single-task OOM for a
dimension (the customer dimension is ~1.5 B rows at TPC-H-shaped
100 TB; the r11 verdict's remaining scale-killer class). The classic
fix is a two-pass range-partitioned rank (repartitionByRange →
per-partition counts → broadcast cumulative offsets), but Spark's
RangePartitioner SAMPLES its boundaries with a seed derived from the
physical RDD id: two actions (or an exchange that isn't reused) can
place the same row in different partitions, so offsets collected in
one job silently mismatch the partitioning of the next — the same
nondeterministic-shuffle-key hazard class as SPARK-23207. This module
instead buckets on a DETERMINISTIC, caller-chosen coarse key that is
monotone along the total order, so every stage is a pure function of
the row and survives task retries, stage recomputes, and AQE replans
bit-identically:

1. rows → buckets via the monotone bucket column(s) (no shuffle yet;
   the bucket is just an expression);
2. a tiny grid aggregation (one row per OCCUPIED bucket: counts +
   value sums) — map-side combinable, output ≈ thousands of rows;
3. exclusive prefix offsets over the grid, computed WITHOUT a global
   window: a window partitioned by a super-bucket handles the
   within-super-bucket prefix, and a bounded broadcast count-greater
   self-join (the llm.py:1963 RRF pattern) handles the across-super-
   bucket offsets — the super-bucket relation is ≤ ~hundreds of rows,
   so the inequality join is a trivial broadcast nested loop;
4. offsets broadcast-join back to the rows; the final rank is
   ``bucket_offset + row_number() OVER (PARTITION BY bucket ORDER BY
   order_cols)`` — every window in the plan is partitioned.

Cost: one extra small aggregation + one broadcast join versus the
single-partition sort; the per-task window input shrinks from n to
n / n_buckets. The caller picks the bucket granularity (a natural
integer grid, or ``floor(value / W)`` for a continuous key) so that
per-bucket groups stay task-sized and the grid stays broadcast-sized —
both documented per call site.

Reference analog: none (the reference has no window functions at all);
[EXT] scale infrastructure for the RFM / Pareto / Gini ranking tier.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_global_rank(
    df: DataFrame,
    bucket_cols: Sequence[str],
    order_cols: Sequence[Column],
    super_bucket: Column,
    *,
    rank_name: str = "rank",
    cum_sums: Mapping[str, Column] | None = None,
    with_totals: bool = False,
    grid_from: DataFrame | None = None,
) -> DataFrame:
    """Exact global ``row_number`` (and optional inclusive running sums)
    over the total order ``order_cols``, with no unpartitioned window.

    Contract the caller must hold (each call site documents how):

    - ``order_cols`` is a TOTAL order: a deterministic tie-break column
      (a key) is last, and every ordering column is non-null. Bucket
      columns must be non-null too (they are equi-join keys back to the
      rows — a null bucket would silently drop its rows).
    - ``bucket_cols`` are columns ALREADY ON ``df``, and their
      lexicographic order is monotone non-decreasing along
      ``order_cols`` (e.g. ``floor(value / W)`` for an ascending value
      key; negate first for a descending key). Rows that compare equal
      under a PREFIX of ``order_cols`` may share a bucket — the
      within-bucket window re-sorts by the full order.
    - ``super_bucket`` is an expression over the bucket columns, also
      monotone along the bucket order, with SMALL cardinality
      (≤ ~hundreds): it bounds the count-greater self-join at
      |super_buckets|² pairs.
    - Granularity: per-bucket row groups should be task-sized
      (≤ ~low millions) and the occupied-bucket grid broadcast-sized
      (≤ ~hundreds of thousands).

    Returns ``df`` plus:

    - ``rank_name``: bigint, 1-based global row number;
    - one inclusive running-sum column per ``cum_sums`` entry
      (``name -> value expression``), summed along the order in the
      value's own type (use an exact decimal for money);
    - with ``with_totals``: ``n_total`` (bigint row count) and
      ``{name}_total`` grand totals, attached via a broadcast 1-row
      cross join (the registry's sanctioned scalar pattern).

    ``grid_from``: optional CHEAPER DataFrame to compute the grid (and
    totals) from instead of ``df``. It must contain exactly the same
    multiset of rows w.r.t. the bucket columns and ``cum_sums`` value
    expressions — the natural case is chained rank passes, where pass
    N's input is pass N−1's output (base + rank columns): computing
    pass N's grid from the BASE avoids re-executing every earlier
    pass's join/window tree inside the grid branch (measured 2-3×
    DAG-overhead reduction on a 3-pass RFM at sf0.1). Results are
    identical by construction; the equivalence is pinned in
    test_ranks.py.

    Every stage is deterministic (no sampling, no partition ids, no
    nondeterministic expressions), so results are invariant under task
    retry and stage recompute — the property Spark's range-partitioned
    alternative cannot give without materializing the exchange.
    """
    cum_sums = dict(cum_sums or {})
    buckets = [F.col(c) for c in bucket_cols]

    reserved = {"__sb", "__cnt", "__rank_off", rank_name} | {
        c for k in cum_sums for c in (f"__v_{k}", f"__s_{k}", f"__cum_off_{k}", k)
    }
    if with_totals:
        reserved |= {"n_total", *(f"{k}_total" for k in cum_sums)}
    clash = reserved.intersection(df.columns) - set(bucket_cols)
    if clash:
        # A silent overwrite here would corrupt offsets or shadow user
        # data (the salted_join `_salt` guard, generalized).
        raise ValueError(f"bucketed_global_rank reserved columns already on df: {sorted(clash)}")

    def _prep(frame: DataFrame) -> DataFrame:
        out = frame.withColumn("__sb", super_bucket)
        for k, expr in cum_sums.items():
            out = out.withColumn(f"__v_{k}", expr)
        return out

    work = _prep(df)
    grid_src = work if grid_from is None else _prep(grid_from)

    # 1. Grid: one row per occupied bucket — counts + value sums.
    # Pinned (r17): the grid feeds the within-super-bucket prefix AND
    # the super-bucket totals (plus the grand totals with with_totals) —
    # unpinned, Spark re-executed the full rows→grid aggregation once
    # per branch (visible as repeated agg-Exchange chains in
    # plans/r17/*_before.txt). The grid is bounded by contract
    # (≤ ~hundreds of thousands of rows), i.e. exactly pinning.pin()'s
    # sanctioned shape; downstream joins keep their explicit
    # F.broadcast hints, so the stats-opaque pin costs no join strategy.
    from etl_sample_spark.pinning import pin

    grid = pin(
        grid_src.groupBy("__sb", *bucket_cols).agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(f"__v_{k}").alias(f"__s_{k}") for k in cum_sums],
        )
    )

    # 2a. Within-super-bucket EXCLUSIVE prefix: inclusive minus own
    # (avoids coalesce-on-empty-frame type coercion for decimals).
    w_sb = (
        Window.partitionBy("__sb")
        .orderBy(*buckets)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid_off = grid.select(
        "__sb",
        *bucket_cols,
        (F.sum("__cnt").over(w_sb) - F.col("__cnt")).alias("__cnt_off"),
        *[
            (F.sum(f"__s_{k}").over(w_sb) - F.col(f"__s_{k}")).alias(f"__s_off_{k}")
            for k in cum_sums
        ],
    )

    # 2b. Across-super-bucket EXCLUSIVE offsets: bounded broadcast
    # count-greater self-join on the ≤ ~hundreds-row super-bucket
    # relation (inner <= join, self always matches → no null frames;
    # subtract own totals for the exclusive form).
    sb_tot = grid.groupBy("__sb").agg(
        F.sum("__cnt").alias("__sb_cnt"),
        *[F.sum(f"__s_{k}").alias(f"__sb_s_{k}") for k in cum_sums],
    )
    prior = sb_tot.select(
        F.col("__sb").alias("__psb"),
        F.col("__sb_cnt").alias("__pcnt"),
        *[F.col(f"__sb_s_{k}").alias(f"__ps_{k}") for k in cum_sums],
    )
    sb_off = (
        sb_tot.join(F.broadcast(prior), F.col("__psb") <= F.col("__sb"), "inner")
        .groupBy("__sb", "__sb_cnt", *[f"__sb_s_{k}" for k in cum_sums])
        .agg(
            F.sum("__pcnt").alias("__le_cnt"),
            *[F.sum(f"__ps_{k}").alias(f"__le_s_{k}") for k in cum_sums],
        )
        .select(
            "__sb",
            (F.col("__le_cnt") - F.col("__sb_cnt")).alias("__sb_cnt_off"),
            *[
                (F.col(f"__le_s_{k}") - F.col(f"__sb_s_{k}")).alias(f"__sb_s_off_{k}")
                for k in cum_sums
            ],
        )
    )

    offsets = grid_off.join(F.broadcast(sb_off), "__sb").select(
        *bucket_cols,
        (F.col("__cnt_off") + F.col("__sb_cnt_off")).alias("__rank_off"),
        *[
            (F.col(f"__s_off_{k}") + F.col(f"__sb_s_off_{k}")).alias(f"__cum_off_{k}")
            for k in cum_sums
        ],
    )

    # 3. Back to the rows: partitioned windows only.
    w_rank = Window.partitionBy(*bucket_cols).orderBy(*order_cols)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = work.join(F.broadcast(offsets), list(bucket_cols)).withColumn(
        rank_name, (F.col("__rank_off") + F.row_number().over(w_rank)).cast("bigint")
    )
    for k in cum_sums:
        out = out.withColumn(k, F.col(f"__cum_off_{k}") + F.sum(f"__v_{k}").over(w_run))

    if with_totals:
        totals = sb_tot.agg(
            F.sum("__sb_cnt").cast("bigint").alias("n_total"),
            *[F.sum(f"__sb_s_{k}").alias(f"{k}_total") for k in cum_sums],
        )
        out = out.crossJoin(F.broadcast(totals))

    drop = ["__sb", "__rank_off"] + [
        c for k in cum_sums for c in (f"__v_{k}", f"__cum_off_{k}")
    ]
    return out.drop(*drop)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` bucket from a 1-based global rank and
    the total row count: the first ``n % k`` buckets take
    ``n div k + 1`` rows, the rest ``n div k`` — exactly Spark's and
    DuckDB's NTILE, so a rank from :func:`bucketed_global_rank` yields
    bit-identical tiles without the global window NTILE plans.

    The divisions run in double precision but stay exact: both operands
    are integers < 2^53, and a correctly-rounded quotient of such
    integers can only land ON an integer when the division is exact
    (|a/b − m| ≥ 1/b > a/b · 2⁻⁵³), so ``ceil`` never mis-steps.
    """
    q = F.floor(n / k).cast("bigint")
    rem = (n % k).cast("bigint")
    cut = rem * (q + 1)
    return (
        F.when(rank <= cut, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - cut) / F.greatest(q, F.lit(1))))
        .cast("int")
    )

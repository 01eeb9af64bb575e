"""Incremental aggregate maintenance: keep a persisted rollup table in
sync with arriving fact batches WITHOUT recomputing history.

The reference recomputes everything per run (single-node pandas loop);
at 100 TB the only viable shape is: aggregate the NEW batch (partial,
map-side), merge with the stored rollup on the group keys, and rewrite
only the touched partitions. All aggregates kept in the rollup are
DISTRIBUTIVE (sum / count / min / max) so merge = re-aggregate of two
partials; averages are served as sum/count at read time (an AVG column
stored directly would not merge).

Cost per batch: one groupBy shuffle of the batch + one key-join-sized
merge against only the affected rollup groups — independent of history
size. `tests/test_operators.py::test_incremental_rollup_equals_full`
pins batch-split invariance (any batch arrival order / grouping gives
the same rollup as one full recompute).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_batch(batch: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Partial rollup of one batch: for every measure column emit the
    distributive components ``<m>_sum``, ``<m>_count``, ``<m>_min``,
    ``<m>_max`` (count counts non-nulls, the SQL AVG convention)."""
    aggs = []
    for m, expr in measures.items():
        col = F.expr(expr)
        aggs += [
            F.sum(col).alias(f"{m}_sum"),
            F.count(col).alias(f"{m}_count"),
            F.min(col).alias(f"{m}_min"),
            F.max(col).alias(f"{m}_max"),
        ]
    return batch.groupBy(*keys).agg(*aggs)


def merge_rollups(existing: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial rollups: union then re-aggregate with the
    distributive combiners (sum of sums, sum of counts, min of mins,
    max of maxes). Associative + commutative ⇒ batch order never
    matters."""
    both = existing.unionByName(delta)
    aggs = []
    for c in both.columns:
        if c in keys:
            continue
        if c.endswith("_sum") or c.endswith("_count"):
            aggs.append(F.sum(c).alias(c))
        elif c.endswith("_min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("_max"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"non-distributive rollup column {c!r}")
    return both.groupBy(*keys).agg(*aggs)


def update_rollup_table(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Apply one batch to the persisted rollup at ``path`` (create on
    first batch) and return the merged rollup.

    The merge is written to a temp directory then swapped into place
    with renames (same local/POSIX-only crash contract as
    ``sources.sinks.compact_parquet_table``; on object stores use a
    table format's rewrite) — writing directly over ``path`` would
    delete the files the lazy merge is still reading. The rollup stays
    distributed end-to-end: nothing is collected, so a rollup with
    billions of groups works the same as one with ten.
    """
    import uuid

    from etl_sample_spark.sources.sinks import swap_parquet_dir

    delta = rollup_batch(batch, keys, measures)
    # Existence is decided by ATTEMPTING the read, never a driver-local
    # _SUCCESS probe (r11 review): `path` may be a scheme-qualified URI
    # the local filesystem cannot see, or the cluster may not write
    # _SUCCESS markers — and a false "absent" here runs the OVERWRITE
    # branch, silently replacing the whole accumulated rollup with one
    # batch's partials. Only PATH_NOT_FOUND may create; anything else
    # (empty dir, corrupt footer, permissions) raises loudly.
    existing = None
    try:
        existing = spark.read.parquet(path)
    except Exception as ex:
        if "PATH_NOT_FOUND" not in str(ex) and "Path does not exist" not in str(ex):
            raise
    if existing is not None:
        merged = merge_rollups(existing, delta, keys)
        tmp = f"{path}__merge_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        swap_parquet_dir(tmp, path)
    else:
        delta.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)



def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    key: str,
    seq: str,
    op_col: str = "op",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change-log (upsert/delete ops with a total-ordering
    sequence column) to a base snapshot — the batch form of a Debezium/
    binlog materialization.

    Latest-wins semantics: per key, only the highest-``seq`` op counts.
    'U' upserts (update if the key exists in the base, insert if not);
    'D' deletes. Keys untouched by the log carry through. Emits the FULL
    post-apply state — payload columns take the op's value on upserted
    keys and the base's otherwise, while base columns OUTSIDE the
    payload carry through unchanged on every surviving row (the partial-
    update Debezium shape; they are NULL only for inserted keys, which
    have no base row) — plus ``n_ops`` (how many log entries hit the
    key) and ``src`` ('base' carried / 'upsert' applied).

    100 TB shape: ONE shuffle on the key — the per-key latest-op window
    and the base join reuse the same hash partitioning; the changelog
    compacts to |distinct keys| rows BEFORE joining the (much larger)
    base, so the join probe side is the compacted log, never raw ops.
    """
    from pyspark.sql import Window

    if payload_cols is None:  # [] is a legal explicit "no payload" choice
        payload_cols = [c for c in changelog.columns if c not in (key, seq, op_col)]
    # Deterministic tie-break beyond seq (r11 review): two ops sharing a
    # key's max seq (e.g. one transaction's binlog events given a single
    # commit sequence) would otherwise be picked by partition order —
    # the same inputs could delete the key on one run and upsert it on
    # the next. Same convention as the streaming latest-wins dedup:
    # op + payload columns, descending, nulls last.
    w = Window.partitionBy(key).orderBy(
        F.desc(seq),
        F.col(op_col).desc_nulls_last(),
        *[F.col(c).desc_nulls_last() for c in payload_cols],
    )
    last = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n_ops", F.count(F.lit(1)).over(Window.partitionBy(key)))
        .where(F.col("__rn") == 1)
        .select(key, op_col, "__n_ops", *payload_cols)
    )
    joined = base.alias("b").join(last.alias("c"), on=key, how="full_outer")
    kept = joined.where(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    )
    out_payload = [
        F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
        .otherwise(F.col(f"b.{c}") if c in base.columns else F.lit(None))
        .alias(c)
        for c in payload_cols
    ]
    # base columns outside the payload carry through on every surviving
    # row (upsert-of-existing-key = partial update; NULL only for
    # inserted keys, which have no base row)
    carried = [
        F.col(f"b.{c}").alias(c)
        for c in base.columns
        if c != key and c not in payload_cols
    ]
    return kept.select(
        F.col(key),
        *out_payload,
        *carried,
        F.when(F.col(f"c.{op_col}").isNotNull(), F.lit("upsert"))
        .otherwise(F.lit("base"))
        .alias("src"),
        F.coalesce(F.col("c.__n_ops"), F.lit(0)).cast("bigint").alias("n_ops"),
    )

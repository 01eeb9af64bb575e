"""Slowly-changing-dimension maintenance (Type 2) — the warehouse-side
twin of the reference's dimension loads: instead of overwriting changed
attributes, close the old version and open a new one, keeping full
history queryable AS OF any time.

Reference parity: the sample pipeline rebuilds its SQL-server dimension
tables wholesale per run (``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-
2019.py:662-763`` appends without versioning). SCD2 is what that sink
grows into in production — and it is pure relational algebra, so it
runs as three key-joins, no driver loops.

100 TB shape: one shuffle on the business key for the change
detection join; the three output branches (carried / closed / opened)
reuse that join's partitioning; history length only grows the dimension
table, never the per-batch work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(
    dim: DataFrame, effective: str | None = None, effective_col: str | None = None
) -> DataFrame:
    """Stamp an initial load as all-current versions.

    ``effective`` stamps one batch-grain timestamp on every row;
    ``effective_col`` (exactly one must be given) uses each row's OWN
    change timestamp as its ``valid_from`` and drops the source column —
    the per-key grain the streaming CDC path needs (see scd2_merge).
    """
    if (effective is None) == (effective_col is None):
        raise ValueError("give exactly one of effective / effective_col")
    if effective_col is not None:
        return (
            dim.withColumn("valid_from", F.col(effective_col).cast("timestamp"))
            .drop(effective_col)
            .withColumn("valid_to", F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True))
        )
    return (
        dim.withColumn("valid_from", F.lit(effective).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def _differs(tracked: list[str]) -> Column:
    """Null-safe 'any tracked attribute changed' predicate between the
    current version (``d.``) and the incoming update (``u.``)."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))
    return cond


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective: str | None = None,
    effective_col: str | None = None,
) -> DataFrame:
    """Merge an update batch into an SCD2 history table.

    - keys whose tracked attributes are UNCHANGED (or absent from the
      batch): carried through untouched, history included;
    - changed keys: the current version is CLOSED (``valid_to`` =
      the effective time, ``is_current`` = false) and a new version
      OPENED;
    - keys new to the dimension: opened as their first version.

    Effective time comes in two grains — exactly one must be given:

    - ``effective``: one batch-grain timestamp stamps every close/open.
    - ``effective_col``: a column of ``updates`` holding each KEY'S OWN
      change timestamp; the close/open for a key uses that key's value
      (and the column is dropped from the opened attributes). CALLER
      CONTRACT: the column must be non-null on every row — a NULL would
      write a closed version with ``valid_to`` NULL, which
      ``scd2_as_of`` reads as still open (duplicate as-of rows); the
      streaming caller filters such rows before merging. This is
      the grain the streaming CDC path needs: with the batch-grain form
      every key's valid_from inflates to the batch MAXIMUM, so a later
      batch's genuinely newer change whose ts falls between a key's own
      last change and that earlier max is silently lost to the stale
      filter (r10 ADVICE).

    The result is the full new history table (append-only semantics:
    no version row is ever mutated after it closes, so the output can
    be written with partition overwrite or into any warehouse table).

    ORDERING PRECONDITION (r11 review): the effective time must be >=
    every changed key's current ``valid_from`` — merging a LATE batch
    with an older effective time writes a closed row whose valid_to
    precedes its valid_from and an is_current row predating the version
    it replaced, corrupting as-of reconstruction. The streaming caller
    (``run_cdc_to_scd2_stream``) enforces this with its stale filter;
    direct batch callers must order their merges (or pre-filter the
    same way).
    """
    if (effective is None) == (effective_col is None):
        raise ValueError("give exactly one of effective / effective_col")
    attr_cols = [
        c for c in history.columns if c not in SCD2_COLS
    ]  # excludes effective_col: it never enters the history schema
    current = history.where(F.col("is_current")).alias("d")
    upd = updates.alias("u")

    changed_keys = (
        current.join(upd, F.col(f"d.{key}") == F.col(f"u.{key}"))
        .where(_differs(tracked))
        .select(F.col(f"d.{key}").alias(key))
    )
    new_keys = upd.join(history.select(key).distinct(), key, "left_anti").select(key)

    # Carried = everything except the CURRENT row of each changed key
    # (that row is re-emitted closed below). Anti-joining the WHOLE
    # history on changed keys — the r1-r10 form — silently deleted every
    # OLDER closed version the second time a key changed (r11 review):
    # closed rows are immutable history and must always carry through.
    carried = history.where(~F.col("is_current")).unionByName(
        history.where(F.col("is_current")).join(changed_keys, key, "left_anti")
    )
    if effective_col is not None:
        # Per-key effective time: one row per key in `updates` (the
        # caller's latest-wins dedup guarantees this), joined in so each
        # close stamps the key's own change ts, not the batch max.
        key_eff = updates.select(
            key, F.col(effective_col).cast("timestamp").alias("__eff")
        )
        closed = (
            history.where(F.col("is_current"))
            .join(changed_keys, key, "left_semi")
            .join(key_eff, key)
            .withColumn("valid_to", F.col("__eff"))
            .drop("__eff")
            .withColumn("is_current", F.lit(False))
        )
        open_from = F.col(effective_col).cast("timestamp")
    else:
        eff = F.lit(effective).cast("timestamp")
        closed = (
            history.where(F.col("is_current"))
            .join(changed_keys, key, "left_semi")
            .withColumn("valid_to", eff)
            .withColumn("is_current", F.lit(False))
        )
        open_from = eff
    opening_keys = changed_keys.unionByName(new_keys)
    opened = (
        updates.join(opening_keys, key, "left_semi")
        .withColumn("valid_from", open_from)
        .select(*attr_cols, "valid_from")
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    return carried.unionByName(closed, allowMissingColumns=False).unionByName(opened)


def scd2_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the version of every key valid AT ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )

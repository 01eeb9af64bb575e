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


def scd2_init(dim: DataFrame, effective: str) -> DataFrame:
    """Stamp an initial load as all-current versions."""
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
    effective: str,
) -> DataFrame:
    """Merge an update batch into an SCD2 history table.

    - keys whose tracked attributes are UNCHANGED (or absent from the
      batch): carried through untouched, history included;
    - changed keys: the current version is CLOSED (``valid_to`` =
      ``effective``, ``is_current`` = false) and a new version OPENED;
    - keys new to the dimension: opened as their first version.

    The result is the full new history table (append-only semantics:
    no version row is ever mutated after it closes, so the output can
    be written with partition overwrite or into any warehouse table).
    """
    eff = F.lit(effective).cast("timestamp")
    attr_cols = [c for c in history.columns if c not in SCD2_COLS]
    current = history.where(F.col("is_current")).alias("d")
    upd = updates.alias("u")

    changed_keys = (
        current.join(upd, F.col(f"d.{key}") == F.col(f"u.{key}"))
        .where(_differs(tracked))
        .select(F.col(f"d.{key}").alias(key))
    )
    new_keys = upd.join(history.select(key).distinct(), key, "left_anti").select(key)

    carried = history.join(changed_keys, key, "left_anti")
    closed = (
        history.where(F.col("is_current"))
        .join(changed_keys, key, "left_semi")
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    opening_keys = changed_keys.unionByName(new_keys)
    opened = (
        updates.join(opening_keys, key, "left_semi")
        .select(*[c for c in attr_cols])
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    return carried.unionByName(closed).unionByName(opened)


def scd2_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time view: the version of every key valid AT ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )

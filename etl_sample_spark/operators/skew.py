"""Skew-mitigation join strategies (100-TB scale path).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on by default in ``session.tune``) handles most skew at runtime, but it
only helps sort-merge joins and only after a shuffle has materialized.
``salted_join`` is the explicit pre-shuffle fix for the pathological
case — a handful of hot keys owning a large fraction of a 100 TB fact
table: the big side's rows are spread across ``n_salts`` sub-keys
deterministically, and the small side is replicated ``n_salts``× so
every sub-key still finds its match. Join semantics are unchanged
(verified against the plain-join oracle in plans/tpch.py's
``skewjoin_revenue_by_priority``).

The reference has no joins at all (SURVEY §2.6) — this is [EXT] scale
infrastructure for the star schema its FK-stamping prepares.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: Sequence[str | Column] | None = None,
    force_shuffle: bool = True,
) -> DataFrame:
    """Equi-join with key salting: ``big`` rows get a DETERMINISTIC salt
    in [0, n_salts) — ``pmod(xxhash64(salt_from...), n_salts)`` when the
    caller names salt columns, else the whole-row hash — and ``small``
    is exploded into one copy per salt value. The shuffle then
    distributes each hot key over ``n_salts`` reducers instead of one.
    The salt never survives the join (dropped before returning).

    The salt MUST be a pure function of the row (r12, was
    ``monotonically_increasing_id mod n_salts`` in r11): the salt is
    part of the shuffle/join key, and on a shuffle-fetch failure Spark
    recomputes only the lost map tasks — a positional salt can assign
    different salts on the retry than the already-fetched reducer
    outputs saw, silently losing or duplicating join rows (the
    SPARK-23207 hazard class; Spark's indeterminate-stage rollback
    covers round-robin repartition, not nondeterministic join keys).

    ``salt_from``: columns (or Column exprs) that VARY WITHIN a hot key
    — a line number, an event id, any near-unique attribute. Pass them
    whenever the source has one; that is the robust spread. The
    whole-row fallback spreads every hot key whose rows differ anywhere,
    but rows that are BYTE-IDENTICAL duplicates hash to ONE salt and
    re-degenerate to a single reducer — if your fact table can hold
    byte-identical duplicate rows, you must pass ``salt_from`` (or
    dedup/add a key first). Because that degradation is silent in the
    output (the join is still correct, just unspread), the fallback
    emits a ``UserWarning`` (r12 ADVICE) so the caller is told to name
    salt columns instead of discovering one straggler reducer at 100 TB.

    Use when a key's row count exceeds what one task should own
    (~shuffle-partition-size / row-width). For dims that fit in memory,
    prefer ``F.broadcast`` — salting is for the mid-size skewed case
    where neither broadcast nor an even shuffle works.

    ``force_shuffle`` (default True) pins the join to sort-merge via a
    ``merge`` hint on the replicated side. Salting only has a job when
    the join SHUFFLES — a broadcast join has no reducers to skew, so if
    the optimizer picks broadcast the salt degenerates to replicating
    the build side ``n_salts``× for nothing. That composition was the
    r13 10× scale-suite outlier (measured r14): the plan chose
    BroadcastHashJoin and the "skew" cost was really an n_salts×-bigger
    broadcast build growing with data size, while the hinted
    sort-merge path scales ~linearly with the salt spreading reducers
    as designed. Pass ``force_shuffle=False`` only when the caller
    wants AQE free to pick broadcast (accepting the replication waste
    if it does).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        # n_salts=0 would silently return zero rows (pmod by zero is
        # NULL, which matches nothing) — fail fast like the `how` guard.
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    for side, name in ((big, "big"), (small, "small")):
        if "_salt" in side.columns:
            raise ValueError(
                f"{name} side already has a '_salt' column — salted_join "
                "would overwrite it and drop it from the output"
            )
    if salt_from:
        hash_cols = [F.col(c) if isinstance(c, str) else c for c in salt_from]
    else:
        import warnings

        warnings.warn(
            "salted_join: no salt_from given — salting on the whole-row "
            "hash. Byte-identical duplicate rows of a hot key all land on "
            "one salt, silently degrading the skew mitigation to a plain "
            "join with replication overhead. Pass salt_from= columns that "
            "vary within a hot key (a line number, an event id).",
            UserWarning,
            stacklevel=2,
        )
        hash_cols = [F.col(c) for c in big.columns]
    salt = F.pmod(F.xxhash64(*hash_cols), F.lit(n_salts))
    salted_big = big.withColumn("_salt", salt)
    if force_shuffle:
        small = small.hint("merge")
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key]) & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return joined.drop("_salt")

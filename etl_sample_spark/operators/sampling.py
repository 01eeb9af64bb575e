"""Deterministic (hash-based) sampling for training-data pipelines.

``DataFrame.sampleBy`` is Bernoulli over Spark's RNG: resampling the
same corpus gives a different subset, a retried task can diverge from
its first attempt's split lineage, and no external system can audit
which rows were kept. For pretraining-data work (domain mixture
re-weighting, ablation subsets) the standard fix is HASH-gated
sampling: keep a row iff ``h(key) mod M < rate*M``. Same statistical
guarantees for a well-mixed hash, but reproducible across runs,
engines, and partitionings — which also makes it cross-engine
oracle-checkable, unlike any RNG sampler.

The hash is the repo's portable arithmetic family (multiplicative
Knuth hash on the key), so DuckDB reproduces the exact subset.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant; modulus keeps everything in exact
# bigint range in both engines.
_MULT = 2654435761
_MOD = 2_147_483_647
_BUCKETS = 10_000


def hash_position(key: Column) -> Column:
    """Deterministic position in [0, _MOD) from ANY bigint key.

    The key is reduced mod _MOD (pmod: non-negative even for negative
    keys) BEFORE the multiply, so the product stays < 2^62.3 — no bigint
    overflow under ANSI mode for any input, and negative keys hash like
    everything else instead of inheriting the dividend's sign. For keys
    already in [0, _MOD) this equals the plain (key * _MULT) % _MOD.
    """
    reduced = F.pmod(key.cast("bigint"), F.lit(_MOD))
    return F.pmod(reduced * _MULT, F.lit(_MOD))


def hash_position_sql(key_sql: str) -> str:
    """DuckDB twin of ``hash_position`` (pmod spelled as ((x%m)+m)%m;
    the product of the non-negative reduced key is already ≥ 0, so the
    outer mod needs no pmod treatment)."""
    reduced = f"(((CAST({key_sql} AS BIGINT) % {_MOD}) + {_MOD}) % {_MOD})"
    return f"(({reduced} * {_MULT}) % {_MOD})"


def _gate(key: Column) -> Column:
    """Deterministic bucket in [0, _BUCKETS) from an integer key."""
    return hash_position(key) % _BUCKETS


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
) -> DataFrame:
    """Keep each row iff its key-hash bucket falls under its stratum's
    rate. Rows whose stratum is not listed are dropped (rate 0).

    100 TB shape: pure map-side filter — no shuffle, no RNG state, and
    any re-run (or a different engine) selects the identical subset.
    """
    if not fractions:
        raise ValueError("hash_stratified_sample: empty fractions")
    bad = {s: f for s, f in fractions.items() if not 0.0 <= f <= 1.0}
    if bad:
        raise ValueError(f"hash_stratified_sample: rates outside [0,1]: {bad}")
    gate = _gate(F.col(key_col))
    rate = None
    for stratum, frac in fractions.items():
        cutoff = int(round(frac * _BUCKETS))
        cond = (F.col(strata_col) == stratum) & (gate < F.lit(cutoff))
        rate = cond if rate is None else (rate | cond)
    return df.where(rate)


def hash_sample_gate_sql(key_sql: str) -> str:
    """DuckDB twin of ``_gate`` for oracle SQL."""
    return f"({hash_position_sql(key_sql)} % {_BUCKETS})"


def rebalance_source_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    parts: Mapping[str, int],
) -> DataFrame:
    """Downsample to a TARGET SOURCE MIXTURE (the training-mix
    re-weighting step): keep sources in the ratio given by integer
    ``parts`` (e.g. ``{"web": 3, "code": 2, "ref": 1}``), taking as
    much data as the binding source allows.

    All rate math is INTEGER arithmetic — ``K = min_s(n_s div part_s)``
    sets the achievable scale (the binding source is kept almost
    whole), and each source's gate cutoff is
    ``part_s * K * buckets div n_s`` — so the selection is exactly
    reproducible in any engine (no float rounding seam), and the
    hash gate keeps it map-side, retry-deterministic, and auditable.

    100 TB shape: one tiny groupBy for the per-source counts (driver
    collect bounded at the number of sources), then a pure map-side
    filter; rows never shuffle.
    """
    if not parts:
        raise ValueError("rebalance_source_mix: empty parts")
    bad = {s: p for s, p in parts.items() if not (isinstance(p, int) and p > 0)}
    if bad:
        raise ValueError(f"rebalance_source_mix: parts must be positive ints: {bad}")
    counts = {
        r[source_col]: r["cnt"]
        for r in df.where(F.col(source_col).isin(*parts))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    missing = [s for s in parts if s not in counts]
    if missing:
        raise ValueError(f"rebalance_source_mix: sources absent from corpus: {missing}")
    k = min(counts[s] // p for s, p in parts.items())
    gate = _gate(F.col(key_col))
    keep = None
    for s, p in parts.items():
        cutoff = (p * k * _BUCKETS) // counts[s]
        cond = (F.col(source_col) == s) & (gate < F.lit(cutoff))
        keep = cond if keep is None else (keep | cond)
    return df.where(keep)


def weighted_sample_integer(
    df: DataFrame,
    key_col: str,
    weight_col: Column,
    weight_cap: int = _BUCKETS,
) -> DataFrame:
    """Importance-weighted deterministic sampling: keep a row iff its
    hash gate falls under its OWN integer weight (capped at
    ``weight_cap`` = always kept). P(keep) = min(weight, cap)/cap per
    row, but with NO randomness: the kept subset is a pure function of
    (key, weight), so re-runs, retries, and other engines select the
    identical rows — the property RNG-based importance sampling can't
    give a reproducible training corpus.

    ``weight_col`` must be an integer expression (exact cross-engine
    comparison; derive integer weights from the quality signal rather
    than multiplying a double by the cap).

    100 TB shape: pure map-side filter, no shuffle, no state.
    """
    gate = hash_position(F.col(key_col)) % weight_cap
    return df.where(gate < F.least(weight_col.cast("bigint"), F.lit(weight_cap)))

"""Magnitude-robustness property tests for exact money aggregation.

The decimal-money sweep (functions/money.py) exists to keep money sums
exact and order-independent at sf1+ magnitudes — but /root/testdata tops
out at sf0.1, where double sums happen to agree. These tests synthesize
the magnitudes the sweep was FOR: an adversarial 2-dp dataset (one
~9e15 outlier + 2M small values) where IEEE double summation is visibly
order-dependent (ulp(9e15) = 1.0 swallows every 0.01 added after it),
and assert that the production decimal path is

1. permutation-invariant: bit-identical across partition layouts and
   accumulation orders that make the double sum diverge, and
2. exact: equal to DuckDB's decimal sum over the same data AND to
   arbitrary-precision integer-cents arithmetic in Python.

Also pins the reason cents-as-BIGINT was measured (~1.8x faster on the
agg kernel, /tmp microbench r5, recorded in SCALE.md) but NOT adopted:
the int64 accumulator overflows at the magnitudes this suite tests.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from etl_sample_spark.functions.money import dec2, sum_money

# One huge 2-dp money value + N_SMALL tiny ones. 9e15 fits decimal(18,2)
# (16 digits + 2 frac = 18) and has double ulp 1.0 > 0.01, so adding
# 0.01 to it individually is a no-op in double arithmetic.
BIG = 9_000_000_000_000_000.0
N_SMALL = 2_000_000
SMALL = 0.01
EXACT_CENTS = int(BIG) * 100 + N_SMALL * 1  # exact integer-cents total


def _adversarial(spark):
    return spark.range(N_SMALL + 1).select(
        F.col("id"),
        F.when(F.col("id") == 0, F.lit(BIG)).otherwise(F.lit(SMALL)).alias("amount"),
    )


def _layouts(df):
    """Accumulation orders that drive an order-dependent sum apart:
    big-value-first in one partition vs big-value-last vs hash-scattered
    across 64 partitions."""
    return [
        df.repartition(1).sortWithinPartitions(F.col("amount").desc()),
        df.repartition(1).sortWithinPartitions(F.col("amount").asc()),
        df.repartition(64, "id"),
    ]


def test_double_sum_is_order_dependent_at_magnitude(spark):
    """Sanity of the fixture: the double sums actually diverge — if they
    didn't, the decimal assertions below would be vacuous."""
    sums = {
        layout.agg(F.sum("amount").alias("s")).head()["s"]
        for layout in _layouts(_adversarial(spark))
    }
    assert len(sums) > 1, "fixture no longer exercises order dependence"
    # and the divergence is far beyond the 2-dp money grid:
    assert max(sums) - min(sums) > 1.0


def test_decimal_sum_is_permutation_invariant_and_exact(spark):
    exact = float(Decimal(EXACT_CENTS) / 100)
    sums = [
        layout.agg(sum_money(dec2("amount")).alias("s")).head()["s"]
        for layout in _layouts(_adversarial(spark))
    ]
    assert all(s == sums[0] for s in sums), f"order-dependent: {sums}"
    assert sums[0] == exact


def test_decimal_sum_matches_duckdb_exact(duck):
    """Cross-engine: DuckDB generates the same rows from the same formula
    and sums on the same decimal grid (VARCHAR-bridged emission per
    money.py); both engines must land on the identical double."""
    oracle = duck.sql(
        f"""
        SELECT CAST(CAST(SUM(CAST(
                 CASE WHEN i = 0 THEN {BIG!r} ELSE {SMALL!r} END
               AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s
        FROM range({N_SMALL + 1}) t(i)
        """
    ).fetchone()[0]
    assert oracle == float(Decimal(EXACT_CENTS) / 100)


def test_bigint_cents_overflows_at_target_scale():
    """Documents the cents-as-BIGINT veto: micro-dollar (1e-6) int64
    accumulation — the encoding needed for revenue = price*(1-discount)
    on the 2dp x 4dp grids — cannot represent a TPC-H sf100 global
    revenue sum, let alone the 100 TB design point (~sf100k)."""
    sf100_revenue_dollars = 2.2e13  # ~sf100 SUM(l_extendedprice*(1-disc))
    assert int(sf100_revenue_dollars * 1e6) > 2**63 - 1

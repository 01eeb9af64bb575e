"""Exact-decimal money accumulation (cross-engine hash-stable sums).

Double-precision SUM is order-dependent: at sf1 magnitudes (≥1e9 over
millions of rows) two engines' partial-sum trees can disagree by far
more than any rounding grid, so no ROUND makes a double-accumulated
money sum comparable across engines. The stable pattern, used by every
money query in the registry:

1. cast each operand onto its exact decimal grid (all money columns in
   the test data sit on a 2dp grid; discount/tax factors on 4dp),
2. pin intermediate product scales with explicit casts,
3. SUM in decimal — exact and order-independent, so bit-identical on
   any engine and any partitioning,
4. emit the final sum as DOUBLE: one IEEE round-to-nearest conversion
   both engines perform identically. No ROUND afterwards (rounding an
   exact value risks HALF_UP-vs-HALF_EVEN divergence on grid ties).

The DuckDB oracle twin must route its cast through VARCHAR —
``CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)`` — because DuckDB's direct
decimal→double cast computes ``int128 * 10^-scale`` in floating point
and can land 1 ulp off the correctly-rounded value (strtod is correctly
rounded; Java's BigDecimal.doubleValue too).

Cost note: decimal aggregation stays inside Tungsten/codegen (Decimal is
a first-class Spark SQL type with partial aggregation); the overhead vs
double sums is a few percent on scan-dominated queries — the price of a
deterministic answer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: Column | str) -> Column:
    """A 2dp money column on its exact decimal grid."""
    return _c(col).cast("decimal(18,2)")


def dec4(col: Column | str) -> Column:
    """A 4dp factor column (discount/tax) on its exact decimal grid."""
    return _c(col).cast("decimal(18,4)")


def revenue_dec(price: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """price * (1 - discount), exact at scale 6."""
    return (dec2(price) * (1 - dec4(discount))).cast("decimal(18,6)")


# DuckDB oracle twins of the Spark expressions above. SUM2_SQL takes the
# column name via .format(c=...); REV_SQL is the lineitem revenue sum.
SUM2_SQL = "CAST(CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))"
)
REV_SQL = f"CAST(CAST(SUM({REV_DEC_SQL}) AS VARCHAR) AS DOUBLE)"


def sum_money(expr: Column | str) -> Column:
    """Exact decimal SUM emitted as a correctly-rounded double.

    ``expr`` must already be a decimal-typed column (``dec2`` /
    ``revenue_dec`` / an explicit cast) — summing a raw double column
    would silently reintroduce order-dependence.
    """
    return F.sum(_c(expr)).cast("double")

"""UDF / UDAF / UDTF surface (SURVEY §2.11).

The reference's per-document Python (masking, datetime reassembly,
fallback chains — ``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:
114-117,162,378-387``) is exactly the logic users register as UDFs. The
engine's position: everything in SURVEY §2.5 ships as built-in
expressions (functions/scalar.py — Catalyst-optimizable, JVM-side), and
this module provides the *escape hatch* tiers for logic that genuinely
needs Python, in descending preference:

1. ``pandas_udf`` scalar — Arrow-batched, vectorized; ~10-100× faster
   than row-at-a-time ``F.udf`` and the only Python tier allowed on
   large columns.
2. ``pandas_udf`` grouped-agg — vectorized custom aggregation.
3. ``applyInPandas`` — grouped-map (UDTF-like) for per-group logic that
   must see the whole group.
4. ``F.udf`` row-at-a-time — provided for completeness; banned on hot
   paths (tests/test_plans.py enforces none leak into oracle queries).

Every UDF here has a built-in twin so tests can assert bit-equality
between the Python tier and the JVM tier (tests/test_udfs.py).
"""

from __future__ import annotations

from functools import cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# UDFs are built lazily (factory + cache) because registering a
# pandas_udf requires an active SparkSession, which doesn't exist at
# import time in test collection or driver import.


@cache
def mask_account_pandas():
    """Vectorized account masking — the intent of the reference's F2
    (``XXXX + account[3:]`` per string, pipeline.py:115,494), not its
    F2b Series-slicing bug (pipeline.py:94,471). JVM twin:
    functions/scalar.py::mask_account."""

    @pandas_udf("string")
    def _mask(account: pd.Series) -> pd.Series:
        return "XXXX" + account.str.slice(3)

    return _mask


@cache
def weighted_mean_price():
    """Grouped-agg pandas UDF: quantity-weighted mean price. JVM twin:
    sum(price*qty)/sum(qty)."""

    @pandas_udf("double")
    def _wm(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else float("nan")

    return _wm


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map via applyInPandas: per-group z-score of ``value_col``.

    The UDTF-like tier: each group arrives as one pandas DataFrame. At
    100 TB the group is the unit of memory — callers must guarantee a
    single group fits an executor (here: one user's events). JVM twin:
    (value - avg over W) / stddev over W with a partitionBy window.
    """
    # derive the pass-through column types from the input (r11 review:
    # hardcoded BIGINT/DOUBLE broke any string group key or decimal
    # value at Arrow conversion time)
    g_t = df.schema[group_col].dataType.simpleString()
    v_t = df.schema[value_col].dataType.simpleString()
    schema = f"{group_col} {g_t}, {value_col} {v_t}, zscore DOUBLE"

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], value_col: pdf[value_col], "zscore": z}
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(compute, schema)


def mask_account_rowudf():
    """Row-at-a-time F.udf variant — completeness only; never use on a
    hot path (each row crosses the JVM↔Python boundary individually)."""
    return F.udf(lambda s: "XXXX" + s[3:] if s is not None else None, "string")


@cache
def tokenize_udtf():
    """Registered Python UDTF (Spark 3.5+): one input row → N output
    rows, usable from SQL via LATERAL — the table-function tier proper,
    complementing the applyInPandas grouped-map shape above. Emits
    (pos, token) per whitespace token. JVM twin: ``posexplode(split(
    text, ' '))`` — equivalence pinned in tests/test_udfs.py.

    Tier guidance as for all Python here: the UDTF boundary is
    row-at-a-time pickle; keep it off wide hot paths and prefer the
    built-in generator twin when the logic is expressible."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, token STRING")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    return Tokenize


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session for SQL/LATERAL use."""
    spark.udtf.register("tokenize", tokenize_udtf())

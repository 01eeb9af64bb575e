"""bucketed_global_rank / ntile_from_rank vs the global-window truth.

The operator's whole claim is bit-identical results to
``ROW_NUMBER() / SUM() / NTILE() OVER (ORDER BY ...)`` with every
window in its plan PARTITIONED — so each test computes both and
diffs, and one test walks the optimized plan to prove no
unpartitioned Window node survives (the r11 verdict's
dimension-global-window class)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from etl_sample_spark.operators.ranks import bucketed_global_rank, ntile_from_rank


def _sample(spark, n=500):
    """Deterministic synthetic rows: a heavily-tied value column (so
    bucket boundaries land ON tie groups), a decimal money column, and
    a unique id tie-break."""
    rows = [
        Row(
            id=i,
            v=(i * 7919) % 37,  # ties: 37 distinct values over 500 rows
            m=Decimal((i * 104729) % 1000) / 100,  # decimal(18,2)-ish grid
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows).select(
        "id", "v", F.col("m").cast("decimal(18,2)").alias("m")
    )


def test_rank_matches_global_window_asc(spark):
    df = _sample(spark)
    got = bucketed_global_rank(
        df.withColumn("__b", F.col("v")),  # natural integer grid
        ["__b"],
        [F.col("v"), F.col("id")],
        F.floor(F.col("__b") / 8),
        rank_name="rk",
    )
    w = Window.orderBy("v", "id")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert (
        got.select("id", "rk").exceptAll(want.select("id", "rk")).count() == 0
        and want.count() == got.count()
    )


def test_rank_matches_global_window_desc_with_cumsum_and_totals(spark):
    df = _sample(spark)
    got = bucketed_global_rank(
        df.withColumn("__b", -F.col("v")),  # descending key → negate
        ["__b"],
        [F.desc("v"), F.col("id")],
        F.floor(F.col("__b") / 8),
        rank_name="rk",
        cum_sums={"cm": F.col("m")},
        with_totals=True,
    )
    w = Window.orderBy(F.desc("v"), "id")
    want = df.select(
        "id",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.sum("m").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cm"),
    )
    assert got.select("id", "rk", "cm").exceptAll(want).count() == 0
    tot = got.select("n_total", "cm_total").distinct().collect()
    assert len(tot) == 1
    assert tot[0]["n_total"] == 500
    assert tot[0]["cm_total"] == sum(r["m"] for r in df.select("m").collect())


def test_rank_two_level_bucket_for_coarse_leading_key(spark):
    """The frequency-style case: the leading key has only a handful of
    values, so the tie-break key itself is chunked as a SECOND bucket
    column — (lead, floor(id/C)) stays lexicographically monotone
    along (lead, id)."""
    df = _sample(spark).withColumn("lead", F.col("v") % 5)
    got = bucketed_global_rank(
        df.withColumn("__b2", F.floor(F.col("id") / 64)),
        ["lead", "__b2"],
        [F.col("lead"), F.col("id")],
        F.col("lead"),  # super-bucket = the ≤5-value leading key
        rank_name="rk",
    )
    w = Window.orderBy("lead", "id")
    want = df.withColumn("rk", F.row_number().over(w).cast("bigint"))
    assert got.select("id", "rk").exceptAll(want.select("id", "rk")).count() == 0


@pytest.mark.parametrize("n,k", [(500, 5), (499, 5), (501, 5), (3, 5), (5, 5), (0, 5), (7, 3)])
def test_ntile_formula_matches_spark_ntile(spark, n, k):
    if n == 0:
        return  # vacuous: no rows to tile
    df = spark.range(n).select(F.col("id"))
    w = Window.orderBy("id")
    want = df.select("id", F.ntile(k).over(w).alias("t"))
    got = df.select(
        "id",
        ntile_from_rank(
            F.row_number().over(w).cast("bigint"), F.lit(n).cast("bigint"), k
        ).alias("t"),
    )
    assert got.exceptAll(want).count() == 0


def test_grid_from_is_result_identical(spark):
    """grid_from only short-circuits WHERE the grid is computed from; a
    chained pass using the pre-rank base as grid source must produce
    bit-identical ranks/cumsums to the default."""
    df = _sample(spark)
    base = df.withColumn("__b", F.col("v"))
    pass1 = bucketed_global_rank(
        base, ["__b"], [F.col("v"), F.col("id")], F.floor(F.col("__b") / 8), rank_name="r1"
    )
    kwargs = dict(
        rank_name="r2", cum_sums={"cm": F.col("m")}, with_totals=True
    )
    order2 = [F.col("v"), F.desc("m"), F.col("id")]  # bucket v stays monotone
    default = bucketed_global_rank(
        pass1, ["__b"], order2, F.floor(F.col("__b") / 8), **kwargs
    )
    shortcut = bucketed_global_rank(
        pass1, ["__b"], order2, F.floor(F.col("__b") / 8), grid_from=base, **kwargs
    )
    cols = ["id", "r1", "r2", "cm", "n_total", "cm_total"]
    assert shortcut.select(cols).exceptAll(default.select(cols)).count() == 0
    assert shortcut.count() == default.count()


def test_no_unpartitioned_window_in_operator_plan(spark):
    from tests.test_plans import _unpartitioned_windows

    df = _sample(spark)
    got = bucketed_global_rank(
        df.withColumn("__b", F.col("v")),
        ["__b"],
        [F.col("v"), F.col("id")],
        F.floor(F.col("__b") / 8),
        rank_name="rk",
        cum_sums={"cm": F.col("m")},
        with_totals=True,
    )
    assert _unpartitioned_windows(got) == 0


def test_reserved_column_clash_raises(spark):
    df = _sample(spark).withColumn("__b", F.col("v")).withColumn("rk", F.lit(1))
    with pytest.raises(ValueError, match="reserved columns"):
        bucketed_global_rank(
            df, ["__b"], [F.col("v"), F.col("id")], F.floor(F.col("__b") / 8),
            rank_name="rk",
        )
    with pytest.raises(ValueError, match="reserved columns"):
        bucketed_global_rank(
            df.drop("rk").withColumn("n_total", F.lit(0)),
            ["__b"], [F.col("v"), F.col("id")], F.floor(F.col("__b") / 8),
            with_totals=True,
        )

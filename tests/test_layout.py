"""Z-order layout: physical data-skipping verification.

The claim behind operators/layout.py is not the curve rank (the oracle
checks that) but the LAYOUT: clustering files on the Morton curve of two
columns must let parquet footer min/max statistics skip most files for a
selective predicate on EITHER column, where a single-column sort skips
only on its own column. We verify against the actual parquet footers —
the same stats a 1000-executor scan would prune with — not Spark metrics
(which at this scale hide in task overhead).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.operators.layout import interleave_bits, write_zordered


def _file_bounds(path_glob: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per parquet file: {col: (min, max)} from footer row-group stats."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        bounds = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                assert st is not None and st.has_min_max
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            bounds[c] = (lo, hi)
        out.append(bounds)
    return out


def _overlapping(bounds, col, lo, hi) -> int:
    return sum(1 for b in bounds if not (b[col][1] < lo or b[col][0] > hi))


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    li = catalog.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], bits=16, target_files=16)
    # Baseline: the best single-column layout (globally sorted on
    # l_partkey) written with the same file count.
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zb = _file_bounds(zpath + "/part-*.parquet", ["l_partkey", "l_suppkey"])
    lb = _file_bounds(lpath + "/part-*.parquet", ["l_partkey", "l_suppkey"])
    assert len(zb) >= 8 and len(lb) >= 8  # layouts actually split

    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    pk_lo, pk_hi, sk_lo, sk_hi = stats
    # middle ~12% slab of each dimension
    pk_a = pk_lo + (pk_hi - pk_lo) * 44 // 100
    pk_b = pk_lo + (pk_hi - pk_lo) * 56 // 100
    sk_a = sk_lo + (sk_hi - sk_lo) * 44 // 100
    sk_b = sk_lo + (sk_hi - sk_lo) * 56 // 100

    # Dimension 1: the linear layout is optimal here; z-order must still
    # skip a solid majority (sqrt-degradation, not collapse).
    z1 = _overlapping(zb, "l_partkey", pk_a, pk_b)
    l1 = _overlapping(lb, "l_partkey", pk_a, pk_b)
    assert l1 <= len(lb) // 4
    assert z1 <= len(zb) * 3 // 4

    # Dimension 2: the single-column sort prunes ~nothing; z-order must
    # skip a meaningful fraction — the whole point of the layout.
    z2 = _overlapping(zb, "l_suppkey", sk_a, sk_b)
    l2 = _overlapping(lb, "l_suppkey", sk_a, sk_b)
    assert l2 >= len(lb) * 3 // 4, "baseline unexpectedly clustered on dim2"
    assert z2 <= len(zb) * 3 // 4, (z2, len(zb))
    assert z2 < l2

    # Layout is lossless: same multiset of rows.
    assert spark.read.parquet(zpath).count() == li.count()
    zsum = spark.read.parquet(zpath).agg(F.sum("l_quantity")).collect()[0][0]
    assert zsum == li.agg(F.sum("l_quantity")).collect()[0][0]


def test_interleave_bits_locality_property(spark):
    """Rows close in both dimensions are close on the curve: the max
    z-distance within a small 2D cell is bounded far below the global
    z-range (the property file-level min/max skipping relies on)."""
    df = spark.range(0, 1 << 10).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("bigint").alias("y")
    )
    z = df.select("x", "y", interleave_bits([F.col("x"), F.col("y")], bits=5).alias("z"))
    # every (x,y) in [0,32)^2 exactly once -> z is a bijection onto [0,1024)
    got = z.agg(
        F.count_distinct("z"), F.min("z"), F.max("z")
    ).collect()[0]
    assert tuple(got) == (1 << 10, 0, (1 << 10) - 1)
    # 4x4 cells are contiguous 16-value z-blocks: max spread within a
    # cell == 15, vs 1023 globally.
    spread = (
        z.groupBy((F.col("x") / 4).cast("int"), (F.col("y") / 4).cast("int"))
        .agg((F.max("z") - F.min("z")).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert spread == 15


def test_interleave_bits_overflow_guard(spark, tmp_path):
    """4+ columns at the default 16 bits would put the top interleaved
    bit on the bigint sign bit — guard raises; write_zordered instead
    auto-coarsens bits so multi-column clustering keeps working."""
    from etl_sample_spark.operators.layout import interleave_bits_sql

    cols = [F.lit(1)] * 4
    with pytest.raises(ValueError, match="63"):
        interleave_bits(cols, bits=16)
    with pytest.raises(ValueError, match="63"):
        interleave_bits_sql(["a", "b", "c", "d"], bits=16)
    # 63-bit-exact configurations stay legal and non-negative
    df = spark.range(0, 100).select(
        *[((F.col("id") + i) % (1 << 15)).alias(f"c{i}") for i in range(4)]
    )
    z = df.select(
        interleave_bits([F.col(f"c{i}") for i in range(4)], bits=15).alias("z")
    )
    assert z.agg(F.min("z")).collect()[0][0] >= 0

    # write_zordered auto-coarsens: 4 cluster columns at default bits=16
    # must write (not raise) and stay lossless.
    out = str(tmp_path / "z4")
    write_zordered(df, out, [f"c{i}" for i in range(4)], target_files=2)
    assert spark.read.parquet(out).count() == 100

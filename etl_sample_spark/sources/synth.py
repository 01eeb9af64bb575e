"""Scale-synthesis: re-keyed N× union of an existing sf directory.

The driver testdata tops out at sf0.1, where every headline query runs
in ~1s and fixed overhead dominates — an accidentally-quadratic stage
would still look fine. This module manufactures an sf1-class dataset by
unioning each table ``factor`` times with SHIFTED KEYS (the re-keying
discipline from ``tests/test_money_magnitude.py``): every key column is
offset by ``copy * (max_key + 1)``, so

- join relationships are preserved copy-locally (each copy's orders
  join each copy's customers/lineitems, never across copies),
- group cardinalities scale ×factor while per-group sizes stay flat
  (the realistic growth mode for a corpus),
- document text is perturbed per copy (suffix token + recomputed
  ``n_chars``) so signature/near-dup hash spread stays realistic
  instead of collapsing into factor-sized exact-duplicate groups.

Dimension tables (region, nation) are copied unchanged — at 100 TB the
dims stay broadcast-sized while facts grow, and the synthesis mirrors
that.

Usage (one-off, ~1 min at factor=10 from sf0.1):

    python -m etl_sample_spark.sources.synth /root/testdata/sf0.1 /tmp/sfsynth1 10
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog

# key column -> table whose max defines the shift stride. Every column
# listed here is offset by copy * (max+1) of its OWN key space, keeping
# FK edges aligned within a copy.
_KEY_SPACES = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

_MAX_KEY_SQL = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

_COPY_UNCHANGED = ("region", "nation")


def synthesize_scale(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int = 10
) -> dict[str, int]:
    """Write the re-keyed ``factor``× dataset to ``out_dir``; returns
    per-table output row counts. Each table is one read → crossJoin with
    a ``factor``-row broadcast range → key shift → write: a single
    map-side pass per table, no shuffle."""
    strides: dict[str, int] = {}
    for space, (tbl, col) in _MAX_KEY_SQL.items():
        strides[space] = int(
            catalog.table(spark, src_dir, tbl).agg(F.max(col)).head()[0]
        ) + 1

    copies = F.broadcast(spark.range(factor).withColumnRenamed("id", "__copy"))
    counts: dict[str, int] = {}
    for name in _COPY_UNCHANGED:
        df = catalog.table(spark, src_dir, name)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = df.count()
    for name, keys in _KEY_SPACES.items():
        df = catalog.table(spark, src_dir, name).crossJoin(copies)
        for col, space in keys:
            df = df.withColumn(col, F.col(col) + F.col("__copy") * F.lit(strides[space]))
        if name == "documents":
            # perturb text on non-original copies so content hashes and
            # signatures spread instead of duplicating factor-fold;
            # n_chars stays consistent with the perturbed text
            df = df.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" r"), F.col("__copy").cast("string"))
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        out = df.drop("__copy")
        # Spread the write across 32 KEY-RANGED part files: the map-side
        # crossJoin inherits the SOURCE file's split count (1-2 for the
        # sf0.1 single-file tables), so without this the 10x fact tables
        # land in 1-2 files and every downstream scan in the scale tier
        # runs 1-2 tasks wide — measured r14 as a suite-wide straggler
        # pattern ((20+1)/21 stages waiting on one scan task). Range
        # partitioning on the table's primary key (not round-robin,
        # which was measured to slow key-ranged consumers ~2x by fully
        # overlapping every file's key range) mirrors how ingested
        # tables land in production: one shuffle at generation buys
        # full, clustered scan parallelism for every consumer.
        out.repartitionByRange(32, keys[0][0]).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        counts[name] = out.count()
    return counts


def main() -> None:
    import sys

    from etl_sample_spark import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfsynth1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("sfsynth")
    spark.sparkContext.setLogLevel("ERROR")
    counts = synthesize_scale(spark, src, out, factor)
    for name, n in sorted(counts.items()):
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()

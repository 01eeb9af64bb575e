"""Driver-checked query over the [REF] normalization core.

The reference's flagship capability is turning a nested document corpus
into a star schema (``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``
:372-763 — explode arrays into child tables, flatten header structs,
stamp parent FKs, drop noise columns, skip absent sections). That path
(``normalize.py`` / ``forms.py``) was pytest-only through round 3; this
module puts it under the driver's sf0.01 DuckDB hash check.

Shape of the check: assemble a nested "scrape" corpus FROM the driver's
own parquet (one document per order: header struct + lines
array-of-structs), run the declarative ``normalize()`` spec over it
(flatten + explode + FK stamp + drop + required-section filter), join
the child table back to its parent on the stamped FK, and aggregate with
exact decimal money sums. The oracle recomputes the same numbers from
the flat ``orders``/``lineitem`` tables directly — so if any spec
semantics (explode grain, FK carry, required filter, drop) are wrong,
the hash diverges.

100 TB shape: the corpus assembly is one groupBy(orderkey) shuffle +
one join; ``normalize()`` itself compiles to generators/projections only
(map-side, no shuffle); the join-back is on the already-co-located FK.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.functions.money import REV_SQL, SUM2_SQL, dec2, revenue_dec, sum_money
from etl_sample_spark.normalize import TableSpec, normalize
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


def orders_as_documents(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """One nested document per order: header struct + lines array.

    This is the inverse of what the reference's pipelines consume — a
    JSON-ish corpus with a 1:N child section — built from the flat
    tables so the downstream normalization is cross-checkable."""
    # Repartition by the grouping key BEFORE the collect_list groupBy
    # (r16, guide §2.4): partial aggregation gives collect_list NOTHING
    # (lists concatenate — no map-side reduction), but Spark still
    # plans partial ObjectHashAggregate in the scan stage, so the
    # entire corpus's list-build ran inside the scan's (often single)
    # task. The explicit repartition satisfies the aggregate's
    # distribution requirement, so Catalyst plans ONE complete-mode
    # ObjectHashAggregate after the exchange — same single shuffle
    # (the groupBy reuses the repartition), list-build spread over the
    # reducers. Measured at sf0.1: 1.35 s → 1.00 s median, results
    # byte-identical. Keyed repartition without an explicit partition
    # count so AQE stays free to coalesce (a hard-coded N measured 3×
    # WORSE here and would be a local[32] constant anyway).
    lines = lineitem.repartition("l_orderkey").groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ).alias("lines")
    )
    return (
        orders.join(lines, orders["o_orderkey"] == lines["l_orderkey"])
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.struct("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate").alias(
                "header"
            ),
            "lines",
        )
    )


ORDER_DOC_SPECS = [
    # header flatten + FK stamp (reference :47-49 FK pattern, flatten :154+)
    TableSpec(
        "order_header",
        flatten="header",
        extra={"order_id": "order_id"},
        required="header.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'",
    ),
    # child explode + parent-key carry + drop (reference :101-126 pattern);
    # the required-section filter mirrors "absent section → no rows".
    # Besides the FK, the parent's priority rides the explode as a
    # struct-carry (reference :114-117 stamps parent fields the same
    # way) — so the rollup below needs NO join-back, halving the plan:
    # one lineitem scan + one collect_list exchange instead of two
    # scans + a sort-merge self-join on the FK.
    TableSpec(
        "order_lines",
        explode=(("lines", "ln"),),
        extra={"order_id": "order_id", "o_orderpriority": "header.o_orderpriority"},
        drop=("l_tax",),
        required="header.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'",
    ),
]


@register(
    "normalize_star_rebuild",
    f"""
    SELECT o.o_orderpriority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {SUM2_SQL.format(c="l_quantity")} AS sum_qty,
           {REV_SQL} AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="[REF] normalization core under the driver hash check: nested "
    "corpus → normalize() spec (flatten/explode/FK-stamp+struct-carry/"
    "drop/required) → exact-decimal rollup grouped on the carried "
    "parent field, with n_orders = COUNT(DISTINCT stamped FK) proving "
    "the FK carry. Single-subtree plan: one lineitem scan, one "
    "collect_list exchange; the header join-back a naive plan pays "
    "(second scan + FK sort-merge self-join) is exercised separately "
    "in the FK-integrity pytest suite. normalize.py::compile_table.",
)
def normalize_star_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    docs = orders_as_documents(orders, lineitem)
    tables = normalize(docs, ORDER_DOC_SPECS)
    lines = tables["order_lines"]  # line fields (minus l_tax) + FK + carry
    return (
        lines.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("order_id").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            sum_money(dec2("l_quantity")).alias("sum_qty"),
            sum_money(revenue_dec()).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )

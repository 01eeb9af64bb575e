"""Relational core: scans, filters, joins (J1-J5), aggregations (A1-A5).

The reference performs no runtime joins or aggregations — it *prepares*
joins by stamping FK columns on every child table (SURVEY §2.6,
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:47-49`` etc.) and
delegates them to the downstream SQL server. This module supplies the
join/agg surface those keys exist to serve, expressed declaratively so
Catalyst picks broadcast-hash vs sort-merge, pushes predicates into the
parquet scan, and runs partial (map-side) aggregation automatically.

Scale notes (100 TB):
- small dims (region, nation) get explicit ``F.broadcast`` hints; the
  big fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  the right plan — AQE splits skewed partitions at runtime.
- every aggregate is expressed as groupBy().agg() → Tungsten
  HashAggregateExec with partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.functions.money import REV_SQL, SUM2_SQL, dec2, revenue_dec, sum_money
from etl_sample_spark.pinning import pin
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: TPC-H Q3-shaped shipping-priority query (SURVEY §7 minimum slice)
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           -- exact decimal accumulation (order-independent), emitted as a
           -- correctly-rounded double (VARCHAR round-trip: DuckDB's direct
           -- decimal->double cast is not correctly rounded)
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))
                              AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="scan→filter→join→agg→sort→limit in one query (driver smoke twin)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-06-01")
    lineitem = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_money(revenue_dec()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# A1/A5: grouped aggregation — TPC-H Q1-shaped pricing summary
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag,
           l_linestatus,
           -- DuckDB's decimal->double cast computes int128 * 10^-scale in
           -- float (not correctly rounded; can be 1 ulp off Java's
           -- BigDecimal.doubleValue). Round-trip through VARCHAR: strtod
           -- IS correctly rounded, so both engines emit the same double.
           CAST(CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))
                    AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)      AS sum_disc_price,
           CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,4)))
                         AS DECIMAL(18,6))
                    * (1 + CAST(l_tax AS DECIMAL(18,4)))
                    AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)     AS sum_charge,
           AVG(l_quantity)                             AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)              AS avg_price,
           ROUND(AVG(l_discount), 6)                   AS avg_disc,
           COUNT(*)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Tungsten hash agg with partial aggregation; filter pushed to "
    "scan. Money SUMs accumulate as exact DECIMAL (order-independent, "
    "bit-identical across engines; at sf0.1 the charge sum is ~4.4e9 "
    "where one double ulp exceeds any sub-6dp rounding grid, so "
    "double ACCUMULATION can't be compared). The final exact decimal "
    "is then cast to DOUBLE — a single IEEE round-to-nearest step both "
    "engines perform identically — so the emitted type is hash-stable "
    "across the Spark/DuckDB bridge (Decimal objects stringify "
    "differently from float64). No ROUND after the cast: rounding an "
    "exact value risks HALF_UP vs HALF_EVEN divergence on grid hits.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2000-09-01")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = F.col("l_discount").cast("decimal(18,4)")
    tax_dec = F.col("l_tax").cast("decimal(18,4)")
    disc_price_dec = (price_dec * (1 - disc_dec)).cast("decimal(18,6)")
    charge_dec = (disc_price_dec * (1 + tax_dec)).cast("decimal(28,10)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(price_dec).cast("double").alias("sum_base_price"),
            F.sum(disc_price_dec).cast("double").alias("sum_disc_price"),
            F.sum(charge_dec).cast("double").alias("sum_charge"),
            # Unrounded: integral quantities sum exactly in double in any
            # order, so avg is bit-identical across engines; rounding an
            # exact rational risks HALF_UP/HALF_EVEN divergence on grid hits.
            F.avg("l_quantity").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# J1 + broadcast: 6-way star join (TPC-H Q5-shaped)
# --------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           {REV_SQL} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="star join; constant dims broadcast, the supplier dim pruned to a "
    "LEAF scan (pushed IN-filter from the ≤25-row nation⋈region collect) "
    "so SIZE-based planning broadcasts it at bench scale and degrades to "
    "a shuffle join at 100 TB — no forced hint on a growing relation",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    # The region's nation keys are CONSTANT (≤25 rows regardless of SF):
    # collect them once (the registry's sanctioned bounded-driver-state
    # pattern) and push the IN-list INTO the supplier scan. That keeps
    # the supplier dim a LEAF with real size statistics, so the planner
    # broadcasts it at bench scale ON SIZE (plan-pinned by
    # test_q5_broadcasts_dims) and falls back to a shuffle join at
    # 100 TB, where the region's suppliers are ~200 M rows and the r11
    # forced-broadcast form would OOM the driver (r12 broadcast audit —
    # a JOIN-OUTPUT dim has no usable stats and planned as a shuffle
    # even at bench scale, costing q5 a 10.9 MB lineitem exchange).
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    asia_keys = [r["n_nationkey"] for r in nr.select("n_nationkey").collect()]
    dim = supplier.where(F.col("s_nationkey").isin(asia_keys)).select(
        "s_suppkey", "s_nationkey"
    )
    # SEMI-filter on the widest fact BEFORE any shuffle: only
    # region-supplied lineitems enter the orderkey/custkey exchanges,
    # cutting the dominant shuffle volume by the region's selectivity
    # (~1/|regions|) — a derived filter Catalyst cannot infer on
    # non-partitioned parquet. Measured at sf0.1: ~20% faster than the
    # unfiltered plan; at 100 TB the saving scales with the lineitem
    # shuffle itself. (Spark's own runtime bloom filter injects this
    # same pruning automatically once the application side crosses its
    # 10 GB scan threshold — the explicit semi keeps it at bench scale.)
    li_local = lineitem.join(dim, lineitem.l_suppkey == dim.s_suppkey, "left_semi")
    n_names = F.broadcast(
        nr.select(F.col("n_nationkey").alias("__nk"), "n_name")
    )
    return (
        li_local.join(orders, li_local.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            dim,
            (F.col("l_suppkey") == dim.s_suppkey) & (customer.c_nationkey == dim.s_nationkey),
        )
        .join(n_names, F.col("s_nationkey") == F.col("__nk"))
        .groupBy("n_name")
        .agg(sum_money(revenue_dec()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# J2: outer joins
# --------------------------------------------------------------------------


@register(
    "join_left_outer_customer_orders",
    """
    SELECT c_custkey,
           c_name,
           COUNT(o_orderkey)                              AS n_orders,
           COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE), 0.0)
                                                          AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    doc="left outer join preserving customers with no orders (count=0); "
    "the money sum follows the exact-decimal pattern (functions/money.py) "
    "— an unordered groupBy double-sum is the order-dependent class",
)
def join_left_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.money import dec2, sum_money

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(sum_money(dec2("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_nation_sides",
    """
    SELECT COALESCE(cn.nk, sn.nk)     AS nationkey,
           COALESCE(cn.n_cust, 0)     AS n_cust,
           COALESCE(sn.n_supp, 0)     AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
      ON cn.nk = sn.nk
    ORDER BY nationkey
    """,
    doc="full outer join over two aggregated sides with coalesced keys",
)
def join_full_outer_nation_sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# J3: semi / anti joins
# --------------------------------------------------------------------------


@register(
    "join_semi_customers_with_urgent_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    doc="left semi join (EXISTS); no row multiplication from the right side",
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="left anti join (NOT EXISTS)",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J4: cross join
# --------------------------------------------------------------------------


@register(
    "join_cross_region_nation_grid",
    """
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
    doc="cross join of two small dims (BroadcastNestedLoopJoin physical)",
)
def join_cross_region_nation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select(
            "r_name",
            "n_name",
            F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("is_home"),
        )
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# J5: theta / non-equi join
# --------------------------------------------------------------------------


@register(
    "join_theta_customer_outbalances_supplier",
    """
    SELECT c.c_custkey, s.s_suppkey,
           ROUND(c.c_acctbal - s.s_acctbal, 2) AS balance_gap
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey AND c.c_acctbal > s.s_acctbal
    ORDER BY c.c_custkey, s.s_suppkey
    """,
    doc="mixed equi + non-equi predicate: hash join on nationkey, theta "
    "filter after. No forced broadcast (r12 audit): supplier grows with "
    "SF, so the hint is left to the size-based planner — broadcast-hash "
    "at bench scale, shuffle-hash on nationkey beyond the threshold.",
)
def join_theta_customer_outbalances_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(s, (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal))
        .select("c_custkey", "s_suppkey", F.round(F.col("c_acctbal") - F.col("s_acctbal"), 2).alias("balance_gap"))
        .orderBy("c_custkey", "s_suppkey")
    )


# --------------------------------------------------------------------------
# A2: distinct + count-distinct
# --------------------------------------------------------------------------


@register(
    "agg_count_distinct_per_segment",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey)        AS n_nations,
           COUNT(*)                           AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="count-distinct (expand + two-phase agg under the hood)",
)
def agg_count_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "distinct_order_status_priority",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="distinct (hash aggregate on all columns)",
)
def distinct_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# A3: rollup / cube / grouping sets
# --------------------------------------------------------------------------


@register(
    "agg_rollup_region_nation",
    f"""
    SELECT COALESCE(r_name, 'ALL')  AS region_name,
           COALESCE(n_name, 'ALL')  AS nation_name,
           COUNT(*)                 AS n_customers,
           {SUM2_SQL.format(c="c_acctbal")} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    doc="rollup hierarchy region→nation→grand total",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), sum_money(dec2("c_acctbal")).alias("total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "agg_cube_status_priority",
    f"""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                         AS n_orders,
           {SUM2_SQL.format(c="o_totalprice")} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="cube over two dims (all 4 grouping sets)",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), sum_money(dec2("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


# --------------------------------------------------------------------------
# A4: collect_list / collect_set (re-nest; inverse of explode, SURVEY §2.4)
# --------------------------------------------------------------------------


@register(
    "agg_collect_set_priorities_per_status",
    """
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), '|') AS priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="collect_set + sort + join→string: deterministic re-nesting check",
)
def agg_collect_set_priorities_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias("priorities"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A5: percentiles / stddev
# --------------------------------------------------------------------------


@register(
    "agg_percentile_stddev_prices",
    """
    SELECT o_orderstatus,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4)  AS median_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4)  AS p90_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4)         AS sd_price,
           ROUND(MIN(o_totalprice), 2)                 AS min_price,
           ROUND(MAX(o_totalprice), 2)                 AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="exact interpolated percentiles + sample stddev",
)
def agg_percentile_stddev_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_percentile_approx_prices",
    None,  # sketch-based: no cross-engine oracle; rows-only check +
    # tolerance-bounded pytest vs the exact percentile
    doc="A5 at 100 TB: percentile_approx (GK / KLL-style sketch, bounded "
    "memory, mergeable partials) replaces exact percentile's full "
    "per-group sort-in-memory. accuracy=10000 → rank error ≤ 1/10000. "
    "The exact twin (agg_percentile_stddev_prices) stays for the oracle "
    "row; this is the plan you'd actually run on a cluster.",
)
def agg_percentile_approx_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 4).alias("median_price"),
            F.round(F.percentile_approx("o_totalprice", 0.9, 10000), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated by Catalyst)
# --------------------------------------------------------------------------


@register(
    "subquery_above_avg_lineitems",
    """
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_extendedprice > (SELECT AVG(l_extendedprice) * 1.8 FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="scalar subquery in predicate (broadcast of 1-row aggregate)",
)
def subquery_above_avg_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    threshold = li.agg((F.avg("l_extendedprice") * 1.8).alias("thr"))
    return (
        li.join(F.broadcast(threshold))
        .where(F.col("l_extendedprice") > F.col("thr"))
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "data_quality_orders",
    """
    SELECT COUNT(*)                                                   AS n_rows,
           COUNT(*) - COUNT(o_orderkey)                               AS null_keys,
           COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)             AS dup_keys,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS neg_prices,
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                           OR o_orderdate > TIMESTAMP '2000-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)                AS out_of_range_dates,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                         THEN 1 ELSE 0 END) AS BIGINT)                AS bad_status
    FROM orders
    """,
    doc="Data-quality rule evaluation in ONE pass: row count, null "
    "keys, duplicate keys, domain violations (negative money, "
    "out-of-range dates, unknown status codes) — the post-load "
    "validation the reference never does (its to_sql appends are "
    "fire-and-forget). Shape at scale: a single partial-aggregable "
    "scan; only the uniqueness rule shuffles (distinct on the key), "
    "everything else is map-side conditional sums.",
)
def data_quality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def violations(cond):
        return F.sum(cond.cast("bigint"))

    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("null_keys"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        violations(F.col("o_totalprice") < 0).alias("neg_prices"),
        violations(
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") > F.lit("2000-01-01").cast("timestamp"))
        ).alias("out_of_range_dates"),
        violations(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bad_status"),
    )


@register(
    "data_quality_fk_orphans",
    """
    SELECT
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphans,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS order_orphans,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        AS customer_orphans
    """,
    doc="Referential-integrity audit: orphan counts across the star's FK "
    "edges (lineitem->orders, orders->customer, customer->nation) via "
    "left-anti joins — the check that makes the reference's FK-stamping "
    "design verifiable after load. Shape at scale: each edge is one "
    "anti join shuffling only the key columns; the nation edge "
    "broadcasts.",
)
def data_quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey")

    def orphan_count(child, parent, cond, alias):
        return child.join(parent, cond, "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias(alias)
        )

    a = orphan_count(
        li, o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "lineitem_orphans"
    )
    b = orphan_count(
        o.select("o_custkey"),
        c.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "order_orphans",
    )
    d = orphan_count(
        c.select("c_nationkey"),
        F.broadcast(n),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "customer_orphans",
    )
    # 1-row x 1-row crossJoins: the scalar-subquery shape (constant-cost
    # single-row broadcast), same class as q11/q22.
    return a.crossJoin(b).crossJoin(d)



@register(
    "histogram_quantile_prices",
    """
    WITH bounds AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             COUNT(*) AS n
      FROM lineitem),
    bucketed AS (
      SELECT LEAST(CAST(FLOOR((l.l_extendedprice - b.lo)
                               / ((b.hi - b.lo) / 1000.0)) AS BIGINT),
                   999) AS bucket
      FROM lineitem l, bounds b),
    counts AS (
      SELECT bucket, COUNT(*) AS cnt FROM bucketed GROUP BY bucket),
    cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cnt
      FROM counts),
    qs AS (
      SELECT UNNEST([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
                     0.9::DOUBLE, 0.99::DOUBLE]) AS q),
    hits AS (
      SELECT q.q, c.bucket, c.cum_cnt,
             ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY c.bucket) AS rn
      FROM qs q JOIN cum c
        ON c.cum_cnt >= CEIL(q.q * (SELECT n FROM bounds)))
    SELECT h.q,
           CAST(h.bucket AS BIGINT)        AS bucket,
           b.lo + (h.bucket + 1) * ((b.hi - b.lo) / 1000.0) AS quantile_upper,
           CAST(h.cum_cnt AS BIGINT)       AS cum_cnt,
           (b.hi - b.lo) / 1000.0          AS max_error
    FROM hits h, bounds b
    WHERE h.rn = 1
    ORDER BY h.q
    """,
    doc="Mergeable histogram quantile sketch with a FULL hash oracle — "
    "the deterministic counterpart to agg_percentile_approx_prices "
    "(whose engine-native KLL sketch is rows-only by nature): bucket "
    "l_extendedprice onto a fixed 1000-cell grid between the exact "
    "min/max, cumulative-sum the counts, and answer each quantile with "
    "the first bucket whose cumulative count reaches ceil(q*n), "
    "reporting the bucket's upper edge and the worst-case error (ONE "
    "bucket width — the sketch's contract). Every comparison is exact "
    "integer; the bucket index and edges are identical IEEE doubles in "
    "both engines because they derive from the same exact 2dp money "
    "values. 100 TB shape: the bucket GROUP BY is map-side combinable "
    "and 1000-bounded — each partition ships <=1000 partial counts, "
    "the merge is an integer add, and that mergeability is exactly why "
    "production systems run this sketch instead of a global sort; the "
    "min/max pre-pass is itself a combinable aggregate.",
)
def histogram_quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    if b["lo"] is None:
        raise ValueError("histogram_quantile: empty input — no quantiles")
    lo, hi, n = float(b["lo"]), float(b["hi"]), int(b["n"])
    if hi == lo:
        # width 0 would NaN the bucketing into silent nonsense; the
        # degenerate answer is trivial, so refuse loudly instead
        raise ValueError(
            f"histogram_quantile: constant column (all values {lo!r}) — "
            "every quantile is that constant; no histogram needed"
        )
    width = (hi - lo) / 1000.0
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)).cast("bigint"),
        F.lit(999).cast("bigint"),
    )
    counts = li.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum_cnt", F.sum("cnt").over(w))
    qs = spark.createDataFrame([(q,) for q in (0.25, 0.5, 0.75, 0.9, 0.99)], "q double")
    hits = qs.join(cum, F.col("cum_cnt") >= F.ceil(F.col("q") * F.lit(n)))
    rn = F.row_number().over(Window.partitionBy("q").orderBy("bucket"))
    return (
        hits.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "q",
            F.col("bucket").cast("bigint").alias("bucket"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("quantile_upper"),
            F.col("cum_cnt").cast("bigint").alias("cum_cnt"),
            F.lit(width).alias("max_error"),
        )
        .orderBy("q")
    )


# --------------------------------------------------------------------------
# Runtime bloom-filter join acceleration (operators/bloom.py consumer)
# --------------------------------------------------------------------------


@register(
    "bloom_semi_join_orders_customers",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {SUM2_SQL.format(c="o_totalprice")} AS sum_price
    FROM orders
    WHERE EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="explicit Bloom-filter pre-join pruning (operators/bloom.py): the "
    "filtered customer keys are folded into a 2^20-bit bitmap "
    "(16K longs, always broadcastable), orders is probed MAP-SIDE via "
    "broadcast joins before the exact semi join removes the false "
    "positives — result-invariant vs the plain EXISTS oracle. At 100 TB "
    "the bloom probe shrinks the fact side's shuffle into the real join "
    "by the filter's selectivity at the cost of zero added Exchanges. "
    "Cost demonstrated here: the HONEST single-shot path — each "
    "invocation pays the ~0.23 s (sf0.1) bitmap build; a caller reusing "
    "the filter across probes builds once with bloom_build_local "
    "(r12 amortized API; SCALE.md 'Bloom build amortization').",
)
def bloom_semi_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.bloom import bloom_build, bloom_probe

    num_bits, num_hashes = 1 << 20, 3
    building = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    bitmap = bloom_build(building, "c_custkey", num_bits, num_hashes)
    pruned = bloom_probe(orders, "o_custkey", bitmap, num_bits, num_hashes)
    # The exact semi join removes bloom false positives; the bloom stage
    # only shrinks what reaches this shuffle.
    return (
        pruned.join(
            building.select("c_custkey"),
            pruned.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money(dec2("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "bitmap_exact_distinct_customers",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXACT distinct counting via mergeable bitmaps (A2's exact "
    "counterpart to HLL): keys are bucketed (bitmap_bucket_number / "
    "bitmap_bit_position partition the bigint key space into 32k-bit "
    "pages), each synthetic shard builds its page bitmaps with "
    "bitmap_construct_agg, shard bitmaps are OR-merged per page "
    "(bitmap_or_agg — associative and idempotent, so retries/overlaps "
    "cannot overcount), and the page popcounts sum to the exact "
    "distinct count. The shard tier is deliberate: it is the shape of "
    "a 1000-executor pre-aggregation or an incremental daily rollup "
    "(store page bitmaps, OR tomorrow's in — exact distinct without "
    "re-scanning history, impossible with plain COUNT DISTINCT and "
    "only approximate with HLL). Oracle: COUNT(DISTINCT). "
    "Reference analog: none ([EXT] bitmap aggregates).",
)
def bitmap_exact_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__bm_orders")
    return spark.sql(
        """
        WITH sharded AS (
          SELECT o_orderpriority,
                 o_orderkey % 8 AS shard,
                 bitmap_bucket_number(o_custkey) AS page,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS b,
                 COUNT(*) AS n
          FROM __bm_orders
          GROUP BY o_orderpriority, o_orderkey % 8,
                   bitmap_bucket_number(o_custkey)),
        merged AS (
          SELECT o_orderpriority, page, bitmap_or_agg(b) AS b, SUM(n) AS n
          FROM sharded GROUP BY o_orderpriority, page)
        SELECT o_orderpriority,
               SUM(bitmap_count(b)) AS n_customers,
               SUM(n) AS n_orders
        FROM merged
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "listagg_nations_per_region",
    """
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="Spark 4 listagg (SQL:2023 LISTAGG ... WITHIN GROUP): ordered "
    "string aggregation as a first-class aggregate — the deterministic "
    "ORDER BY inside the group is what makes the result hash-stable "
    "across engines and partitionings (collect_list + array_join has "
    "no such guarantee without an explicit sort). Bounded groups only "
    "(dimension-sized): an unbounded listagg over a fact table is the "
    "string version of the unpartitioned collect. Oracle: DuckDB "
    "string_agg with ORDER BY. Reference analog: none ([EXT] listagg, "
    "Spark 4.0).",
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "region").createOrReplaceTempView("__la_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("__la_nation")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                 AS nations,
               COUNT(*) AS n_nations
        FROM __la_region r JOIN __la_nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
        """
    )


@register(
    "mad_outlier_prices_by_brand",
    """
    WITH med AS (
      SELECT p_brand, QUANTILE_CONT(p_retailprice, 0.5) AS med
      FROM part GROUP BY p_brand),
    dev AS (
      SELECT p.p_brand, p.p_retailprice, m.med,
             ABS(p.p_retailprice - m.med) AS adev
      FROM part p JOIN med m ON p.p_brand = m.p_brand),
    mad AS (
      SELECT p_brand, QUANTILE_CONT(adev, 0.5) AS mad
      FROM dev GROUP BY p_brand)
    SELECT d.p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN d.adev > 3.0::DOUBLE * 1.4826::DOUBLE * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MAX(d.med), 4) AS median_price,
           ROUND(MAX(m.mad), 4) AS mad_price
    FROM dev d JOIN mad m ON d.p_brand = m.p_brand
    GROUP BY d.p_brand
    ORDER BY d.p_brand
    """,
    doc="Robust outlier detection via Median Absolute Deviation: per "
    "brand, median and MAD (median of |x - median|), then the classic "
    "3-sigma-equivalent flag |x - med| > 3 * 1.4826 * MAD — the "
    "consistency constant makes MAD estimate sigma under normality, "
    "but unlike mean/stddev the estimator has a 50% breakdown point, "
    "so the outliers themselves cannot drag the threshold (the failure "
    "mode of the sigma-clip family on heavy-tailed measurement "
    "columns). Exact medians both sides (Spark percentile == DuckDB "
    "QUANTILE_CONT linear interpolation, the established r8 pairing). "
    "100 TB shape: two grouped exact percentiles + one broadcast-sized "
    "per-brand stats join back onto the scan. Reference analog: none "
    "([EXT] robust statistics).",
)
def mad_outlier_prices_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    # pin the BRAND-sized medians (r15 scan audit): med feeds both the
    # MAD pass and the stats join — unpinned, each branch re-ran the
    # percentile scan (7 part scans in the executed plan). Pinned, part
    # is scanned exactly the three algorithmically necessary times
    # (median, MAD, outlier count).
    med = pin(part.groupBy("p_brand").agg(
        F.expr("percentile(p_retailprice, 0.5)").alias("med")
    ))
    mad = pin(
        part.join(F.broadcast(med), "p_brand")
        .withColumn("adev", F.abs(F.col("p_retailprice") - F.col("med")))
        .groupBy("p_brand")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    # one per-brand stats frame joined back onto the scan ONCE — keeps
    # the lineage single-consumer so the scan and the median percentile
    # are not silently re-executed per downstream branch
    stats = med.join(mad, "p_brand")
    return (
        part.join(F.broadcast(stats), "p_brand")
        .withColumn("adev", F.abs(F.col("p_retailprice") - F.col("med")))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.col("adev") > 3.0 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max("med"), 4).alias("median_price"),
            F.round(F.max("mad"), 4).alias("mad_price"),
        )
        .orderBy("p_brand")
    )

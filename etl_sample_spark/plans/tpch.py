"""TPC-H-shaped query suite adapted to the driver's simplified star schema.

The reference performs no runtime joins or aggregations (SURVEY §2.6-2.7;
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py`` prepares a star
schema and delegates queries downstream). These queries exercise the
[EXT] relational surface those FK-stamped tables exist to serve, in the
classic TPC-H shapes, adapted because the driver schema omits partsupp,
l_shipmode / l_commitdate / l_receiptdate, c_phone, and p_container.

Scale notes (100 TB):
- broadcast hints are FORCED only on relations whose size is constant
  in SF (nation/region, 1-row scalar aggregates like q15's max or
  q22's threshold). Relations that GROW with the data — part,
  supplier, customer, and part-/supplier-keyed aggregates — carry NO
  hint (r12 broadcast audit): at bench SF Spark's size statistics and
  AQE still pick broadcast-hash joins (plan-pinned), while at 100 TB
  (part ≈ 2 B rows) the same code degrades to a shuffle join instead
  of a guaranteed driver OOM. A forced hint overrides the size check
  at EVERY scale, which is exactly wrong for a growing relation.
- the only shuffles left are fact⋈fact on the join key plus the final
  agg, which is what a 1000-executor plan should look like.
- correlated subqueries (q17 avg-per-part, q22 NOT EXISTS) are written
  as aggregate-then-broadcast-join / anti-join — the decorrelated plan
  Catalyst would produce, stated explicitly so intent survives refactors.
- EXISTS with a non-equi correlated predicate (q4) is a left-semi join
  with a composite condition: hash on the equi part, filter on the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.functions.money import (
    REV_DEC_SQL,
    REV_SQL,
    SUM2_SQL,
    dec2,
    dec4,
    revenue_dec,
    sum_money,
)
from etl_sample_spark.operators.skew import salted_join
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS w/ correlated non-equi predicate → left-semi "
    "join hashed on orderkey, shipped-late filter applied inside the join",
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey) & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_discount AS DECIMAL(18,4))
                              AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+agg — all three predicates push "
    "into the parquet scan (PushedFilters), no shuffle beyond 1-row agg",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_amt = (dec2("l_extendedprice") * dec4("l_discount")).cast("decimal(18,6)")
    return li.agg(sum_money(disc_amt).alias("revenue"))


@register(
    "q7_volume_shipping_pairs",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             {REV_DEC_SQL} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: self-joined nation dim under two roles; both "
    "nation copies broadcast, pair-predicate applied post-join",
)
def q7_volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), customer.c_nationkey == n2.c_nk)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(sum_money(revenue_dec()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           -- UNROUNDED ratio: both operands are exact decimal sums bridged
           -- to double identically on each engine, so the IEEE division is
           -- bit-identical too; ROUND here would reintroduce HALF_UP vs
           -- float-multiply divergence on near-tie values (ADVICE r3).
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,6)) END)
                     AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {REV_DEC_SQL} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO')
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: market share of one supplier-nation inside a "
    "region, conditional-sum ratio per year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_in_region = (
        customer.join(F.broadcast(n1), customer.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    # Money sums accumulate in exact decimal (functions/money.py): both the
    # numerator and denominator are bridged to double only after the exact
    # SUM, so the ratio is computed from bit-identical operands on any engine.
    volume_dec = revenue_dec()
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == cust_in_region.c_custkey, "left_semi")
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), supplier.s_nationkey == n2.s_nk)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                sum_money(
                    F.when(F.col("nation") == "NATION_5", volume_dec).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                )
                / sum_money(volume_dec)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year,
           CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST({REV_DEC_SQL}
                  - CAST(p_retailprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(12,0))
                    * CAST(0.1 AS DECIMAL(2,1))
                  AS DECIMAL(25,6)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 shape (no partsupp: cost modeled as 10% of retail price "
    "per unit); LIKE filter on part name pushed below the joins. Profit "
    "accumulates in exact decimal (functions/money.py): revenue at scale "
    "6 minus cost at scale 3, normalized to decimal(25,6) per row",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cost = dec2("p_retailprice") * F.col("l_quantity").cast("decimal(12,0)") * F.lit("0.1").cast(
        "decimal(2,1)"
    )
    amount = (revenue_dec() - cost).cast("decimal(25,6)")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(sum_money(amount).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q10_returned_items_top20",
    f"""
    SELECT c_custkey, c_name,
           {REV_SQL} AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, one-quarter "
    "window, global top-20 (TakeOrderedAndProject)",
)
def q10_returned_items_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum_money(revenue_dec()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipmode→returnflag): conditional counts of "
    "high/low priority among late-shipped lines",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(
            orders,
            (lineitem.l_orderkey == orders.o_orderkey) & (lineitem.l_shipdate > orders.o_orderdate),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue_ratio",
    f"""
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                      THEN {REV_DEC_SQL}
                                      ELSE CAST(0 AS DECIMAL(18,6)) END)
                        AS VARCHAR) AS DOUBLE)
           / {REV_SQL} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share in one month; the part dim "
    "broadcasts by SIZE at bench scale (no forced hint — it grows with "
    "SF, r12 audit) so the fact side never shuffles there. Both sums accumulate in "
    "exact decimal and bridge to double before the ratio, so the division "
    "operates on bit-identical operands in both engines — no post-bridge "
    "ROUND (functions/money.py)",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    lineitem = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    promo_dec = F.when(F.col("p_type") == "PROMO", revenue_dec()).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * sum_money(promo_dec) / sum_money(revenue_dec())).alias(
                "promo_revenue"
            )
        )
    )


@register(
    "q15_top_revenue_suppliers",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({REV_DEC_SQL}) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: top supplier by quarterly revenue via "
    "aggregate→scalar-max→equality join (the decorrelated view form). "
    "The MAX-equality filter compares EXACT DECIMAL sums — an equality "
    "on double-accumulated sums is cross-engine fragile by construction; "
    "the double bridge happens only in the projection",
)
def q15_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_dec()).alias("total_dec")
    )
    max_rev = revenue.agg(F.max("total_dec").alias("max_dec"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_dec == max_rev.max_dec, "left_semi")
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT {SUM2_SQL.format(c="l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#12'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-part AVG decorrelated into a "
    "grouped aggregate joined back to the fact (size-based broadcast at "
    "bench scale; part-keyed, so no forced hint — r12 audit). The price sum "
    "accumulates in exact decimal; the AVG threshold is safe in double "
    "because quantities are small integers (exact at any sum order)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12").select("p_partkey")
    per_part_avg = lineitem.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(per_part_avg, lineitem.l_partkey == per_part_avg.avg_pk)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((sum_money(dec2("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_quantity_orders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(sum_qty, 2)      AS sum_qty
    FROM customer, orders,
         (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big
    WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: HAVING on grouped fact, joined back to orders + "
    "customer; quantity sums are exact (integral doubles)",
)
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
            F.col("o_totalprice").alias("_sort"),
        )
        .orderBy(F.desc("_sort"), F.asc("o_orderkey"))
        .limit(100)
        .drop("_sort")
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT {REV_SQL} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive ranges spanning both "
    "join sides — join on partkey, OR-predicate evaluated post-join",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def clause(brand: str, max_size: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = clause("Brand#12", 15, 1, 11) | clause("Brand#14", 25, 10, 20) | clause(
        "Brand#15", 35, 20, 30
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .where(cond)
        .agg(sum_money(revenue_dec()).alias("revenue"))
    )


@register(
    "q22_idle_customers",
    f"""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {SUM2_SQL.format(c="c_acctbal")} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {SUM2_SQL.format(c="c_acctbal")} / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape (phone cntrycode→nationkey): above-average-balance "
    "customers with no orders — scalar subquery + anti join. The AVG "
    "threshold is an exact decimal SUM bridged to double, then divided by "
    "the exact count, so the > comparison sees bit-identical operands in "
    "both engines (a double-accumulated AVG is order-dependent)",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    threshold = customer.where(F.col("c_acctbal") > 0.0).agg(
        (sum_money(dec2("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_money(dec2("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "skewjoin_revenue_by_priority",
    f"""
    SELECT o_orderpriority,
           COUNT(*)   AS n_lines,
           {REV_SQL}  AS revenue
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="skew path: the fact-fact join executed through salted_join "
    "(operators/skew.py) — semantics identical to the plain join the "
    "oracle runs; the salt spreads hot keys over n_salts reducers. "
    "Salted on the (l_orderkey, l_linenumber) unique key (r12): a "
    "deterministic per-row salt survives shuffle-fetch retries, where "
    "the r11 positional salt could re-deal rows mid-recovery. r14: the "
    "join is pinned to sort-merge (salted_join force_shuffle) — the "
    "optimizer previously picked broadcast here, where the salt has no "
    "reducers to spread and just replicated the build side 4x (the r13 "
    "10x scale outlier); the hinted path scales ~linearly.",
)
def skewjoin_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(
            lineitem,
            orders,
            "l_orderkey",
            "o_orderkey",
            n_salts=4,
            salt_from=["l_orderkey", "l_linenumber"],
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            sum_money(revenue_dec()).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: two-level aggregation — per-customer order "
    "counts, then the histogram of those counts (the second agg's input "
    "is already tiny, AQE coalesces its shuffle to a few partitions)",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "agg_hll_approx_distinct",
    None,  # HLL estimates are engine-specific: rows-only check; pytest
    # bounds the estimate against the exact count
    doc="A2 scale path: approx_count_distinct (HyperLogLog++) — the "
    "100 TB substitute for exact count-distinct's expand+double-shuffle; "
    "estimate bounded within 5% of exact in tests",
)
def agg_hll_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custkeys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q16_supplier_count_by_part_attrs",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#12'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (lineitem as the partsupp surrogate): distinct "
    "supplier counts per part attribute with a NOT-IN anti-join exclusion "
    "list (anti join on the filtered supplier set; size-based broadcast "
    "at bench scale, no forced hint — r12 audit)",
)
def q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_suppliers = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    lineitem = _t(spark, sf_dir, "lineitem").join(
        bad_suppliers,
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_suppliers_with_excess_stock",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND p_name LIKE '%blue%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape: suppliers who moved > 100 units of blue parts "
    "in 1996 — grouped HAVING subquery, IN as a left-semi join",
)
def q20_suppliers_with_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%blue%")).select("p_partkey")
    lineitem = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    movers = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
    )
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.join(
            movers, supplier.s_suppkey == movers.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 100 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 100 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    doc="TPC-H Q21 shape (lateness := shipped >100 days after order, the "
    "schema's receipt/commit-date proxy): suppliers in one nation who "
    "were the ONLY late supplier on a finished multi-supplier order. "
    "Spark side replaces the correlated EXISTS/NOT-EXISTS pair with one "
    "per-order aggregate (n_suppliers, n_late_suppliers) — a single "
    "shuffle on the order key that the join-back reuses — while the "
    "oracle keeps the textbook correlated form, so the two engines cross-"
    "check the de-correlation itself.",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supplier = _t(spark, sf_dir, "supplier")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
    # Two-level agg instead of two countDistincts: the gid-expand plan
    # for multi-distinct doubles every shuffled row, while (orderkey,
    # suppkey) → orderkey shuffles each line once and the second hop is
    # already just one row per order-supplier.
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("is_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late_supp"),
    )
    qualifying = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    nation_suppliers = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name")
    return (
        lo.where(late)
        .join(qualifying.select("l_orderkey"), "l_orderkey")
        .join(nation_suppliers, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q2_min_cost_supplier_per_part",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             ROUND(AVG(l_extendedprice / l_quantity), 6) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cost, l_suppkey) AS rn
      FROM costs)
    SELECT r.l_partkey AS partkey, r.l_suppkey AS suppkey,
           r.unit_cost, s_name
    FROM ranked r JOIN supplier ON s_suppkey = r.l_suppkey
    WHERE rn = 1 AND r.l_partkey <= 200
    ORDER BY partkey
    """,
    doc="TPC-H Q2 shape (lineitem as partsupp surrogate): cheapest "
    "supplier per part — argmin-per-group as rank-1 over a rounded cost "
    "(rounding before ranking makes the cross-engine order exact); "
    "partkey cap keeps the oracle result bounded at any sf",
)
def q2_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    costs = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("l_partkey") <= 200))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "unit_cost",
            "s_name",
        )
        .orderBy("partkey")
    )


@register(
    "q11_important_part_values",
    f"""
    WITH part_value AS (
      SELECT l_partkey,
             SUM({REV_DEC_SQL}) AS value_dec
      FROM lineitem
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey,
           CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS value
    FROM part_value
    WHERE CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) >
          (SELECT CAST(CAST(SUM(value_dec) AS VARCHAR) AS DOUBLE) / COUNT(*) * 1.2
           FROM part_value)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 shape (lineitem as partsupp surrogate): per-part value "
    "exceeding a global threshold — grouped agg + 1-row scalar aggregate "
    "broadcast into the HAVING filter. Threshold is 1.2x the mean part "
    "value (scale-free; Q11's fixed total-fraction threshold selects "
    "nothing once part count grows with sf). Per-part values and the "
    "global mean both come from exact decimal sums bridged to double — "
    "the AVG-of-doubles it replaces is order-dependent across engines",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part_value = lineitem.groupBy("l_partkey").agg(F.sum(revenue_dec()).alias("value_dec"))
    # Mean part value from the EXACT total: sum the per-part decimal sums
    # (still exact), bridge once, divide by the part count — identical
    # bits in both engines, unlike avg() over double part values.
    threshold = part_value.agg(
        (F.sum("value_dec").cast("double") / F.count(F.lit(1)) * F.lit(1.2)).alias("thr")
    )
    value_dbl = F.col("value_dec").cast("double")
    return (
        part_value.join(F.broadcast(threshold))
        .where(value_dbl > F.col("thr"))
        .select(F.col("l_partkey").alias("partkey"), value_dbl.alias("value"))
        .orderBy(F.desc("value"), F.asc("partkey"))
    )

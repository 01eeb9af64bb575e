"""Analytic surface beyond the core windows module: distribution window
functions, value windows, RANGE frames, pivot, GROUPING SETS, and
MapType extraction.

All [EXT] per SURVEY §2 — the reference has no window functions
(verified over the whole of
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``); its only
map-shaped operation is plucking known keys out of the ``statistics``
dict (``pipeline.py:80-88,457-465``), which map_props_extract
re-expresses as a typed MapType lookup.

Determinism discipline: every window ordering carries a unique tie-break
key; RANGE frames order on an integer day offset so Spark's numeric
rangeBetween and DuckDB's RANGE ... PRECEDING agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.pinning import pin
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "win_percent_rank_cume_dist",
    """
    SELECT c_nationkey, c_custkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
    doc="W1: distribution functions percent_rank / cume_dist per nation "
    "(single window exchange for both). Emitted UNROUNDED: both engines "
    "compute the identical double from exact integer ratios, while "
    "rounding diverges on 2^a*5^b boundary values (e.g. 41/640 = "
    ".0640625 → HALF_UP .064063 vs HALF_EVEN .064062).",
)
def win_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


@register(
    "win_first_last_value_suppliers",
    """
    SELECT s_nationkey, s_suppkey,
           FIRST_VALUE(s_name) OVER w AS richest_name,
           LAST_VALUE(s_name)  OVER w AS poorest_name
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY s_nationkey, s_suppkey
    """,
    doc="W2: first_value/last_value over a full-partition frame (the "
    "default frame would make last_value degenerate — frame is explicit)",
)
def win_first_last_value_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _t(spark, sf_dir, "supplier")
        .select(
            "s_nationkey",
            "s_suppkey",
            F.first("s_name").over(w).alias("richest_name"),
            F.last("s_name").over(w).alias("poorest_name"),
        )
        .orderBy("s_nationkey", "s_suppkey")
    )


@register(
    "win_range_30d_customer_spend",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY DATE_DIFF('day', TIMESTAMP '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="W3: trailing-30-day RANGE frame — ordered on integer day offset "
    "so both engines frame identically; same-day rows share a frame. "
    "Double sum is grid-safe: 30-day per-customer frames are small, so "
    "FP error (~1e-9) cannot cross the 0.005 ROUND boundary of a "
    "2-dp-grid sum.",
)
def win_range_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_offset = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    w = Window.partitionBy("o_custkey").orderBy(day_offset).rangeBetween(-30, 0)
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "pivot_priority_by_status",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="pivot: long→wide with an explicit value list (explicit values "
    "keep the schema static — mandatory at scale, avoids a discovery pass)",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_p"),
    ).orderBy("o_orderpriority")


@register(
    "grouping_sets_supplier_geo",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*)                AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    ORDER BY region_name, nation_name
    """,
    doc="A3: explicit GROUPING SETS (not derivable from rollup/cube) via "
    "Spark SQL over temp views — one Expand node, single shuffle",
)
def grouping_sets_supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("supplier", "nation", "region"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"gs_{name}")
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*)                AS n_suppliers,
               ROUND(SUM(s_acctbal), 2) AS total_bal
        FROM gs_supplier
        JOIN gs_nation ON s_nationkey = n_nationkey
        JOIN gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY region_name, nation_name
        """
    )


@register(
    "map_props_extract",
    """
    SELECT event_id,
           ARRAY_TO_STRING(LIST_SORT(json_keys(props)), '|')       AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER)      AS k_value
    FROM events
    WHERE event_id <= 200
    ORDER BY event_id
    """,
    doc="MapType surface: props JSON → map<string,int>, sorted key list + "
    "known-key lookup — the reference's statistics-dict pluck "
    "(pipeline.py:80-88) as a typed, vectorized expression",
)
def map_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.from_json("props", "map<string,int>")
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") <= 200)
        .select(
            "event_id",
            F.array_join(F.sort_array(F.map_keys(m)), "|").alias("prop_keys"),
            F.element_at(m, "k").alias("k_value"),
        )
        .orderBy("event_id")
    )


@register(
    "unpivot_order_measures",
    """
    SELECT o_orderkey, measure, value
    FROM (
      SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
      FROM orders WHERE o_orderkey <= 500
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
      FROM orders WHERE o_orderkey <= 500)
    ORDER BY o_orderkey, measure
    """,
    doc="unpivot/melt: wide→long, the inverse of pivot — Spark's native "
    "unpivot (Expand node, no shuffle, no scan duplication; the UNION-ALL "
    "oracle form would scan twice)",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 500)
        .select("o_orderkey", F.col("o_totalprice").alias("totalprice"), F.col("o_custkey").cast("double").alias("custkey"))
        .unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "value")
        .orderBy("o_orderkey", "measure")
    )


@register(
    "posexplode_token_positions",
    """
    SELECT d.doc_id, r.i AS pos, d.l[r.i + 1] AS token
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS l FROM documents WHERE doc_id < 20) d,
         UNNEST(RANGE(LEN(d.l))) AS r(i)
    ORDER BY doc_id, pos
    """,
    doc="posexplode: array→rows with ordinality (the order-preserving "
    "explode the reference's per-row loops imply; generator runs inline "
    "in the scan stage, no shuffle)",
)
def posexplode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@register(
    "unpivot_priority_status_counts",
    """
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, s AS status, n
    FROM (
      SELECT o_orderpriority, 'F' AS s, status_f AS n FROM wide
      UNION ALL SELECT o_orderpriority, 'O', status_o FROM wide
      UNION ALL SELECT o_orderpriority, 'P', status_p FROM wide)
    ORDER BY o_orderpriority, status
    """,
    doc="Unpivot (melt): the wide pivot table back to long form via "
    "stack() — the inverse restructuring of pivot_priority_by_status, "
    "rounding out the reshape family (SURVEY §2.3's transpose "
    "generalized). Map-only after the grouped agg: stack is a Generate, "
    "no extra shuffle; the oracle melts with UNION ALL.",
)
def unpivot_priority_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        *[
            F.sum((F.col("o_orderstatus") == s).cast("bigint")).alias(f"status_{s.lower()}")
            for s in ("F", "O", "P")
        ]
    )
    long = wide.select(
        "o_orderpriority",
        F.expr("stack(3, 'F', status_f, 'O', status_o, 'P', status_p) AS (status, n)"),
    )
    return long.orderBy("o_orderpriority", "status")


def _zorder_oracle() -> str:
    from etl_sample_spark.operators.layout import interleave_bits_sql

    z = interleave_bits_sql(["p_partkey % 256", "p_size % 256"], bits=8)
    return f"""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(p_size AS INT)       AS p_size,
           CAST({z} AS BIGINT)       AS zrank
    FROM part
    ORDER BY p_partkey
    """


@register(
    "zorder_curve_rank_parts",
    _zorder_oracle(),
    doc="Z-order (Morton) curve rank over two part dimensions: the "
    "cluster key behind multi-dimensional data-skipping layouts "
    "(OPTIMIZE ZORDER BY). Bit interleave is pure shift/mask Catalyst "
    "arithmetic generated by the same helper that builds the physical "
    "layout writer (operators/layout.py::interleave_bits — the SQL twin "
    "is generated from one spec, so the oracle checks the exact curve "
    "the writer clusters by). The layout's physical skipping payoff is "
    "measured against parquet footer stats in tests/test_layout.py. "
    "100 TB shape: map-only rank, one range-shuffle when writing.",
)
def zorder_curve_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.layout import interleave_bits

    part = _t(spark, sf_dir, "part")
    z = interleave_bits(
        [F.col("p_partkey") % 256, F.col("p_size") % 256], bits=8
    )
    return part.select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        F.col("p_size").cast("int").alias("p_size"),
        z.cast("bigint").alias("zrank"),
    ).orderBy("p_partkey")


# Fixed-point PageRank constants: ranks live on an integer 1e12 grid and
# every update is integer multiply/divide, so the iteration is
# bit-identical in any engine and independent of partition layout or
# summation order — the same determinism trick as the money decimals.
_PR_SCALE = 10**12
_PR_ITERS = 5

# The nation trade network's directed edge list (shared by PageRank and
# the triangle census): edge src->dst iff some customer of nation src
# bought from some supplier of nation dst.
_TRADE_EDGES_SQL = """
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed trade-edge extraction, facts as probe sides: orders x
    customer projects to a 2-column (orderkey, src) build relation;
    lineitem streams past it and the supplier dimension in one
    whole-stage pass; distinct collapses to <= |nation|^2 rows."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    o_cust = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(F.col("o_orderkey").alias("k"), F.col("c_nationkey").alias("src"))
    return (
        lineitem.join(supplier, supplier["s_suppkey"] == lineitem["l_suppkey"])
        .join(o_cust, F.col("k") == lineitem["l_orderkey"])
        .where(F.col("src") != F.col("s_nationkey"))
        .select("src", F.col("s_nationkey").alias("dst"))
        .distinct()
    )


def _pagerank_oracle() -> str:
    edges = _TRADE_EDGES_SQL
    base = f"(15 * {_PR_SCALE}) // (100 * (SELECT COUNT(*) FROM nation))"
    steps = ",".join(
        f"""
    pr{i} AS (
      SELECT n.node,
             CAST({base} + COALESCE(SUM((85 * p.rank) // (100 * od.deg)), 0) AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN pr{i - 1} p ON p.node = e.src
      LEFT JOIN outdeg od ON od.src = e.src
      GROUP BY n.node)"""
        for i in range(1, _PR_ITERS + 1)
    )
    return f"""
    WITH
    edges AS ({edges}),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    pr0 AS (
      SELECT node,
             CAST({_PR_SCALE} // (SELECT COUNT(*) FROM nation) AS BIGINT) AS rank
      FROM nodes),
    {steps}
    SELECT na.n_name AS nation, p.rank AS rank
    FROM pr{_PR_ITERS} p JOIN nation na ON na.n_nationkey = p.node
    ORDER BY rank DESC, nation
    """


@register(
    "pagerank_trade_network",
    _pagerank_oracle(),
    doc="Iterative graph algorithm: 5 power-iterations of PageRank "
    "(d=0.85) over the nation trade network (edge = some customer of "
    "nation A bought from some supplier of nation B). Ranks are "
    "FIXED-POINT integers on a 1e12 grid — every update is integer "
    "multiply/divide, so the result is bit-identical across engines, "
    "partition layouts, and summation orders (floating-point PageRank "
    "is none of those), letting an iterative algorithm carry a full "
    "hash oracle (unrolled CTE chain). 100 TB shape: the heavy step is "
    "the DISTRIBUTED edge extraction — the facts enter as probe sides "
    "(never a broadcast build), distinct collapses the output to "
    "|V|^2-bounded. The graph itself is dimension-sized (|nation| "
    "nodes), so the power iteration runs driver-side over the bounded "
    "collect (same discipline as IVF's Lloyd loop over n_centroids "
    "rows) instead of paying 5 shuffle-stage rounds for a 600-row "
    "dataset; operators/graph.py::pagerank_distributed is the "
    "driver-infeasible-graph tier, tested value-equal on this graph.",
)
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.graph import pagerank_fixed_point

    nation = _t(spark, sf_dir, "nation")
    edges_df = _trade_edges(spark, sf_dir)
    # Bounded collects: |V|^2 edges, |V| nodes (|V| = |nation| = 25).
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    nation_rows = nation.select("n_nationkey", "n_name").collect()
    rank = pagerank_fixed_point(
        edges, [r["n_nationkey"] for r in nation_rows], iters=_PR_ITERS, scale=_PR_SCALE
    )
    out = sorted(
        ((r["n_name"], rank[r["n_nationkey"]]) for r in nation_rows),
        key=lambda t: (-t[1], t[0]),
    )
    # Emit pre-sorted through a VALUES LocalRelation: collect is then
    # driver-local (no job, no 32-task parallelize of 25 rows). An empty
    # graph would render `VALUES ` (parse error) — emit an empty
    # LocalRelation instead; Spark string literals treat backslash as an
    # escape by default, so escape it along with the quote.
    if not out:
        return spark.createDataFrame([], "nation string, rank bigint")
    vals = ", ".join(
        "('{}', {}L)".format(n.replace("\\", "\\\\").replace("'", "''"), v)
        for n, v in out
    )
    return spark.sql(f"SELECT nation, rank FROM (VALUES {vals}) AS t(nation, rank)")


@register(
    "triangle_census_trade_network",
    f"""
    WITH edges AS ({_TRADE_EDGES_SQL}),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges),
    tri AS (
      SELECT a.u AS x, a.v AS y, b.v AS z
      FROM und a
      JOIN und b ON b.u = a.v
      JOIN und c ON c.u = a.u AND c.v = b.v),
    pernode AS (
      SELECT node, COUNT(*) AS n_tri FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) t
      GROUP BY node),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und) t
      GROUP BY node)
    SELECT na.n_name AS nation,
           CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
           CAST(COALESCE(p.n_tri, 0) AS BIGINT)  AS n_triangles,
           CASE WHEN COALESCE(d.degree, 0) >= 2
                THEN (2 * COALESCE(p.n_tri, 0)) * 1.0
                     / (d.degree * (d.degree - 1))
                ELSE 0.0 END AS clustering_coeff
    FROM nation na
    LEFT JOIN deg d ON d.node = na.n_nationkey
    LEFT JOIN pernode p ON p.node = na.n_nationkey
    ORDER BY nation
    """,
    doc="Triangle census + local clustering coefficient over the "
    "(undirected) nation trade network — the standard graph-cohesion "
    "measure, built as the ordered-adjacency triangle join: "
    "canonicalize edges to u<v, then tri(x<y<z) = und(x,y) ⋈ und(y,z) "
    "⋈ und(x,z), counting each triangle exactly once. The coefficient "
    "is an exact-integer ratio emitted unrounded. 100 TB shape: the "
    "heavy step is the same distributed edge extraction PageRank uses "
    "(facts as probe sides, |V|^2-bounded output); the triangle joins "
    "run on the collapsed edge list, all equi-joins — ordered "
    "adjacency is the textbook guard against the degree-square blowup "
    "of naive neighborhood intersection.",
)
def triangle_census_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    edges = _trade_edges(spark, sf_dir)
    # UNPINNED r16 (was an eager localCheckpoint since its r13 form):
    # all four consumers (three triangle legs + the degree count) read
    # the IDENTICAL (u, v) projection, so Spark's ReuseExchange
    # deduplicates the trade-edges shuffle across the branches by
    # itself — the executed plan computes the 4-way fact join ONCE and
    # the other branches read ReusedExchange nodes. The pin was paying
    # a full serial materialization (4.9 s vs 1.5 s at the 10× tier,
    # interleaved medians — SCALE.md r16) to buy a dedup the engine
    # already performs when the branch subtrees stay canonical-equal.
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    a, b, c = und.alias("a"), und.alias("b"), und.alias("c")
    tri = (
        a.join(b, F.col("b.u") == F.col("a.v"))
        .join(c, (F.col("c.u") == F.col("a.u")) & (F.col("c.v") == F.col("b.v")))
        .select(F.col("a.u").alias("x"), F.col("a.v").alias("y"), F.col("b.v").alias("z"))
    )
    pernode = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select("y"))
        .unionAll(tri.select("z"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    degree = F.coalesce("degree", F.lit(0))
    n_tri = F.coalesce("n_tri", F.lit(0))
    return (
        nation.join(deg, nation["n_nationkey"] == deg["node"], "left")
        .drop("node")
        .join(pernode, nation["n_nationkey"] == pernode["node"], "left")
        .select(
            F.col("n_name").alias("nation"),
            degree.cast("bigint").alias("degree"),
            n_tri.cast("bigint").alias("n_triangles"),
            F.when(
                degree >= 2,
                (2 * n_tri) * 1.0 / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
        .orderBy("nation")
    )


@register(
    "snapshot_diff_orders",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'),
    snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0
                  THEN ROUND(o_totalprice + 1.0, 2) ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01')
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           ROUND(a.o_totalprice, 2) AS price_before,
           ROUND(b.o_totalprice, 2) AS price_after
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice OR a.o_orderstatus <> b.o_orderstatus
    ORDER BY o_orderkey
    """,
    doc="Snapshot reconciliation: diff two versions of a table by key "
    "into added / removed / changed rows (the data-versioning audit "
    "behind every ingest validation and CDC backfill check; snapshot B "
    "deterministically perturbs 1% of prices so 'changed' is "
    "non-vacuous). One full-outer shuffle join on the key, unchanged "
    "rows filtered before any output materializes. 100 TB shape: "
    "both sides bucket/cluster on the key -> the join co-locates; the "
    "output is only the delta, never the table.",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    snap_a = orders.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    snap_b = orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.round(F.col("o_totalprice") + 1.0, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return (
        joined.where(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        )
        .select(
            F.coalesce("a.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), "added")
            .when(F.col("b.o_orderkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change"),
            F.round("a.o_totalprice", 2).alias("price_before"),
            F.round("b.o_totalprice", 2).alias("price_after"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "quantile_binning_order_prices",
    """
    WITH binned AS (
      SELECT o_orderstatus, o_totalprice,
             NTILE(4) OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders)
    SELECT o_orderstatus,
           CAST(bin AS INT)            AS bin,
           CAST(COUNT(*) AS BIGINT)    AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM binned
    GROUP BY o_orderstatus, bin
    ORDER BY o_orderstatus, bin
    """,
    doc="Equi-depth feature discretization: quartile bin per order "
    "within its status via NTILE over a total order (o_orderkey "
    "tiebreak makes the binning exactly deterministic — rank-based, no "
    "interpolation, so no cross-engine percentile boundary to disagree "
    "on), reported as per-bin count + value range (the bin edges a "
    "feature store would persist). One window shuffle + one groupBy.",
)
def quantile_binning_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_orderstatus", "o_totalprice", F.ntile(4).over(w).alias("bin"))
        .groupBy("o_orderstatus", F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderstatus", "bin")
    )


@register(
    "rfm_customer_scores",
    """
    WITH base AS (
      SELECT o_custkey                                             AS c_custkey,
             DATE_DIFF('day', MAX(o_orderdate), TIMESTAMP '2001-09-01') AS recency_days,
             COUNT(*)                                              AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2)))              AS monetary_dec
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT c_custkey, recency_days, frequency, monetary_dec,
             NTILE(5) OVER (ORDER BY recency_days DESC, c_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency ASC,  c_custkey)    AS f_score,
             NTILE(5) OVER (ORDER BY monetary_dec ASC, c_custkey)  AS m_score
      FROM base)
    SELECT CAST(c_custkey AS BIGINT)     AS c_custkey,
           CAST(recency_days AS INT)     AS recency_days,
           CAST(frequency AS BIGINT)     AS frequency,
           CAST(CAST(monetary_dec AS VARCHAR) AS DOUBLE) AS monetary,
           CAST(r_score AS INT)          AS r_score,
           CAST(f_score AS INT)          AS f_score,
           CAST(m_score AS INT)          AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    ORDER BY c_custkey
    """,
    doc="RFM customer scoring: recency (days to a fixed as-of date), "
    "frequency, exact-decimal monetary, each quintiled with NTILE over "
    "a custkey-tiebroken total order (rank-based -> no percentile "
    "interpolation to disagree on; monetary ranks on the DECIMAL sum, "
    "so ordering is exact), concatenated into the classic 555-style "
    "segment label. The standard marketing-feature materialization. "
    "100 TB shape (r12, the r11 verdict's remaining scale-killer "
    "class): the three NTILEs are exact bucketed global ranks "
    "(operators/ranks.py) fed through the SQL-standard NTILE formula — "
    "recency buckets on its own bounded day grid (~2.5k values), "
    "frequency (a ~25-value key whose tie groups are dimension-sized) "
    "on the (frequency, custkey div 2^21) two-level grid, monetary on "
    "a fixed 4096-wide value grid (per-customer totals are "
    "SF-independent in TPC-H: ~33k..7.4M at every SF). Every window "
    "in the plan is partitioned; the customer dimension never lands "
    "on one task. Bit-identical to the NTILE oracle by construction "
    "(test_ranks.py pins the formula against F.ntile).",
)
def rfm_customer_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.money import dec2
    from etl_sample_spark.operators.ranks import bucketed_global_rank, ntile_from_rank

    orders = _t(spark, sf_dir, "orders")
    # pin (r15): base feeds every pass's rank branch AND the grid_from
    # branches — unpinned, the executed plan re-scanned orders 15 times
    # (scan-audit); pinned, the fact table is read once and the passes
    # consume the customer-sized aggregate.
    base = pin(orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec2("o_totalprice")).alias("monetary_dec"),
    ))
    # Recency DESC → negate for a monotone bucket; the day grid is
    # bounded by the fixed date range (~2.5k buckets at any SF).
    # Passes 2-3 compute their GRIDS from `base` (grid_from): the grid
    # only depends on the bucket-column multiset, which rank columns
    # don't change, and grid branches re-executing the earlier passes'
    # join trees was 2-3× pure DAG overhead.
    ranked = bucketed_global_rank(
        base.withColumn("__b", -F.col("recency_days")),
        ["__b"],
        [F.desc("recency_days"), F.col("c_custkey")],
        F.floor(F.col("__b") / 64),
        rank_name="__r_rank",
    ).drop("__b")
    # Frequency has ~25 distinct values → its tie groups are the whole
    # dimension; chunk the custkey tie-break (monotone within equal
    # frequency) so per-bucket groups stay ≤ 2^21 rows at any scale.
    chunk = F.floor(F.col("c_custkey") / F.lit(2097152))
    ranked = bucketed_global_rank(
        ranked.withColumn("__b2", chunk),
        ["frequency", "__b2"],
        [F.asc("frequency"), F.col("c_custkey")],
        F.col("frequency"),
        rank_name="__f_rank",
        grid_from=base.withColumn("__b2", chunk),
    ).drop("__b2")
    # Monetary: fixed 4096-wide grid over the SF-independent per-customer
    # total (floor of a monotone double bridge keeps bucket order).
    mbucket = F.floor(F.col("monetary_dec").cast("double") / F.lit(4096.0)).cast("bigint")
    ranked = bucketed_global_rank(
        ranked.withColumn("__b", mbucket),
        ["__b"],
        [F.asc("monetary_dec"), F.col("c_custkey")],
        F.floor(F.col("__b") / 64),
        rank_name="__m_rank",
        with_totals=True,
        grid_from=base.withColumn("__b", mbucket),
    ).drop("__b")
    n = F.col("n_total")
    scored = ranked.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary_dec",
        ntile_from_rank(F.col("__r_rank"), n, 5).alias("r_score"),
        ntile_from_rank(F.col("__f_rank"), n, 5).alias("f_score"),
        ntile_from_rank(F.col("__m_rank"), n, 5).alias("m_score"),
    )
    return scored.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.col("recency_days").cast("int").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    ).orderBy("c_custkey")


@register(
    "benford_first_digit_audit",
    """
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT c.digit,
           CAST(c.n AS BIGINT)       AS n,
           c.n * 1.0 / t.total       AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / c.digit), 6) AS benford_share
    FROM counts c CROSS JOIN tot t
    ORDER BY c.digit
    """,
    doc="Benford's-law first-digit audit of order prices: observed "
    "leading-digit distribution (exact integer ratios, unrounded) next "
    "to the Benford expectation log10(1+1/d) — the classic "
    "fabricated-data / corrupted-feed detector a data-quality suite "
    "runs on money columns. One map pass + a 9-row aggregate; the "
    "1-row total broadcasts. (Synthetic uniform-ish prices should and "
    "do deviate from Benford — the audit reports, it doesn't gate.)",
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        orders.where(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n") * 1.0 / F.col("total")).alias("observed_share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_share"),
        )
        .orderBy("digit")
    )


@register(
    "correlation_qty_price_exact",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*)                                            AS n,
             SUM(CAST(l_quantity AS BIGINT))                     AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)))         AS sy,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(l_extendedprice AS DECIMAL(18,2)))       AS sxy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2)))       AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(
             CAST(CAST(CAST(n AS DECIMAL(38,4)) * sxy - CAST(sx AS DECIMAL(38,4)) * sy AS VARCHAR) AS DOUBLE)
             / SQRT(
                 CAST(CAST(CAST(n AS DECIMAL(38,4)) * CAST(sxx AS DECIMAL(38,4))
                           - CAST(sx AS DECIMAL(38,4)) * CAST(sx AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(CAST(n AS DECIMAL(38,4)) * syy - sy * sy AS VARCHAR) AS DOUBLE)
               ), 6) AS corr_qty_price
    FROM m
    ORDER BY l_returnflag
    """,
    doc="Pearson correlation from EXACT moments: quantity is integral "
    "and price sits on the 2dp decimal grid, so every moment (n, Σx, "
    "Σy, Σxy, Σx², Σy²) accumulates exactly (BIGINT / DECIMAL(38,4)) "
    "and the closed-form correlation is computed from identical numbers "
    "in both engines — unlike the engines' one-pass corr() kernels, "
    "whose partial-sum order differs. The feature-redundancy screen a "
    "feature store runs pairwise. 100 TB shape: one "
    "map-side-combinable aggregate, six partials per group, no second "
    "pass. Decimal-to-double via the VARCHAR bridge, the money-suite "
    "convention.",
)
def correlation_qty_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(price).alias("sy"),
        F.sum(qty * price).alias("sxy"),
        F.sum(qty * qty).alias("sxx"),
        F.sum(price * price).alias("syy"),
    )
    n_d = F.col("n").cast("decimal(38,4)")
    num = (n_d * F.col("sxy") - F.col("sx").cast("decimal(38,4)") * F.col("sy")).cast(
        "double"
    )
    den_x = (
        n_d * F.col("sxx").cast("decimal(38,4)")
        - F.col("sx").cast("decimal(38,4)") * F.col("sx").cast("decimal(38,4)")
    ).cast("double")
    den_y = (n_d * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(num / F.sqrt(den_x * den_y), 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_argmax_order_per_status",
    """
    SELECT o_orderstatus,
           CAST(struct_extract(MAX({'p': o_totalprice, 'k': o_orderkey}), 'p') AS DOUBLE) AS top_price,
           CAST(struct_extract(MAX({'p': o_totalprice, 'k': o_orderkey}), 'k') AS BIGINT) AS top_orderkey,
           CAST(struct_extract(MIN({'p': o_totalprice, 'k': o_orderkey}), 'k') AS BIGINT) AS bottom_orderkey
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Deterministic argmax/argmin WITHOUT a window: MAX/MIN over a "
    "(value, key) struct — lexicographic struct ordering makes the key "
    "an explicit tiebreak, unlike max_by/arg_max whose ties are "
    "engine-nondeterministic. One map-side-combinable aggregate versus "
    "a full window sort: the cheap form of top-1-per-group at 100 TB.",
)
def agg_argmax_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max(pair)["o_totalprice"].cast("double").alias("top_price"),
            F.max(pair)["o_orderkey"].cast("bigint").alias("top_orderkey"),
            F.min(pair)["o_orderkey"].cast("bigint").alias("bottom_orderkey"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q6_via_sql_interface",
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
    doc="SQL-interface parity: TPC-H Q6 submitted as a spark.sql() TEXT "
    "query over registered temp views — the second front door every "
    "engine user expects (the DataFrame form is q6_forecast_revenue; "
    "both compile to the same Catalyst plan, which is the point). The "
    "statement text is near-identical on both engines; only the "
    "decimal-sum-to-double step differs (Spark CAST vs the DuckDB "
    "VARCHAR bridge) because that seam is about output typing, not "
    "query semantics.",
)
def q6_via_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("li_sql_view")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_discount AS DECIMAL(18,4))
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM li_sql_view
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "surrogate_keys_customers",
    """
    WITH keyed AS (
      SELECT c_custkey,
             sha256(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment) AS skey
      FROM customer)
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           SUBSTR(skey, 1, 16)       AS skey16,
           CAST(COUNT(*) OVER (PARTITION BY SUBSTR(skey, 1, 16)) AS BIGINT) AS n_sharing
    FROM keyed
    ORDER BY c_custkey
    """,
    doc="Deterministic surrogate-key assignment: content-hash keys "
    "(sha-256 over the pipe-delimited natural key, 64-bit hex prefix) "
    "instead of monotonically_increasing_id/sequence — stable across "
    "re-runs, cluster sizes, and partition layouts, which is what makes "
    "dimension keying retry-safe and backfill-safe at 100 TB (an id "
    "sequence is neither). n_sharing is the inline collision audit "
    "(expected 1 everywhere; a prefix collision would surface as 2 and "
    "hash-diverge the driver check). Map-only + one window on the key.",
)
def surrogate_keys_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    skey = F.sha2(
        F.concat_ws(
            "|", F.col("c_name"), F.col("c_nationkey").cast("string"), F.col("c_mktsegment")
        ),
        256,
    )
    keyed = cust.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.substring(skey, 1, 16).alias("skey16"),
    )
    return keyed.select(
        "c_custkey",
        "skey16",
        F.count(F.lit(1)).over(Window.partitionBy("skey16")).cast("bigint").alias("n_sharing"),
    ).orderBy("c_custkey")


def _geo_cells_sql() -> str:
    from etl_sample_spark.operators.layout import interleave_bits_sql

    cell = interleave_bits_sql(["lat_s", "lon_s"], bits=4)
    return f"""
      SELECT c_custkey,
             lat_micro, lon_micro,
             CAST({cell} AS BIGINT) AS cell
      FROM (
        SELECT c_custkey,
               ((c_custkey * 2654435761) % 2147483647 * 7919) % 180000000 - 90000000  AS lat_micro,
               ((c_custkey * 2654435789) % 2147483629 * 104729) % 360000000 - 180000000 AS lon_micro,
               (((c_custkey * 2654435761) % 2147483647 * 7919) % 180000000) // 11250000   AS lat_s,
               (((c_custkey * 2654435789) % 2147483629 * 104729) % 360000000) // 22500000 AS lon_s
        FROM customer)"""


@register(
    "geo_candidate_pairs",
    f"""
    WITH pts AS ({_geo_cells_sql()})
    SELECT a.c_custkey AS cust_a,
           b.c_custkey AS cust_b,
           a.cell,
           ROUND(12742.0::DOUBLE * ASIN(SQRT(
             POW(SIN(RADIANS((b.lat_micro - a.lat_micro) / 2000000.0::DOUBLE)), 2)
             + COS(RADIANS(a.lat_micro / 1000000.0::DOUBLE))
               * COS(RADIANS(b.lat_micro / 1000000.0::DOUBLE))
               * POW(SIN(RADIANS((b.lon_micro - a.lon_micro) / 2000000.0::DOUBLE)), 2)
           )), 3) AS dist_km
    FROM pts a JOIN pts b
      ON a.cell = b.cell AND a.c_custkey < b.c_custkey
    WHERE 12742.0::DOUBLE * ASIN(SQRT(
             POW(SIN(RADIANS((b.lat_micro - a.lat_micro) / 2000000.0::DOUBLE)), 2)
             + COS(RADIANS(a.lat_micro / 1000000.0::DOUBLE))
               * COS(RADIANS(b.lat_micro / 1000000.0::DOUBLE))
               * POW(SIN(RADIANS((b.lon_micro - a.lon_micro) / 2000000.0::DOUBLE)), 2)
           )) <= 200.0::DOUBLE
    ORDER BY cust_a, cust_b
    """,
    doc="Geospatial blocked similarity join: deterministic synthetic "
    "coordinates (micro-degrees from the customer key), geohash-style "
    "cells via the SAME Morton interleave as the Z-order layout "
    "(4 bits/axis -> 256 cells), candidate pairs generated ONLY inside "
    "a cell, haversine-filtered to <= 200 km. The spatial twin of the "
    "LSH banding shape: join work is sum(cell^2), never n^2, with the "
    "documented cell-boundary recall trade (neighbor-cell expansion is "
    "the production completion, same banding math). The haversine is "
    "the identical double expression both engines evaluate; ROUND(,3) "
    "output. 100 TB shape: map-side cell assignment + one equi-join.",
)
def geo_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.layout import interleave_bits

    cust = _t(spark, sf_dir, "customer")
    lat_micro = ((F.col("c_custkey") * 2654435761) % 2147483647 * 7919) % 180000000 - 90000000
    lon_micro = ((F.col("c_custkey") * 2654435789) % 2147483629 * 104729) % 360000000 - 180000000
    lat_s = (((F.col("c_custkey") * 2654435761) % 2147483647 * 7919) % 180000000) / 11250000
    lon_s = (((F.col("c_custkey") * 2654435789) % 2147483629 * 104729) % 360000000) / 22500000
    pts = cust.select(
        "c_custkey",
        lat_micro.alias("lat_micro"),
        lon_micro.alias("lon_micro"),
        interleave_bits(
            [F.floor(lat_s).cast("bigint"), F.floor(lon_s).cast("bigint")], bits=4
        ).alias("cell"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    rad = lambda c: F.radians(c)  # noqa: E731
    dlat = (F.col("b.lat_micro") - F.col("a.lat_micro")) / F.lit(2000000.0)
    dlon = (F.col("b.lon_micro") - F.col("a.lon_micro")) / F.lit(2000000.0)
    hav = (
        F.pow(F.sin(rad(dlat)), 2)
        + F.cos(rad(F.col("a.lat_micro") / F.lit(1000000.0)))
        * F.cos(rad(F.col("b.lat_micro") / F.lit(1000000.0)))
        * F.pow(F.sin(rad(dlon)), 2)
    )
    dist = F.lit(12742.0) * F.asin(F.sqrt(hav))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(dist <= 200.0)
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.cell").alias("cell"),
            F.round(dist, 3).alias("dist_km"),
        )
        .orderBy("cust_a", "cust_b")
    )


@register(
    "hierarchy_rollup_suppliers",
    """
    WITH RECURSIVE
    nodes AS (
      SELECT s_suppkey AS node,
             CASE WHEN s_suppkey = 0 THEN NULL
                  ELSE (s_suppkey - 1) // 2 END AS parent,
             CAST(s_acctbal AS DECIMAL(18,2)) AS bal
      FROM supplier),
    up(node, anc) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.node, n.parent
      FROM up u JOIN nodes n ON n.node = u.anc
      WHERE n.parent IS NOT NULL)
    SELECT CAST(u.anc AS BIGINT)  AS node,
           CAST(COUNT(*) AS BIGINT) AS subtree_size,
           CAST(CAST(SUM(n.bal) AS VARCHAR) AS DOUBLE) AS subtree_bal
    FROM up u JOIN nodes n ON n.node = u.node
    GROUP BY u.anc
    ORDER BY node
    """,
    doc="Hierarchical (BOM/org-chart) rollup: each node's subtree size "
    "and exact-decimal subtree balance over a synthesized binary "
    "hierarchy (parent(k) = (k-1) div 2 — deterministic, so both "
    "engines build the identical tree from the flat supplier table). "
    "Spark computes the ancestor closure by iterated parent-pointer "
    "doubling (log2(n) joins: each round the known-ancestor set jumps "
    "twice as far up, so 1M-node trees need ~20 rounds, not depth "
    "rounds); the oracle is a recursive-CTE closure — two different "
    "algorithms, one answer. 100 TB shape: closure edges are "
    "O(n log n) for balanced trees; each doubling round is one "
    "self-join shuffle on the ancestor key; the rollup is one grouped "
    "decimal sum. The classic chart-of-accounts / parts-explosion "
    "aggregation.",
)
def hierarchy_rollup_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.money import sum_money

    sup = _t(spark, sf_dir, "supplier")
    nodes = sup.select(
        F.col("s_suppkey").alias("node"),
        F.when(F.col("s_suppkey") == 0, F.lit(None)).otherwise(
            ((F.col("s_suppkey") - 1) / 2).cast("bigint")
        ).alias("parent"),
        F.col("s_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    n_nodes = nodes.count()  # bounded scalar: sizes the doubling rounds
    # pairs (node, ancestor-or-self); "jump" is each pair's frontier —
    # doubling: join frontier to the CURRENT pair set, not just parents.
    pairs = nodes.select("node", F.col("node").alias("anc")).unionByName(
        nodes.where(F.col("parent").isNotNull()).select(
            "node", F.col("parent").alias("anc")
        )
    )
    rounds = max(1, (n_nodes - 1).bit_length())
    for _ in range(rounds):
        hop = (
            pairs.alias("p")
            .join(
                pairs.where(F.col("node") != F.col("anc")).alias("q"),
                F.col("p.anc") == F.col("q.node"),
            )
            .select(F.col("p.node").alias("node"), F.col("q.anc").alias("anc"))
        )
        # deliberately NOT pinning.pin(): iterative truncation is
        # algorithmically load-bearing (lineage doubles per round) and
        # must not be disabled by the plan-guard bypass.
        new_pairs = pairs.unionByName(hop).distinct().localCheckpoint(eager=True)
        if new_pairs.count() == pairs.count():
            pairs = new_pairs
            break
        pairs = new_pairs
    return (
        pairs.join(nodes, "node")
        .groupBy(F.col("anc").cast("bigint").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("subtree_size"),
            sum_money(F.col("bal")).alias("subtree_bal"),
        )
        .orderBy("node")
    )


@register(
    "ab_test_two_proportion_z",
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN ((((user_id % 2147483647) + 2147483647) % 2147483647)
                        * 2654435761) % 2147483647 % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 17
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id),
    arms AS (
      SELECT variant,
             COUNT(*)       AS n_users,
             SUM(converted) AS n_converted
      FROM assigned GROUP BY variant),
    wide AS (
      SELECT MAX(CASE WHEN variant = 'control'   THEN n_users END)     AS n_c,
             MAX(CASE WHEN variant = 'control'   THEN n_converted END) AS x_c,
             MAX(CASE WHEN variant = 'treatment' THEN n_users END)     AS n_t,
             MAX(CASE WHEN variant = 'treatment' THEN n_converted END) AS x_t
      FROM arms)
    SELECT CAST(n_c AS BIGINT) AS n_control,
           CAST(x_c AS BIGINT) AS conv_control,
           CAST(n_t AS BIGINT) AS n_treatment,
           CAST(x_t AS BIGINT) AS conv_treatment,
           x_c * 1.0 / n_c     AS rate_control,
           x_t * 1.0 / n_t     AS rate_treatment,
           ROUND(
             (x_t * 1.0 / n_t - x_c * 1.0 / n_c)
             / NULLIF(SQRT((x_c + x_t) * 1.0 / (n_c + n_t)
                    * (1.0 - (x_c + x_t) * 1.0 / (n_c + n_t))
                    * (1.0 / n_c + 1.0 / n_t)), 0.0), 6) AS z_stat
    FROM wide
    """,
    doc="A/B experiment analysis: users assigned to arms by the "
    "deterministic hash gate (the stable-bucketing property real "
    "experimentation platforms need — a user's arm never changes across "
    "sessions or reruns), conversion = a heavy-purchaser gate (>= 17 purchase events), and the "
    "pooled two-proportion z-statistic from exact integer counts (the "
    "rates are exact ratios; only the final z carries a ROUND). One "
    "groupBy(user) + one tiny arm aggregate. The decision stat every "
    "growth team computes, expressed as two shuffles over the raw "
    "event log.",
)
def ab_test_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.sampling import hash_position

    ev = _t(spark, sf_dir, "events")
    variant = F.when(hash_position(F.col("user_id")) % 2 == 0, "control").otherwise(
        "treatment"
    )
    assigned = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 17
        ).cast("int").alias("converted")
    ).select(variant.alias("variant"), "converted")
    arms = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_converted")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n_users"))).alias("n_c"),
        F.max(F.when(F.col("variant") == "control", F.col("n_converted"))).alias("x_c"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n_users"))).alias("n_t"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n_converted"))).alias("x_t"),
    )
    p_pool = (F.col("x_c") + F.col("x_t")) * 1.0 / (F.col("n_c") + F.col("n_t"))
    z = (
        F.col("x_t") * 1.0 / F.col("n_t") - F.col("x_c") * 1.0 / F.col("n_c")
    ) / F.nullif(
        F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t"))),
        F.lit(0.0),
    )
    return wide.select(
        F.col("n_c").cast("bigint").alias("n_control"),
        F.col("x_c").cast("bigint").alias("conv_control"),
        F.col("n_t").cast("bigint").alias("n_treatment"),
        F.col("x_t").cast("bigint").alias("conv_treatment"),
        (F.col("x_c") * 1.0 / F.col("n_c")).alias("rate_control"),
        (F.col("x_t") * 1.0 / F.col("n_t")).alias("rate_treatment"),
        F.round(z, 6).alias("z_stat"),
    )


@register(
    "k_anonymity_audit",
    """
    WITH cells AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             COUNT(*) AS cell_size
      FROM customer c GROUP BY 1, 2)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_mktsegment,
           CAST(cell_size AS BIGINT)   AS cell_size,
           CAST(cell_size < 5 AS BOOLEAN) AS below_k
    FROM cells
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="k-anonymity audit (k=5) over the quasi-identifier pair "
    "(nation, market segment): any equivalence class smaller than k "
    "re-identifies its members when the table is shared — the privacy "
    "gate run before exporting an 'anonymized' extract, and the "
    "counterpart of text_scrub_pii for structured columns (suppress or "
    "generalize the flagged cells before release). One "
    "map-side-combinable groupBy; cell count bounded by the "
    "quasi-identifier domain, not the table.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"), "c_mktsegment"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cell_size"))
        .withColumn("below_k", F.col("cell_size") < 5)
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "abc_pareto_classification",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS r
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(r) OVER () AS total
      FROM rev)
    SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS class_revenue
    FROM ranked
    GROUP BY 1
    ORDER BY abc_class
    """,
    doc="ABC / Pareto classification: parts ranked by exact-decimal "
    "revenue, classed A/B/C at the 80%/95% cumulative-share cuts. "
    "Every comparison is decimal-on-decimal (cum*100 <= total*80 — "
    "integer cross-multiplication, no division), so the class "
    "boundary cannot flip cross-engine, and the running sum is exact "
    "regardless of partition order. The inventory-prioritization "
    "classic. Shape (r12): one grouped agg + an exact bucketed running "
    "sum (operators/ranks.py) over a fixed 4096-wide revenue grid "
    "(per-part revenue is SF-independent in TPC-H, ~0.45M..2.9M → "
    "~700 buckets; DESC → negated bucket), grand total via the "
    "broadcast 1-row scalar — no unpartitioned window over the part "
    "dimension — then one 3-row rollup.",
)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.money import revenue_dec
    from etl_sample_spark.operators.ranks import bucketed_global_rank

    li = _t(spark, sf_dir, "lineitem")
    # pin (r15 scan audit): the rank operator's grid / offset / rank
    # branches re-executed this part-sized agg — 6 lineitem scans in
    # the executed plan; pinned, the fact is read once.
    rev = pin(
        li.groupBy("l_partkey")
        .agg(F.sum(revenue_dec()).alias("r"))
    )
    ranked = bucketed_global_rank(
        rev.withColumn(
            "__b", F.floor((-F.col("r")).cast("double") / F.lit(4096.0)).cast("bigint")
        ),
        ["__b"],
        [F.desc("r"), F.col("l_partkey")],
        F.floor(F.col("__b") / 64),
        rank_name="__rk",
        cum_sums={"cum": F.col("r")},
        with_totals=True,
    ).select("r", "cum", F.col("cum_total").alias("total"))
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "wow_revenue_growth",
    """
    WITH weekly AS (
      SELECT DATE_DIFF('day', TIMESTAMP '1995-01-02', o_orderdate) // 7 AS week_idx,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-02'
      GROUP BY 1),
    laged AS (
      SELECT week_idx, rev,
             LAG(rev) OVER (ORDER BY week_idx) AS prev
      FROM weekly)
    SELECT CAST(week_idx AS BIGINT) AS week_idx,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE)  AS revenue,
           CAST(CAST(prev AS VARCHAR) AS DOUBLE) AS prev_revenue,
           ROUND(CAST(CAST(rev - prev AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(prev AS VARCHAR) AS DOUBLE), 6) AS wow_growth
    FROM laged
    WHERE prev IS NOT NULL
    ORDER BY week_idx
    """,
    doc="Week-over-week growth: the executive trend KPI — weekly revenue "
    "on the exact decimal grid (Monday-anchored integer week index, no "
    "engine week-numbering semantics to disagree on), LAG for the "
    "prior week, growth ratio of two exactly-equal decimals bridged to "
    "double (identical operands both engines; ROUND(,6) absorbs the "
    "division ulp). One grouped agg + one tiny global window over the "
    "week dimension.",
)
def wow_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_sample_spark.functions.money import dec2

    orders = _t(spark, sf_dir, "orders")
    anchor = F.lit("1995-01-02").cast("timestamp")
    weekly = (
        orders.where(F.col("o_orderdate") >= anchor)
        .groupBy(
            F.floor(F.datediff(F.col("o_orderdate"), anchor) / 7).alias("week_idx")
        )
        .agg(F.sum(dec2("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("week_idx")
    laged = weekly.select(
        "week_idx", "rev", F.lag("rev").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    return laged.select(
        F.col("week_idx").cast("bigint").alias("week_idx"),
        F.col("rev").cast("double").alias("revenue"),
        F.col("prev").cast("double").alias("prev_revenue"),
        F.round(
            (F.col("rev") - F.col("prev")).cast("double") / F.col("prev").cast("double"),
            6,
        ).alias("wow_growth"),
    ).orderBy("week_idx")



@register(
    "market_basket_part_pairs",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT o) AS n FROM op),
    freq AS (SELECT p, COUNT(*) AS cnt FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS pair_cnt
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 3)
    SELECT pr.p1, pr.p2,
           CAST(pr.pair_cnt AS BIGINT) AS pair_cnt,
           pr.pair_cnt * 1.0 / n.n AS support,
           pr.pair_cnt * 1.0 / f1.cnt AS confidence_1_to_2,
           (pr.pair_cnt * 1.0 * n.n) / (f1.cnt * 1.0 * f2.cnt) AS lift
    FROM pairs pr
    JOIN freq f1 ON f1.p = pr.p1
    JOIN freq f2 ON f2.p = pr.p2
    CROSS JOIN n_orders n
    ORDER BY lift DESC, pr.p1, pr.p2
    LIMIT 100
    """,
    doc="Market-basket association rules over co-purchased parts: "
    "support / confidence / lift for every part pair appearing in >=3 "
    "common orders, top-100 by lift. All inputs are exact integer "
    "counts, the ratios ship unrounded (bit-identical IEEE), and the "
    "lift tie-break is total (lift DESC, pair ASC). 100 TB shape: the "
    "basket self-join is ORDER-keyed — candidate work is "
    "sum(basket_size^2), never n^2 (the LSH-banding containment "
    "argument; baskets are small by nature, and a hot-basket cap "
    "mirrors dedup's max_bucket for the pathological case); part "
    "frequencies broadcast back onto the pair table; the top-100 is a "
    "TakeOrdered, never a global sort.",
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # pin the distinct basket relation (r15 scan audit): op feeds
    # n_orders, freq, and BOTH sides of the pair self-join — unpinned,
    # each branch re-scanned lineitem AND re-ran the distinct shuffle
    # (8 scans / 5 distincts). The distinct is already a full shuffle,
    # so pinning its two-int output once strictly dominates recomputing
    # it per branch.
    op = pin(
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n_orders = op.select(F.countDistinct("o").alias("n"))
    freq = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 3)
    )
    f1 = freq.select(F.col("p").alias("p1"), F.col("cnt").alias("cnt1"))
    f2 = freq.select(F.col("p").alias("p2"), F.col("cnt").alias("cnt2"))
    out = (
        pairs.join(f1, "p1")
        .join(f2, "p2")
        .crossJoin(n_orders)
        .select(
            "p1",
            "p2",
            F.col("pair_cnt").cast("bigint").alias("pair_cnt"),
            (F.col("pair_cnt") * F.lit(1.0) / F.col("n")).alias("support"),
            (F.col("pair_cnt") * F.lit(1.0) / F.col("cnt1")).alias(
                "confidence_1_to_2"
            ),
            (
                (F.col("pair_cnt") * F.lit(1.0) * F.col("n"))
                / (F.col("cnt1") * F.lit(1.0) * F.col("cnt2"))
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "p1", "p2").limit(100)


@register(
    "recursive_cte_trade_reachability",
    """
    WITH RECURSIVE trade AS (
      SELECT sn.n_name AS src, cn.n_name AS dst, COUNT(*) AS n_trades
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE sn.n_name <> cn.n_name
      GROUP BY sn.n_name, cn.n_name
    ), edges AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY n_trades DESC, dst) AS rk
        FROM trade) t
      WHERE rk <= 3
    ), reach(n_name, hops) AS (
      SELECT CAST('NATION_0' AS VARCHAR(25)) AS n_name, CAST(0 AS INT) AS hops
      UNION ALL
      SELECT e.dst, CAST(r.hops + 1 AS INT)
      FROM reach r JOIN edges e ON e.src = r.n_name
      WHERE r.hops < 4
    )
    SELECT n_name, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY n_name ORDER BY n_name
    """,
    doc="Spark 4 RECURSIVE CTE (WITH RECURSIVE ... UNION ALL, SQL "
    "interface): BFS reachability with path counts over the top-3-"
    "partner trade graph — min hops AND the number of ≤4-hop paths per "
    "reached nation, so the whole recursion tree (not just the "
    "frontier) must match the oracle. The recursive reference is a "
    "single self-join per level; Spark bounds it via "
    "spark.sql.cteRecursionLevelLimit and the hops<4 predicate makes "
    "termination explicit. Edge derivation is the standard fact-join + "
    "per-src top-k (deterministic count-desc/dst tiebreak), so the "
    "graph is scale-invariant in shape. Reference analog: none (no "
    "iteration in the reference); complements the fixed-point unrolled "
    "pagerank_trade_network / transitive-closure neardup clusters with "
    "the ENGINE-NATIVE recursion surface new in Spark 4.",
)
def recursive_cte_trade_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"rcte_{t}")
    return spark.sql(
        """
        WITH RECURSIVE trade AS (
          SELECT sn.n_name AS src, cn.n_name AS dst, COUNT(*) AS n_trades
          FROM rcte_lineitem JOIN rcte_orders ON l_orderkey = o_orderkey
               JOIN rcte_customer ON o_custkey = c_custkey
               JOIN rcte_supplier ON l_suppkey = s_suppkey
               JOIN rcte_nation sn ON s_nationkey = sn.n_nationkey
               JOIN rcte_nation cn ON c_nationkey = cn.n_nationkey
          WHERE sn.n_name <> cn.n_name
          GROUP BY sn.n_name, cn.n_name
        ), edges AS (
          SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY n_trades DESC, dst) AS rk
            FROM trade) t
          WHERE rk <= 3
        ), reach(n_name, hops) AS (
          SELECT CAST('NATION_0' AS VARCHAR(25)) AS n_name, CAST(0 AS INT) AS hops
          UNION ALL
          SELECT e.dst, CAST(r.hops + 1 AS INT)
          FROM reach r JOIN edges e ON e.src = r.n_name
          WHERE r.hops < 4
        )
        SELECT n_name, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM reach GROUP BY n_name ORDER BY n_name
        """
    )


@register(
    "lateral_top2_orders_per_customer",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l ON TRUE
    WHERE c.c_mktsegment = 'MACHINERY'
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="correlated LATERAL subquery with per-row ORDER BY ... LIMIT "
    "(SQL interface): top-2 orders per MACHINERY customer expressed as "
    "a lateral correlate instead of a ranked window — the SQL-standard "
    "formulation a reference user would port verbatim. Catalyst "
    "decorrelates it into a ranked join (DecorrelateInnerQuery), so "
    "the physical plan is the same single-shuffle shape as the "
    "window-function twin (win_top3_orders_per_customer) — no "
    "per-customer re-execution at 100 TB. Deterministic via the "
    "(o_totalprice DESC, o_orderkey) tiebreak.",
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM lat_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        WHERE c.c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


# Latest Observation handle from observe_quality_gate_orders — a
# last-writer-wins CONVENIENCE for interactive use only (two
# interleaved runs alias it). Programmatic callers should use
# quality_gate_orders(), which returns the Observation paired with its
# own DataFrame.
LAST_QUALITY_GATE_OBSERVATION = None


def quality_gate_orders(orders: DataFrame):
    """(result_df, observation): the orders rollup instrumented with a
    same-pass quality gate (row count, bad-price count, null-date
    count via ``DataFrame.observe`` — CollectMetrics piggybacks on the
    existing scan, zero extra passes). Read ``observation.get`` after
    an action on the returned DataFrame; each call gets its OWN
    Observation, so concurrent/interleaved runs never alias."""
    from pyspark.sql import Observation

    obs = Observation("ingest_quality_gate")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n_bad_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("n_null_date"),
    )
    result = (
        observed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
        .orderBy("o_orderstatus")
    )
    return result, obs


@register(
    "observe_quality_gate_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS rev
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Data-quality observability via DataFrame.observe: the scan is "
    "instrumented with a named Observation collecting row count, "
    "bad-price count (<= 0) and null-date count AS THE QUERY RUNS — "
    "CollectMetrics piggybacks on the existing pass, so at 100 TB the "
    "quality gate costs ZERO extra scans (the naive alternative is a "
    "second full aggregate over the input). The observed metrics are "
    "exposed through LAST_QUALITY_GATE_OBSERVATION for the ingest "
    "gate to assert on (pytest pins them against an independent "
    "aggregate and pins the CollectMetrics node in the plan); the "
    "query result itself is ordinary and fully oracle-checked. "
    "Reference analog: none ([EXT] Observation API).",
)
def observe_quality_gate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    global LAST_QUALITY_GATE_OBSERVATION
    result, obs = quality_gate_orders(_t(spark, sf_dir, "orders"))
    LAST_QUALITY_GATE_OBSERVATION = obs
    return result


_ORDERS_PROFILE_SPECS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    from etl_sample_spark.operators.profiling import profile_oracle_sql

    return profile_oracle_sql("orders", _ORDERS_PROFILE_SPECS)


@register(
    "profile_columns_orders",
    _profile_oracle(),
    doc="Single-pass column profiling (the Deequ-class data-profile "
    "report): per column of orders — row count, null count, EXACT "
    "distinct count, and type-appropriate min/max. The engine side is "
    "ONE aggregate over ONE scan (multi-countDistinct plans via Expand; "
    "the wide stats row is unpivoted to the report with stack), so "
    "profiling a 100 TB table costs a single read regardless of column "
    "count — the oracle deliberately recomputes per column with UNION "
    "ALL branches, so the single-pass fusion itself is what the hash "
    "check verifies. operators/profiling.py::profile_columns. "
    "Reference analog: none ([EXT] data profiling).",
)
def profile_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.profiling import profile_columns

    return profile_columns(_t(spark, sf_dir, "orders"), _ORDERS_PROFILE_SPECS)


@register(
    "largest_remainder_allocation",
    """
    WITH grp AS (
      SELECT o_orderpriority AS pri,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority),
    tot AS (SELECT SUM(n) AS tn FROM grp),
    quota AS (
      SELECT pri, n,
             CAST((n * 1000) // tn AS BIGINT) AS base,
             (n * 1000) % tn AS rem
      FROM grp CROSS JOIN tot),
    ranked AS (
      SELECT pri, n, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, pri) AS rk,
             1000 - SUM(base) OVER () AS leftover
      FROM quota)
    SELECT pri,
           n AS n_orders,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS seats
    FROM ranked
    ORDER BY pri
    """,
    doc="EXACT-SUM proportional allocation (largest-remainder / "
    "Hamilton method): distribute 1000 'seats' across order priorities "
    "proportionally to volume such that the allocations sum to EXACTLY "
    "1000 — naive per-group rounding violates the total (the classic "
    "budget/quota bug). Pure integer arithmetic end to end (floor "
    "quotas via integer division, remainders ranked, the leftover "
    "seats go to the largest remainders with a deterministic "
    "tie-break), so the oracle is bit-exact with no float rounding "
    "anywhere. Shape: one grouped count + one broadcast total + one "
    "tiny window over group-cardinality rows. Reference analog: none "
    "([EXT] constrained allocation).",
)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    grp = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = grp.agg(F.sum("n").alias("tn"))
    quota = grp.crossJoin(F.broadcast(tot)).select(
        "pri",
        "n",
        F.expr("(n * 1000) div tn").cast("bigint").alias("base"),
        ((F.col("n") * 1000) % F.col("tn")).alias("rem"),
    )
    w_rank = Window.orderBy(F.desc("rem"), "pri")
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = quota.select(
        "pri",
        "n",
        "base",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(1000) - F.sum("base").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "pri",
        F.col("n").alias("n_orders"),
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("bigint")
        .alias("seats"),
    ).orderBy("pri")


@register(
    "revenue_bridge_customers",
    """
    WITH a AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
    b AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey),
    j AS (
      SELECT COALESCE(a.o_custkey, b.o_custkey) AS k,
             COALESCE(a.rev, 0) AS ra, COALESCE(b.rev, 0) AS rb
      FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey),
    cls AS (
      SELECT k, ra, rb,
             CASE WHEN ra = 0 THEN 'new'
                  WHEN rb = 0 THEN 'churned'
                  WHEN rb > ra THEN 'expansion'
                  WHEN rb < ra THEN 'contraction'
                  ELSE 'flat' END AS segment
      FROM j)
    SELECT segment,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(rb - ra) AS VARCHAR) AS DOUBLE) AS rev_delta
    FROM cls
    GROUP BY segment
    ORDER BY segment
    """,
    doc="Revenue BRIDGE (waterfall decomposition): the 1995→1996 net "
    "revenue change split into its causal segments — new customers, "
    "churned, expansion, contraction — via two period aggregates "
    "full-outer joined per customer and classified. The per-segment "
    "deltas sum EXACTLY to the total net change (exact decimal "
    "arithmetic end to end; a float bridge visibly fails to foot, the "
    "classic finance-report bug), and the foot-to-total property is "
    "pinned in pytest. Shape: two filtered grouped aggregates over one "
    "fact scan each + one key-partitioned full-outer join — all "
    "ordinary keyed shuffles at 100 TB. Reference analog: none ([EXT] "
    "period-over-period bridge).",
)
def revenue_bridge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Conditional-pivot rewrite (r15 scan audit): the two year slices
    # previously aggregated in separate branches and met in a
    # full-outer join — 4 orders scans and two shuffles. One filtered
    # scan + one conditional groupBy produces the identical row set
    # (a customer active in either year appears once; the missing
    # year's SUM over no rows is NULL → coalesce 0, exactly what the
    # outer join's unmatched side yielded).
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    yr = F.year("o_orderdate")
    j = (
        orders.where(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1995, dec)).alias("a_rev"),
            F.sum(F.when(yr == 1996, dec)).alias("b_rev"),
        )
        .select(
            F.coalesce(F.col("a_rev"), F.lit(0).cast("decimal(18,2)")).alias("ra"),
            F.coalesce(F.col("b_rev"), F.lit(0).cast("decimal(18,2)")).alias("rb"),
        )
    )
    cls = j.select(
        "ra",
        "rb",
        F.when(F.col("ra") == 0, "new")
        .when(F.col("rb") == 0, "churned")
        .when(F.col("rb") > F.col("ra"), "expansion")
        .when(F.col("rb") < F.col("ra"), "contraction")
        .otherwise("flat")
        .alias("segment"),
    )
    return (
        cls.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("rb") - F.col("ra")).cast("double").alias("rev_delta"),
        )
        .orderBy("segment")
    )


@register(
    "ks_two_sample_click_vs_purchase",
    """
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2
      FROM events WHERE event_type IN ('click', 'purchase')),
    pts AS (SELECT v, SUM(g1) AS c1, SUM(g2) AS c2 FROM s GROUP BY v),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM pts),
    ecdf AS (
      SELECT SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
      FROM pts)
    SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
           ROUND(MAX(ABS(CAST(e.cum1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
                         - CAST(e.cum2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))),
                 6) AS ks_stat
    FROM ecdf e CROSS JOIN tot t
    GROUP BY t.n1, t.n2
    """,
    doc="EXACT two-sample Kolmogorov-Smirnov statistic between the "
    "click and purchase value distributions — the distribution-drift "
    "test that sees SHAPE changes PSI's fixed binning smooths over: "
    "per distinct value, both groups' counts; running sums give both "
    "ECDFs at every jump point; KS = max |F1 - F2|. All counts are "
    "exact integers; each ECDF value is one double-precision ratio of "
    "exact integers computed identically on both engines (explicit "
    "CAST-to-DOUBLE before dividing — DuckDB's `* 1.0` idiom widens "
    "to DECIMAL(38,1) instead, the r10 hash-divergence cause), and "
    "ROUND(,6) on the emitted statistic absorbs the final-ulp seam "
    "per the OLS/Gini discipline. Scale note (r12): `value` is a "
    "CONTINUOUS double, so the distinct-value jump points grow ~with "
    "the event count — the former global ECDF window was the "
    "dimension-global-window scale-killer class in disguise. Both "
    "running ECDFs now come from bucketed_global_rank cumulative sums "
    "over a fixed 0.25-wide value grid (~2.2k buckets on the bounded "
    "[0, 560] value domain) — every window partitioned, group counts "
    "per bucket ~n/2000. Values are non-null in this domain (both "
    "engines' window forms already disagreed on null placement, so "
    "nulls were never supported here). Reference analog: "
    "none ([EXT] KS drift test).",
)
def ks_two_sample_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.ranks import bucketed_global_rank

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    # pin (r15 scan audit): the rank operator's grid / rank / offset
    # branches re-executed this agg — 8 scans of events in the executed
    # plan. Pinned, events is scanned once; the branches read the
    # value-grid-sized counts.
    pts = pin(
        ev.select(
            F.col("value").alias("v"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g2"),
        )
        .groupBy("v")
        .agg(F.sum("g1").alias("c1"), F.sum("g2").alias("c2"))
    )
    ecdf = bucketed_global_rank(
        pts.withColumn("__b", F.floor(F.col("v") * 4).cast("bigint")),
        ["__b"],
        [F.col("v")],
        F.floor(F.col("__b") / 64),
        rank_name="__rk",
        cum_sums={"cum1": F.col("c1"), "cum2": F.col("c2")},
        with_totals=True,
    ).select(
        "cum1",
        "cum2",
        F.col("cum1_total").alias("n1"),
        F.col("cum2_total").alias("n2"),
    )
    return (
        ecdf.groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum1").cast("double") / F.col("n1").cast("double")
                        - F.col("cum2").cast("double") / F.col("n2").cast("double")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            "ks_stat",
        )
    )


@register(
    "ols_price_on_quantity_by_flag",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*)                                            AS n,
             SUM(CAST(l_quantity AS BIGINT))                     AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)))         AS sy,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(l_extendedprice AS DECIMAL(18,2)))       AS sxy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2)))       AS syy
      FROM lineitem GROUP BY l_returnflag),
    c AS (
      SELECT l_returnflag, n,
             CAST(CAST(CAST(n AS DECIMAL(38,4)) * sxy
                       - CAST(sx AS DECIMAL(38,4)) * sy AS VARCHAR) AS DOUBLE) AS sxy_c,
             CAST(CAST(CAST(n AS DECIMAL(38,4)) * CAST(sxx AS DECIMAL(38,4))
                       - CAST(sx AS DECIMAL(38,4)) * CAST(sx AS DECIMAL(38,4))
                  AS VARCHAR) AS DOUBLE) AS sxx_c,
             CAST(CAST(CAST(n AS DECIMAL(38,4)) * syy - sy * sy AS VARCHAR) AS DOUBLE) AS syy_c,
             CAST(CAST(sy * CAST(sxx AS DECIMAL(38,4))
                       - CAST(sx AS DECIMAL(38,4)) * sxy AS VARCHAR) AS DOUBLE) AS int_num
      FROM m)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(sxy_c / sxx_c, 6) AS slope,
           ROUND(int_num / sxx_c, 6) AS intercept,
           ROUND(sxy_c * sxy_c / (sxx_c * syy_c), 6) AS r2
    FROM c
    ORDER BY l_returnflag
    """,
    doc="Closed-form OLS per group (price regressed on quantity per "
    "return flag) from EXACT moments — the distributed-regression "
    "pattern: the fit never iterates, it is five map-side-combinable "
    "partials per group (same exact BIGINT/DECIMAL moment discipline "
    "as correlation_qty_price_exact) plugged into the normal "
    "equations, with the intercept in its all-exact-numerator form "
    "(ΣyΣxx − ΣxΣxy)/(nΣxx − Σx²) so no intermediate rounding "
    "leaks. slope/intercept/r² are ratios of identically-computed "
    "exact numbers, ROUND(,6) absorbs the final-division ulp. At "
    "100 TB this is how per-segment elasticities/trends are fit: one "
    "aggregate, zero passes over residuals. Reference analog: none "
    "([EXT] closed-form regression).",
)
def ols_price_on_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(price).alias("sy"),
        F.sum(qty * price).alias("sxy"),
        F.sum(qty * qty).alias("sxx"),
        F.sum(price * price).alias("syy"),
    )
    n_d = F.col("n").cast("decimal(38,4)")
    sx_d = F.col("sx").cast("decimal(38,4)")
    sxx_d = F.col("sxx").cast("decimal(38,4)")
    sxy_c = (n_d * F.col("sxy") - sx_d * F.col("sy")).cast("double")
    sxx_c = (n_d * sxx_d - sx_d * sx_d).cast("double")
    syy_c = (n_d * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    int_num = (F.col("sy") * sxx_d - sx_d * F.col("sxy")).cast("double")
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(sxy_c / sxx_c, 6).alias("slope"),
        F.round(int_num / sxx_c, 6).alias("intercept"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "gini_revenue_concentration",
    """
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY y, o_custkey) AS i FROM rev),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(y) AS sy,
             SUM(CAST(i AS DECIMAL(38,4)) * y) AS siy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS total_rev,
           ROUND(CAST(CAST(2 * siy - CAST(n + 1 AS DECIMAL(38,4)) * sy
                      AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(CAST(n AS DECIMAL(38,4)) * sy AS VARCHAR)
                        AS DOUBLE), 6) AS gini
    FROM m
    """,
    doc="Gini coefficient of customer revenue concentration — the "
    "single-number Lorenz summary behind 'what share of spend sits in "
    "the top customers' (and, for corpora, 'how concentrated is the "
    "training mix in few sources'): G = (2Σi·y_i − (n+1)Σy)/(nΣy) over "
    "ascending-sorted exact decimal revenues with integer ranks, so "
    "numerator and denominator are EXACT decimals and the single final "
    "division is deterministic (ROUND(,6) for the division ulp only; "
    "deterministic (y, custkey) tie-break). The rank pass is an exact "
    "bucketed global rank (operators/ranks.py, r12): per-customer "
    "revenue on a fixed 4096-wide value grid (SF-independent range, "
    "~1.8k buckets), so no window in the plan is unpartitioned and the "
    "customer dimension never sorts on one task; the "
    "mergeable-histogram query is the sketch path when a sorted pass "
    "is too dear. Reference analog: none ([EXT] concentration "
    "metrics).",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.operators.ranks import bucketed_global_rank

    # pin (r15 scan audit): rank-operator branches re-executed this
    # customer-sized agg — 5 orders scans; pinned, the fact is read
    # once.
    rev = pin(
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    ranked = bucketed_global_rank(
        rev.withColumn(
            "__b", F.floor(F.col("y").cast("double") / F.lit(4096.0)).cast("bigint")
        ),
        ["__b"],
        [F.asc("y"), F.col("o_custkey")],
        F.floor(F.col("__b") / 64),
        rank_name="i",
    ).select("y", "i")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i").cast("decimal(38,4)") * F.col("y")).alias("siy"),
    )
    num = (2 * F.col("siy") - (F.col("n") + 1).cast("decimal(38,4)") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n").cast("decimal(38,4)") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("sy").cast("double").alias("total_rev"),
        F.round(num / den, 6).alias("gini"),
    )


@register(
    "chi2_event_type_by_user_band",
    """
    WITH obs AS (
      SELECT event_type, CAST(user_id % 4 AS INT) AS band, COUNT(*) AS o
      FROM events GROUP BY event_type, CAST(user_id % 4 AS INT)),
    rows_ AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
    cols_ AS (SELECT band, SUM(o) AS c FROM obs GROUP BY band),
    tot AS (SELECT SUM(o) AS n FROM obs),
    -- FULL nr x nc grid: a zero-observed cell still contributes e =
    -- r*c/n to the statistic (the scipy chi2_contingency convention)
    grid AS (SELECT r.event_type, c.band, r.r, c.c FROM rows_ r CROSS JOIN cols_ c),
    cells AS (
      SELECT COALESCE(obs.o, 0) AS o, g.event_type, g.band,
             CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE) / CAST(t.n AS DOUBLE)
               AS e,
             t.n
      FROM grid g
      LEFT JOIN obs ON obs.event_type = g.event_type AND obs.band = g.band
      CROSS JOIN tot t),
    agg AS (
      SELECT MAX(n) AS n,
             COUNT(DISTINCT event_type) AS nr,
             COUNT(DISTINCT band) AS nc,
             SUM((o - e) * (o - e) / e) AS chi2
      FROM cells)
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n * LEAST(nr - 1, nc - 1))), 6) AS cramers_v
    FROM agg
    """,
    doc="Chi-square test of independence + Cramér's V between event "
    "type and a deterministic user band (user_id mod 4 — the A/B-arm "
    "shape): the significance layer on top of the registry's pivot/"
    "crosstab tier, answering 'does behavior actually differ across "
    "arms' instead of eyeballing the contingency table. Observed and "
    "marginal counts are exact integers; each cell's (o−e)²/e is a "
    "pure function of exact ratios and the cell count is bounded by "
    "the category product (here ≤ 20), so the final sums sit far "
    "inside ROUND(,6). Distinct-count of marginal TOTALS gives the "
    "table dimensions without a second pass. One grouped count + two "
    "marginal rollups + a broadcast total at any scale. Reference "
    "analog: none ([EXT] categorical significance testing).",
)
def chi2_event_type_by_user_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # pin the contingency table (r15 scan audit): every marginal
    # (rows/cols/total) and the cell join derive from obs — unpinned,
    # each branch re-scanned events (6 scans); pinned, the fact is read
    # once and the nr×nc table feeds everything.
    obs = pin(ev.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("band")
    ).agg(F.count(F.lit(1)).alias("o")))
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("band").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    # full nr x nc grid so zero-observed cells still contribute e=r*c/n
    grid = rows_.crossJoin(F.broadcast(cols_))
    cells = (
        grid.join(obs, ["event_type", "band"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e",
            F.col("r").cast("double")
            * F.col("c").cast("double")
            / F.col("n").cast("double"),
        )
    )
    agg = cells.agg(
        F.max("n").alias("n"),
        # categories, not marginal totals — two categories with equal
        # totals must still count as two
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("band").alias("nc"),
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "chi2"
        ),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))),
            6,
        ).alias("cramers_v"),
    )

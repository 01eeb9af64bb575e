"""Scalar function surface (SURVEY §2.5): string / date / math / array /
map / json, including the reference's specific transforms re-expressed as
built-in (JVM-side, codegen-friendly) expressions:

- F2  account masking ``'XXXX' + account[3:]``
  (``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:115,494`` — we
  implement the *intent*, not the Series-slicing bug at :94,471)
- F3  compact-date reassembly ``YYYYMMDD + HHMMSS → timestamp``
  (``...-10-03-2019.py:162``) — normalized to a real TimestampType, not
  the reference's ad-hoc ``'YYYY-MM-DD HH:MM.SS'`` string
- F7  multi-source fallback chains via ``coalesce``
  (``...-10-03-2019.py:378-387,399-402``)
- R1  regex routing (``...-10-03-2019.py:798-805``)
- R2  key derivation by regex (``...-10-03-2019.py:35,156``)

Everything here is built-in ``pyspark.sql.functions`` — no Python UDFs —
so the whole expression tree stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.functions.scalar import mask_account, reassemble_compact_timestamp
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "str_functions_part",
    """
    SELECT p_partkey,
           UPPER(p_brand)                          AS brand_upper,
           LOWER(p_type)                           AS type_lower,
           TRIM(CONCAT('  ', p_name, '  '))        AS name_trimmed,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')   AS size_padded,
           SUBSTRING(p_name, 1, 5)                 AS name_prefix,
           (p_type LIKE '%BRASS%')                 AS is_brass,
           LENGTH(p_name)                          AS name_len
    FROM part
    ORDER BY p_partkey
    """,
    doc="upper/lower/trim/lpad/substr/like/length",
)
def str_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.col("p_type").like("%BRASS%").alias("is_brass"),
            F.length("p_name").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


@register(
    "mask_account_numbers",
    """
    SELECT c_custkey,
           c_name,
           'XXXX' || SUBSTRING(c_name, 4) AS masked_name
    FROM customer
    ORDER BY c_custkey
    """,
    doc="F2: the reference's account-masking intent ('XXXX' + s[3:])",
)
def mask_account_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", mask_account(F.col("c_name")).alias("masked_name"))
        .orderBy("c_custkey")
    )


@register(
    "date_functions_orders",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)                        AS order_year,
           CAST(MONTH(o_orderdate) AS INT)                       AS order_month,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2024-12-31') AS INT) AS days_to_eoy,
           STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS due_date
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="year/month/date_trunc/datediff/date arithmetic",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.datediff(F.lit("2024-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_eoy"),
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "ts_reassemble_compact",
    """
    SELECT event_id,
           STRFTIME(ts, '%Y%m%d') AS date_part,
           STRFTIME(ts, '%H%M%S') AS time_part,
           STRFTIME(STRPTIME(STRFTIME(ts, '%Y%m%d') || STRFTIME(ts, '%H%M%S'),
                             '%Y%m%d%H%M%S'),
                    '%Y-%m-%d %H:%M:%S') AS reassembled
    FROM events
    ORDER BY event_id
    """,
    doc="F3: compact Date+Time strings reassembled into a real timestamp "
    "(reference does this with 6 string slices at pipeline.py:162)",
)
def ts_reassemble_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    date_part = F.date_format("ts", "yyyyMMdd")
    time_part = F.date_format("ts", "HHmmss")
    return ev.select(
        "event_id",
        date_part.alias("date_part"),
        time_part.alias("time_part"),
        F.date_format(
            reassemble_compact_timestamp(date_part, time_part), "yyyy-MM-dd HH:mm:ss"
        ).alias("reassembled"),
    ).orderBy("event_id")


@register(
    "math_functions_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6)  AS net_price,
           ROUND(ABS(l_discount - 0.05), 4)              AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT)             AS qty_floor,
           CAST(CEIL(l_quantity) AS BIGINT)              AS qty_ceil,
           ROUND(POW(1 + l_tax, 2), 6)                   AS tax_sq,
           ROUND(SQRT(l_extendedprice), 4)               AS price_sqrt,
           CAST(l_quantity AS INT) % 7                   AS qty_mod7
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="round/abs/floor/ceil/pow/sqrt/mod",
)
def math_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "array_functions_documents",
    """
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' '))                             AS n_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark')          AS has_spark,
           ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:3], ' ')       AS first3,
           ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' ')[1:3]), ' ') AS first3_sorted
    FROM documents
    ORDER BY doc_id
    """,
    doc="split/size/array_contains/slice/sort_array on the token array",
)
def array_functions_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(F.sort_array(F.slice(toks, 1, 3)), " ").alias("first3_sorted"),
    ).orderBy("doc_id")


@register(
    "array_higher_order_functions",
    """
    SELECT doc_id,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> LENGTH(t) > 4))                 AS n_long_tokens,
           ARRAY_TO_STRING(LIST_TRANSFORM(STRING_SPLIT(text, ' ')[1:3], t -> UPPER(t)), ' ') AS first3_upper,
           CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '), t -> LENGTH(t))) AS BIGINT) AS total_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="higher-order array fns: filter / transform / aggregate (all JVM-side)",
)
def array_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.array_join(F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t)), " ").alias("first3_upper"),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).alias("total_chars"),
    ).orderBy("doc_id")


@register(
    "json_functions_events",
    """
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS prop_k,
           (CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) >= 50) AS k_high
    FROM events
    ORDER BY event_id
    """,
    doc="get_json_object / from_json over the events.props JSON string",
)
def json_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k >= 50).alias("k_high"),
    ).orderBy("event_id")


@register(
    "from_json_typed_events",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="from_json with explicit schema then aggregate on the parsed field",
)
def from_json_typed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("p.k")).cast("bigint").alias("sum_k"))
        .orderBy("event_type")
    )


@register(
    "coalesce_fallback_chain",
    """
    SELECT c_custkey,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_name END,
                    CASE WHEN c_mktsegment = 'BUILDING' THEN 'builder' END,
                    'Not specified') AS resolved_name
    FROM customer
    ORDER BY c_custkey
    """,
    doc="F7: multi-source fallback chain (reference's customer_name logic at "
    "pipeline.py:378-387 — BankScrapeData.name → CustomerInformation → "
    "TU_FFR names → 'Not specified')",
)
def coalesce_fallback_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_name")),
            F.when(F.col("c_mktsegment") == "BUILDING", F.lit("builder")),
            F.lit("Not specified"),
        ).alias("resolved_name"),
    ).orderBy("c_custkey")


@register(
    "regex_route_events",
    """
    SELECT CASE WHEN REGEXP_MATCHES(event_type, '^(click|view)$') THEN 'browse'
                WHEN REGEXP_MATCHES(event_type, 'purchase')        THEN 'txn'
                WHEN REGEXP_MATCHES(event_type, 'error')           THEN 'fault'
                ELSE 'other' END AS route,
           COUNT(*)              AS n
    FROM events
    GROUP BY 1
    ORDER BY route
    """,
    doc="R1: the reference's 4-way regex dispatch (pipeline.py:798-805) as a "
    "declarative routing column instead of an imperative if/elif chain",
)
def regex_route_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").rlike("^(click|view)$"), "browse")
        .when(F.col("event_type").rlike("purchase"), "txn")
        .when(F.col("event_type").rlike("error"), "fault")
        .otherwise("other")
    )
    return ev.groupBy(route.alias("route")).agg(F.count(F.lit(1)).alias("n")).orderBy("route")


@register(
    "regexp_extract_source_id",
    """
    SELECT doc_id,
           source,
           REGEXP_EXTRACT(source, 'src(\\d+)', 1)                  AS source_num,
           CAST(REGEXP_EXTRACT(source, 'src(\\d+)', 1) AS INT) % 4 AS source_bucket
    FROM documents
    ORDER BY doc_id
    """,
    doc="R2: key derivation by regex from an identifier string "
    "(reference slices filenames at pipeline.py:35,156)",
)
def regexp_extract_source_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    num = F.regexp_extract("source", r"src(\d+)", 1)
    return docs.select(
        "doc_id",
        "source",
        num.alias("source_num"),
        (num.cast("int") % 4).alias("source_bucket"),
    ).orderBy("doc_id")


@register(
    "conditional_case_buckets",
    """
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END            AS bucket,
           o_orderstatus,
           COUNT(*)                         AS n,
           ROUND(AVG(o_totalprice), 2)      AS avg_price
    FROM orders
    GROUP BY 1, o_orderstatus
    ORDER BY bucket, o_orderstatus
    """,
    doc="CASE WHEN bucketing + grouped agg",
)
def conditional_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("bucket", "o_orderstatus")
    )


@register(
    "udtf_tokenize_docs",
    """
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS l
      FROM documents WHERE doc_id < 50)
    SELECT t.doc_id,
           CAST(r.i AS INT)      AS pos,
           t.l[r.i + 1]          AS token
    FROM toks t, UNNEST(RANGE(LEN(t.l))) AS r(i)
    ORDER BY doc_id, pos
    """,
    doc="SURVEY §2.11 table-function tier, driver-checked: the registered "
    "Python UDTF (functions/udfs.py::tokenize_udtf) applied via SQL "
    "LATERAL — one doc row expands to (pos, token) rows. Bounded to 50 "
    "docs: the UDTF boundary is row-at-a-time Python and belongs on "
    "bounded/cold paths only (the JVM posexplode twin is the hot-path "
    "form; equivalence pinned in tests/test_udfs.py). Whitelisted as the "
    "sanctioned Python-tier demo in tests/test_plans.py.",
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.udfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM __udtf_docs d, LATERAL tokenize(d.text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "variant_shred_events",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MAX(value) AS max_value,
           CAST(COUNT(CASE WHEN CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) >= 50
                           THEN 1 END) AS BIGINT) AS n_k_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 VariantType shredding: each event is re-encoded as ONE "
    "nested semi-structured document (type / metrics.{k,value}), parsed "
    "once with parse_json into the binary variant encoding, then typed "
    "fields are re-extracted with variant_get before the aggregate. The "
    "oracle computes the same aggregates directly from the base columns, "
    "so any value corruption in the encode->shred round-trip (int, "
    "double, string, nested path) hash-diverges. At 100 TB variant is "
    "the replacement for repeated get_json_object string re-parsing: "
    "one parse per document, then O(1) binary field access per "
    "extraction — the parse cost is paid once however many fields the "
    "query touches. Reference analog: none (the reference holds parsed "
    "dicts in memory per document); [EXT] the open variant encoding "
    "shipped in Spark 4 / Delta / Iceberg.",
)
def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                F.col("value").alias("value"),
            ).alias("metrics"),
        )
    )
    # parse ONCE into the binary variant encoding; every later
    # variant_get is a typed binary lookup, not a JSON re-parse.
    v = ev.select(F.parse_json(doc).alias("v"))
    shred = v.select(
        F.variant_get("v", "$.type", "string").alias("event_type"),
        F.variant_get("v", "$.metrics.k", "int").alias("k"),
        F.variant_get("v", "$.metrics.value", "double").alias("value"),
    )
    return (
        shred.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("value").alias("max_value"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).cast("bigint").alias("n_k_high"),
        )
        .orderBy("event_type")
    )


@register(
    "pipe_syntax_yearly_orders",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS total_rev
    FROM orders
    WHERE o_totalprice > 0
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    ORDER BY order_year, o_orderstatus
    """,
    doc="Spark 4 SQL PIPE syntax run ENGINE-NATIVE: the query is written "
    "as FROM orders |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> WHERE "
    "(post-aggregate, i.e. HAVING) |> ORDER BY — each operator applied in "
    "reading order, the Spark 4.0 SQL surface for linear query "
    "composition. Catalyst lowers pipes to the identical logical plan as "
    "the nested form, so every optimization (pushdown, partial agg, "
    "pruning) applies unchanged; the oracle is the standard ANSI nesting "
    "of the same query, so the lowering itself is what is checked. Money "
    "sum on the exact decimal grid (functions/money.py discipline). "
    "Reference analog: none ([EXT] SQL pipe syntax, Spark 4.0).",
)
def pipe_syntax_yearly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__pipe_orders")
    return spark.sql(
        """
        FROM __pipe_orders
        |> WHERE o_totalprice > 0
        |> EXTEND CAST(year(o_orderdate) AS INT) AS order_year
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total_rev
           GROUP BY order_year, o_orderstatus
        |> WHERE n_orders >= 5
        |> ORDER BY order_year, o_orderstatus
        """
    )


# The SQL-UDF bodies are pinned on an exact decimal grid at every
# intermediate (18,2 price; 18,4 factors; 18,6 after discount; 28,10
# after tax — the 6dp*4dp product is <=10dp so the final cast is exact,
# never rounded) so Spark and the inlined DuckDB twin agree bit-for-bit.
_NET_REV_BODY = (
    "CAST(CAST(CAST({p} AS DECIMAL(18,2)) * (1 - CAST({d} AS DECIMAL(18,4)))"
    " AS DECIMAL(18,6)) * (1 + CAST({t} AS DECIMAL(18,4))) AS DECIMAL(28,10))"
)


@register(
    "sql_udf_net_revenue_bands",
    f"""
    WITH big AS (
      SELECT o_orderkey, o_orderpriority
      FROM orders WHERE o_totalprice >= 150000.0
    ),
    net AS (
      SELECT b.o_orderpriority,
             {_NET_REV_BODY.format(p="l.l_extendedprice", d="l.l_discount", t="l.l_tax")} AS nr
      FROM lineitem l JOIN big b ON l.l_orderkey = b.o_orderkey
    )
    SELECT o_orderpriority,
           CASE WHEN nr >= 50000 THEN 'high'
                WHEN nr >= 20000 THEN 'mid'
                ELSE 'low' END AS band,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(nr) AS VARCHAR) AS DOUBLE) AS band_rev
    FROM net
    GROUP BY 1, 2
    ORDER BY o_orderpriority, band
    """,
    doc="Spark 4 SQL user-defined functions, all three kinds composed in "
    "one query: a scalar SQL UDF (net_rev, exact-decimal net revenue), a "
    "second scalar UDF that CALLS the first (rev_band — SQL UDFs compose "
    "at analysis time, the body is inlined into the plan so there is no "
    "per-row call overhead and codegen sees one expression tree), and a "
    "SQL TABLE function (big_orders(threshold) RETURNS TABLE) used as a "
    "parameterized relation in the FROM clause. The oracle inlines every "
    "body by hand, so what is checked is exactly Spark's inlining. At "
    "100 TB SQL UDFs are the shareable-logic surface that keeps "
    "everything JVM-side — unlike Python UDFs they cost nothing. "
    "Reference analog: none ([EXT] CREATE FUNCTION, Spark 4.0).",
)
def sql_udf_net_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__sqludf_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__sqludf_lineitem")
    body = _NET_REV_BODY.format(p="price", d="disc", t="tax")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_rev("
        "price DOUBLE, disc DOUBLE, tax DOUBLE) "
        f"RETURNS DECIMAL(28,10) RETURN {body}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rev_band("
        "price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS STRING RETURN "
        "CASE WHEN net_rev(price, disc, tax) >= 50000 THEN 'high' "
        "WHEN net_rev(price, disc, tax) >= 20000 THEN 'mid' "
        "ELSE 'low' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION big_orders(threshold DOUBLE) "
        "RETURNS TABLE(o_orderkey BIGINT, o_orderpriority STRING) RETURN "
        "SELECT o_orderkey, o_orderpriority FROM __sqludf_orders "
        "WHERE o_totalprice >= threshold"
    )
    return spark.sql(
        """
        SELECT b.o_orderpriority,
               rev_band(l.l_extendedprice, l.l_discount, l.l_tax) AS band,
               COUNT(*) AS n_lines,
               CAST(SUM(net_rev(l.l_extendedprice, l.l_discount, l.l_tax))
                    AS DOUBLE) AS band_rev
        FROM __sqludf_lineitem l
        JOIN big_orders(150000.0) b ON l.l_orderkey = b.o_orderkey
        GROUP BY 1, 2
        ORDER BY o_orderpriority, band
        """
    )


@register(
    "collation_ci_brand_rollup",
    """
    WITH styled AS (
      SELECT CASE CAST(p_partkey % 3 AS INT)
               WHEN 0 THEN upper(p_brand)
               WHEN 1 THEN lower(p_brand)
               ELSE p_brand END AS s,
             p_retailprice
      FROM part
    )
    SELECT lower(s) AS brand_ci,
           COUNT(*) AS n_parts,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_casings,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS retail_sum
    FROM styled
    GROUP BY lower(s)
    ORDER BY brand_ci
    """,
    doc="Spark 4 string collations: brands restyled into three distinct "
    "casings (deterministically, by p_partkey mod 3), then grouped on "
    "collate(s, 'UTF8_LCASE') — the ENGINE's collation-aware hash/compare "
    "does the case-insensitive merge, no lower() normalization column is "
    "materialized on the grouping path. COUNT(DISTINCT s) on the "
    "un-collated column proves each group really merged multiple "
    "binary-distinct casings (hash-diverges if collation silently decays "
    "to binary equality); the final key is emitted as lower() CAST back "
    "to a plain string so the output schema carries no collation. The "
    "oracle groups by lower(s) — semantically identical for ASCII "
    "brands. At 100 TB collated grouping beats lower()-wrapping because "
    "the collation key participates in shuffle partitioning natively and "
    "comparisons run on collation keys inside Tungsten. Reference "
    "analog: none ([EXT] UTF8_LCASE collation, Spark 4.0).",
)
def collation_ci_brand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("__collate_part")
    return spark.sql(
        """
        WITH styled AS (
          SELECT CASE CAST(p_partkey % 3 AS INT)
                   WHEN 0 THEN upper(p_brand)
                   WHEN 1 THEN lower(p_brand)
                   ELSE p_brand END AS s,
                 p_retailprice
          FROM __collate_part
        )
        SELECT CAST(lower(collate(s, 'UTF8_LCASE')) AS STRING) AS brand_ci,
               COUNT(*) AS n_parts,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS n_casings,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS retail_sum
        FROM styled
        GROUP BY collate(s, 'UTF8_LCASE')
        ORDER BY brand_ci
        """
    )


@register(
    "session_vars_above_avg_orders",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS rev
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    HAVING COUNT(*) >= 5
    ORDER BY o_orderpriority
    """,
    doc="Spark 4 SQL session variables + EXECUTE IMMEDIATE ... INTO + "
    "named-parameter SQL, composed: the above-average price threshold is "
    "computed by EXECUTE IMMEDIATE (dynamic SQL string) INTO a DECLAREd "
    "session variable, the main aggregate references the variable "
    "directly in its WHERE (variables are plain expressions to Catalyst "
    "— constant-folded into the plan, so pushdown still applies), and "
    "the HAVING bound arrives as a named parameter via spark.sql(..., "
    "args=...) (injection-proof parameter binding, not string splicing). "
    "The oracle inlines the threshold as a scalar subquery and the bound "
    "as a constant, so what is checked is exactly the variable/parameter "
    "substitution. The threshold is only a filter boundary (prices sit "
    "on a 2dp grid; ulp noise in AVG cannot flip membership). Reference "
    "analog: none ([EXT] session variables, Spark 4.0).",
)
def session_vars_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__var_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE ord_thr DOUBLE")
    spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT AVG(o_totalprice) FROM __var_orders' INTO ord_thr"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS rev
        FROM __var_orders
        WHERE o_totalprice > ord_thr
        GROUP BY o_orderpriority
        HAVING COUNT(*) >= :min_n
        ORDER BY o_orderpriority
        """,
        args={"min_n": 5},
    )


@register(
    "sql_scripting_sigma_clip_prices",
    """
    WITH c0 AS (SELECT p_brand, p_retailprice FROM part),
    t1 AS (SELECT AVG(p_retailprice) + 1.0::DOUBLE * stddev_samp(p_retailprice) AS thr FROM c0),
    c1 AS (SELECT * FROM c0 WHERE p_retailprice <= (SELECT thr FROM t1)),
    t2 AS (SELECT AVG(p_retailprice) + 1.0::DOUBLE * stddev_samp(p_retailprice) AS thr FROM c1),
    c2 AS (SELECT * FROM c1 WHERE p_retailprice <= (SELECT thr FROM t2)),
    t3 AS (SELECT AVG(p_retailprice) + 1.0::DOUBLE * stddev_samp(p_retailprice) AS thr FROM c2),
    c3 AS (SELECT * FROM c2 WHERE p_retailprice <= (SELECT thr FROM t3))
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS clipped_sum
    FROM c3
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="Spark 4 SQL scripting (BEGIN..END, DECLARE, WHILE, compound "
    "SET with scalar subqueries) running ENGINE-NATIVE: three rounds of "
    "iterative sigma-clipping (drop rows above mean + 1*stddev of the "
    "still-surviving set — the classic robust-statistics cleaning pass "
    "for price/measurement columns) expressed as a WHILE loop that "
    "re-aggregates the surviving rows each pass; the script's final "
    "SELECT is the result relation. The oracle unrolls the exact same "
    "three iterations as chained CTEs, so the scripting control flow "
    "itself is what is checked. Thresholds are filter boundaries only "
    "(2dp price grid vs ~1e-9 ulp noise), so cross-engine float noise "
    "cannot flip membership; emitted aggregates are exact decimal sums. "
    "At 100 TB each loop iteration is one scan+aggregate Catalyst plan "
    "— the loop runs on the driver, the data never leaves executors. "
    "Reference analog: none ([EXT] SQL scripting, Spark 4.0).",
)
def sql_scripting_sigma_clip_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("__clip_part")
    # The scripting flag is needed only while spark.sql() parses and runs
    # the script (the returned relation is an ordinary plan); restore the
    # previous value so this — the one registry query that touches session
    # conf — stays side-effect-free like its peers.
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return _sigma_clip_script(spark)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


def _sigma_clip_script(spark: SparkSession) -> DataFrame:
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 1e18D;
          DECLARE i INT DEFAULT 0;
          WHILE i < 3 DO
            SET thr = (SELECT AVG(p_retailprice)
                              + 1.0D * stddev_samp(p_retailprice)
                       FROM __clip_part WHERE p_retailprice <= thr);
            SET i = i + 1;
          END WHILE;
          SELECT p_brand,
                 COUNT(*) AS n_parts,
                 CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS clipped_sum
          FROM __clip_part
          WHERE p_retailprice <= thr
          GROUP BY p_brand
          ORDER BY p_brand;
        END
        """
    )


@register(
    "xml_roundtrip_events",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(user_id) AS max_user
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 native XML: every event row is serialized to an XML "
    "document (to_xml over a NESTED struct — metrics under a child "
    "element), then parsed back with from_xml against a typed schema "
    "and aggregated from the decoded fields only. The oracle computes "
    "the same aggregates from the base columns, so any encode→parse "
    "corruption (type coercion, nesting, numeric text round-trip — "
    "JVM shortest-roundtrip double printing makes the value column "
    "lossless) hash-diverges. XML is the remaining first-class "
    "semi-structured format next to JSON (from_json), Variant "
    "(parse_json) and CSV; at 100 TB both directions are per-row "
    "codegen expressions — no Python, no shuffle added. Reference "
    "analog: none ([EXT] built-in XML, Spark 4.0).",
)
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    enc = ev.select(
        F.to_xml(
            F.struct(
                "event_id",
                "event_type",
                F.struct("user_id", "value").alias("m"),
            ),
            {"rowTag": "ev"},
        ).alias("xml")
    )
    schema = "event_id BIGINT, event_type STRING, m STRUCT<user_id: BIGINT, value: DOUBLE>"
    dec = enc.select(F.from_xml("xml", schema, {"rowTag": "ev"}).alias("r"))
    return (
        dec.select(
            F.col("r.event_type").alias("event_type"),
            F.col("r.m.user_id").alias("user_id"),
            F.col("r.m.value").alias("value"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("event_type")
    )


@register(
    "try_functions_dirty_inputs",
    """
    WITH dirty AS (
      SELECT event_type, value, event_id,
             CASE CAST(event_id % 4 AS INT)
               WHEN 0 THEN CAST(value AS VARCHAR)
               WHEN 1 THEN 'not-a-number'
               WHEN 2 THEN ''
               ELSE NULL END AS raw_num,
             CASE CAST(event_id % 3 AS INT)
               WHEN 0 THEN '2024-01-15 10:30:00'
               WHEN 1 THEN '2024-13-45 99:99:99'
               ELSE 'garbage' END AS raw_ts
      FROM events),
    parsed AS (
      SELECT event_type,
             TRY_CAST(raw_num AS DOUBLE) AS num,
             CASE WHEN CAST(event_id % 5 AS INT) = 0 THEN NULL
                  ELSE value / (CAST(event_id % 5 AS INT)) END AS ratio,
             TRY_CAST(raw_ts AS TIMESTAMP) AS ts
      FROM dirty)
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(num) AS n_num_ok,
           ROUND(SUM(num), 2) AS sum_num,
           COUNT(ratio) AS n_ratio_ok,
           ROUND(SUM(ratio), 2) AS sum_ratio,
           COUNT(ts) AS n_ts_ok
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="ANSI-mode error-safe scalar surface: Spark 4 runs ANSI ON, so "
    "a single malformed row aborts a 100 TB job unless the pipeline "
    "uses the try_* family — exercised here over deterministically "
    "dirtied inputs (event_id mod N selects clean / malformed / empty / "
    "NULL variants): try_cast for numeric parse (malformed -> NULL, "
    "never an exception), try_divide for the div-by-zero lane, and "
    "try_to_timestamp for unparseable timestamps. The oracle mirrors "
    "with DuckDB TRY_CAST and an explicit zero-guard, so both the "
    "success lanes (values survive bit-exact) and the failure lanes "
    "(exact per-group NULL counts) are hash-checked. All JVM-side "
    "codegen expressions. Reference analog: none ([EXT] try_* "
    "functions, ANSI SQL mode).",
)
def try_functions_dirty_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mod4 = (F.col("event_id") % 4).cast("int")
    mod3 = (F.col("event_id") % 3).cast("int")
    mod5 = (F.col("event_id") % 5).cast("int")
    dirty = ev.select(
        "event_type",
        "value",
        F.when(mod4 == 0, F.col("value").cast("string"))
        .when(mod4 == 1, F.lit("not-a-number"))
        .when(mod4 == 2, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
        .alias("raw_num"),
        F.when(mod3 == 0, F.lit("2024-01-15 10:30:00"))
        .when(mod3 == 1, F.lit("2024-13-45 99:99:99"))
        .otherwise(F.lit("garbage"))
        .alias("raw_ts"),
        mod5.alias("den"),
    )
    parsed = dirty.select(
        "event_type",
        F.col("raw_num").try_cast("double").alias("num"),
        F.try_divide(F.col("value"), F.col("den")).alias("ratio"),
        F.try_to_timestamp(F.col("raw_ts")).alias("ts"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("num").alias("n_num_ok"),
            F.round(F.sum("num"), 2).alias("sum_num"),
            F.count("ratio").alias("n_ratio_ok"),
            F.round(F.sum("ratio"), 2).alias("sum_ratio"),
            F.count("ts").alias("n_ts_ok"),
        )
        .orderBy("event_type")
    )


@register(
    "identifier_group_by_all_orders",
    """
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS rev
    FROM orders
    GROUP BY o_orderstatus, order_year
    ORDER BY o_orderstatus, order_year
    """,
    doc="Spark 4 IDENTIFIER() binding + GROUP BY ALL: the table and the "
    "grouped measure column arrive as PARAMETERS bound through "
    "IDENTIFIER(:name) — the injection-safe way to write dynamic SQL "
    "over table/column names (string-splicing identifiers is the "
    "classic ETL-template vulnerability; parameter markers alone "
    "cannot name a table). GROUP BY ALL infers the grouping set from "
    "the non-aggregate select items — template queries stay correct "
    "when a dimension column is added. Both are pure analysis-time "
    "features: the optimized plan is the ordinary partial+final "
    "aggregate, which is what the constant-inlined oracle checks. "
    "Reference analog: none ([EXT] IDENTIFIER clause, Spark 4.0).",
)
def identifier_group_by_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__ident_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(year(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(IDENTIFIER(:measure) AS DECIMAL(18,2)))
                    AS DOUBLE) AS rev
        FROM IDENTIFIER(:tbl)
        GROUP BY ALL
        ORDER BY o_orderstatus, order_year
        """,
        args={"tbl": "__ident_orders", "measure": "o_totalprice"},
    )

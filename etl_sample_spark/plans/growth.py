"""Product-growth analytics over the ``events`` stream: cohort
retention and funnel conversion — the two queries every events
warehouse serves daily.

Reference analog: none (the reference is a document normalizer); [EXT]
analytics surface on the same events table as the session/attribution
family.

Cross-engine determinism: every emitted ratio is a division of EXACT
integer counts — the raw IEEE double is bit-identical in both engines,
so ratios ship UNROUNDED (rounding integer ratios is the cross-engine
trap; see the percent_rank precedent). Week truncation is Monday-based
in both Spark's date_trunc and DuckDB's DATE_TRUNC.
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
    "cohort_retention_matrix",
    """
    WITH w AS (
      SELECT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk FROM events),
    firsts AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id),
    m AS (
      SELECT f.cohort,
             CAST((w.wk - f.cohort) // 7 AS INT) AS offset_weeks,
             COUNT(DISTINCT w.user_id)           AS n_active
      FROM w JOIN firsts f USING (user_id)
      GROUP BY 1, 2),
    cs AS (SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort)
    SELECT m.cohort                    AS cohort_week,
           m.offset_weeks,
           CAST(m.n_active AS BIGINT)  AS n_active,
           CAST(cs.cohort_size AS BIGINT) AS cohort_size,
           m.n_active * 1.0 / cs.cohort_size AS retention
    FROM m JOIN cs USING (cohort)
    ORDER BY cohort_week, offset_weeks
    """,
    doc="Cohort retention matrix: users grouped by first-seen ISO week "
    "(the cohort), then per (cohort, week-offset) the share of the "
    "cohort still active — the growth dashboard's core table. "
    "Retention ships as the UNROUNDED ratio of exact counts "
    "(bit-identical IEEE division). 100 TB shape: one "
    "map-side-combinable per-user MIN, a fact join on user_id (AQE "
    "broadcasts the cohort side when small, shuffles when not), and "
    "one COUNT DISTINCT grouped on the week pair whose domain is "
    "weeks², not events.",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    )
    # pin (r15 scan audit): the user-sized cohort table feeds the
    # activity join AND the cohort-size agg — unpinned, both re-scanned
    # events (6 scans); pinned, events is read twice (cohort build +
    # activity join), firsts once.
    firsts = pin(
        w.groupBy("user_id")
        .agg(F.min("wk").alias("cohort"))
    )
    m = (
        w.join(firsts, "user_id")
        .groupBy(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("offset_weeks"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    cs = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        m.join(cs, "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            "offset_weeks",
            F.col("n_active").cast("bigint").alias("n_active"),
            "cohort_size",
            (F.col("n_active") * 1.0 / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "offset_weeks")
    )


@register(
    "funnel_conversion_steps",
    """
    WITH s1 AS (
      SELECT user_id, event_type, ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events),
    s2 AS (
      SELECT user_id, event_type, ts, t1,
             MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id) AS t2
      FROM s1),
    s3 AS (
      SELECT user_id, t1, t2,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2),
    u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
          FROM s3 GROUP BY user_id),
    c AS (SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3 FROM u)
    SELECT 1 AS step_order, 'view' AS step,
           CAST(n1 AS BIGINT) AS n_users, n1 * 1.0 / n1 AS pct_of_first
    FROM c
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT), n2 * 1.0 / n1 FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT), n3 * 1.0 / n1 FROM c
    ORDER BY step_order
    """,
    doc="Ordered funnel conversion (view -> click -> purchase, strictly "
    "increasing timestamps per user): step k counts users whose "
    "earliest qualifying step-k event follows their step-(k-1) time — "
    "the sequential-containment semantics real funnel engines "
    "implement, NOT mere per-type existence. Built as three CHAINED "
    "window minimums over the same user partitioning, so Spark reuses "
    "ONE exchange for all three (chained-window precedent: the "
    "next-event training pairs). 100 TB shape: one shuffle on user_id "
    "+ one scalar aggregate; the 3-row emit is a constant.",
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pw = Window.partitionBy("user_id")
    s1 = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(pw).alias("t1"),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(pw),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(pw),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    c = u.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return c.selectExpr(
        """stack(3,
             1, 'view',     CAST(n1 AS BIGINT), CAST(n1 AS DOUBLE) / n1,
             2, 'click',    CAST(n2 AS BIGINT), CAST(n2 AS DOUBLE) / n1,
             3, 'purchase', CAST(n3 AS BIGINT), CAST(n3 AS DOUBLE) / n1)
           AS (step_order, step, n_users, pct_of_first)"""
    ).orderBy("step_order")



@register(
    "user_path_analysis_daily",
    """
    WITH paths AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             array_to_string(list(event_type ORDER BY ts, event_id)[1:8], '>')
               AS path
      FROM events
      GROUP BY user_id, CAST(ts AS DATE))
    SELECT path,
           CAST(COUNT(*) AS BIGINT)                AS n_user_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_user_days DESC, path
    LIMIT 20
    """,
    doc="Top user journeys: per (user, day), the ordered sequence of up "
    "to the first 8 event types joined into a path string, then the 20 "
    "most common paths with user reach — the product-analytics 'path "
    "analysis' every events warehouse serves beside funnels. "
    "Determinism: the sequence orders by (ts, event_id) — a total "
    "order — via array_sort over (ts, event_id, type) structs "
    "(lexicographic struct ordering) mirrored by DuckDB's ordered "
    "list(); truncation to 8 happens AFTER the sort in both engines. "
    "100 TB shape: one shuffle on (user_id, day) — the same key the "
    "session family already uses — with per-group state bounded by the "
    "day's events; the path-frequency rollup then aggregates "
    "path-cardinality rows, not events, and the top-20 is a "
    "TakeOrdered, never a global sort.",
)
def user_path_analysis_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.slice(F.transform(seq, lambda x: x["event_type"]), 1, 8), ">"
    )
    paths = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(path.alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_user_days"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_user_days"), "path")
        .limit(20)
    )


@register(
    "twap_event_value_daily",
    """
    WITH seq AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS v100,
             epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY epoch_us(ts), event_id) AS next_us
      FROM events),
    held AS (
      SELECT event_type, day, v100, next_us - t_us AS dur_us
      FROM seq WHERE next_us IS NOT NULL)
    SELECT event_type, day,
           CAST(SUM(dur_us) AS BIGINT)                    AS held_us,
           CAST(COUNT(*) AS BIGINT)                       AS n_intervals,
           (SUM(v100 * dur_us) * 1.0 / SUM(dur_us)) / 100 AS twap
    FROM held
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    doc="Time-weighted average value (TWAP) per event_type per day: each "
    "event's value is 'held' until the next event of that type that "
    "day, and the average weights by holding time — the fair average "
    "for irregularly-sampled series, where the plain mean over-counts "
    "bursts. EXACT integer arithmetic end-to-end: value is 2dp money "
    "grid (v100 bigint), durations are epoch-MICROsecond differences "
    "(bigint; a day bounds each group's total duration at 8.64e10 µs, "
    "so the weighted v100·dur_us sum stays under ~10^18 — inside "
    "bigint), so the final "
    "ratio-of-exact-integers is bit-identical IEEE in both engines and "
    "ships unrounded. 100 TB shape: ONE shuffle on (event_type, day) "
    "reused by both the LEAD window and the aggregation (same key), "
    "map-side-combinable partial sums.",
)
def twap_event_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    # ts is TIMESTAMP_NTZ at microsecond precision; the session timezone
    # is pinned to UTC (session.tune), so the LTZ cast is the identity
    # and unix_micros equals DuckDB's epoch_us. Ordering by (t_us,
    # event_id) IS ordering by (ts, event_id) — micros are lossless.
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    seq = ev.select(
        "event_type",
        day,
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v100"),
        t_us.alias("t_us"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    seq = seq.withColumn("next_us", F.lead("t_us").over(w))
    held = seq.where(F.col("next_us").isNotNull()).withColumn(
        "dur_us", F.col("next_us") - F.col("t_us")
    )
    return (
        held.groupBy("event_type", "day")
        .agg(
            F.sum("dur_us").cast("bigint").alias("held_us"),
            F.count(F.lit(1)).alias("n_intervals"),
            (
                (F.sum(F.col("v100") * F.col("dur_us")) * F.lit(1.0) / F.sum("dur_us"))
                / F.lit(100)
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )



@register(
    "active_users_dau_wau_mau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    contrib AS (
      SELECT ud.user_id, ud.day + CAST(o.o AS INT) AS day, o.o AS offset
      FROM ud, LATERAL UNNEST(generate_series(0, 27)) AS o(o)),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT c.day,
           CAST(COUNT(DISTINCT CASE WHEN c.offset = 0 THEN c.user_id END)
                AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT CASE WHEN c.offset < 7 THEN c.user_id END)
                AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
    FROM contrib c SEMI JOIN days d ON d.day = c.day
    GROUP BY c.day
    ORDER BY c.day
    """,
    doc="Rolling active users — DAU / 7-day WAU / 28-day MAU per day, "
    "the dashboard staple. The scalable shape: instead of a per-day "
    "range join (non-equi, NLJ at scale) or a 28-wide distinct window "
    "(unsupported), each DISTINCT (user, day) pair explodes map-side "
    "into the 28 future days it contributes to, and ONE groupBy(day) "
    "computes all three via conditional COUNT(DISTINCT) on the "
    "offset — bounded 28x row inflation of the already-deduped "
    "(user, day) table, never of raw events. Days with no activity "
    "are dropped on both sides (semi-join against observed days), so "
    "trailing windows past the data's end don't fabricate rows. "
    "100 TB shape: dedup shuffle on (user, day), then the one "
    "day-keyed aggregate; both map-side-combinable.",
)
def active_users_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # pin (r15 scan audit): the user-day distinct is already a full
    # shuffle and feeds both the contribution explode and the day
    # spine — pinning its output beats recomputing the distinct per
    # branch (4 events scans before; 1 after).
    ud = pin(
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("offset"),
        "day",
    ).select("user_id", "offset", F.date_add("day", F.col("offset")).alias("day"))
    days = ud.select("day").distinct()
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("offset") == 0, F.col("user_id"))
            ).cast("bigint").alias("dau"),
            F.countDistinct(
                F.when(F.col("offset") < 7, F.col("user_id"))
            ).cast("bigint").alias("wau"),
            F.countDistinct("user_id").cast("bigint").alias("mau"),
        )
        .orderBy("day")
    )



@register(
    "yoy_monthly_revenue",
    """
    WITH monthly AS (
      -- VARCHAR round-trip: DuckDB's decimal->double cast is not
      -- correctly rounded (int128 * 10^-scale in float); strtod is,
      -- matching Java BigDecimal.doubleValue (q1 precedent).
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1)
    SELECT cur.month,
           cur.revenue,
           prev.revenue AS revenue_prior_year,
           (cur.revenue - prev.revenue) / prev.revenue AS yoy_growth
    FROM monthly cur
    JOIN monthly prev ON prev.month = cur.month - INTERVAL 12 MONTH
    ORDER BY cur.month
    """,
    doc="Year-over-year monthly revenue: exact-decimal monthly sums "
    "self-joined on month-minus-12 (an equi-join on the month key — "
    "never LAG(12), which silently misreads gaps in the month spine as "
    "year offsets). Sums aggregate exactly in DECIMAL then surface as "
    "correctly-rounded doubles on both engines (Spark's decimal cast "
    "is BigDecimal.doubleValue; the oracle round-trips VARCHAR, since "
    "DuckDB's direct decimal->double cast can be 1 ulp off) — raw "
    "decimal outputs are banned driver-facing because Spark sums to "
    "DECIMAL(28,2) while DuckDB sums to DECIMAL(38,2) and the driver "
    "hash is dtype-exact (the r8 CORRECTNESS fail this fixes). Growth "
    "is then a ratio of bit-identical doubles. 100 TB shape: the "
    "monthly rollup is a map-side-combinable aggregate collapsing the "
    "fact table to months² rows; the self-join is months-sized.",
)
def yoy_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.functions.money import dec2

    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(dec2("o_totalprice")).cast("double").alias("revenue"))
    cur, prev = monthly.alias("cur"), monthly.alias("prev")
    joined = cur.join(
        prev, F.col("prev.month") == F.add_months(F.col("cur.month"), -12)
    )
    cr, pr = F.col("cur.revenue"), F.col("prev.revenue")
    return joined.select(
        F.col("cur.month").alias("month"),
        cr.alias("revenue"),
        pr.alias("revenue_prior_year"),
        ((cr - pr) / pr).alias("yoy_growth"),
    ).orderBy("month")


@register(
    "new_vs_returning_weekly",
    """
    WITH w AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
      FROM events),
    firsts AS (SELECT user_id, MIN(wk) AS first_wk FROM w GROUP BY user_id)
    SELECT w.wk,
           CAST(COUNT(*) AS BIGINT)                           AS n_active,
           CAST(SUM(CASE WHEN w.wk = f.first_wk THEN 1 ELSE 0 END)
                AS BIGINT)                                    AS n_new,
           CAST(SUM(CASE WHEN w.wk > f.first_wk THEN 1 ELSE 0 END)
                AS BIGINT)                                    AS n_returning
    FROM w JOIN firsts f USING (user_id)
    GROUP BY w.wk
    ORDER BY w.wk
    """,
    doc="New vs returning users per ISO week — the growth-accounting "
    "split every activation dashboard leads with. Exact integer "
    "counts; Monday-based week truncation is identical in both "
    "engines (cohort_retention_matrix precedent). 100 TB shape: one "
    "(user, week) dedup shuffle, a per-user MIN that is map-side "
    "combinable, and a weeks-sized rollup; AQE broadcasts the firsts "
    "side when small.",
)
def new_vs_returning_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # pin (r15 scan audit): the user-week distinct is a full shuffle
    # feeding both the first-week agg and the activity join — pin its
    # output instead of recomputing it per branch.
    w = pin(ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct())
    firsts = w.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    j = w.join(firsts, "user_id")
    return (
        j.groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("wk") == F.col("first_wk")).cast("int"))
            .cast("bigint")
            .alias("n_new"),
            F.sum((F.col("wk") > F.col("first_wk")).cast("int"))
            .cast("bigint")
            .alias("n_returning"),
        )
        .orderBy("wk")
    )



@register(
    "time_to_convert_distribution",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_any_purchase
      FROM events GROUP BY user_id),
    conv AS (
      SELECT p.user_id,
             (SELECT MIN(epoch_us(e.ts)) FROM events e
              WHERE e.user_id = p.user_id AND e.event_type = 'purchase'
                AND epoch_us(e.ts) > p.t_view) - p.t_view AS lag_us
      FROM per_user p WHERE p.t_view IS NOT NULL),
    buckets AS (
      SELECT CAST(lag_us // 3600000000 AS BIGINT) AS hours
      FROM conv WHERE lag_us IS NOT NULL)
    SELECT hours,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           SUM(COUNT(*)) OVER (ORDER BY hours
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1.0 / SUM(COUNT(*)) OVER () AS cum_share
    FROM buckets
    GROUP BY hours
    ORDER BY hours
    """,
    doc="Time-to-convert distribution: per user, the lag from first "
    "view to the first purchase strictly after it, floor-bucketed "
    "into whole hours on the exact integer microsecond grid, with the "
    "cumulative converted share per bucket (unrounded exact-integer "
    "ratio). The sequential-containment semantics match the funnel "
    "family (a purchase before any view is not a conversion). 100 TB "
    "shape: ONE user_id shuffle computes both conditional MINs (the "
    "Spark side uses chained conditional aggregation, not the "
    "oracle's correlated subquery), then an hours-sized rollup and "
    "window over at most hundreds of buckets.",
)
def time_to_convert_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", t_us)).alias("t_view"),
    )
    # first purchase strictly after t_view: one more conditional MIN over
    # the same user partitioning (join back on user_id — AQE keeps it a
    # local shuffle-reuse; the oracle spells the same thing as a
    # correlated subquery)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", t_us.alias("t_p")
    )
    conv = (
        per_user.where(F.col("t_view").isNotNull())
        .join(purchases, "user_id", "left")
        .where(F.col("t_p") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("t_p").alias("t_conv"))
        .select(
            # integer `div`, matching the oracle's BIGINT `//` exactly —
            # no double-division floor on the microsecond grid
            F.expr("(t_conv - t_view) div 3600000000").cast("bigint").alias("hours")
        )
    )
    counts = conv.groupBy("hours").agg(F.count(F.lit(1)).alias("n_users"))
    w_cum = Window.orderBy("hours").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return counts.select(
        "hours",
        F.col("n_users").cast("bigint").alias("n_users"),
        (
            F.sum("n_users").over(w_cum) * F.lit(1.0) / F.sum("n_users").over(w_all)
        ).alias("cum_share"),
    ).orderBy("hours")


@register(
    "kaplan_meier_customer_lifetime",
    """
    WITH life AS (
      SELECT o_custkey,
             date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                              MAX(CAST(o_orderdate AS DATE))) AS t,
             CASE WHEN MAX(CAST(o_orderdate AS DATE))
                       < (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
                         - INTERVAL 180 DAY
                  THEN 1 ELSE 0 END AS ev
      FROM orders GROUP BY o_custkey),
    tot AS (SELECT COUNT(*) AS n FROM life),
    pts AS (
      SELECT t, SUM(ev) AS d, COUNT(*) AS leaving
      FROM life GROUP BY t),
    risk AS (
      SELECT t, d,
             tt.n - COALESCE(SUM(leaving) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM pts CROSS JOIN tot tt),
    km AS (
      SELECT t, d, n_risk,
             CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                  THEN 0.0
                  ELSE ROUND(EXP(SUM(CASE WHEN d < n_risk
                                          THEN LN(1.0 - d * 1.0 / n_risk)
                                          ELSE 0.0 END)
                             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
             END AS survival
      FROM risk WHERE d > 0)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(d AS BIGINT) AS d_events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           survival
    FROM km
    ORDER BY t_days
    """,
    doc="Kaplan-Meier survival estimator over customer LIFETIME (days "
    "between first and last order), with right-censoring done properly: "
    "a customer whose last order falls within 180 days of the dataset "
    "horizon is CENSORED (their lifetime is still running), not an "
    "event — the distinction naive churn averages get wrong, biasing "
    "lifetime low. S(t) = product over event times of (1 - d/n_at_risk) "
    "computed as exp of a running LN-sum (the distributed form of a "
    "cumulative product); d and n_at_risk are exact integers, LN ulp "
    "noise sits far below ROUND(,6). Shape: one keyed agg (lifetimes), "
    "one grouped agg (event times), one ordered window over the "
    "event-time points (hundreds of rows, the global-ranking tier). "
    "Reference analog: none ([EXT] survival analysis).",
)
def kaplan_meier_customer_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # pin the customer-sized lifetime table (r15 scan audit): it feeds
    # tot + pts (and the horizon), and unpinned each branch re-scanned
    # orders — 8 scans in the executed plan. The horizon now derives
    # FROM the pinned base (global max orderdate == max over
    # per-customer maxes), so orders is scanned exactly once.
    life_base = pin(
        orders.groupBy("o_custkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
    )
    horizon = life_base.agg(F.max("last_d").alias("hmax"))
    life = (
        life_base
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last_d", "first_d").alias("t"),
            F.when(
                F.col("last_d") < F.date_sub(F.col("hmax"), 180), 1
            )
            .otherwise(0)
            .alias("ev"),
        )
    )
    tot = life.agg(F.count(F.lit(1)).alias("n"))
    pts = life.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    from pyspark.sql import Window

    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = pts.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("n") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))).alias(
            "n_risk"
        ),
    )
    # Terminal cohort guard: when d == n_risk the factor is 0 and
    # survival is EXACTLY 0 from that event time on — LN(0) would be
    # NULL in Spark (silently skipped by SUM) and an error in DuckDB,
    # so the zero is carried by an explicit running flag instead.
    km = risk.withColumn(
        "survival",
        F.when(
            F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(w_run)
            == 1,
            F.lit(0.0),
        ).otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d") < F.col("n_risk"),
                            F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk")),
                        ).otherwise(F.lit(0.0))
                    ).over(w_run)
                ),
                6,
            )
        ),
    ).where(F.col("d") > 0)
    return km.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("d").cast("bigint").alias("d_events"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        "survival",
    ).orderBy("t_days")

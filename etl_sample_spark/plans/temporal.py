"""Event-time / temporal operators over the ``events`` table: tumbling,
sliding and session windows (SURVEY §2.10 T2/T3, batch twins of the
streaming versions in ``etl_sample_spark.streaming``), and the as-of join
(§2.6 J6).

The tumbling/sliding/session queries here are the *batch* semantics
checkable by the DuckDB oracle; the streaming module applies the same
expressions under watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sample_spark import catalog
from etl_sample_spark.operators.joins import asof_join
from etl_sample_spark.pinning import pin
from etl_sample_spark.plans.registry import register
from etl_sample_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return catalog.table(spark, sf_dir, name)


@register(
    "window_tumbling_hourly",
    """
    SELECT STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*)             AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, event_type
    ORDER BY window_start, event_type
    """,
    doc="T2: tumbling 1h event-time window (epoch-aligned in both engines)",
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "window_sliding_2h_1h",
    """
    WITH buckets AS (
      SELECT TIME_BUCKET(INTERVAL '1 hour', ts)                     AS w, value FROM events
      UNION ALL
      SELECT TIME_BUCKET(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS w, value FROM events
    )
    SELECT STRFTIME(w, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*)             AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM buckets
    GROUP BY w
    ORDER BY window_start
    """,
    doc="T2: sliding window 2h every 1h — each event lands in 2 windows",
)
def window_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "window_session_30m",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*)                                AS n_events,
           ROUND(SUM(value), 2)                    AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="T3: session windows with 30m gap (session_window in Spark; "
    "gaps-and-islands in the oracle)",
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "dedup_within_window_batch_twin",
    """
    WITH ranked AS (
      SELECT user_id, event_type,
             STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                             TIME_BUCKET(INTERVAL '1 hour', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id, event_type, window_start, event_id, value
    FROM ranked
    WHERE rn = 1
    ORDER BY user_id, event_type, window_start
    """,
    doc="T5 batch twin: earliest row per (user_id, event_type) per 1h "
    "event-time bucket — dropDuplicatesWithinWatermark with the bucket "
    "standing in for the watermark's state bound",
)
def dedup_within_window_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_sample_spark.streaming.windows import dedup_within_window_batch

    ev = _t(spark, sf_dir, "events")
    kept = dedup_within_window_batch(ev, keys=("user_id", "event_type"), ts_col="ts")
    return kept.select(
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_id",
        "value",
    ).orderBy("user_id", "event_type", "window_start")


@register(
    "asof_join_purchase_to_click",
    """
    SELECT p.event_id,
           p.user_id,
           ROUND(p.value, 4)  AS purchase_value,
           ROUND(c.value, 4)  AS value_asof,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    doc="J6: as-of join — latest prior click per purchase, implemented "
    "shuffle-once via union-sort (operators/joins.py), checked against "
    "DuckDB's native ASOF JOIN",
)
def asof_join_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value", "ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("value_asof", 4).alias("value_asof"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    ).orderBy("event_id")


@register(
    "interval_join_clicks_after_purchase",
    """
    SELECT p.event_id, p.user_id, COUNT(c.event_id) AS n_clicks_30m
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts > p.ts
     AND c.ts <= p.ts + INTERVAL 30 MINUTE
    GROUP BY p.event_id, p.user_id
    ORDER BY p.event_id
    """,
    doc="J5: interval/range join — clicks within 30 minutes after each "
    "purchase; hash-join on user_id with the time band as post-join "
    "filter (the streaming twin is a stream-stream join with watermarks)",
)
def interval_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (p.p_user_id == c.c_user_id)
            & (c.c_ts > p.p_ts)
            & (c.c_ts <= p.p_ts + F.expr("INTERVAL 30 MINUTES")),
            "left",
        )
        .groupBy("p_event_id", "p_user_id")
        .agg(F.count("c_event_id").alias("n_clicks_30m"))
        .select(
            F.col("p_event_id").alias("event_id"),
            F.col("p_user_id").alias("user_id"),
            "n_clicks_30m",
        )
        .orderBy("event_id")
    )


@register(
    "cohort_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
    activity AS (
      SELECT e.user_id,
             STRFTIME(DATE_TRUNC('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
             CAST(FLOOR(DATE_DIFF('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) / 7.0) AS INT)
               AS weeks_since
      FROM events e JOIN firsts f USING (user_id))
    SELECT cohort_week, weeks_since,
           COUNT(DISTINCT user_id) AS active_users
    FROM activity
    GROUP BY cohort_week, weeks_since
    ORDER BY cohort_week, weeks_since
    """,
    doc="Cohort retention matrix: users bucketed by the ISO week of "
    "their first event; active distinct users per (cohort, weeks-since) "
    "cell — the standard product-analytics retention triangle. Shape at "
    "scale: one groupBy for first-touch (user-keyed), one user-keyed "
    "join back to the fact (co-partitioned on the same key: AQE reuses "
    "the shuffle side), one distinct-count agg on the (cohort, week) "
    "grid. Both engines truncate weeks to ISO Monday and difference "
    "whole days — integer arithmetic end to end.",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # pin (r15 scan audit): the user-sized first-activity table is
    # re-derived by the join branch otherwise (4 events scans; 2 after
    # — cohort build + activity join).
    firsts = pin(
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    activity = ev.join(firsts, "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("first_ts")), "yyyy-MM-dd").alias("cohort_week"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("first_ts").cast("date")) / 7
        ).cast("int").alias("weeks_since"),
    )
    return (
        activity.groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'     THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*)                                                  AS n_users,
           COUNT(first_view)                                         AS viewed,
           COUNT(CASE WHEN first_click > first_view THEN 1 END)      AS clicked_after_view,
           COUNT(CASE WHEN first_click > first_view
                       AND first_purchase > first_click THEN 1 END)  AS full_funnel
    FROM f
    """,
    doc="Ordered funnel via conditional-MIN pivot: per user, the first "
    "timestamp of each stage in ONE grouped agg (no per-stage joins, no "
    "sequence window), then strict-order comparisons count each stage. "
    "Shape at scale: a single user-keyed partial-aggregable groupBy over "
    "the fact + a 1-row final agg — the cheapest possible funnel plan; "
    "the join-per-stage alternative shuffles the fact once per stage.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def first_ts(stage: str):
        return F.min(F.when(F.col("event_type") == stage, F.col("ts")))

    f = ev.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    after_view = F.col("first_click") > F.col("first_view")
    full = after_view & (F.col("first_purchase") > F.col("first_click"))
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("viewed"),
        F.count(F.when(after_view, 1)).alias("clicked_after_view"),
        F.count(F.when(full, 1)).alias("full_funnel"),
    )


@register(
    "multitouch_attribution_linear",
    """
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'),
    touches AS (
      SELECT p.purchase_id, p.value, c.click_id
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.cts <= p.pts
       AND c.cts >  p.pts - INTERVAL '6 hours'),
    credited AS (
      SELECT click_id,
             CAST(FLOOR(value * 1000000.0::DOUBLE
                        / (COUNT(*) OVER (PARTITION BY purchase_id))
                        + 0.5::DOUBLE) AS BIGINT) AS credit_micro
      FROM touches)
    SELECT CAST(click_id AS BIGINT)    AS click_id,
           CAST(COUNT(*) AS BIGINT)    AS n_purchases_touched,
           CAST(SUM(credit_micro) AS BIGINT) AS attributed_micro
    FROM credited
    GROUP BY click_id
    ORDER BY click_id
    """,
    doc="Multi-touch attribution (linear model): every click within the "
    "6-hour window before a purchase shares the purchase value equally. "
    "Credits are integer MICRO-units (floor(value*1e6/n + 0.5) — the "
    "portable half-up on a bit-identical double input), so per-click "
    "sums are exact integers with no rounding-tie seam (a 2dp ROUND "
    "diverged cross-engine on boundary credits at sf0.01) — the "
    "marketing-spend allocation query. Shape: an interval join "
    "(range-bounded, per-user equi + time band — the plan-guarded "
    "no-NLJ interval-join family) + one count window per purchase + "
    "one grouped sum. 100 TB: both sides pre-filtered by type before "
    "the join; the window partitions by purchase (bounded touch "
    "counts).",
)
def multitouch_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts"), "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    touches = purchases.join(
        clicks,
        (purchases["user_id"] == clicks["user_id"])
        & (clicks["cts"] <= purchases["pts"])
        & (clicks["cts"] > purchases["pts"] - F.expr("INTERVAL 6 HOURS")),
    ).select("purchase_id", "value", "click_id")
    n_touch = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    credit_micro = F.floor(
        F.col("value") * F.lit(1000000.0) / n_touch + F.lit(0.5)
    ).cast("bigint")
    return (
        touches.select("click_id", credit_micro.alias("credit_micro"))
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases_touched"),
            F.sum("credit_micro").cast("bigint").alias("attributed_micro"),
        )
        .select(
            F.col("click_id").cast("bigint").alias("click_id"),
            "n_purchases_touched",
            "attributed_micro",
        )
        .orderBy("click_id")
    )


@register(
    "bounce_rate_by_usertype",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id)
    SELECT CASE WHEN user_id % 3 = 0 THEN 'cohort_a'
                WHEN user_id % 3 = 1 THEN 'cohort_b'
                ELSE 'cohort_c' END AS cohort,
           CAST(COUNT(*) AS BIGINT)                          AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS bounce_rate
    FROM per_session
    GROUP BY 1
    ORDER BY cohort
    """,
    doc="Bounce rate: share of 30-minute-gap sessions containing exactly "
    "one event, by (deterministic) user cohort — the engagement KPI "
    "built on the same sessionization as window_session_30m (same gap "
    "flag + running-sum session ids), then one more grouped pass. "
    "bounce_rate is an exact integer ratio, emitted unrounded. One "
    "user-partitioned window + two small groupBys.",
)
def bounce_rate_by_usertype(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Native session windows (the same 30m-gap semantics the LAG-based
    # oracle spells out — the pairing window_session_30m already proved).
    per_session = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    cohort = (
        F.when(F.col("user_id") % 3 == 0, "cohort_a")
        .when(F.col("user_id") % 3 == 1, "cohort_b")
        .otherwise("cohort_c")
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy(cohort.alias("cohort"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            bounces.cast("bigint").alias("n_bounces"),
            (bounces * 1.0 / F.count(F.lit(1))).alias("bounce_rate"),
        )
        .orderBy("cohort")
    )


@register(
    "longest_daily_streak_per_user",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    islands AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM islands GROUP BY user_id, island)
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_islands
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gaps-and-islands (MATCH_RECOGNIZE-lite): longest run of "
    "CONSECUTIVE calendar days with activity per user. The classic "
    "trick — date minus dense row number is CONSTANT exactly within a "
    "consecutive run — turns sequence-pattern detection into a plain "
    "groupBy, so the whole pattern costs one (user) window + one "
    "(user, island) aggregate: no self-join, no iteration, no UDF, "
    "and it scales as ordinary keyed shuffles at 100 TB. Emits per "
    "user the longest streak, total active days, and number of "
    "distinct runs. Identical SQL on both engines. Reference analog: "
    "none ([EXT] sequence patterns).",
)
def longest_daily_streak_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("user_id")
    )


@register(
    "state_runs_per_user",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged)
    SELECT user_id,
           CAST(run_id AS BIGINT) AS run_id,
           event_type,
           COUNT(*) AS n_events,
           MIN(ts) AS run_start,
           MAX(ts) AS run_end
    FROM runs
    GROUP BY user_id, run_id, event_type
    ORDER BY user_id, run_id
    """,
    doc="Run-length encoding of an event-state TIMELINE (change-point "
    "runs): consecutive same-type events per user collapse into one "
    "run with start/end/count — the general form of gaps-and-islands "
    "for VALUE changes rather than date gaps, via the lag-compare + "
    "cumulative-sum-of-change-flags trick (run_id is constant exactly "
    "between change points). The compacted timeline is how state "
    "histories are stored at scale (RLE rows instead of raw events). "
    "Deterministic (ts, event_id) ordering makes arrival order "
    "irrelevant. Shape: ONE keyed sort serves both windows, then one "
    "keyed agg — Catalyst reuses the (user_id) partitioning across "
    "lag, running sum and groupBy. Reference analog: none ([EXT] "
    "change-point compaction).",
)
def state_runs_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("user_id", "run_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("timestamp").alias("run_start"),
            F.max("ts").cast("timestamp").alias("run_end"),
        )
        .select(
            "user_id",
            F.col("run_id").cast("bigint").alias("run_id"),
            "event_type",
            "n_events",
            "run_start",
            "run_end",
        )
        .orderBy("user_id", "run_id")
    )

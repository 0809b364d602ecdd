"""Event-table queries: time bucketing, sessionization, JSON extraction,
pivot.  The reference has no streaming (SURVEY §2.4) — scheduled
incremental loads are its substitute — so these run as batch here and
have Structured Streaming twins in ``sayn_spark.streaming``.

Timestamps are compared as exact integer microseconds (Spark
``unix_micros`` vs DuckDB ``epoch_us``) to avoid float/ns-resolution
mismatches between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sayn_spark.functions.registry import T, persist_tracked, register
from sayn_spark.functions.relational import dec, dsum


@register(
    "q_events_hourly",
    oracle="""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregation (batch twin of a windowed stream agg)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "total_value"))
    )


@register(
    "q_events_sessionize",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id, ts_us,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(ts_us) AS BIGINT) AS start_us,
       CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us
FROM sessions GROUP BY user_id, session_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window functions.

    The classic stateful-streaming op expressed as a batch plan: lag ->
    flag -> running sum -> per-session agg.  One shuffle on user_id; at
    100 TB the same shape holds (sessions never cross users, so the
    window partitioning is the natural data partitioning).  Streaming
    twin: ``streaming.sessionize_stream`` (session_window).
    """
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    marked = e.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(
            (ts_us - F.lag(ts_us).over(w) > 1800 * 1000 * 1000)
            | F.lag(ts_us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )


@register(
    "q_events_json_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       event_type, COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: JSON string column -> typed extraction.

    Maps the reference's dict->JSON type rule (database/__init__.py:432).
    """
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select((k % 10).alias("k_mod"), "event_type")
        .groupBy("k_mod", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_events_daily_pivot",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY 1
""",
)
def q_events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: event counts per day x type (explicit value list so
    the plan is a single-pass conditional agg, no extra distinct job)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


@register(
    "q_events_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       DATEDIFF('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM events e JOIN firsts f ON f.user_id = e.user_id
GROUP BY 1, 2
""",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each subsequent active day — the standard product-analytics
    rollup (two aggregations, one self-join on user_id; at 100 TB both
    shuffles share the user_id partitioning)."""
    e = T(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "q_events_anomalies",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_sq
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.value - s.mean_v) / sqrt(s.mean_sq - s.mean_v * s.mean_v), 4) AS zscore
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE ABS((e.value - s.mean_v) / sqrt(s.mean_sq - s.mean_v * s.mean_v)) > 3
""",
)
def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type (|z| > 3).

    Moments accumulate in exact DECIMAL (order-independent), the
    mean/variance/z arithmetic is then identical double ops in both
    engines.  One agg + one broadcast join — fully linear at scale.
    """
    e = T(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(12,2)")
    stats = e.groupBy("event_type").agg(
        (F.sum(dv).cast("double") / F.count(F.lit(1))).alias("mean_v"),
        (F.sum(dv * dv).cast("double") / F.count(F.lit(1))).alias("mean_sq"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.sqrt(
        F.col("mean_sq") - F.col("mean_v") * F.col("mean_v")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3)
        .select("event_id", "event_type", F.round(z, 4).alias("zscore"))
    )


@register(
    "q_events_funnel",
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_signup) AS did_signup,
       COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS signup_then_click,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_signup THEN 1 END) AS full_funnel
FROM stages
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: signup -> click -> purchase, each stage
    counted only when it happens AFTER the previous one (first-touch
    timestamps compared as exact integer microseconds).  One groupBy
    per user — the canonical conversion query."""
    e = T(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, us))

    stages = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("did_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias("signup_then_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("full_funnel"),
    )


@register(
    "q_events_unpivot",
    oracle="""
WITH wide AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) FILTER (event_type = 'click') AS click,
         COUNT(*) FILTER (event_type = 'purchase') AS purchase
  FROM events GROUP BY 1
)
SELECT day, etype, n FROM (
  SELECT day, 'click' AS etype, click AS n FROM wide
  UNION ALL
  SELECT day, 'purchase', purchase FROM wide
) WHERE n > 0
""",
)
def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT surface: wide daily counts melted back to long via
    stack() — the melt direction of q_events_daily_pivot."""
    e = T(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .pivot("event_type", ["click", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.select(
        "day", F.expr("stack(2, 'click', click, 'purchase', purchase) AS (etype, n)")
    ).where(F.col("n") > 0)


@register(
    "q_calendar_spine",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
), spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
), daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT s.day, COALESCE(d.n, 0) AS n_signups
FROM spine s LEFT JOIN daily d ON d.day = s.day
""",
)
def q_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar spine joined to sparse facts — zero-filled
    daily series (sequence() + explode; the gap-free reporting pattern)."""
    e = T(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d0"),
        F.max(F.date_trunc("day", "ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    daily = (
        e.where(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_signups")
    )


@register(
    "q_events_sliding_window",
    oracle="""
WITH buckets AS (
  SELECT w0 + s.off AS win_start, e.event_type
  FROM (SELECT (epoch_us(ts) // 1000000 // 900) * 900 AS w0, event_type FROM events) e,
       (SELECT unnest([0, -900, -1800]) AS off) s
)
SELECT win_start, event_type, COUNT(*) AS n
FROM buckets GROUP BY win_start, event_type
""",
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (45-min length, 15-min slide) expressed as an
    explode over the 3 windows each event belongs to — the batch
    equivalent of F.window(ts, '45 minutes', '15 minutes'), written as
    integer epoch arithmetic so both engines agree exactly."""
    e = T(spark, sf_dir, "events")
    w0 = (F.unix_micros("ts") / 1000000 / 900).cast("long") * 900
    return (
        e.select(w0.alias("w0"), "event_type")
        .select(
            F.explode(F.expr("array(0L, -900L, -1800L)")).alias("off"), "w0", "event_type"
        )
        .groupBy((F.col("w0") + F.col("off")).alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_events_first_touch",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
)
SELECT event_type AS first_event_type,
       COUNT(*) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS first_touch_value
FROM ranked WHERE rk = 1 GROUP BY event_type
""",
)
def q_events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's earliest event credited
    (argmin via row_number, deterministic event_id tiebreak)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .groupBy(F.col("event_type").alias("first_event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            dsum(dec("value"), "first_touch_value"),
        )
    )


@register(
    "q_asof_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purchases AS (
  SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id,
       epoch_us(p.ts) AS purchase_us,
       c.click_id,
       epoch_us(c.ts) AS click_us
FROM purchases p ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest click by the
    same user at-or-before it — an operator Spark lacks natively.

    Scale design: NOT a per-key join + argmax (that shuffles the full
    pair cross-product).  Both sides are tagged and unioned, then ONE
    shuffle on user_id feeds a sorted window where
    ``last(click_id, ignorenulls)`` carries the most recent click
    forward onto each purchase row — linear state, no pair blowup,
    identical to how a 100 TB as-of backfill should run.  Clicks are
    pre-deduped to one per (user, ts) (max event_id) so ties are
    deterministic in both engines.
    """
    e = T(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(None).cast("long").alias("purchase_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # clicks sort before purchases at equal ts => the <= is inclusive
    tagged = clicks.unionByName(purchases).withColumn(
        "kind", F.when(F.col("purchase_id").isNull(), 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w))
        .where((F.col("kind") == 1) & F.col("last_click_id").isNotNull())
        .select(
            "user_id",
            "purchase_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.col("last_click_id").alias("click_id"),
            F.unix_micros("last_click_ts").alias("click_us"),
        )
    )


@register(
    "q_range_join",
    oracle="""
SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
       epoch_us(e.ts) - epoch_us(p.ts) AS lag_us
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 2 HOUR
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: errors within 2 hours after each
    purchase by the same user.

    Scale design: a naive theta-join on (user, t in [start, end))
    degenerates to a per-user cross product.  Instead both sides are
    bucketed on fixed 2-hour epoch buckets — an interval of length <=
    bucket width spans at most 2 buckets, so the purchase side explodes
    into <= 2 rows and the join becomes an EQUI-join on (user_id,
    bucket) with a residual range filter.  Join fan-out is bounded by
    bucket population, never by interval span; each point lives in
    exactly one bucket so no post-join dedup is needed.  This is the
    standard Spark rewrite for what Databricks' range-join hints do.
    """
    H = 2 * 3600 * 1000 * 1000  # bucket = interval width, microseconds
    e = T(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pus"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("eus"),
    )
    pb = purchases.withColumn(
        "bucket",
        F.explode(F.expr(f"sequence(pus div {H}, (pus + {H} - 1) div {H})")),
    )
    eb = errors.withColumn("bucket", F.expr(f"eus div {H}"))
    return (
        pb.join(
            eb,
            (F.col("user_id") == F.col("e_user"))
            & (pb.bucket == eb.bucket)
            & (F.col("eus") >= F.col("pus"))
            & (F.col("eus") < F.col("pus") + H),
        )
        .select(
            "user_id",
            "purchase_id",
            "error_id",
            (F.col("eus") - F.col("pus")).alias("lag_us"),
        )
    )


@register(
    "q_events_changepoints",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN LAG(event_type) OVER w IS NULL
              OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), segs AS (
  SELECT user_id, event_type, ts_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg_id
  FROM marked
), collapsed AS (
  SELECT user_id, seg_id, MIN(event_type) AS event_type,
         MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
  FROM segs GROUP BY user_id, seg_id
)
SELECT user_id, seg_id, event_type, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg_id) AS valid_to_us,
       n_events
FROM collapsed
""",
)
def q_events_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change capture (SCD-2 shape): collapse each user's event stream
    into maximal runs of the same event_type, emitting validity
    intervals [valid_from, valid_to) — the open current segment has
    valid_to NULL.

    This is the dimension-history build the reference's users do in
    warehouse SQL (SAYN delegates it, `database/__init__.py:441-448`);
    lag -> flag -> running-sum -> collapse -> lead is the canonical
    window plan.  One shuffle on user_id, reused by every window; at
    100 TB the run-length collapse happens partition-local after it.
    """
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    marked = e.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segs = marked.withColumn("seg_id", F.sum("is_new").over(w2))
    collapsed = segs.groupBy("user_id", "seg_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w3 = Window.partitionBy("user_id").orderBy("seg_id")
    return collapsed.select(
        "user_id",
        "seg_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w3).alias("valid_to_us"),
        "n_events",
    )


@register(
    "q_events_gap_fill",
    oracle="""
WITH anchors AS (
  SELECT user_id, (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events WHERE user_id < 50
), hourly AS (
  SELECT user_id, hour_us, value FROM anchors WHERE rk = 1
), bounds AS (
  SELECT user_id, MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM hourly GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS hour_us FROM bounds
), joined AS (
  SELECT s.user_id, s.hour_us, h.value,
         CASE WHEN h.value IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM spine s LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hour_us = s.hour_us
)
SELECT user_id, hour_us,
       ROUND(LAST_VALUE(value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled_value,
       is_gap
FROM joined
""",
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build an hourly calendar spine per user
    and forward-fill the last observed event value across missing hours.

    Anchor per hour = value of the hour's last event (ts desc,
    event_id desc — fully deterministic).  The spine is generated
    per-user with sequence() (no driver loop), the fill is
    last(ignorenulls) over an ordered window — at 100 TB both stay
    partition-local after the one shuffle on user_id.
    """
    H = 3600 * 1000 * 1000
    e = T(spark, sf_dir, "events").where(F.col("user_id") < 50)
    hour_us = (F.unix_micros(F.col("ts")) / H).cast("bigint") * H
    w_rk = Window.partitionBy("user_id", "hour_us").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        e.select("user_id", hour_us.alias("hour_us"), "value", "ts", "event_id")
        .withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select("user_id", "hour_us", "value")
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
        .select("user_id", F.explode(F.expr(f"sequence(lo, hi, {H})")).alias("hour_us"))
    )
    joined = spine.join(hourly, ["user_id", "hour_us"], "left").select(
        "user_id",
        "hour_us",
        "value",
        F.when(F.col("value").isNull(), 1).otherwise(0).alias("is_gap"),
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_us",
        F.round(F.last("value", ignorenulls=True).over(w_fill), 2).alias("filled_value"),
        "is_gap",
    )


@register(
    "q_hll_sketch_rollup",
    oracle="""
SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       1 AS union_within_5pct
FROM events
""",
)
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: build one DataSketches HLL per DAY of
    events (the shape you'd persist as a binary column in a daily
    rollup table), then hll_union_agg the daily sketches into an
    overall distinct-user estimate — without ever re-touching raw
    events.  The estimate must land within 5% of the exact distinct
    count (computed independently); only that CONTRACT plus exact
    values cross engines.

    This is the 100 TB incremental pattern the sanity checks
    (q_approx_distinct_sanity) don't cover: day N's load aggregates
    only day N, and any date-range distinct count is a cheap union of
    tiny sketches — no growing shuffle, no re-scan.  The reference's
    substitute is a full GROUP BY re-run per load (SURVEY §2.1
    autosql incremental).
    """
    e = T(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    return merged.join(F.broadcast(exact)).select(
        "n_days",
        "exact_users",
        F.when(
            F.abs(F.col("est") - F.col("exact_users")) <= 0.05 * F.col("exact_users"), 1
        )
        .otherwise(0)
        .alias("union_within_5pct"),
    )


@register(
    "q_events_mad_anomalies",
    oracle="""
WITH v AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type, vm AS med_micro FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT v.event_id, v.event_type, v.vm, ABS(v.vm - m.med_micro) AS ad,
         m.med_micro
  FROM v JOIN med m USING (event_type)
),
dranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, ad AS mad_micro FROM dranked WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(d.med_micro) AS BIGINT) AS med_micro,
       CAST(MAX(md.mad_micro) AS BIGINT) AS mad_micro,
       CAST(SUM(CASE WHEN 10000 * d.ad > 44478 * md.mad_micro
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad md USING (event_type)
GROUP BY d.event_type
""",
)
def q_events_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly detection per event type — the
    outlier screen that survives the outliers it hunts (a handful of
    extreme values drag q_events_anomalies' mean AND its sigma, masking
    themselves; the median and the median absolute deviation move by
    at most one rank).  An event is anomalous when
    |v - median| > 3 * 1.4826 * MAD (the Gaussian-consistent MAD
    sigma), evaluated as the INTEGER cross-multiplication
    10000*|v - med| > 44478*MAD over 1e-6-unit values, so no FP
    boundary exists anywhere — medians are lower-median order
    statistics (exact rank (n+1) div 2, the adaptive-filter rule),
    never interpolated.

    Scale shape: two rank-in-group passes (sort within event_type
    partitions — at 100 TB this is percentile_approx territory, the
    documented boundaries:approx swap) and one map-side-combinable
    aggregate; output rows = event-type cardinality."""
    e = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = e.select(
        "event_id",
        "event_type",
        F.expr("cast(round(value * 1000000) as bigint)").alias("vm"),
    )
    v = persist_tracked(v)

    def _lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        wn = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .where(F.expr("rn = (n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = _lower_median(v, "vm", "med_micro")
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "med_micro",
        F.abs(F.col("vm") - F.col("med_micro")).alias("ad"),
    )
    dev = persist_tracked(dev)
    mad = _lower_median(dev, "ad", "mad_micro")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("med_micro").cast("bigint").alias("med_micro"),
            F.max("mad_micro").cast("bigint").alias("mad_micro"),
            F.sum(
                F.when(
                    F.lit(10000) * F.col("ad") > F.lit(44478) * F.col("mad_micro"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )

"""Event-stream analytics in batch form (the streaming variants live in
quiver_spark.streaming; these batch recipes share the same semantics so the
DuckDB oracle can check them).

The events table arrives with nanosecond timestamps (see tables.load) and a
JSON props column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.functions import DEC_VALUE, dsum, sql_dsum
from quiver_spark.registry import register
from quiver_spark.tables import load

#: Timestamps are emitted as formatted strings — bulletproof against
#: timezone/precision representation differences between engines.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "events_hourly_rollup",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour_ts,
       event_type,
       COUNT(*) AS cnt,
       {sql_dsum('value', DEC_VALUE)} AS sum_value,
       COUNT(DISTINCT user_id) AS users
FROM events
GROUP BY 1, 2
""",
    tags=("events", "agg", "time"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (1h) aggregate in batch form — the batch twin of the
    Structured Streaming window() aggregation in quiver_spark.streaming."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT_SPARK).alias(
                "hour_ts"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value", DEC_VALUE).alias("sum_value"),
            F.countDistinct("user_id").alias("users"),
        )
    )


@register(
    "events_sliding_daily",
    oracle=f"""
SELECT strftime(date_trunc('day', ts), '{TS_FMT_DUCK}') AS day_ts,
       COUNT(*) AS cnt,
       {sql_dsum('value', DEC_VALUE)} AS sum_value
FROM events
GROUP BY 1
""",
    tags=("events", "agg", "time"),
)
def events_sliding_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup via Spark's window() streaming-compatible function; the
    1-day tumbling window start equals date_trunc('day')."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value", DEC_VALUE).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("day_ts"),
            "cnt",
            "sum_value",
        )
    )


@register(
    "events_json_extract",
    oracle="""
SELECT TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS k_bucket,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1
""",
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a JSON field (regex-based so both engines share semantics)
    and aggregate per bucket."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": (\\d+)', 1).cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(F.col("value").cast(DEC_VALUE)).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
    )


@register(
    "events_sessionize",
    oracle="""
WITH marked AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
)
SELECT user_id,
       CAST(1 + SUM(is_new) AS BIGINT) AS session_cnt,
       COUNT(*) AS event_cnt
FROM marked
GROUP BY user_id
""",
    tags=("events", "session", "window"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min idle gap) via LAG + running flag —
    the batch twin of session_window() in streaming. Per-user windows
    partition cleanly (no global ordering), so this scales with user count."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w)).select(
        "user_id",
        "event_id",
        F.when(F.expr("ts - prev_ts > INTERVAL 30 MINUTE"), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return marked.groupBy("user_id").agg(
        (F.lit(1) + F.sum("is_new")).cast("bigint").alias("session_cnt"),
        F.count(F.lit(1)).alias("event_cnt"),
    )


@register(
    "events_pivot_types",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM events
GROUP BY user_id
""",
    tags=("events", "pivot"),
)
def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into per-user count columns (single-pass
    conditional aggregation — one shuffle, no pivot metadata pass)."""
    ev = load(spark, sf_dir, "events")

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "bigint"
        )

    return ev.groupBy("user_id").agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
    )


@register(
    "events_gapfill_hourly",
    oracle=f"""
WITH agg AS (
    SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
rng AS (
    SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
    FROM events
),
grid AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM rng
),
types AS (SELECT DISTINCT event_type FROM events)
SELECT strftime(g.h, '{TS_FMT_DUCK}') AS hour_ts,
       t.event_type,
       COALESCE(a.c, 0) AS cnt,
       (a.c IS NULL) AS is_gap
FROM grid g
CROSS JOIN types t
LEFT JOIN agg a ON a.h = g.h AND a.event_type = t.event_type
""",
    tags=("events", "time", "gapfill"),
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap-fill): generate the full hourly grid
    between the corpus min/max hour × every event type, left-join the
    observed hourly counts, and zero-fill the holes — the step before any
    window/trend model that assumes a regular series.

    Scale posture: the grid is bounded by wall-clock span × type count
    (hours-in-a-decade ≈ 88k rows), so it broadcasts; the only data-sized
    shuffle is the hourly pre-aggregation itself."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("h")
        )
    )
    types = ev.select("event_type").distinct()
    full = grid.crossJoin(F.broadcast(types))
    return (
        full.join(F.broadcast(agg), ["h", "event_type"], "left")
        .select(
            F.date_format("h", TS_FMT_SPARK).alias("hour_ts"),
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("cnt"),
            F.col("c").isNull().alias("is_gap"),
        )
    )


@register(
    "events_funnel_steps",
    oracle="""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
    WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
       (SELECT COUNT(*) FROM s2) AS n_view_after,
       (SELECT COUNT(*) FROM s3) AS n_purchase_after
""",
    tags=("events", "funnel", "analytics"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first view after signup → first
    purchase after that view): the product-analytics staple. Each stage is
    a min-timestamp aggregate chained through a user-keyed join — at
    100 TB that's three shuffles on the uniform user_id key and the stage
    tables only ever shrink."""
    ev = load(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(
                F.col("ts") >= F.col("prev_ts")
            )
        return e.groupBy("user_id").agg(F.min("ts").alias("prev_ts"))

    s1 = stage("signup", None)
    s2 = stage("view", s1)
    s3 = stage("purchase", s2)
    c1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_view_after"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_purchase_after"))
    return c1.crossJoin(c2).crossJoin(c3)


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS act_w FROM events
)
SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort_w, a.act_w) // 7 AS BIGINT)
           AS week_offset,
       COUNT(*) AS users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY 1, 2
""",
    tags=("events", "retention", "analytics"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-activity week,
    counted in each later week they were active — the engagement matrix.
    Week truncation is ISO-Monday in both engines, and the offset is an
    exact integer day difference divided by 7 (both weeks are aligned
    boundaries, so the division is exact). Two shuffles on user_id plus
    one small cohort aggregate."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_w")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("act_w"), F.col("cohort_w")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


@register(
    "events_moving_avg_24h",
    oracle=f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt
    FROM events GROUP BY 1
)
SELECT strftime(h, '{TS_FMT_DUCK}') AS hour_ts,
       cnt,
       CAST(SUM(cnt) OVER w AS BIGINT) AS mov_cnt_24h,
       CAST(COUNT(*) OVER w AS BIGINT) AS mov_hours_24h
FROM hourly
WINDOW w AS (ORDER BY h
             RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW)
""",
    tags=("events", "window", "timeseries"),
)
def events_moving_avg_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour moving aggregate over the hourly event grid using a
    RANGE frame (gap-correct: a missing hour narrows the frame instead of
    silently widening it the way a ROWS frame would). The window runs over
    the PRE-AGGREGATED hourly grid — ~9k rows per year of data — so the
    unpartitioned ordering is driver-scale by construction; the raw events
    table only pays one hash aggregate."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # range key = whole hours since epoch, computed with timestampdiff on
    # the NAIVE timestamps — calendar arithmetic, no session-timezone/DST
    # dependence (unix_timestamp(cast(ntz as timestamp)) would shift with
    # the session zone and skew frame bounds across a DST boundary)
    hours = F.expr(
        "timestampdiff(HOUR, TIMESTAMP_NTZ'1970-01-01 00:00:00', h)"
    )
    w = Window.orderBy(hours).rangeBetween(-23, 0)
    return hourly.select(
        F.date_format("h", TS_FMT_SPARK).alias("hour_ts"),
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("mov_cnt_24h"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("mov_hours_24h"),
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)
               AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS transitions,
       CAST(COUNT(*) * 10000 //
            SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS BIGINT)
           AS share_10k
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    tags=("events", "window", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition (Markov) matrix: for each ordered pair of
    consecutive events WITHIN a user's timeline, the transition count and
    its integer basis-point share of the predecessor's outgoing edges —
    the product-analytics "what happens after X" table. The per-user
    ordering tie-breaks on event_id (the registry determinism rule, same
    as events_sessionize): equal microsecond timestamps must not leave
    the transition order engine-dependent.

    Scale shape: one window shuffle partitioned by user_id (the natural
    key — millions of small partitions, no global order), one
    (prev, next) aggregate over the #event_types²-bounded result, and a
    tiny window over that aggregate for the row-share. The raw table is
    read once."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("transitions")
    )
    return cnt.select(
        "prev_type",
        "next_type",
        "transitions",
        F.expr(
            "(transitions * 10000) div sum(transitions) over "
            "(partition by prev_type)"
        ).alias("share_10k"),
    )


@register(
    "events_scd2_history",
    oracle=f"""
SELECT user_id, event_id, value,
       strftime(ts, '{TS_FMT_DUCK}') AS valid_from,
       strftime(LEAD(ts) OVER w, '{TS_FMT_DUCK}') AS valid_to,
       CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("events", "scd2", "window", "timeseries"),
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history building — turn a change feed into validity
    ranges: each user's purchase events become rows
    (value, valid_from, valid_to, is_current) where valid_to is the NEXT
    change's timestamp (open-ended for the current row). The complement
    of events_latest_per_user's SCD-1 compaction: dimension tables that
    must answer "what was the state AT time t" are built exactly this
    way from CDC feeds.

    Per-user windows partition cleanly (no global ordering, uniform user
    keys), so the build scales with user count; the (ts, event_id)
    tie-break makes the ranges deterministic under equal timestamps."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.date_format("ts", TS_FMT_SPARK).alias("valid_from"),
        F.date_format(nxt, TS_FMT_SPARK).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("bigint").alias("is_current"),
    )

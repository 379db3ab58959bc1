"""Time-series operators the reference ecosystem lacks, built Spark-first
(SURVEY §2.3 custom-operator row; the driver's "as-of join / hypertable
rollup" examples).

The as-of join uses the union-merge formulation: tag both streams, sort by
(key, time, tag) in ONE shuffle, and carry the latest left-hand attributes
forward with an ignore-nulls window — no row fan-out, no range-join
explosion. At 100 TB this is the only shape that scales: work is
O(events + orders) per key, not O(events × orders)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load


@register(
    "asof_join_events_orders",
    oracle="""
WITH od AS (
    SELECT o_custkey, o_orderdate, CAST(MAX(o_orderkey) AS BIGINT) AS okey
    FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.okey AS last_orderkey,
       date_diff('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE))
           AS days_since_order
FROM events e
ASOF JOIN od o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    tags=("timeseries", "asof", "join"),
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event picks the user's latest order at-or-before the
    event time (orders deduped per (custkey, day) by max orderkey so the
    match is unique — DuckDB's ASOF has no tie-break control).

    Implementation: union both streams with a type tag, one window sorted
    by (time, tag) per user, `last(..., ignoreNulls)` carries the most
    recent order forward; inner-match semantics via the NOT NULL filter."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").cast("bigint").alias("okey"))
    )
    left = od.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        "okey",
        F.col("o_orderdate").alias("ot"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    right = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("bigint").alias("okey"),
        F.lit(None).cast(left.schema["ot"].dataType).alias("ot"),
        "event_id",
    )
    merged = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = merged.select(
        "event_id",
        "user_id",
        "is_event",
        "t",
        F.last("okey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("ot", ignorenulls=True).over(w).alias("last_ot"),
    )
    return (
        joined.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            "last_orderkey",
            F.datediff(
                F.col("t").cast("date"), F.col("last_ot").cast("date")
            ).alias("days_since_order"),
        )
    )


RANGE_WINDOW_S = 300  # range-join window (5 minutes)


@register(
    "range_join_user_bursts",
    oracle=f"""
WITH ev AS (
    -- floor to whole seconds: matches Spark's unix_timestamp truncation
    SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
    FROM events
),
pairs AS (
    SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
           CAST(ABS(b.sec - a.sec) AS BIGINT) AS gap_s
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(b.sec - a.sec) <= {RANGE_WINDOW_S}
)
SELECT user_id, COUNT(*) AS n_pairs,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(SUM(gap_s) AS BIGINT) AS total_gap_s
FROM pairs GROUP BY user_id
""",
    tags=("timeseries", "range-join"),
)
def range_join_user_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN via time-bucketing: pairs of same-user events within
    5 minutes. The naive formulation is a per-user cross join; the scale
    formulation buckets time into window-sized cells and joins only
    (user, bucket±1) — each candidate pair is examined exactly once because
    the left row explodes to 3 buckets and the right row owns 1.

    At 100 TB the shuffle key is (user, bucket): bounded fan-out, no
    quadratic blow-up outside genuinely bursty cells."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
    )
    bucket = (F.col("sec") / RANGE_WINDOW_S).cast("bigint")
    a = ev.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("sec").alias("a_sec"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("jb"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("sec").alias("b_sec"),
        bucket.alias("jb"),
    )
    pairs = a.join(b, ["user_id", "jb"]).filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.abs(F.col("b_sec") - F.col("a_sec")) <= RANGE_WINDOW_S)
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.abs(F.col("b_sec") - F.col("a_sec"))).cast("bigint").alias("min_gap_s"),
        F.sum(F.abs(F.col("b_sec") - F.col("a_sec"))).cast("bigint").alias("total_gap_s"),
    )


@register(
    "hypertable_rollup",
    oracle="""
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(CASE WHEN GROUPING(hr) = 0 THEN hr END AS INTEGER) AS hr,
       CAST(GROUPING(hr) AS INTEGER) AS is_day_total,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM (SELECT CAST(ts AS DATE) AS day, date_part('hour', ts) AS hr, value
      FROM events)
GROUP BY ROLLUP (day, hr)
HAVING GROUPING(day) = 0
""",
    tags=("timeseries", "rollup", "grouping-sets"),
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces BOTH the
    hourly and the daily rollup of the events stream (grouping-set
    hierarchy day → (day, hour)); `is_day_total` marks the coarser level.
    The map-side partial aggregation makes the two granularities cost one
    shuffle, the continuous-aggregate trick at scale."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hr"),
        "value",
    )
    return (
        ev.rollup("day", "hr")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.grouping("hr").cast("int").alias("is_day_total"),
            F.grouping("day").cast("int").alias("_gday"),
        )
        # keep (day) and (day, hr) levels; drop the grand total — the
        # GROUPING(day)=0 HAVING of the oracle
        .filter(F.col("_gday") == 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("hr").cast("int").alias("hr"),
            "is_day_total",
            "cnt",
            "sum_value",
        )
    )


@register(
    "events_locf_impute",
    oracle="""
SELECT event_id, user_id, masked,
       last_value(masked IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled
FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS masked
    FROM events
)
""",
    tags=("timeseries", "window", "impute"),
)
def events_locf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation: gaps (here a
    deterministic mask, in production sensor dropouts) take the most
    recent non-null value per user via an ignore-nulls running window —
    the standard time-series gap-repair primitive. One shuffle on
    user_id; values pass through without arithmetic, so parity is exact.
    Leading gaps (before any observation) legitimately stay NULL."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("masked"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "masked",
        F.last("masked", ignorenulls=True).over(w).alias("filled"),
    )

"""Mergeable-sketch operators (SURVEY §2.3 custom-operator row, the
driver's "novel sketch" example): a count-min sketch built and queried as
DataFrames.

The sketch itself is a (depth × width) grid of counters; BUILD is one
map-side hash + groupBy (fully parallel, counters merge by addition — the
sketch is a monoid, so 1000 executors each build partial sketches and the
shuffle adds them). QUERY is a broadcast lookup of each key's d cells and a
min. Hashes are md5-based so DuckDB reproduces the exact grid."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load

CM_DEPTH = 4
CM_WIDTH = 64


def _bucket_spark(row: int, key: str = "event_type") -> F.Column:
    """Bucket of `key` in hash row `row`: first 8 md5 hex chars as int."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), F.col(key))), 1, 8), 16, 10)
        .cast("bigint") % CM_WIDTH
    )


def _bucket_sql(row: int, key: str = "event_type") -> str:
    return (
        f"(('0x' || substr(md5('{row}:' || {key}), 1, 8))::BIGINT % {CM_WIDTH})"
    )


@register(
    "sketch_count_min",
    oracle=f"""
WITH cells AS (
    {" UNION ALL ".join(f'''
    SELECT {r} AS hrow, {_bucket_sql(r)} AS bucket, COUNT(*) AS c
    FROM events GROUP BY 2''' for r in range(CM_DEPTH))}
),
keys AS (SELECT DISTINCT event_type FROM events),
est AS (
    SELECT k.event_type,
           MIN(c.c) AS cm_estimate
    FROM keys k
    JOIN cells c
      ON {" OR ".join(f"(c.hrow = {r} AND c.bucket = {_bucket_sql(r, 'k.event_type')})" for r in range(CM_DEPTH))}
    GROUP BY k.event_type
),
exact AS (SELECT event_type, COUNT(*) AS exact_cnt FROM events GROUP BY event_type)
SELECT e.event_type, x.exact_cnt, CAST(e.cm_estimate AS BIGINT) AS cm_estimate
FROM est e JOIN exact x ON e.event_type = x.event_type
""",
    tags=("sketch", "count-min", "agg"),
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of event_type frequencies: build the {CM_DEPTH}×{CM_WIDTH}
    counter grid, then point-query every distinct key and compare to the
    exact count (estimate ≥ exact always; equality when no collisions)."""
    ev = load(spark, sf_dir, "events")
    # BUILD: one pass per hash row (a single pass with posexplode of the d
    # buckets would also work; per-row passes keep the plan obvious)
    cells = None
    for r in range(CM_DEPTH):
        c = ev.groupBy(_bucket_spark(r).alias("bucket")).agg(
            F.count(F.lit(1)).alias("c")
        ).withColumn("hrow", F.lit(r))
        cells = c if cells is None else cells.unionByName(c)
    keys = ev.select("event_type").distinct()
    # QUERY: each key probes its d cells (broadcast the tiny sketch)
    probes = None
    for r in range(CM_DEPTH):
        p = keys.select(
            "event_type",
            F.lit(r).alias("hrow"),
            _bucket_spark(r).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(cells), ["hrow", "bucket"])
        .groupBy("event_type")
        .agg(F.min("c").cast("bigint").alias("cm_estimate"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return est.join(exact, "event_type").select(
        "event_type", "exact_cnt", "cm_estimate"
    )

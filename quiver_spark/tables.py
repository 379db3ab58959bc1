"""Loaders for the driver's testdata tables.

Every loader is declarative (``spark.read.parquet`` → Catalyst gets pushdown,
pruning, and partition planning for free). The only imperative fix-up is the
``events.ts`` nanosecond column, which Spark's parquet reader cannot type
natively — we read it as int64 (``nanosAsLong``) and truncate to microseconds,
exactly what DuckDB does when it reads the same file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables whose cardinality is a CONSTANT of the benchmark (region=5,
#: nation=25) — safe to broadcast unconditionally at any scale factor. Tables
#: that scale linearly with the data volume (customer/supplier/part: TB-scale
#: at TPC-H SF ~100k) must never carry an unconditional hint; use
#: ``maybe_broadcast`` so the hint is size-gated at plan time.
BROADCAST_TABLES = frozenset({"region", "nation"})

#: Ceiling for an explicit broadcast hint on a linearly-scaling relation, in
#: bytes of Catalyst's plan-time size estimate. Above this the relation is
#: returned unhinted and AQE picks the join strategy from RUNTIME sizes —
#: a forced broadcast of a TB-scale side is a hard executor OOM, while a
#: missed broadcast merely costs a shuffle. 256 MiB is comfortably inside a
#: production executor's memory yet far above any bounded dimension table.
BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-time size estimate for ``df`` (bytes), or None.

    For file scans this is derived from the file footprint on disk (the same
    estimate autoBroadcastJoinThreshold consults); derived plans (filters,
    aggregates) propagate it conservatively, so an aggregate over a 100 TB
    fact table reports huge — exactly the behavior a broadcast gate wants.
    """
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def maybe_broadcast(df: DataFrame, size_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint for relations that scale with the data.

    Emits ``F.broadcast(df)`` only when Catalyst's plan-time estimate is
    under the ceiling (``BROADCAST_MAX_BYTES``, env override
    ``QUIVER_BROADCAST_MAX_BYTES``); otherwise returns ``df`` unhinted so
    AQE chooses shuffle-vs-broadcast from runtime statistics. Use this for
    customer/supplier/part-class tables and anything derived per-key from
    them; keep plain ``F.broadcast`` for constant-cardinality relations
    (nation/region, singleton aggregates, bounded grids/probe sets).

    Unknown size (stats unavailable) → no hint: at 100 TB the failure mode
    of a wrong hint is an executor OOM, of a missing hint an extra shuffle.

    ``size_bytes`` overrides the Catalyst estimate with a caller-known size
    — used for quiver scans, where a Python DataSource cannot report plan
    statistics (Spark reads Long.MaxValue) but the manifest/footer metadata
    the planner already holds knows the table's on-disk footprint.
    """
    cap = int(os.environ.get("QUIVER_BROADCAST_MAX_BYTES", BROADCAST_MAX_BYTES))
    size = size_bytes if size_bytes is not None else plan_size_bytes(df)
    if size is not None and size <= cap:
        return F.broadcast(df)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with engine-canonical types."""
    configure(spark)
    # ship quiver_spark to Python workers up front: operators that pickle
    # references into the package (mapInPandas decoders, UDTF classes) must
    # work no matter which query the caller runs first or what the driver
    # process's cwd/sys.path looks like
    from quiver_spark.sources import ship_package

    ship_package(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanoseconds → naive microsecond timestamp (truncating, the
        # same conversion DuckDB applies to TIMESTAMP(NANOS) parquet).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-style recipes)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)

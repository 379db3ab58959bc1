"""Loaders for the driver's testdata tables.

Every loader is declarative (``spark.read.parquet`` → Catalyst gets pushdown,
pruning, and partition planning for free). The only imperative fix-up is the
``events.ts`` nanosecond column, which Spark's parquet reader cannot type
natively — we read it as int64 (``nanosAsLong``) and truncate to microseconds,
exactly what DuckDB does when it reads the same file.
"""

from __future__ import annotations

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

#: Dimension tables small enough to broadcast at any scale factor — at 100 TB
#: the fact tables grow but these stay tiny (region=5, nation=25) or modest.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


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

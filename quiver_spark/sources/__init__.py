from quiver_spark.sources.arrow_datasource import (  # noqa: F401
    ArrowIpcDataSource,
    register_arrow,
)
from quiver_spark.sources.quiver_datasource import (  # noqa: F401
    QuiverDataSource,
    register,
    ship_package,
)


def scan(spark, path: str, **options):
    """Unified quiver scan — ONE entry point that routes to the fastest
    engine able to serve the table correctly:

    - **quiverjvm** (the Java DataSourceV2 columnar reader): flat schemas,
      plain/generation/Hive layouts, ALTER-DDL rename/add/drop tables —
      manifest-served planning, zone-map + bloom page pruning, Catalyst
      column pruning, no JVM→Python boundary (sf0.1: 0.19-0.37x of the
      parquet control vs the Python DS's ~1.4x planner-floor proxies).
    - **python "quiver" DS** fallback: everything semantic the JVM reader
      refuses — nested/unsigned/large types, column initial-defaults,
      merge-schemas directories — plus ANY reader option (time travel,
      CDC cursors, file_column, …), which only the Python DS implements.

    Eligibility is probed against the REAL JVM guards (one driver-side
    manifest read via QuiverJvmRead.inferTableSchema) — not a Python-side
    re-implementation that could drift — and a failed probe or un-attachable
    jar degrades silently to the Python DS: routing never changes results,
    only the engine that produces them.
    """
    register(spark)
    if not options:
        df = try_jvm_scan(spark, path)
        if df is not None:
            return df
    reader = spark.read.format("quiver")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def try_jvm_scan(spark, path: str):
    """The quiverjvm columnar relation when the REAL JVM guards accept the
    table, else None. Guard refusals (UnsupportedOperationException:
    exotic leaf units, non-scalar defaults, merge-schemas dirs) are the
    designed silent reroute; anything ELSE (corrupt manifest or footer,
    missing files, jar ABI fault) is a genuine fault that must not be
    hidden by the fallback — it warns before returning None, and the
    Python DS raises loudly if IT can't read the table either."""
    from quiver_spark.jvm import attach_jar

    if not attach_jar(spark):
        return None
    try:
        spark._jvm.io.quiverspark.QuiverJvmRead.inferTableSchema(path)
        return spark.read.format("quiverjvm").load(path)
    except Exception as exc:  # noqa: BLE001 — adjudicated in the docstring
        # py4j surfaces the class inside the message; pyspark's captured-
        # exception conversion surfaces it as the CLASS name with the java
        # prefix stripped from the message — accept both.
        if "UnsupportedOperationException" not in str(exc) and (
            type(exc).__name__ != "UnsupportedOperationException"
        ):
            import warnings

            warnings.warn(
                "quiver scan: JVM probe failed with a non-guard "
                f"error on {path!r}; falling back to the Python "
                f"datasource: {exc}",
                RuntimeWarning,
                stacklevel=3,
            )
        return None

"""quiver_spark — a PySpark-native analytics engine with the capabilities of
sundy-li/Quiver (strawboat), re-expressed Spark-first.

Layout:
    format/     — the native "quiver" columnar file format (pyarrow-level codec +
                  page + footer machinery, mirroring the reference's on-disk
                  layout; see SURVEY.md §1.2)
    sources/    — PySpark DataSource V2 wrappers (spark.read.format("quiver"))
    operators/  — the declared relational + LLM-pipeline query surface
                  (SURVEY.md §2.3), each with a DuckDB oracle
    functions/  — reusable column-expression helpers
    plans/      — plan inspection / explain utilities
    streaming/  — Structured Streaming recipes over the events table
"""

__version__ = "0.1.0"

from quiver_spark.registry import QUERIES, QuerySpec, register  # noqa: F401

"""Operator modules — importing this package registers every query spec."""

from quiver_spark.operators import (  # noqa: F401
    dedup,
    events,
    format_queries,
    multimodal,
    relational,
    relational2,
    similarity,
    text,
)

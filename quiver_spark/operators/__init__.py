"""Operator modules — importing this package registers every query spec."""

from quiver_spark.operators import (  # noqa: F401
    dedup,
    events,
    format_queries,
    format_queries2,
    multimodal,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    pipeline6,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    similarity,
    sketches,
    text,
    timeseries,
    udtf_ops,
)

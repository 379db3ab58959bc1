from quiver_spark.streaming.events import (  # noqa: F401
    hourly_counts,
    sessionized_counts,
    stream_dedup,
    stream_events,
)

from debias_spark.streaming.incremental import (
    run_available_now,
    session_window_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "run_available_now",
    "session_window_counts",
    "stream_events",
    "tumbling_counts",
]

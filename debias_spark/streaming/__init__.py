from debias_spark.streaming.incremental import (
    narrow_shuffle,
    run_available_now,
    session_window_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "narrow_shuffle",
    "run_available_now",
    "session_window_counts",
    "stream_events",
    "tumbling_counts",
]

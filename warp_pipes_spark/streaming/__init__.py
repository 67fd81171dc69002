from warp_pipes_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    session_windows,
    sliding_window_counts,
    tumbling_window_agg,
    write_stream_parquet,
)
from warp_pipes_spark.streaming.stateful import stateful_sessions

__all__ = [
    "dedup_stream",
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_counts",
    "session_windows",
    "stateful_sessions",
    "write_stream_parquet",
]

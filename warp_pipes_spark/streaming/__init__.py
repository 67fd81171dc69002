from warp_pipes_spark.streaming.cdc_sink import SnapshotStore, merge_upsert_sink
from warp_pipes_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    session_windows,
    sliding_window_counts,
    tumbling_window_agg,
    write_stream_parquet,
)
from warp_pipes_spark.streaming.stateful import stateful_sessions
from warp_pipes_spark.streaming.transform_state import (
    stateful_topk,
    transform_with_state_available,
)

__all__ = [
    "stateful_topk",
    "transform_with_state_available",
    "dedup_stream",
    "merge_upsert_sink",
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_counts",
    "session_windows",
    "SnapshotStore",
    "stateful_sessions",
    "write_stream_parquet",
]

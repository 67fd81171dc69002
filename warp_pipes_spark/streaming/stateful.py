"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

``F.session_window`` (streaming/events.py) covers gap-based session
aggregation declaratively; this operator is the *custom-state* path the
reference's extension mechanism would need for logic Spark's built-in
windows can't express (per-session derived features, early emission, custom
eviction). State per user = the open session (start, last, n, value-sum),
kept as a tuple row; closed sessions are emitted as soon as a gap is
observed in-batch, and the open session is flushed by an event-time timeout
once the watermark passes ``last + gap``.

Scale notes: state is partitioned by the group key (user_id) across
executors and checkpointed by Structured Streaming; per-batch work is
Arrow-batched pandas over only the keys present in the micro-batch, so
state size and per-trigger cost stay proportional to active users, not
history.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, v double"

_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
}


def _interval_us(interval: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", interval)
    if not m or m.group(2) not in _UNITS_US:
        raise ValueError(f"unsupported interval: {interval!r}")
    return int(m.group(1)) * _UNITS_US[m.group(2)]


def stateful_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming DataFrame (user_id, ts, value, ...) -> closed sessions
    (user_id, session_start, session_end, n_events, total_value)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _interval_us(gap)

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last+gap with no new events: flush open session
            start, last, n, v = state.get
            state.remove()
            yield _session_pdf(user_id, [(start, last, n, v)])
            return

        pdfs = [pdf for pdf in pdf_iter if len(pdf)]
        if not pdfs:
            return
        batch = pd.concat(pdfs, ignore_index=True).sort_values(ts_col)
        ts_us = batch[ts_col].astype("datetime64[us]").astype("int64")
        vals = batch[value_col].astype("float64")

        open_sess = state.get if state.exists else None
        closed = []
        for t, val in zip(ts_us, vals):
            if open_sess is None:
                open_sess = (t, t, 1, float(val))
            else:
                start, last, n, v = open_sess
                if t - last > gap_us:
                    closed.append(open_sess)
                    open_sess = (t, t, 1, float(val))
                else:
                    open_sess = (start, max(last, t), n + 1, v + float(val))
        state.update(open_sess)
        # flush when the event-time watermark passes the close boundary
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        if closed:
            yield _session_pdf(user_id, closed)

    def _session_pdf(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


ZSCORE_OUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, "
    "n_seen long, z double, is_anomaly boolean"
)
ZSCORE_STATE_SCHEMA = "n long, s double, ss double"


def stateful_zscore(
    events: DataFrame,
    z_threshold: float = 2.0,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Online anomaly detection: every event is scored ONE-STEP-AHEAD
    against its user's running mean/std over all strictly-earlier events
    (prequential scoring — the event never masks itself), then folded into
    the state. The streaming counterpart of the batch
    :class:`~warp_pipes_spark.pipes.temporal.RollingZScore`, with the
    expanding-history frame a stream can actually maintain: state per user
    is three numbers (count, sum, sum of squares) — O(1) per key forever,
    no eviction needed.

    Events are scored in (ts, id) order within each micro-batch; an event
    with fewer than 2 predecessors (or zero spread) scores z = 0. Output
    mode: append — one scored row per input event."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        pdfs = [pdf for pdf in pdf_iter if len(pdf)]
        if not pdfs:
            return
        batch = pd.concat(pdfs, ignore_index=True).sort_values(
            [ts_col, id_col]
        )
        n, s, ss = state.get if state.exists else (0, 0.0, 0.0)
        out = {k: [] for k in (
            "user_id", "event_id", "ts", "value", "n_seen", "z", "is_anomaly"
        )}
        for _, row in batch.iterrows():
            v = float(row[value_col])
            z = 0.0
            if n >= 2:
                mean = s / n
                var = ss / n - mean * mean
                if var > 0:
                    z = (v - mean) / var ** 0.5
            out["user_id"].append(user_id)
            out["event_id"].append(int(row[id_col]))
            out["ts"].append(row[ts_col])
            out["value"].append(v)
            out["n_seen"].append(n)
            out["z"].append(z)
            out["is_anomaly"].append(abs(z) > z_threshold)
            n, s, ss = n + 1, s + v, ss + v * v
        state.update((n, s, ss))
        yield pd.DataFrame(out)

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=ZSCORE_OUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

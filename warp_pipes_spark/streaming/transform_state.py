"""Stateful streaming on the ``transformWithStateInPandas`` API (Spark 4).

``applyInPandasWithState`` (``streaming/stateful.py``) carries one opaque
state tuple per key; the ``transformWithState`` family is its successor —
NAMED, TYPED state variables (value/list/map) with per-state TTL and
timers, checkpointed in the state store like any built-in stateful op.
This module uses it for the operator the trending query (q100) computes
per-window in batch: the per-key RUNNING top-k items by count, maintained
incrementally in a ``MapState`` (item -> count) so each micro-batch does
work proportional to the batch, not to history.

Scale notes: state is hash-partitioned by the group key across executors;
per-key state is the key's distinct-item map (bound it upstream by
pre-bucketing items or adding a TTL); the emitted top-k is recomputed from
that map only for keys PRESENT in the micro-batch (update semantics).

ENVIRONMENT GATE (same honesty contract as ``HFTokenizer`` /
``DecodeMedia``): Spark's TransformWithStateInPySpark driver worker talks
to the JVM over a protobuf channel, so the ``protobuf`` Python package
must be importable on driver and executors. This container does not ship
it, so ``stateful_topk`` raises ``NotImplementedError`` with that reason
up front (the implementation itself is complete against the public API
and runs wherever ``google.protobuf`` is present). The operator also
requires the RocksDB state store provider::

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


def transform_with_state_available() -> bool:
    """True when the TWS Python<->JVM protobuf bridge can load."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _TopKProcessor(StatefulProcessor):
    """MapState(item -> cnt); on every micro-batch: fold the batch's counts
    into state, then emit the key's current top-k (count desc, item asc —
    deterministic)."""

    def __init__(self, k: int):
        self.k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getMapState("counts", "item string", "cnt long")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        local: dict = {}
        for pdf in rows:
            for item, n in pdf["item"].value_counts().items():
                local[item] = local.get(item, 0) + int(n)
        for item, n in local.items():
            prev = self.counts.getValue((item,))
            self.counts.updateValue((item,), ((prev[0] if prev else 0) + n,))
        current = [(ik[0], v[0]) for ik, v in self.counts.iterator()]
        current.sort(key=lambda t: (-t[1], t[0]))
        top = current[: self.k]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "item": [t[0] for t in top],
                "cnt": [t[1] for t in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    def close(self) -> None:
        pass


def stateful_topk(
    events: DataFrame,
    key_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 3,
) -> DataFrame:
    """(streaming or batch) events -> per-key running top-``k`` items:
    ``(key, item, cnt, rank)``, re-emitted for a key whenever one of its
    items arrives (Update mode). Batch input = one conceptual micro-batch,
    i.e. the plain per-key top-k of the input."""
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` Python package "
            "(Spark's TWS driver-worker bridge); it is not installed in "
            "this environment"
        )
    key_type = dict(events.dtypes)[key_col]
    out_schema = f"key {key_type}, item string, cnt long, rank int"
    narrowed = events.select(
        F.col(key_col).alias("key_in"), F.col(item_col).cast("string").alias("item")
    )
    return narrowed.groupBy("key_in").transformWithStateInPandas(
        statefulProcessor=_TopKProcessor(k),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )

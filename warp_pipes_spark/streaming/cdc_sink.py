"""Streaming CDC apply: a foreachBatch MERGE-upsert sink with an
atomically versioned parquet snapshot.

A change-event stream (insert/update/delete rows with a change sequence)
maintains a queryable TABLE, not an append log: each micro-batch folds
into the current snapshot via ``MergeUpsert`` (one key-partitioned
max-struct aggregation — ``pipes/cdc.py``) and publishes a NEW snapshot
version; readers always see a complete version, never a half-written one.

Exactly-once across restarts: the snapshot meta records the batch id that
produced it. Structured Streaming replays the in-flight batch after a
crash (offsets commit AFTER foreachBatch returns), so the sink SKIPS any
batch id it has already published — the classic idempotent-foreachBatch
contract.

Publication protocol (same spirit as ``CacheManager.store``):
  - the merged snapshot writes to ``<dir>/v<batch_id>`` (parquet)
  - ``<dir>/_CURRENT`` (a one-line pointer file) is replaced atomically
    (write-temp + ``os.replace``) to name the new version
Readers resolve ``_CURRENT`` then read that version — on any crash the
pointer still names the previous complete version. At cluster scale the
same protocol runs against shared storage with a conditional-put pointer.

The reference is batch-only (SURVEY §2.10); this composes the engine's
streaming extension with the CDC operator the same way a Delta/Hudi MERGE
sink would, without a table-format dependency.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from warp_pipes_spark.pipes.cdc import MergeUpsert


class SnapshotStore:
    """Versioned parquet snapshot with an atomic ``_CURRENT`` pointer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_version(self) -> Optional[int]:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def current_path(self) -> Optional[str]:
        v = self.current_version()
        return None if v is None else os.path.join(self.root, f"v{v}")

    def load(self, spark: SparkSession) -> Optional[DataFrame]:
        path = self.current_path()
        return None if path is None else spark.read.parquet(path)

    def publish(self, df: DataFrame, version: int) -> None:
        path = os.path.join(self.root, f"v{version}")
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer + f".tmp-{version}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer)  # atomic pointer swap


def merge_upsert_sink(
    store: SnapshotStore,
    keys: List[str],
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Returns the ``foreachBatch`` function: wire it with
    ``stream.writeStream.foreachBatch(merge_upsert_sink(store, keys))``.

    Idempotent on batch replay: a batch id at or below the published
    version is a post-crash replay of work already visible — skipped.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = store.current_version()
        if cur is not None and batch_id <= cur:
            return  # replayed batch — already published
        spark = batch_df.sparkSession
        snapshot = store.load(spark)
        if snapshot is None:
            # first batch: an empty snapshot with the payload schema
            payload_cols = [
                c for c in batch_df.columns if c not in (op_col, seq_col)
            ]
            snapshot = batch_df.select(*payload_cols).limit(0)
        merged = MergeUpsert(
            snapshot=snapshot, keys=keys, op_col=op_col, seq_col=seq_col
        )(batch_df)
        store.publish(merged, batch_id)

    return apply_batch

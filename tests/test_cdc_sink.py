"""Streaming MERGE-upsert sink: snapshot maintenance + replay idempotence."""

import os

from warp_pipes_spark.streaming.cdc_sink import SnapshotStore, merge_upsert_sink


def _collect(store, spark):
    df = store.load(spark)
    return sorted(tuple(r) for r in df.collect()) if df is not None else None


def test_sequential_batches_fold_into_snapshot(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    sink = merge_upsert_sink(store, keys=["k"])
    b0 = spark.createDataFrame(
        [(1, "a", 1, "I"), (2, "b", 1, "I")], "k int, v string, seq int, op string"
    )
    b1 = spark.createDataFrame(
        [(1, "a2", 1, "U"), (3, "c", 1, "I")], "k int, v string, seq int, op string"
    )
    b2 = spark.createDataFrame(
        [(2, "b", 1, "D")], "k int, v string, seq int, op string"
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)
    assert _collect(store, spark) == [(1, "a2"), (3, "c")]
    assert store.current_version() == 2
    # every published version remains a complete readable snapshot
    assert os.path.exists(str(tmp_path / "snap" / "v1" / "_SUCCESS"))


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Structured Streaming replays the in-flight batch after a crash; the
    sink must not double-apply it."""
    store = SnapshotStore(str(tmp_path / "snap"))
    sink = merge_upsert_sink(store, keys=["k"])
    b0 = spark.createDataFrame([(1, "a", 1, "I")], "k int, v string, seq int, op string")
    sink(b0, 0)
    before = _collect(store, spark)
    # replay of batch 0, and a stale batch after newer ones exist
    sink(b0, 0)
    assert _collect(store, spark) == before
    assert store.current_version() == 0


def test_stream_drives_sink(spark, tmp_path):
    """End-to-end through writeStream.foreachBatch with a file source:
    change files (disjoint key sets, so batch order is immaterial) fold
    into the final snapshot."""
    src = tmp_path / "changes"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a", 1, "I"), (2, "b", 1, "I")], "k int, v string, seq int, op string"
    ).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(
        [(3, "c", 1, "I"), (4, "d", 1, "I"), (4, "d2", 2, "U")],
        "k int, v string, seq int, op string",
    ).coalesce(1).write.parquet(str(src / "f1"))
    store = SnapshotStore(str(tmp_path / "snap"))
    stream = (
        spark.readStream.schema("k int, v string, seq int, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(merge_upsert_sink(store, keys=["k"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert _collect(store, spark) == [(1, "a"), (2, "b"), (3, "c"), (4, "d2")]

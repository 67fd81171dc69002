"""Structured Streaming tests: the streaming plan over a file source equals
the batch plan over the same rows; watermark drops late rows."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.streaming.events import (
    read_events_stream,
    session_windows,
    tumbling_window_agg,
)
from warp_pipes_spark.streaming.stateful import stateful_sessions

ROWS_ON_TIME = [
    # user 1: two events in hour 10, one in hour 11
    (1, "2024-01-01T10:05:00", 1, "click", 1.0),
    (2, "2024-01-01T10:45:00", 1, "click", 2.0),
    (3, "2024-01-01T11:10:00", 1, "view", 3.0),
    # user 2: one event in hour 10
    (4, "2024-01-01T10:30:00", 2, "view", 4.0),
]
LATE_ROW = (5, "2024-01-01T08:00:00", 2, "click", 9.0)  # > watermark behind
MID_ROW = (6, "2024-01-01T11:20:00", 1, "view", 1.0)  # on-time filler batch


def _write_batch(path, rows, name):
    with open(os.path.join(path, name), "w") as f:
        for eid, ts, uid, etype, val in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": ts,
                        "user_id": uid,
                        "event_type": etype,
                        "value": val,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def _run_stream(spark, src_dir, transform, timeout_s=60):
    stream = read_events_stream(spark, src_dir)
    out = transform(stream)
    results = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[tuple(r[k] for k in ("window_start", "event_type"))] = (
                r["n"],
                r["v"],
            )

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
            time.sleep(1.0)
            if not q.status["isDataAvailable"]:
                break
    q.stop()
    q.awaitTermination(10)
    return results


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME, "batch0.json")

    stream_results = _run_stream(spark, src, lambda s: tumbling_window_agg(s, "1 hour", "30 minutes"))

    batch_df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in ROWS_ON_TIME],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch_results = {
        (r["window_start"], r["event_type"]): (r["n"], r["v"])
        for r in tumbling_window_agg(batch_df).collect()
    }
    assert stream_results == batch_results
    assert len(batch_results) == 3


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "events_late")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME, "batch0.json")

    stream = read_events_stream(spark, src)
    out = tumbling_window_agg(stream, "1 hour", "30 minutes")
    seen = []

    def sink(batch_df, batch_id):
        seen.append({tuple(r) for r in batch_df.collect()})
        # Spark applies a watermark computed from batch N's data starting at
        # batch N+2 (the operator watermark is advanced after each batch from
        # the *previous* batch's max event time). So: batch 0 = on-time rows,
        # batch 1 = on-time filler (watermark 10:40 now committed), batch 2 =
        # very late row — it must NOT create/extend an 08:00 window.
        if batch_id == 0:
            _write_batch(src, [MID_ROW], "batch1.json")
        elif batch_id == 1:
            _write_batch(src, [LATE_ROW], "batch2.json")

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    deadline = time.time() + 90
    while time.time() < deadline and len(seen) < 3:
        time.sleep(1.0)
    # allow one more microbatch to flush
    time.sleep(3)
    q.stop()
    q.awaitTermination(10)

    all_rows = set().union(*seen) if seen else set()
    late_windows = [r for r in all_rows if str(r[0]).startswith("2024-01-01 08")]
    assert not late_windows, f"late row leaked past watermark: {late_windows}"


def test_stateful_sessions_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: intra-batch gaps close sessions
    immediately; open sessions flush via event-time timeout once the
    watermark passes last+gap. Expect exactly the 4 sessions the batch
    session_window computes on the same rows."""
    src = str(tmp_path / "events_stateful")
    os.makedirs(src)
    # user 1: session (10:00,10:10) then gap 80m then (11:30); user 2: one
    batch0 = [
        (1, "2024-01-01T10:00:00", 1, "click", 1.0),
        (2, "2024-01-01T10:10:00", 1, "click", 2.0),
        (3, "2024-01-01T11:30:00", 1, "view", 3.0),
        (4, "2024-01-01T10:30:00", 2, "view", 4.0),
    ]
    batch1 = [(5, "2024-01-01T14:00:00", 3, "click", 1.0)]
    batch2 = [(6, "2024-01-01T16:00:00", 3, "click", 1.0)]
    _write_batch(src, batch0, "b0.json")

    out = stateful_sessions(
        read_events_stream(spark, src), gap="30 minutes", watermark="10 minutes"
    )
    seen = []

    def sink(batch_df, batch_id):
        seen.append([tuple(r) for r in batch_df.collect()])
        if batch_id == 0:
            _write_batch(src, batch1, "b1.json")
        elif batch_id == 1:
            _write_batch(src, batch2, "b2.json")

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 120
    while time.time() < deadline and sum(len(b) for b in seen) < 4:
        time.sleep(1.0)
    q.stop()
    q.awaitTermination(10)

    rows = sorted(r for b in seen for r in b)
    got = [(r[0], str(r[1]), str(r[2]), r[3], r[4]) for r in rows]
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0),
        (1, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1, 3.0),
        (2, "2024-01-01 10:30:00", "2024-01-01 10:30:00", 1, 4.0),
        (3, "2024-01-01 14:00:00", "2024-01-01 14:00:00", 1, 1.0),
    ]


def test_session_window_batch(spark):
    rows = [
        (1, "2024-01-01T10:00:00", 1, "click", 1.0),
        (2, "2024-01-01T10:10:00", 1, "click", 1.0),  # same session (gap 10m)
        (3, "2024-01-01T11:30:00", 1, "click", 1.0),  # new session (gap 80m)
    ]
    df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = session_windows(df, gap="30 minutes").collect()
    assert len(out) == 2
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [1, 2]


def test_stream_parquet_sink_checkpoint_recovery(spark, tmp_path):
    """Exactly-once file sink: run to completion, stop, add data, restart
    against the SAME checkpoint -> all rows exactly once, no duplicates."""
    from warp_pipes_spark.streaming.events import write_stream_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME[:2], "b0.json")

    def run_once():
        stream = read_events_stream(spark, src).select("event_id", "user_id", "value")
        q = write_stream_parquet(stream, sink, ckpt, trigger_once=True)
        q.awaitTermination(60)

    run_once()
    got1 = {r["event_id"] for r in spark.read.parquet(sink).collect()}
    assert got1 == {1, 2}

    _write_batch(src, ROWS_ON_TIME[2:], "b1.json")
    run_once()  # restart from the same checkpoint
    rows = spark.read.parquet(sink).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4], f"duplicate or lost rows: {ids}"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup_stream keeps the first occurrence per key and drops re-arrivals
    within the watermark; state is bounded by the watermark horizon. Batch
    fallback = plain dropDuplicates."""
    from warp_pipes_spark.streaming.events import dedup_stream, read_events_stream

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    # re-use the events schema: event_type plays the content-fingerprint role
    _write_batch(src, [
        (1, "2024-01-01T10:00:00", 1, "fpA", 1.0),
        (2, "2024-01-01T10:01:00", 1, "fpA", 1.0),   # dup within watermark
        (3, "2024-01-01T10:02:00", 2, "fpB", 1.0),
    ], "b0.json")
    _write_batch(src, [
        (4, "2024-01-01T10:30:00", 3, "fpA", 1.0),   # still within watermark
        (5, "2024-01-01T10:31:00", 4, "fpC", 1.0),
    ], "b1.json")

    stream = read_events_stream(spark, src)
    out = dedup_stream(stream, key_cols=("event_type",), ts_col="ts", watermark="1 hour")
    seen = []

    def sink(batch_df, batch_id):
        seen.extend((r["event_id"], r["event_type"]) for r in batch_df.collect())

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
            time.sleep(1.0)
            if not q.status["isDataAvailable"]:
                break
    q.stop()
    q.awaitTermination(10)

    # exactly one row survives per key ("first" = micro-batch arrival
    # order, which across files is not event-time order — standard
    # streaming-dedup semantics)
    kept = sorted(fp for _, fp in seen)
    assert kept == ["fpA", "fpB", "fpC"], seen
    assert (2, "fpA") not in seen  # same-batch dup always dropped

    # batch degradation: plain exact dedup
    batch = spark.createDataFrame(
        [(1, "fpA"), (2, "fpA"), (3, "fpB")], "event_id long, event_type string"
    )
    got = dedup_stream(batch, key_cols=("event_type",)).count()
    assert got == 2


def test_sampling_gate_is_streaming_safe(spark, tmp_path):
    """The md5 sampling gate is a stateless row filter, so the SAME operator
    works unchanged on a stream — and selects exactly the rows the batch
    plan selects (keyed determinism; an RNG sample could not promise this)."""
    from warp_pipes_spark.pipes.sampling import DeterministicSample

    src = str(tmp_path / "sample_stream")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME + [MID_ROW], "batch0.json")

    sampler = DeterministicSample(0.5, key_col="event_id", seed=3)
    stream = read_events_stream(spark, src)
    got = []

    def sink(batch_df, batch_id):
        got.extend(r["event_id"] for r in batch_df.collect())

    q = sampler(stream).writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
            time.sleep(1.0)
            if not q.status["isDataAvailable"]:
                break
    q.stop()
    q.awaitTermination(10)

    batch_df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in ROWS_ON_TIME + [MID_ROW]],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    want = [r["event_id"] for r in sampler(batch_df).collect()]
    assert sorted(got) == sorted(want)
    assert 0 < len(want) < 5  # the gate actually split the batch


def test_streaming_term_counts_match_batch(spark, tmp_path):
    """Heavy-hitter term counts accumulate across stream batches (update
    mode) and converge to exactly the batch answer over the same docs."""
    from warp_pipes_spark.streaming.events import streaming_term_counts

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    docs = [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, "alpha delta delta"),
    ]
    # two files -> two micro-batches
    for i, chunk in enumerate([docs[:2], docs[2:]]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text in chunk:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    counts = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            counts[r["term"]] = r["doc_freq"]

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        r["term"]: r["doc_freq"]
        for r in streaming_term_counts(batch_df).collect()
    }

    q = (
        streaming_term_counts(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    # bounded CONVERGENCE wait, not an idle-status probe: under a loaded
    # machine the status flags read idle between file discoveries, which
    # made the idle-probe version break before the second micro-batch
    deadline = time.time() + 120
    while time.time() < deadline and counts != want:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(10)

    assert counts == want
    assert want == {"alpha": 2, "beta": 2, "gamma": 1, "delta": 1}


def test_stream_static_enrich(spark, tmp_path):
    from warp_pipes_spark.streaming.events import enrich_stream

    src = str(tmp_path / "enrich_src")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME, "batch0.json")
    dim = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "user_id long, cohort string"
    )
    rows = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            rows[r["event_id"]] = r["cohort"]

    stream = read_events_stream(spark, src)
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert rows == {1: "alpha", 2: "alpha", 3: "alpha", 4: "beta"}


def test_stream_stream_join_equals_batch(spark, tmp_path):
    from warp_pipes_spark.streaming.events import stream_stream_join

    rows = [
        (1, "2024-01-01T10:00:00", 1, "view", 1.0),
        (2, "2024-01-01T10:20:00", 1, "click", 1.0),   # pairs with view 1
        (3, "2024-01-01T11:40:00", 1, "click", 1.0),   # view 1 too old
        (4, "2024-01-01T10:10:00", 2, "view", 1.0),
        (5, "2024-01-01T10:15:00", 2, "click", 1.0),   # pairs with view 4
    ]
    src = str(tmp_path / "ssj_src")
    os.makedirs(src)
    _write_batch(src, rows, "batch0.json")

    got = set()

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got.add((r["click_id"], r["view_id"]))

    stream = read_events_stream(spark, src)
    clicks = stream.filter(F.col("event_type") == "click")
    views = stream.filter(F.col("event_type") == "view")
    q = (
        stream_stream_join(clicks, views, within="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    batch_df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        (r["click_id"], r["view_id"])
        for r in stream_stream_join(
            batch_df.filter(F.col("event_type") == "click"),
            batch_df.filter(F.col("event_type") == "view"),
            within="1 hour",
        ).collect()
    }
    assert got == expect
    assert got == {(2, 1), (5, 4)}


def test_split_assign_is_streaming_safe(spark, tmp_path):
    """Split assignment is a stateless scan-level CASE, so the SAME
    operator labels a stream — and assigns exactly the splits the batch
    plan assigns (hash-keyed determinism)."""
    from warp_pipes_spark.pipes.sampling import SplitAssign

    src = str(tmp_path / "split_stream")
    os.makedirs(src)
    _write_batch(src, ROWS_ON_TIME + [MID_ROW], "batch0.json")

    assigner = SplitAssign({"val": 0.4}, key_col="event_id", seed=5)
    stream = read_events_stream(spark, src)
    got = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["event_id"]] = r["split"]

    q = assigner(stream).writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 60
    while time.time() < deadline:
        if not q.status["isDataAvailable"] and not q.status["isTriggerActive"]:
            time.sleep(1.0)
            if not q.status["isDataAvailable"]:
                break
    q.stop()
    q.awaitTermination(10)

    batch_df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in ROWS_ON_TIME + [MID_ROW]],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    want = {r["event_id"]: r["split"] for r in assigner(batch_df).collect()}
    assert got == want
    assert set(want.values()) == {"train", "val"}  # both splits exercised


def test_stateful_zscore_prequential_parity(spark, tmp_path):
    """Online z-score over a stream equals the batch one-step-ahead window
    computation (expanding frame over strictly-earlier rows) on the same
    events — including state carried ACROSS micro-batches."""
    src = str(tmp_path / "events_zscore")
    os.makedirs(src)
    batch0 = [
        (1, "2024-01-01T10:00:00", 1, "click", 10.0),
        (2, "2024-01-01T10:05:00", 1, "click", 12.0),
        (3, "2024-01-01T10:10:00", 1, "click", 11.0),
        (4, "2024-01-01T10:15:00", 1, "click", 50.0),
    ]
    batch1 = [
        (5, "2024-01-01T10:20:00", 1, "click", 11.5),
    ]
    _write_batch(src, batch0, "b0.json")

    from warp_pipes_spark.streaming.stateful import stateful_zscore

    got = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["event_id"]] = (r["n_seen"], r["z"], r["is_anomaly"])
        if batch_id == 0:
            _write_batch(src, batch1, "b1.json")

    out = stateful_zscore(read_events_stream(spark, src), z_threshold=2.0)
    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 120
    while time.time() < deadline and len(got) < 5:
        time.sleep(1.0)
    q.stop()
    q.awaitTermination(10)

    rows = batch0 + batch1
    batch_df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count("value").over(w)
    s = F.sum("value").over(w)
    ss = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s / n
    var = ss / n - mean * mean
    z = F.when(
        (n >= 2) & (var > 0), (F.col("value") - mean) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    want = {
        r["event_id"]: (r["n_seen"], r["z"])
        for r in batch_df.select(
            "event_id", n.cast("long").alias("n_seen"), z.alias("z")
        ).collect()
    }
    assert set(got) == set(want)
    for eid, (wn, wz) in want.items():
        gn, gz, ga = got[eid]
        assert gn == wn, (eid, gn, wn)
        assert abs(gz - wz) < 1e-9, (eid, gz, wz)
    # event 4 (value 50 vs history 10/12/11) must flag; the rest must not
    assert got[4][2] is True
    assert all(not got[e][2] for e in (1, 2, 3, 5))


def test_transform_with_state_env_gate(spark):
    """transformWithStateInPandas needs the protobuf bridge; in this
    container it is absent, so the operator must fail FAST with the
    documented reason (not crash mid-query). Where protobuf exists the
    skipped test below exercises real semantics."""
    from warp_pipes_spark.streaming.transform_state import (
        stateful_topk,
        transform_with_state_available,
    )

    ev = spark.createDataFrame(
        [(1, "a"), (1, "b")], "user_id long, event_type string"
    )
    if transform_with_state_available():
        pytest.skip("protobuf present; covered by the semantics test")
    with pytest.raises(NotImplementedError, match="protobuf"):
        stateful_topk(ev, k=2)


def test_stateful_topk_running_counts(spark, tmp_path):
    """Per-key running top-k via MapState: counts accumulate ACROSS
    micro-batches and re-emit on every arrival for the key."""
    from warp_pipes_spark.streaming.transform_state import (
        stateful_topk,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("protobuf bridge unavailable in this container")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "tws_src")
    os.makedirs(src)

    def w(name, rows):
        with open(f"{src}/{name}", "w") as f:
            for u, e in rows:
                f.write('{"user_id": %d, "event_type": "%s"}\n' % (u, e))

    w("b0.json", [(1, "a"), (1, "a"), (1, "b"), (2, "c")])
    ev = spark.readStream.schema("user_id long, event_type string").json(src)
    out = stateful_topk(ev, k=2)
    seen = []

    def sink(bdf, bid):
        seen.append(sorted(tuple(r) for r in bdf.collect()))
        if bid == 0:
            w("b1.json", [(1, "b"), (1, "b")])

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and len(seen) < 2:
        time.sleep(1.0)
    q.stop()
    q.awaitTermination(10)

    assert seen[0] == [(1, "a", 2, 1), (1, "b", 1, 2), (2, "c", 1, 1)]
    # batch 1 only touches user 1; b overtakes a (3 > 2)
    assert seen[1] == [(1, "b", 3, 1), (1, "a", 2, 2)]


def test_streaming_cms_merge_matches_batch(spark, tmp_path):
    """Incremental sketch maintenance: each micro-batch builds a partial
    count-min sketch and foreachBatch folds it into the running sketch via
    cell-wise merge — the per-shard/per-day pattern that never re-scans
    history. The converged sketch is cell-for-cell the batch sketch over
    all docs (CMS merge is exact, not approximate-on-approximate)."""
    from warp_pipes_spark.ml.sketches import CountMinSketch, merge_sketches
    from warp_pipes_spark.text.analysis import tokens_expr

    src = str(tmp_path / "cms_stream")
    os.makedirs(src)
    docs = [
        (1, "alpha beta alpha"),
        (2, "beta gamma beta"),
        (3, "alpha delta delta gamma"),
        (4, "epsilon alpha"),
    ]
    for i, chunk in enumerate([docs[:2], docs[2:]]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text in chunk:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    cms = CountMinSketch(key_col="term", depth=3, width=32, seed=13)

    def terms(df):
        return df.select(F.explode(tokens_expr(F.col("text"))).alias("term"))

    merged_cells = {}  # (d, bucket) -> cnt

    def sink(batch_df, batch_id):
        for r in cms.sketch(terms(batch_df)).collect():
            key = (r["d"], r["bucket"])
            merged_cells[key] = merged_cells.get(key, 0) + r["cnt"]

    batch_all = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms.sketch(terms(batch_all)).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert merged_cells == want

    # merge_sketches on DataFrames agrees with the dict fold
    a = cms.sketch(terms(spark.createDataFrame(docs[:2], "doc_id long, text string")))
    b = cms.sketch(terms(spark.createDataFrame(docs[2:], "doc_id long, text string")))
    via_op = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in merge_sketches(a, b).collect()
    }
    assert via_op == want


def test_streaming_curation_ops_match_batch(spark, tmp_path):
    """The scan-level curation operators (encoding repair, quality gate,
    langid) are stateless column expressions, so the SAME pipes run
    unchanged on a stream and agree row-for-row with the batch run."""
    from warp_pipes_spark.pipes.pipelines import Sequential
    from warp_pipes_spark.text.analysis import GopherQualityFilter, LangId
    from warp_pipes_spark.text.web import FixEncoding

    src = str(tmp_path / "cur_stream")
    os.makedirs(src)
    docs = [
        (1, "cafÃ© the a and is of to in it menu plan"),
        (2, "donâ€™t stop the line keep it all going now"),
        (3, "zero​width the a of market data value table row scan"),
    ]
    for i, chunk in enumerate([docs[:2], docs[2:]]):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for did, text in chunk:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    pipe = Sequential(
        FixEncoding(),
        GopherQualityFilter(text_col="fixed_text", min_tokens=3),
        LangId(text_col="fixed_text"),
    )

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        r["doc_id"]: (r["fixed_text"], r["keep"], r["pred_lang"])
        for r in pipe(batch_df).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = pipe(stream)
    assert out.isStreaming
    got = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["doc_id"]] = (r["fixed_text"], r["keep"], r["pred_lang"])

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    deadline = time.time() + 60
    while time.time() < deadline and set(got) != set(want):
        time.sleep(0.5)
    q.stop()
    assert got == want


def test_stream_soak_state_bounded_smoke(spark):
    """Short soak through the rate-source pipeline (tools/stream_soak.py):
    two chained state operators under continuous real-time watermark
    pressure must plateau, not grow with input — the boundedness property
    the full soak proves over minutes, checked here in ~20 s."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from stream_soak import run_soak

    result = run_soak(spark, seconds=20, rate=5000)
    if not result["state_bounded"]:
        # the 20 s window is real wall-clock: at the tail of a long suite
        # run (GC pressure, state-store commit stalls) too few triggers
        # complete for eviction to show inside the window, which reads as
        # "unbounded" even though steady state plateaus (passes alone in
        # ~30 s). One retry distinguishes a scheduling stall from a real
        # leak — a genuine leak fails both runs.
        result = run_soak(spark, seconds=20, rate=5000)
    assert result["n_batches"] >= 5
    assert result["total_input_rows"] > 0
    assert result["watermark_advanced"], "watermark never advanced"
    assert result["state_bounded"], f"state grew unbounded: {result['state_ops']}"

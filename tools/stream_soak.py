"""Structured-streaming soak: drive the engine's stateful streaming path
(watermarked dedup -> tumbling window agg) from a rate source for a
sustained run and PROVE bounded state — the property that decides whether
a streaming pipeline survives week-long uptimes at production rates, which
the per-test micro-batches can't show.

The pipeline chains TWO state operators (dropDuplicates within the
watermark, then a windowed aggregation), so the soak watches both state
stores: with event time advancing in real time and the watermark trailing
it, every window/dedup key eventually crosses the watermark and must be
EVICTED; state rows plateau instead of growing with input. A leak (e.g. a
missing withWatermark, or aggregating on a non-event-time key) shows up as
monotone state growth within a minute of soak.

Writes STREAM_SOAK.json:
  {"seconds", "total_input_rows", "rows_per_sec", "n_batches",
   "state_ops": [{"name", "peak_rows", "final_rows", "first_half_peak"}],
   "watermark_advanced": bool, "state_bounded": bool}

Usage: python tools/stream_soak.py [--seconds 60] [--rate 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(spark, rate: int):
    """Rate source -> synthetic events -> watermarked dedup -> 5s tumbling
    windows per event_type. Event time is wall time, so the watermark
    advances continuously and eviction pressure is constant."""
    from pyspark.sql import functions as F

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            # duplicate-rich id stream: every other row repeats its
            # predecessor's id so the dedup operator does real work
            (F.col("value") - F.col("value") % 2).alias("event_id"),
            (F.col("value") % 7).cast("string").alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    # content-keyed (engine `dedup_stream` shape): (key, ts) keying only
    # dedupes timestamp collisions — see the round-6 funnel-soak finding
    deduped = events.withWatermark(
        "ts", "5 seconds"
    ).dropDuplicatesWithinWatermark(["event_id"])
    agg = (
        deduped.groupBy(F.window("ts", "5 seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return agg


def run_soak(spark, seconds: int = 60, rate: int = 20000) -> dict:
    query = (
        build_pipeline(spark, rate)
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", f"/tmp/stream_soak_ckpt_{os.getpid()}")
        .start()
    )
    # sample per-trigger progress; recentProgress keeps a bounded tail, so
    # poll and merge by batchId to cover the full run
    progress_by_batch: dict = {}
    t_start = time.time()
    deadline = t_start + seconds
    try:
        while time.time() < deadline:
            time.sleep(1.0)
            for p in query.recentProgress:
                progress_by_batch[p["batchId"]] = p
    finally:
        query.stop()
        query.awaitTermination(30)
    dur = round(time.time() - t_start, 1)  # measured, incl. drain

    # every sampled batch counts toward throughput (batch 0 included —
    # it carries real input rows even before a watermark exists)
    batches = [progress_by_batch[b] for b in sorted(progress_by_batch)]
    total_rows = sum(int(p.get("numInputRows", 0)) for p in batches)
    # state rows per operator per batch
    op_series: dict = {}
    for p in batches:
        for i, op in enumerate(p.get("stateOperators", [])):
            name = f'{i}:{op.get("operatorName", f"op{i}")}'
            op_series.setdefault(name, []).append(int(op.get("numRowsTotal", 0)))
    state_ops = []
    bounded = True
    for name, series in op_series.items():
        half = max(1, len(series) // 2)
        first_half_peak = max(series[:half])
        peak = max(series)
        # bounded = the second half's peak is within 50% of the first
        # half's (a plateau with eviction churn), not still climbing
        op_bounded = first_half_peak > 0 and peak <= 1.5 * first_half_peak
        bounded = bounded and op_bounded
        state_ops.append(
            {
                "name": name,
                "peak_rows": peak,
                "final_rows": series[-1],
                "first_half_peak": first_half_peak,
                "bounded": op_bounded,
            }
        )
    wm = [p.get("eventTime", {}).get("watermark", "") for p in batches]
    wm = [w for w in wm if w and not w.startswith("1970")]
    return {
        "seconds": dur,
        "rate_rows_per_sec": rate,
        "total_input_rows": total_rows,
        "rows_per_sec": round(total_rows / dur, 1) if dur else 0,
        "n_batches": len(batches),
        "state_ops": state_ops,
        "watermark_advanced": len(set(wm)) >= 2,
        "state_bounded": bounded,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--rate", type=int, default=20000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_soak(spark, args.seconds, args.rate)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_SOAK.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "state_ops"}))
    print(json.dumps(result["state_ops"]))
    if not result["state_bounded"] or not result["watermark_advanced"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

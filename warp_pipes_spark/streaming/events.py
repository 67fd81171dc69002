"""Structured Streaming ingestion + windowed aggregation (north-star extension).

The reference is batch-only (SURVEY §2.10); streaming is an extension
required for 100 TB-scale pipelines: event streams with watermarks, late
data, tumbling/sliding/session windows.

All aggregations here work identically on a batch DataFrame and a streaming
one — the batch forms are oracled in the query catalog (q21/q22), and the
streaming tests drive the same functions through a file-source readStream +
foreachBatch sink, including late-row handling under a watermark."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events directory (json or parquet files
    dropped into ``path``); the production analogue is Kafka/Kinesis with
    the same downstream plan."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
    output_mode: str = "append",
):
    """Exactly-once parquet sink: the checkpoint directory tracks committed
    source offsets + sink file manifest, so a crashed/restarted query
    resumes without duplicating or losing data (the recovery test restarts
    the query against the same checkpoint). Returns the StreamingQuery."""
    w = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def tumbling_window_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-window per-type counts and value sums. With a watermark, rows
    later than ``watermark`` behind the max event time are dropped and
    windows finalize — bounded state at any scale."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "v")
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def dedup_stream(
    docs: DataFrame,
    key_cols=("doc_fp",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: keep the first row per key,
    dropping re-occurrences that arrive within ``watermark`` of event time
    (``dropDuplicatesWithinWatermark``— seen-key state is evicted once the
    watermark passes, so state size is rate x watermark, not corpus size).
    The streaming form of ``ExactDedup``: at 100 TB ingest, key on the
    8-byte ``DocFingerprint`` instead of raw text. On a batch frame it
    degrades to plain ``dropDuplicates`` (exact, unbounded window)."""
    keys = list(key_cols)
    if not docs.isStreaming:
        return docs.dropDuplicates(keys)
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows (``F.session_window``): per-user sessions
    closed after ``gap`` of inactivity. The batch-equivalent lag/cumsum
    formulation is q21 in the catalog."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("v"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "v",
        )
    )


def streaming_term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Incremental corpus heavy hitters: per-term document counts over a
    document stream, maintained in update mode — the streaming form of
    ``TermStats`` (the batch form is oracled as q60). Distinct-per-doc
    explode then count: state is one long per term (vocabulary-sized, not
    corpus-sized), so the query runs indefinitely at bounded memory. On a
    batch DataFrame the same function computes the same counts one-shot."""
    from warp_pipes_spark.text.analysis import tokens_expr

    terms = docs.select(
        F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("term")
    )
    return terms.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))


def enrich_stream(
    events: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich each event with a (slowly-changing)
    dimension table — the standard streaming enrichment shape. The static
    side is broadcast, so the stream never shuffles and each micro-batch
    joins map-side; the static plan is re-evaluated per micro-batch, so a
    dim refresh (new parquet snapshot) is picked up without restarting the
    query. Works identically on a batch events frame."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    user_col: str = "user_id",
    within: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: pair each click with the same user's
    views from the preceding ``within`` interval. Both sides carry
    watermarks and the join condition bounds event-time distance, so each
    side's buffered state is evicted once the other side's watermark
    passes — bounded state, the requirement for an unbounded run. On batch
    frames the same plan is the q49-style range join."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col(user_col).alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col(user_col).alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"interval {within}"))
    )
    return c.join(v, cond).select(
        "click_id", F.col("c_user").alias("user_id"), "click_ts", "view_id", "view_ts"
    )

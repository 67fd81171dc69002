"""Sequence packing: map documents to fixed-capacity training examples.

The standard pretraining data layout ("concat-and-chunk") concatenates all
documents of a shard in a deterministic order and cuts the token stream
every ``capacity`` tokens. This operator computes that layout as pure
relational algebra — for each document, the pack it starts in, its offset
inside that pack, and the pack it ends in (documents may straddle pack
boundaries; the writer slices accordingly):

    start       = sum of preceding documents' token counts   (running sum)
    start_pack  = floor(start / capacity)
    pack_offset = start mod capacity
    end_pack    = floor((start + n_tokens - 1) / capacity)

The running sum is a window ``PARTITION BY shard ORDER BY order_col`` —
fully parallel across shards; shard granularity bounds both parallelism
and skew (at 100 TB, shard = file/source/hash-bucket so each partition's
token stream fits one task; a global single-shard packing would serialize
and is deliberately not the default). Everything is codegen'd JVM
expressions — no Python, no explode, one shuffle (the window exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class PackSequences(Pipe):
    """Assign each document its (start_pack, pack_offset, end_pack) under
    concat-and-chunk packing at ``capacity`` tokens per pack, shard-local.

    Requires a token-count column (``token_col``) — compose with
    ``TokenCount`` when starting from raw text. Documents with zero
    tokens occupy no positions: they get the current stream position with
    ``end_pack = start_pack`` and zero width."""

    def __init__(
        self,
        capacity: int,
        token_col: str = "n_tokens",
        shard_col: str = "source",
        order_col: str = "doc_id",
        **kwargs,
    ):
        if capacity <= 0:
            raise ValueError(f"capacity must be positive, got {capacity}")
        super().__init__(**kwargs)
        self.capacity = capacity
        self.token_col = token_col
        self.shard_col = shard_col
        self.order_col = order_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        cap = F.lit(self.capacity)
        n = F.col(self.token_col).cast("long")
        w = (
            Window.partitionBy(self.shard_col)
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        start = F.coalesce(F.sum(n).over(w), F.lit(0).cast("long"))
        return df.select(
            self.shard_col,
            self.order_col,
            n.alias("n_tokens"),
            (start / cap).cast("long").alias("start_pack"),
            (start % cap).cast("long").alias("pack_offset"),
            (
                F.when(n > 0, ((start + n - 1) / cap).cast("long"))
                .otherwise((start / cap).cast("long"))
            ).alias("end_pack"),
        )


def pack_sequences_sql(
    table_sql: str,
    capacity: int,
    token_expr: str = "n_tokens",
    shard: str = "source",
    order: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`PackSequences` — identical window algebra.
    ``table_sql`` must yield (shard, order, token) columns."""
    return f"""
WITH sized AS (
  SELECT {shard}, {order}, CAST({token_expr} AS BIGINT) AS n_tokens
  FROM ({table_sql}) t
), placed AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
      PARTITION BY {shard} ORDER BY {order}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM sized
)
SELECT {shard}, {order}, n_tokens,
       CAST(floor(start / {capacity}) AS BIGINT) AS start_pack,
       CAST(start % {capacity} AS BIGINT) AS pack_offset,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((start + n_tokens - 1) / {capacity}) AS BIGINT)
            ELSE CAST(floor(start / {capacity}) AS BIGINT) END AS end_pack
FROM placed
"""


class LengthBucketBatches(Pipe):
    """Deterministic length-bucketed inference micro-batching.

    Batched model inference (the ``Predict`` stack) pads every sequence in
    a batch to the batch max; random batch composition wastes most of the
    compute on pad tokens. The standard fix sorts sequences by length so
    each fixed-size batch holds near-equal lengths. This operator computes
    that assignment as one window pass, shard-local (same parallelism/skew
    contract as :class:`PackSequences`):

        rank     = row_number() over (shard, ORDER BY n_tokens DESC, id)
        batch_id = floor((rank - 1) / batch_size)
        pad_cost = batch max length - own length   (0 for the longest row)

    Summing ``pad_cost`` per batch (or corpus-wide) yields the exact pad
    waste; against random batching the saving is typically 30-60% of
    inference FLOPs on natural length distributions. Everything is
    codegen'd JVM expressions — the only exchange is the window shuffle
    on the shard key."""

    def __init__(
        self,
        batch_size: int,
        token_col: str = "n_tokens",
        shard_col: str = "source",
        order_col: str = "doc_id",
        **kwargs,
    ):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        super().__init__(**kwargs)
        self.batch_size = batch_size
        self.token_col = token_col
        self.shard_col = shard_col
        self.order_col = order_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        n = F.col(self.token_col).cast("long")
        w = Window.partitionBy(self.shard_col).orderBy(
            F.desc(self.token_col), F.asc(self.order_col)
        )
        ranked = df.select(
            self.shard_col,
            self.order_col,
            n.alias("n_tokens"),
            F.row_number().over(w).alias("__rk"),
        ).withColumn(
            "batch_id", ((F.col("__rk") - 1) / F.lit(self.batch_size)).cast("long")
        )
        wb = Window.partitionBy(self.shard_col, "batch_id")
        return ranked.select(
            self.shard_col,
            self.order_col,
            "n_tokens",
            "batch_id",
            (F.max("n_tokens").over(wb) - F.col("n_tokens"))
            .cast("long")
            .alias("pad_cost"),
        )


def length_bucket_sql(
    table_sql: str,
    batch_size: int,
    token_expr: str = "n_tokens",
    shard: str = "source",
    order: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`LengthBucketBatches` — identical window
    algebra (row_number is deterministic under the (len DESC, id) key)."""
    return f"""
WITH sized AS (
  SELECT {shard}, {order}, CAST({token_expr} AS BIGINT) AS n_tokens
  FROM ({table_sql}) t
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {shard} ORDER BY n_tokens DESC, {order}) AS rk
  FROM sized
), batched AS (
  SELECT {shard}, {order}, n_tokens,
         CAST(floor((rk - 1) / {batch_size}) AS BIGINT) AS batch_id
  FROM ranked
)
SELECT {shard}, {order}, n_tokens, batch_id,
       CAST(MAX(n_tokens) OVER (PARTITION BY {shard}, batch_id) - n_tokens
            AS BIGINT) AS pad_cost
FROM batched
"""

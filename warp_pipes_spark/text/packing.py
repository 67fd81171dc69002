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

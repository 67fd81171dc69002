"""Embedding pooling: collapse many vectors into one per group.

The passage->document step of every two-level retrieval pipeline: documents
are embedded per passage (bounded context windows), then the document's
single vector is the mean of its passage vectors (the standard mean-pooling
recipe; normalize downstream if cosine is the metric). Also the
class-centroid computation for clustering/labeling diagnostics.

Plan shape: ``posexplode`` to (group, position, component) — dim x rows,
but each row is 3 narrow columns — one aggregation on (group, position)
with exact floor-scaled BIGINT component sums (order-free: the mean is
bit-identical however partitions arrive), then one
``array_sort(collect_list(struct(pos, val)))``
re-assembly per group. Two shuffles total, both on small keys; at 100 TB
the (group, position) aggregation collapses map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class PoolEmbeddings(Pipe):
    """Mean-pool vectors per group: ``(group_col, n_vecs, pooled)`` where
    ``pooled[j]`` is the component mean over 1e-9 floor-quantized
    components, summed as exact BIGINTs so the result is independent of
    row order/partitioning (and tie-free across engines). Rows with NULL vectors are
    ignored; groups with only NULL vectors drop out."""

    def __init__(
        self,
        group_col: str = "label",
        vec_col: str = "embedding",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.group_col = group_col
        self.vec_col = vec_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        g = self.group_col
        exploded = df.filter(F.col(self.vec_col).isNotNull()).select(
            g,
            F.posexplode(F.col(self.vec_col).cast("array<double>")).alias(
                "__pos", "__val"
            ),
        )
        # floor-scale each component to an exact BIGINT (1e-9 quantization,
        # negligible on unit-norm embeddings): floor is tie-free, unlike
        # double->DECIMAL casts whose half-up/half-even tie rules differ
        # between engines (observed on real data); the BIGINT sum is then
        # exact and order-free, and the final double division is IEEE-
        # defined — bit-identical across engines and partitionings
        q = F.floor(F.col("__val") * F.lit(1e9)).cast("long")
        per_comp = exploded.withColumn("__q", q).groupBy(g, "__pos").agg(
            F.sum("__q").alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        mean = (F.col("__s").cast("double") / F.lit(1e9)) / F.col("__n")
        return (
            per_comp.withColumn("__m", mean)
            .groupBy(g)
            .agg(
                F.max("__n").cast("long").alias("n_vecs"),
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", F.col("__m")))
                    ),
                    lambda s: s["__m"],
                ).alias("pooled"),
            )
        )


def pool_embeddings_sql(
    table_sql: str, group_col: str = "label", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle for :class:`PoolEmbeddings` — same decimal component
    sums, same positional re-assembly."""
    return f"""
WITH src AS (
  SELECT {group_col} AS g, {vec_col}::DOUBLE[] AS v FROM ({table_sql}) t
  WHERE {vec_col} IS NOT NULL
), comp AS (
  SELECT g, u.i - 1 AS pos, v[u.i] AS val
  FROM src, UNNEST(range(1, len(v) + 1)) AS u(i)
), agg AS (
  SELECT g, pos,
         SUM(CAST(FLOOR(val * 1e9) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM comp GROUP BY 1, 2
), means AS (
  SELECT g, pos, (CAST(s AS DOUBLE) / 1e9) / n AS m, n
  FROM agg
)
SELECT g AS {group_col},
       CAST(MAX(n) AS BIGINT) AS n_vecs,
       list(m ORDER BY pos) AS pooled
FROM means GROUP BY g
"""

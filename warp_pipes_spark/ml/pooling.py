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


class StandardizeEmbeddings(Pipe):
    """Per-component z-score standardization of a vector column — the
    preprocessing pass before quantization/ANN when component scales
    differ (SQ8's per-dim ranges, PCA/whitening pipelines).

    Component statistics come from EXACT integer sums of 1e-9
    floor-quantized components (sum as BIGINT, sum of squares as
    DECIMAL(38,0) — q^2 overflows BIGINT): order- and partitioning-free,
    tie-free across engines. Mean/variance/std then derive in IEEE double
    from those exact numerators, and each output component is
    ``(q/1e9 - mean) / std`` (0 when the component is constant), so the
    whole transform is bit-identical across engines.

    Plan: one stats aggregation over (position, component) — dim-sized
    result, broadcast back — then the same posexplode -> join ->
    order-pinned re-collect as :class:`PoolEmbeddings`."""

    def __init__(
        self,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        out_col: str = "standardized",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.vec_col = vec_col
        self.out_col = out_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        exploded = df.filter(F.col(self.vec_col).isNotNull()).select(
            F.col(self.id_col).alias("__id"),
            F.posexplode(F.col(self.vec_col).cast("array<double>")).alias(
                "__pos", "__val"
            ),
        ).withColumn("__q", F.floor(F.col("__val") * F.lit(1e9)).cast("long"))
        stats = exploded.groupBy("__pos").agg(
            F.sum("__q").alias("__s"),
            F.sum(F.col("__q").cast("decimal(38,0)") * F.col("__q")).alias("__ss"),
            F.count(F.lit(1)).alias("__n"),
        )
        mean = (F.col("__s").cast("double") / F.lit(1e9)) / F.col("__n")
        ex2 = (F.col("__ss").cast("double") / F.lit(1e18)) / F.col("__n")
        std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
        stats = stats.select(
            "__pos", mean.alias("__mean"), std.alias("__std")
        )
        z = F.when(F.col("__std") == 0.0, F.lit(0.0)).otherwise(
            (F.col("__q").cast("double") / F.lit(1e9) - F.col("__mean"))
            / F.col("__std")
        )
        return (
            exploded.join(F.broadcast(stats), "__pos")
            .withColumn("__z", z)
            .groupBy("__id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", F.col("__z")))),
                    lambda s: s["__z"],
                ).alias(self.out_col)
            )
            .select(F.col("__id").alias(self.id_col), self.out_col)
        )


def standardize_sql(
    table_sql: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle for :class:`StandardizeEmbeddings` — identical integer
    stats and double arithmetic."""
    return f"""
WITH src AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM ({table_sql}) t
  WHERE {vec_col} IS NOT NULL
), comp AS (
  SELECT id, u.i - 1 AS pos,
         CAST(FLOOR(v[u.i] * 1e9) AS BIGINT) AS q
  FROM src, UNNEST(range(1, len(v) + 1)) AS u(i)
), stats AS (
  SELECT pos,
         SUM(q) AS s,
         SUM(CAST(q AS DECIMAL(38,0)) * q) AS ss,
         COUNT(*) AS n
  FROM comp GROUP BY 1
), ms AS (
  SELECT pos,
         (CAST(s AS DOUBLE) / 1e9) / n AS mean,
         sqrt(greatest((CAST(ss AS DOUBLE) / 1e18) / n
                       - ((CAST(s AS DOUBLE) / 1e9) / n)
                         * ((CAST(s AS DOUBLE) / 1e9) / n), 0.0)) AS std
  FROM stats
), z AS (
  SELECT c.id, c.pos,
         CASE WHEN m.std = 0.0 THEN 0.0
              ELSE (CAST(c.q AS DOUBLE) / 1e9 - m.mean) / m.std END AS zv
  FROM comp c JOIN ms m USING (pos)
)
SELECT id AS {id_col}, list(zv ORDER BY pos) AS standardized
FROM z GROUP BY id
"""

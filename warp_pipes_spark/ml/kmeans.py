"""Distributed Lloyd's k-means over an embedding column.

The IVF index (``ml/similarity.py``) trains its coarse quantizer on a
bounded md5 sample DRIVER-side — right for an index artifact, but not a
clustering of the corpus. This operator is the full-data path: every
iteration is one scan (assign: k distance folds per row against broadcast
centroid literals, pure codegen) plus one k-group aggregation (recenter:
per-dimension DECIMAL-exact sums, one IEEE division each) — the textbook
Lloyd step (Lloyd 1982; MacQueen 1967) expressed in the engine's
differential-testing discipline, so the WHOLE ITERATION CHAIN is
bit-reproducible in SQL (``kmeans_sql`` unrolls it as a CTE chain — no
sampled-literal dependency, unlike the IVF oracle).

Determinism contract (both engines, any partitioning):
* init = the embeddings of the ``k`` smallest ids (k-means|| is the
  production init at scale; a deterministic init is what makes the chain
  oracle-able end to end);
* distances fold per-dimension squared differences left-to-right in
  double, then round through DECIMAL(18,6); argmin tie-breaks on cell id;
* recenter discretizes components to nano units (floor(x*1e9 + 0.5) —
  every step an IEEE double op, so both engines produce the identical
  BIGINT), sums exactly, and divides by the member count;
* empty cells drop out (both engines recompute centroids only for cells
  with members).

At 100 TB: per iteration one scan + a k×dim-sized shuffle — the scan
dominates; k-means|| init plus this loop is exactly how Spark MLlib's
KMeans is laid out physically.

Reference anchor: extension of the ANN/quantization family
(``ml/similarity.py`` IVF, ``ml/quantize.py`` PQ codebooks).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.ml.similarity import _dot

_DEC = "decimal(18,6)"


class LloydKMeans(Pipe):
    """Input df = (``id_col``, ``vec_col``); output one row per (cell,
    dim): ``(cell, dim, value, n_members)`` — the post-final-iteration
    centroids with their member counts. ``dim`` slices the vector prefix
    (the matryoshka convention, q108)."""

    def __init__(
        self,
        k: int = 8,
        iters: int = 3,
        dim: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.k = k
        self.iters = iters
        self.dim = dim
        self.id_col = id_col
        self.vec_col = vec_col

    def _assign(self, vecs: DataFrame, centroids: List[List[float]]) -> DataFrame:
        """argmin_cell dist²(x, c_cell) with (dist DECIMAL(18,6), cell)
        lexicographic tie-break; centroids ride as literals (bounded
        k×dim artifact, the codebook pattern)."""
        def diff_expr(c_lit):
            # single-param closure: a 2-param lambda (or default-arg
            # closure) would be read by PySpark as (element, index)
            def sub(d):
                return F.element_at(F.col("__x"), d) - F.element_at(c_lit, d)

            return F.transform(F.sequence(F.lit(1), F.lit(self.dim)), sub)

        structs = []
        for cell, c in enumerate(centroids):
            diff = diff_expr(F.array(*[F.lit(float(v)) for v in c]))
            structs.append(
                F.struct(
                    _dot(diff, diff).cast(_DEC).alias("dist"),
                    F.lit(cell).cast("int").alias("cell"),
                )
            )
        best = F.array_min(F.array(*structs))
        return vecs.withColumn("cell", best["cell"])

    def _recenter(self, assigned: DataFrame):
        """Per-cell member count + per-dimension exact-decimal mean."""
        aggs = [F.count(F.lit(1)).alias("n")]
        for d in range(self.dim):
            # discretize components to nano units with floor(x*1e9 + 0.5):
            # every step is an IEEE double op, so BOTH engines produce the
            # identical BIGINT — unlike a double->DECIMAL cast, whose
            # rounding algorithm is engine-private (DuckDB multiplies in
            # double; Spark expands the exact binary value) and diverges
            # at the last decimal often enough to skew summed centroids
            aggs.append(
                F.sum(
                    F.floor(
                        F.element_at(F.col("__x"), d + 1) * F.lit(1e9)
                        + F.lit(0.5)
                    ).cast("long")
                ).alias(f"s{d}")
            )
        rows = assigned.groupBy("cell").agg(*aggs).collect()
        cents, counts = {}, {}
        for r in rows:
            counts[r["cell"]] = r["n"]
            cents[r["cell"]] = [
                float(r[f"s{d}"]) / r["n"] / 1e9 for d in range(self.dim)
            ]
        return cents, counts

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        vecs = df.select(
            F.col(self.id_col).alias("__id"),
            # float32 embeddings promote to double ONCE here — mirrored in
            # the oracle's vecs CTE (DuckDB would otherwise run FLOAT
            # arithmetic: a FLOAT * DECIMAL-literal multiply stays FLOAT)
            F.slice(F.col(self.vec_col), 1, self.dim)
            .cast("array<double>")
            .alias("__x"),
        )
        # the q27-style localCheckpoint: every iteration re-reads the
        # sliced vectors; without a materialization point Spark re-plans
        # the scan per iteration (cheap here, but the contract matters on
        # wide inputs)
        vecs = vecs.localCheckpoint()
        init = [
            [float(v) for v in r["__x"]]
            for r in vecs.orderBy("__id").limit(self.k).collect()
        ]
        centroids = {i: c for i, c in enumerate(init)}
        for _ in range(self.iters):
            cells = sorted(centroids)
            assigned = self._assign(
                vecs, [centroids[c] for c in cells]
            ).withColumn(
                "cell",
                # map positional argmin index back to surviving cell ids
                F.element_at(
                    F.array(*[F.lit(c) for c in cells]), F.col("cell") + 1
                ),
            )
            cents, counts = self._recenter(assigned)
            centroids = cents  # empty cells drop out
        rows = []
        for cell in sorted(centroids):
            for d, v in enumerate(centroids[cell]):
                rows.append((cell, d, v, counts[cell]))
        spark = df.sparkSession
        return spark.createDataFrame(
            rows, "cell int, dim int, value double, n_members bigint"
        )


def kmeans_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    dim: int = 8,
) -> str:
    """DuckDB oracle for :class:`LloydKMeans`: the identical iteration
    chain unrolled as CTEs — same init, same per-dimension double fold
    rounded through DECIMAL(18,6), same (dist, cell) argmin, same
    nano-unit integer sums and division order. Purely relational (no
    retrained literals — the chain itself is the oracle)."""
    diff = f"list_transform(generate_series(1, {dim}), d -> x[d] - cv[d])"
    dist = (
        f"CAST(list_dot_product({diff}, {diff}) AS DECIMAL(18,6))"
    )
    mean_cols = ", ".join(
        f"CAST(SUM(CAST(FLOOR(x[{d + 1}] * 1000000000.0 + 0.5) AS BIGINT)) "
        f"AS DOUBLE) / COUNT(*) / 1000000000.0 AS m{d}"
        for d in range(dim)
    )
    to_list = "[" + ", ".join(f"m{d}" for d in range(dim)) + "]"
    ctes = [
        f"vecs AS (SELECT {id_col} AS id, list_transform(({vec_col})[1:{dim}], "
        f"v -> CAST(v AS DOUBLE)) AS x FROM {table})",
        (
            f"cent0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT)"
            f" AS cell, x AS cv FROM (SELECT id, x FROM vecs ORDER BY id LIMIT {k}) t)"
        ),
    ]
    for i in range(iters):
        ctes.append(
            f"assign{i} AS (SELECT v.id, v.x, c.cell FROM vecs v "
            f"CROSS JOIN cent{i} c "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY v.id "
            f"ORDER BY {dist}, c.cell) = 1)"
        )
        ctes.append(
            f"stats{i} AS (SELECT cell, COUNT(*) AS n, {mean_cols} "
            f"FROM assign{i} GROUP BY cell)"
        )
        ctes.append(
            f"cent{i + 1} AS (SELECT cell, {to_list} AS cv FROM stats{i})"
        )
    last = iters - 1
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT s.cell, CAST(g.d - 1 AS INT) AS dim, s_c.cv[g.d] AS value,
       CAST(s.n AS BIGINT) AS n_members
FROM stats{last} s
JOIN cent{iters} s_c ON s.cell = s_c.cell
CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS d) g
ORDER BY s.cell, dim
"""
    )

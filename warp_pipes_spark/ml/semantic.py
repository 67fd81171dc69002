"""Semantic (embedding-space) deduplication — SemDeDup-style.

Removes documents whose *embeddings* are near-duplicates, catching
paraphrases and template rewrites that defeat lexical dedup (MinHash /
n-gram Jaccard). The formulation follows the SemDeDup recipe (Abbas et al.,
2023, arXiv:2303.09540): bucket vectors into k-means cells, compare pairs
only WITHIN a cell, connect pairs above a cosine threshold, and keep one
survivor per connected component (the smallest id — deterministic).

Two candidate-generation strategies:

- ``strategy='exact'`` — all-pairs cosine over the (bounded) input; the
  correctness oracle. O(n^2): deliberately the verification path, exactly
  like ``BruteForceCosineTopK`` vs its LSH/IVF scale paths.
- ``strategy='ivf'`` — k-means cell assignment (seeded, driver-trained on a
  bounded sample — ``IvfCosineTopK``'s trainer), then pairs only within a
  cell. With c cells the pair space drops from n^2/2 to ~n^2/(2c) and every
  cell's pair-join is an equi-join on ``__cell`` — shuffle-bounded and
  embarrassingly parallel across cells, which is what makes the SemDeDup
  shape viable at 100 TB. Recall loss is only for near-dup pairs straddling
  a cell boundary (the paper accepts the same approximation).

Cluster formation reuses ``DedupClusters`` (pointer-jumping min-label
propagation, O(log diameter) rounds); survivor policy is keep-min, the same
canonical rule as the lexical dedup stack.

Reference scope note: the reference engine has no semantic dedup — this is
part of the LLM-data-pipeline extension surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.ml.similarity import CosinePairs, IvfCosineTopK, _dot, _norm
from warp_pipes_spark.text.dedup import DedupClusters


class SemanticDedup(Pipe):
    """Embedding near-dup removal: pairs with cosine >= ``threshold`` form
    clusters; every input row is labeled with its cluster and a keep flag.

    Output: ``(id, cluster_id, keep)`` for EVERY input row — singletons are
    their own cluster with ``keep=true``; within a duplicate cluster only
    the smallest id survives. Downstream: ``.filter("keep")`` is the
    deduplicated corpus; the full labeling supports audit queries
    ("what did we drop and why")."""

    def __init__(
        self,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.5,
        strategy: str = "exact",
        n_centroids: int = 16,
        train_sample: int = 2048,
        seed: int = 42,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if strategy not in ("exact", "ivf"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.strategy = strategy
        self.n_centroids = n_centroids
        self.train_sample = train_sample
        self.seed = seed

    def _pairs_exact(self, df: DataFrame) -> DataFrame:
        return CosinePairs(
            id_col=self.id_col, vec_col=self.vec_col, threshold=self.threshold
        )(df).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))

    def _pairs_ivf(self, df: DataFrame) -> DataFrame:
        """Within-cell pairs: assign each vector to its nearest k-means
        centroid (pandas-UDF argmax over the broadcast centroid matrix),
        then pair-join on the cell id. The join is an equi-join — each
        cell's quadratic blow-up is bounded by the cell size, and AQE's
        skew-join splitting handles a hot cell."""
        ivf = IvfCosineTopK(
            corpus=df,
            k=1,
            query_id=self.id_col,
            query_vec=self.vec_col,
            corpus_id=self.id_col,
            corpus_vec=self.vec_col,
            n_centroids=self.n_centroids,
            train_sample=self.train_sample,
            seed=self.seed,
        )
        centroids = ivf._centroids()
        cell1 = ivf._cell_udf(centroids, 1)  # array<long> of length 1
        base = (
            df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.vec_col).cast("array<double>").alias("v"),
            )
            .withColumn("__cell", F.element_at(cell1(F.col("v")), 1))
            .withColumn("n", _norm(F.col("v")))
        )
        a = base.select(
            "__cell", F.col("id").alias("doc_a"), F.col("v").alias("va"), F.col("n").alias("na")
        )
        b = base.select(
            "__cell", F.col("id").alias("doc_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
        cosine = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            a.join(b, "__cell")
            .where(F.col("doc_a") < F.col("doc_b"))
            .where(cosine.cast("decimal(18,6)") >= F.lit(self.threshold))
            .select("doc_a", "doc_b")
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        pairs = (
            self._pairs_exact(df) if self.strategy == "exact" else self._pairs_ivf(df)
        )
        clusters = DedupClusters()(pairs)  # (doc_id, cluster_id), paired nodes only
        ids = df.select(F.col(self.id_col).alias("id"))
        labeled = ids.join(
            clusters.withColumnRenamed("doc_id", "id"), "id", "left"
        ).select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        return labeled.withColumn(
            "keep", (F.col("id") == F.col("cluster_id"))
        ).select("id", "cluster_id", "keep")


def semantic_dedup_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    where: Optional[str] = None,
) -> str:
    """DuckDB oracle for the exact strategy: all-pairs cosine pairs above
    the threshold (decimal-pinned, same cast point as the engine), recursive
    -CTE transitive closure for components, keep-min survivors, singletons
    labeled by themselves via the left join."""
    w = f"WHERE {where}" if where else ""
    return f"""
WITH RECURSIVE e AS (
  SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table} {w}
), pairs AS (
  SELECT a.id AS doc_a, b.id AS doc_b
  FROM e a JOIN e b ON a.id < b.id
  WHERE CAST(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        AS DECIMAL(18,6)) >= {threshold}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges) s
  UNION
  SELECT x.dst, r.label FROM reach r JOIN edges x ON x.src = r.node
), comp AS (
  SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
)
SELECT e.id AS id,
       COALESCE(comp.cluster_id, e.id) AS cluster_id,
       (COALESCE(comp.cluster_id, e.id) = e.id) AS keep
FROM e LEFT JOIN comp ON comp.node = e.id
ORDER BY id
"""

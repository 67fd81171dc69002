"""Similarity search over embedding columns (``array<float>``).

North-star extension operators:

- **BruteForceCosineTopK** — exact top-k neighbors; the correctness
  baseline. Two physical strategies:
  (a) ``strategy='join'``: query⨝corpus cross-join + window top-k, pure
      DataFrame — Catalyst broadcasts the small side; right shape for
      moderate corpus × query products and the DuckDB oracle.
  (b) ``strategy='pandas'``: Arrow-batched BLAS — broadcast the corpus
      matrix (numpy) to executors, `mapInPandas` computes Q @ V.T per batch
      and emits per-partition top-k; the scale path when the corpus fits in
      executor memory (the reference's torch engine is this exact shape,
      ``warp_pipes/search/vector_base/torch.py:42-50``).
- **LshCosineTopK** — random-hyperplane LSH bucketing: only pairs sharing a
  hyperplane-sign bucket are scored, then exact re-rank. Sub-quadratic; the
  100 TB path where brute force is impossible.
- **CosinePairs** — embedding near-dup: all pairs with cosine >= threshold.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    """Cosine similarity of two array<double> columns, computed as a
    left-to-right fold (deterministic summation order → oracle-exact)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


class BruteForceCosineTopK(Pipe):
    """Exact cosine top-k: for each query row return the k nearest corpus
    rows. Input df = queries; ``corpus`` df given at construction."""

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 10,
        query_id: str = "vec_id",
        query_vec: str = "embedding",
        corpus_id: str = "vec_id",
        corpus_vec: str = "embedding",
        exclude_self: bool = True,
        strategy: str = "join",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.k = k
        self.query_id = query_id
        self.query_vec = query_vec
        self.corpus_id = corpus_id
        self.corpus_vec = corpus_vec
        self.exclude_self = exclude_self
        self.strategy = strategy

    _no_fingerprint = ("corpus",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        if self.strategy == "pandas":
            return self._transform_pandas(df)
        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.query_vec).cast("array<double>").alias("qv"),
        )
        c = self.corpus.select(
            F.col(self.corpus_id).alias("neighbor_id"),
            F.col(self.corpus_vec).cast("array<double>").alias("cv"),
        )
        pairs = q.crossJoin(F.broadcast(c))
        if self.exclude_self:
            pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
        scored = pairs.select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).cast("decimal(18,6)").alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "rank", "neighbor_id", "score")
        )

    def _transform_pandas(self, df: DataFrame) -> DataFrame:
        """BLAS path: broadcast corpus matrix, Arrow-batched matmul + top-k.
        Same results as the join path (modulo float summation order), ~10-100×
        faster per query batch; use when corpus fits in executor memory."""
        import pandas as pd

        corpus_rows = (
            self.corpus.select(
                F.col(self.corpus_id).alias("neighbor_id"),
                F.col(self.corpus_vec).cast("array<double>").alias("cv"),
            )
            .collect()
        )
        ids = np.array([r["neighbor_id"] for r in corpus_rows], dtype=np.int64)
        mat = np.array([r["cv"] for r in corpus_rows], dtype=np.float64)
        mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        spark = df.sparkSession
        b_ids = spark.sparkContext.broadcast(ids)
        b_mat = spark.sparkContext.broadcast(mat_n)
        k = self.k
        exclude_self = self.exclude_self

        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.query_vec).cast("array<double>").alias("qv"),
        )

        def topk_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            cids = b_ids.value
            cmat = b_mat.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qm = np.stack(pdf["qv"].to_numpy())
                qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
                scores = qm @ cmat.T  # [nq, nc]
                qids = pdf["query_id"].to_numpy()
                if exclude_self:
                    for i, qid in enumerate(qids):
                        scores[i, cids == qid] = -np.inf
                kk = min(k, scores.shape[1])
                part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                out = []
                for i, qid in enumerate(qids):
                    cand = part[i]
                    order = np.lexsort((cids[cand], -scores[i, cand]))
                    sel = cand[order]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": qid,
                                "rank": np.arange(1, len(sel) + 1),
                                "neighbor_id": cids[sel],
                                "score": scores[i, sel],
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        return q.mapInPandas(
            topk_batches,
            schema="query_id long, rank int, neighbor_id long, score double",
        )


class LshCosineTopK(Pipe):
    """Random-hyperplane LSH: bucket = sign bits of ``n_planes`` random
    projections (seeded, deterministic); candidates share a bucket in at
    least one of ``n_tables`` tables; exact cosine re-rank of candidates.
    Approximate recall, exact precision on returned scores."""

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 10,
        n_planes: int = 8,
        n_tables: int = 4,
        dim: int = 64,
        seed: int = 42,
        query_id: str = "vec_id",
        query_vec: str = "embedding",
        corpus_id: str = "vec_id",
        corpus_vec: str = "embedding",
        exclude_self: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.k = k
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.dim = dim
        self.seed = seed
        self.query_id = query_id
        self.query_vec = query_vec
        self.corpus_id = corpus_id
        self.corpus_vec = corpus_vec
        self.exclude_self = exclude_self

    _no_fingerprint = ("corpus",)

    def _bucket_expr(self, vec):
        rng = np.random.RandomState(self.seed)
        planes = rng.randn(self.n_tables, self.n_planes, self.dim)
        buckets = []
        for t in range(self.n_tables):
            code = F.lit(0).cast("long")
            for p in range(self.n_planes):
                w = planes[t, p]
                proj = F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in w]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x,
                )
                code = code + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            buckets.append(code)
        return F.array(*buckets)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.query_vec).cast("array<double>").alias("qv"),
        ).withColumn("qb", self._bucket_expr(F.col("qv")))
        c = self.corpus.select(
            F.col(self.corpus_id).alias("neighbor_id"),
            F.col(self.corpus_vec).cast("array<double>").alias("cv"),
        ).withColumn("cb", self._bucket_expr(F.col("cv")))
        qe = q.select(
            "query_id", "qv", F.posexplode("qb").alias("table_id", "bucket")
        )
        ce = c.select(
            "neighbor_id", "cv", F.posexplode("cb").alias("table_id", "bucket")
        )
        cand = (
            qe.join(ce, on=["table_id", "bucket"])
            .select("query_id", "qv", "neighbor_id", "cv")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        if self.exclude_self:
            cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
        scored = cand.select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).cast("decimal(18,6)").alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "rank", "neighbor_id", "score")
        )


class CosinePairs(Pipe):
    """Embedding near-duplicate pairs: cosine(a, b) >= threshold, a < b.
    Exact O(n²) pair scan — bounded input or pre-bucketed input only; the
    LSH operator is the scale path."""

    def __init__(
        self,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.95,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        base = df.select(
            F.col(self.id_col).alias("id"),
            F.col(self.vec_col).cast("array<double>").alias("v"),
        )
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(F.broadcast(b)).where(F.col("id_a") < F.col("id_b"))
        return (
            pairs.select(
                "id_a",
                "id_b",
                cosine_expr(F.col("va"), F.col("vb")).cast("decimal(18,6)").alias("cosine"),
            )
            .filter(F.col("cosine") >= F.lit(self.threshold))
        )

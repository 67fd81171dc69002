"""Dense vector search engine.

Capability parity with the reference's faiss/torch engines
(``warp_pipes/search/dense.py:28-129``, ``vector_base/torch.py:20-112``):
top-k nearest corpus vectors per query. We do not port faiss internals —
the exact engine is a broadcast matmul / similarity join (the reference's
torch path is the same math), and the approximate scale path is
random-hyperplane LSH (``warp_pipes_spark.ml.similarity.LshCosineTopK``).

Output is long-form results (query_id, rank, idx, score)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.ml.similarity import BruteForceCosineTopK, LshCosineTopK


class DenseSearch(Pipe):
    """``metric``: 'cosine' (normalized dot) — the reference's default
    inner-product search on normalized vectors. ``method``: 'exact' (join or
    BLAS) or 'lsh' (approximate, sub-quadratic)."""

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 10,
        method: str = "exact",
        strategy: str = "join",
        corpus_id: str = "vec_id",
        corpus_vec: str = "embedding",
        query_id: str = "vec_id",
        query_vec: str = "embedding",
        exclude_self: bool = False,
        dim: int = 64,
        seed: int = 42,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.k = k
        self.method = method
        if method == "exact":
            self._engine = BruteForceCosineTopK(
                corpus,
                k=k,
                query_id=query_id,
                query_vec=query_vec,
                corpus_id=corpus_id,
                corpus_vec=corpus_vec,
                exclude_self=exclude_self,
                strategy=strategy,
            )
        elif method == "lsh":
            self._engine = LshCosineTopK(
                corpus,
                k=k,
                dim=dim,
                seed=seed,
                query_id=query_id,
                query_vec=query_vec,
                corpus_id=corpus_id,
                corpus_vec=corpus_vec,
                exclude_self=exclude_self,
            )
        else:
            raise ValueError(f"unknown dense method: {method}")

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = self._engine.transform(df)
        return out.select(
            "query_id", "rank", F.col("neighbor_id").alias("idx"), "score"
        )

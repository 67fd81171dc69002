"""Top-k re-ranker engine.

Parity with the reference's ``TopkSearch`` (``warp_pipes/search/topk.py:21-87``):
given previous engine results, keep the k best per query. A pure window
operation — no data movement beyond the partition-by-query shuffle that the
result set already has."""

from __future__ import annotations

from pyspark.sql import DataFrame

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.search.result import topk_results


class TopkSearch(Pipe):
    def __init__(self, k: int = 10, **kwargs):
        super().__init__(**kwargs)
        self.k = k
        # like the reference, a re-ranker never merges with previous results
        self.merge_previous_results = False

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return topk_results(df, self.k)


class PairwiseRerank(Pipe):
    """Second-stage pairwise re-scorer — the retrieve-then-rerank cascade's
    expensive step, bounded by k candidates per query (never corpus-sized):
    previous results join back to query/corpus text, every (query, doc)
    pair is re-scored by ``score_expr`` (a Column expression over the
    joined pair columns — here deterministic lexical overlap; a
    cross-encoder slots into the same seam as an Arrow-batched pandas UDF
    over the identical bounded pair table), and the top ``k`` per query
    survive. Rank ties break on the FIRST-stage score then idx, so the
    cascade is deterministic end to end.

    Plan shape: candidates (|Q| x k_retrieve rows) broadcast-join the query
    batch, then join the corpus projection on idx — at 100 TB the corpus
    side prunes to the candidate ids (Bloom/DPP-eligible equi-join), never
    a full scan join."""

    def __init__(
        self,
        corpus: DataFrame,
        score_expr,
        k: int = 10,
        corpus_id: str = "doc_id",
        corpus_cols: tuple = ("text",),
        query_cols: tuple = ("text",),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.score_expr = score_expr
        # the Column object itself cannot be JSON-reflected, but its
        # expression string can: fold it into the fingerprint so two
        # reranks with different scorers are never fingerprint-identical
        # (they'd otherwise collide if this pipe ever keys an artifact
        # cache the way the LSH/BM25/SimHash indexes do)
        self.score_expr_desc = str(score_expr)
        self.k = k
        self.corpus_id = corpus_id
        self.corpus_cols = tuple(corpus_cols)
        self.query_cols = tuple(query_cols)
        self.merge_previous_results = False
        self._queries = None
        self.queries_fp = None

    _no_fingerprint = ("corpus", "score_expr", "_queries")

    def bind_queries(self, queries: DataFrame) -> "PairwiseRerank":
        """Attach the query batch (an Index chain hands re-rankers only the
        previous results; the pair scorer also needs the query columns).
        The bound batch's fingerprint folds into the pipe fingerprint —
        rebinding different queries changes the pipe identity."""
        from warp_pipes_spark.core.fingerprint import fingerprint_dataframe

        self._queries = queries
        self.queries_fp = fingerprint_dataframe(queries)
        return self

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if self._queries is None:
            raise ValueError("PairwiseRerank needs bind_queries(queries)")
        qcols = self._queries.select(
            "query_id",
            *[F.col(c).alias(f"q_{c}") for c in self.query_cols],
        )
        ccols = self.corpus.select(
            F.col(self.corpus_id).alias("idx"),
            *[F.col(c).alias(f"d_{c}") for c in self.corpus_cols],
        )
        pairs = (
            df.select("query_id", "idx", F.col("score").alias("stage1_score"))
            .join(F.broadcast(qcols), "query_id")
            .join(ccols, "idx")
        )
        rescored = pairs.withColumn("score", self.score_expr)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.desc("stage1_score"), F.asc("idx")
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "rank", "idx", "score", "stage1_score")
        )


def token_overlap_expr(a, b):
    """Deterministic pair scorer: Jaccard overlap of the distinct token
    sets (DECIMAL-rounded — the stand-in for a learned cross-encoder,
    bit-reproducible in SQL)."""
    from pyspark.sql import functions as F

    from warp_pipes_spark.text.analysis import tokens_expr

    ta = F.array_distinct(tokens_expr(a))
    tb = F.array_distinct(tokens_expr(b))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return (
        F.when(union > 0, inter.cast("double") / union.cast("double"))
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
        .cast("double")
    )

"""Write a custom search engine and plug it into the Index chain.

Spark-first rewrite of the reference user guide's
``custom_search_engine.py``: there a custom engine subclasses ``Search``
and implements ``_build``/``search`` over torch tensors. Here an engine is
just a ``Pipe`` that maps a query DataFrame to the long-form result
contract ``(query_id, idx, score)`` — it composes with ``Index``,
``TopkSearch`` and the ``ENGINES`` registry exactly like the built-ins.

The custom engine below scores by RAW (un-normalized) dot product — the
reference Custom's ``query @ vectors.T`` — via ``F.zip_with`` +
``F.aggregate``, entirely JVM-side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.search.auto import ENGINES
from warp_pipes_spark.search.index import Index
from warp_pipes_spark.search.topk import TopkSearch

SF_DIR = "/root/testdata/sf0.001"


class DotProductSearch(Pipe):
    """Exact dot-product top-k: broadcast the corpus, score every
    (query, doc) pair, keep k per query by a window. The correctness
    baseline shape — swap in the LSH/IVF engines for the 100 TB path."""

    def __init__(self, corpus: DataFrame, k: int = 10, **kwargs):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.k = k

    _no_fingerprint = ("corpus",)

    def _transform(self, queries: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        c = F.broadcast(
            self.corpus.select(
                F.col("vec_id").alias("idx"), F.col("embedding").alias("cvec")
            )
        )
        q = queries.select(F.col("vec_id").alias("query_id"), "embedding")
        scored = q.crossJoin(c).select(
            "query_id",
            "idx",
            F.aggregate(
                F.zip_with("embedding", "cvec", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("idx"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .drop("rank")
        )


# register like the reference's AutoSearchEngine registry
ENGINES.setdefault("dot", DotProductSearch)


def run(spark: SparkSession) -> DataFrame:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)

    # engine chain: custom retriever (k=10) -> top-3 re-rank
    index = Index(
        corpus=emb,
        engines=[DotProductSearch(emb, k=10), TopkSearch(k=3)],
        k=3,
    )
    return index(queries)


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    run(get_spark(shuffle_partitions=8)).show(12)

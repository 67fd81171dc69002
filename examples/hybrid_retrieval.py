"""Hybrid retrieval + rerank cascade (extension beyond the reference's
user guide): BM25 and dense cosine retrievers fuse by Reciprocal Rank
Fusion inside an ``Index`` chain, then a pairwise re-scorer reranks the
fused candidates — the standard two-stage lexical+dense serving recipe.

Run: ``python examples/hybrid_retrieval.py``
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table
from warp_pipes_spark.ml.similarity import BruteForceCosineTopK
from warp_pipes_spark.search.bm25 import Bm25Search
from warp_pipes_spark.search.index import Index
from warp_pipes_spark.search.topk import PairwiseRerank, token_overlap_expr
from warp_pipes_spark.text.analysis import tokens_expr

SF_DIR = "/root/testdata/sf0.001"


def doc_vectors(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in embedding (swap for a real model through
    ``Predict``): a pure Catalyst expression over the text."""
    n = F.length("text")
    c1 = F.when(n > 0, F.ascii(F.substring("text", 1, 1))).otherwise(0)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda i: ((i * 2654435761 + n * 31 + c1 * 7) % 1000003).cast("double")
        / 1000003,
    )
    return docs.select("doc_id", vec.alias("embedding"))


def run(spark: SparkSession) -> DataFrame:
    docs = load_table(spark, SF_DIR, "documents")
    dv = doc_vectors(docs)

    # one query batch carrying BOTH modalities: BM25 reads `text`, the
    # dense engine reads `embedding`
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_expr(F.col("text")), 1, 5), " ").alias("text"),
    )
    qboth = queries.join(
        dv.select(F.col("doc_id").alias("query_id"), "embedding"), "query_id"
    )

    bm25 = Bm25Search(corpus=docs, k=20, query_text="text")
    dense = BruteForceCosineTopK(
        corpus=dv,
        k=20,
        query_id="query_id",
        query_vec="embedding",
        corpus_id="doc_id",
        corpus_vec="embedding",
        exclude_self=False,
    )
    fused = Index(
        corpus=docs,
        engines=[bm25, dense],
        k=10,
        merge_previous_results=True,
        merge_strategy="rrf",  # scale-free fusion: BM25 scores ~10s, cosine ~1s
    )(qboth)

    rerank = PairwiseRerank(
        corpus=docs,
        score_expr=token_overlap_expr(F.col("q_text"), F.col("d_text")),
        k=3,
    ).bind_queries(queries)
    return rerank(fused)


def main() -> None:
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="hybrid-retrieval-example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark).orderBy("query_id", "rank").show(12, truncate=40)


if __name__ == "__main__":
    main()

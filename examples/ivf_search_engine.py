"""Approximate vector search with the relational IVF engine.

Spark-first rewrite of the reference user guide's
``faiss_search_engine.py`` (faiss ``IVF1,Flat`` via ``FaissVectorBase``):
the faiss index becomes RELATIONAL IVF — seeded k-means cell centroids
trained on a bounded sample, corpus vectors assigned to cells, queries
probe their ``n_probe`` nearest cells through an equi-join, and the
probed candidates are exactly re-scored. No native library, no
per-executor index files; the "index" is a cell-bucketed DataFrame, so
building and searching both scale with the cluster.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.ml.similarity import BruteForceCosineTopK, IvfCosineTopK

SF_DIR = "/root/testdata/sf0.001"


def run(spark: SparkSession) -> DataFrame:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)

    engine = IvfCosineTopK(
        corpus=emb, k=5, n_centroids=8, n_probe=3, seed=7, exclude_self=False
    )
    return engine(queries)


def recall_vs_exact(spark: SparkSession) -> float:
    """IVF recall against the exact engine — the check the reference's
    faiss example eyeballs by printing both result sets."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = BruteForceCosineTopK(emb, k=5, exclude_self=False)(queries).select(
        "query_id", "neighbor_id"
    )
    approx = run(spark).select("query_id", "neighbor_id")
    hit = approx.join(exact, ["query_id", "neighbor_id"]).count()
    return hit / max(exact.count(), 1)


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    run(spark).show(10)
    print(f"recall@5 vs exact: {recall_vs_exact(spark):.2f}")

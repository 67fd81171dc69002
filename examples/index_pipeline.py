"""Build an Index from config and run a query batch through the chain.

Spark-first rewrite of the reference user guide's ``index.py``: there an
``Index`` wraps an HF dataset with an elasticsearch + faiss engine list,
a DummyModel and cache configs. Here the corpus is a DataFrame, the engine
list is plain config resolved through the ``auto_index`` registry
(reference ``AutoSearchEngine``), BM25 replaces the elasticsearch server
(in-engine inverted index, materialized once per corpus fingerprint), and
"model inference" for dense vectors is the Predict pipe's job — this
example keeps the lexical chain: BM25 retrieve (k=20) → top-5 re-rank.

Both call forms of the reference are shown: a small ad-hoc query batch
(``pipe(batch)``) and a whole dataset split (``pipe(dataset)``) — in Spark
both are just DataFrames.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.search.auto import auto_index
from warp_pipes_spark.text.analysis import tokens_expr

SF_DIR = "/root/testdata/sf0.001"


def run(spark: SparkSession) -> DataFrame:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    index = auto_index(
        corpus=docs,
        engine_configs=[
            {"name": "bm25", "k": 20},
            {"name": "topk", "k": 5},
        ],
        k=5,
    )

    # --- `pipe(batch)`: an ad-hoc query batch ---------------------------
    batch = spark.createDataFrame(
        [(9000, "fast key order sort"), (9001, "table scan merge window")],
        "query_id long, text string",
    )
    adhoc = index(batch)

    # --- `pipe(dataset)`: a whole split of queries ----------------------
    split = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens_expr(F.col("text")), 1, 5), " ").alias("text"),
    )
    dataset_results = index(split)

    return adhoc.unionByName(dataset_results)


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    run(get_spark(shuffle_partitions=8)).show(15)

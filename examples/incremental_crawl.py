"""The daily-increment loop of a crawl corpus, end to end.

A production corpus is not rebuilt — it ACCRETES: each arriving batch is
repaired, quality-gated, deduplicated against the existing corpus,
merged into the snapshot as CDC changes, and appended to the retrieval
index without re-tokenizing a single existing document. This example wires
the incremental operators into that loop:

    batch -> FixEncoding + Gopher gate
          -> IncrementalDedup (anti-join on 8-byte fingerprints vs corpus)
          -> MergeUpsert (latest-image-wins CDC into the snapshot)
          -> Bm25Search.append (old postings reused, bit-identical scores)

Scale shape: the dedup anti-join ships fingerprints (8 bytes/doc, Bloom-
prunable), the CDC merge is ONE keyed shuffle, and the index append
tokenizes ONLY the new documents. Nothing in the loop is proportional to
the existing corpus except narrow keyed joins.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.cdc import MergeUpsert
from warp_pipes_spark.pipes.pipelines import Sequential
from warp_pipes_spark.search.bm25 import Bm25Search
from warp_pipes_spark.text.analysis import GopherQualityFilter
from warp_pipes_spark.text.dedup import IncrementalDedup
from warp_pipes_spark.text.web import FixEncoding

SF_DIR = "/root/testdata/sf0.001"


def run(spark: SparkSession) -> dict:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # day 0: the existing, already-curated corpus
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    # the arriving batch: some genuinely new docs, some exact re-crawls
    fresh = docs.filter(F.col("doc_id") % 3 == 0)
    recrawl = corpus.limit(20)  # duplicates the dedup must drop
    batch = fresh.unionByName(recrawl)

    # 1. scan-level repair + gate (one fused projection, no shuffle)
    cleaned = Sequential(
        FixEncoding(), GopherQualityFilter(text_col="fixed_text", min_tokens=3)
    )(batch).filter(F.col("keep"))

    # 2. dedup the batch against the corpus (and within itself):
    #    anti-join on the content fingerprint — 8 bytes per corpus doc
    new_docs = IncrementalDedup(corpus=corpus)(
        cleaned.select("doc_id", "text", "lang", "source", "n_chars")
    )

    # 3. CDC-merge into the snapshot (latest image wins; here all inserts)
    changes = new_docs.select(
        "doc_id",
        F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"),
        "text", "lang", "source", "n_chars",
    )
    next_snapshot = MergeUpsert(snapshot=corpus, keys=["doc_id"])(changes)

    # 4. append to the BM25 index: reuses the old corpus' cached postings,
    #    tokenizes only new_docs; scores are bit-identical to a fresh build
    base = Bm25Search(corpus=corpus, k=5)
    appended = base.append(new_docs)
    queries = next_snapshot.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    results = appended(queries)

    return {
        "corpus_docs": corpus.count(),
        "batch_docs": batch.count(),
        "after_gate": cleaned.count(),
        "genuinely_new": new_docs.count(),
        "next_snapshot_docs": next_snapshot.count(),
        "search_results": results.count(),
        "results_df": results,
        "snapshot_df": next_snapshot,
    }


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="incremental-crawl", shuffle_partitions=8)
    stats = run(spark)
    print({k: v for k, v in stats.items() if not hasattr(v, "columns")})

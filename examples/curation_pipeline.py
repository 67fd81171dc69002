"""End-to-end training-corpus curation: the full operator library in one
pipeline, composed the way a production run would chain it.

repair -> quality gate -> language id -> exact dedup -> MinHash near-dedup
-> cluster survivors -> WordPiece tokenize -> sequence packing

Each stage is a ``Pipe`` (lazy DataFrame -> DataFrame), so the whole
pipeline is ONE Catalyst plan per action; the only wide operations are the
dedup joins and the packing window. This is the Spark-first rendition of
what the reference composes with ``Sequential``/``Gate`` over HF datasets
(``warp_pipes/pipes/pipelines.py``) — extended with the LLM-data operators
(dedup, quality, packing) a 100 TB curation run needs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.pipelines import Sequential
from warp_pipes_spark.pipes.tokenizer import WordPieceTokenizer
from warp_pipes_spark.text.analysis import GopherQualityFilter, LangId
from warp_pipes_spark.text.bpe import train_wordpiece_vocab
from warp_pipes_spark.text.dedup import DedupClusters, ExactDedup, MinHashDedup
from warp_pipes_spark.text.packing import PackSequences
from warp_pipes_spark.text.web import FixEncoding

SF_DIR = "/root/testdata/sf0.001"
SEQ_CAPACITY = 256


def run(spark: SparkSession) -> DataFrame:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- stage 1: row-preserving enrichment (one fused projection) ------
    # FixEncoding + quality audit + language id are all column ops: the
    # Sequential composes them into a single scan-level plan, no shuffle.
    enrich = Sequential(
        FixEncoding(),  # mojibake/zero-width/control repair + changed flag
        GopherQualityFilter(text_col="fixed_text"),  # per-rule audit + keep
        LangId(text_col="fixed_text"),  # n-gram/stopword language id
    )
    enriched = enrich(docs)

    # gate on the quality verdict (the audit columns survive for reporting)
    kept = enriched.filter(F.col("keep"))

    # ---- stage 2: exact dedup (hash-groupBy, keep smallest doc_id) ------
    # ExactDedup emits one row per duplicated text with its canonical
    # (min doc_id) representative; anti-join drops the other copies.
    groups = ExactDedup(key_col="fixed_text", id_col="doc_id")(kept)
    # drop every copy except the canonical (min doc_id) representative
    drop = (
        kept.join(
            groups.select(F.col("fixed_text").alias("__t"), "canonical_id"),
            kept["fixed_text"] == F.col("__t"),
        )
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    unique_docs = kept.join(drop, "doc_id", "left_anti")

    # ---- stage 3: near-dedup (MinHash banding -> clusters -> survivors) -
    pairs = MinHashDedup(
        text_col="fixed_text", id_col="doc_id", n=3, threshold=0.5
    )(unique_docs).select("doc_a", "doc_b")
    clusters = DedupClusters()(pairs)  # (doc_id, cluster_id) for paired docs
    survivors = (
        unique_docs.join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        .filter(F.col("doc_id") == F.col("cluster_id"))  # keep-min rule
    )

    # ---- stage 4: tokenize with a corpus-trained WordPiece vocab --------
    vocab = train_wordpiece_vocab(survivors, text_col="fixed_text", n_merges=80)
    tokenized = WordPieceTokenizer(
        vocab, text_col="fixed_text", add_special_tokens=False
    )(survivors)

    # ---- stage 5: pack into fixed-capacity training sequences -----------
    packed = PackSequences(capacity=SEQ_CAPACITY, token_col="n_tok")(
        tokenized.withColumn("n_tok", F.size("tokens"))
    )
    return packed


def report(spark: SparkSession) -> dict:
    """Stage-by-stage funnel counts — the curation datasheet a real run
    publishes next to the output."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    enriched = Sequential(
        FixEncoding(), GopherQualityFilter(text_col="fixed_text")
    )(docs)
    kept = enriched.filter(F.col("keep"))
    groups = ExactDedup(key_col="fixed_text", id_col="doc_id")(kept)
    packed = run(spark)
    return {
        "input_docs": docs.count(),
        "after_quality": kept.count(),
        "exact_dup_groups": groups.count(),
        "packed_docs": packed.count(),
        "n_packs": packed.agg(F.max("end_pack")).collect()[0][0] + 1,
    }


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="curation-pipeline", shuffle_partitions=8)
    print(report(spark))

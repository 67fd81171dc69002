"""Data SELECTION + SFT construction: the second half of a pretraining
run, picking up where ``curation_pipeline.py`` (repair/quality/dedup)
leaves off and ending at trainer-ready tensors.

maximal-span exact-substring removal -> benchmark decontamination ->
DSIR importance selection toward a target domain -> UniMax
source-balanced budget -> WordPiece chat-template SFT ids + loss mask

Every stage is a ``Pipe`` over DataFrames; the corpus-sized shuffles are
the dedup gram table, the DSIR bucket table, and nothing else — the
benchmark, the bucket models, and the UniMax allocation all ride
broadcasts. This is the composition a reference user would run as
tokenize -> collate (``warp_pipes/pipes/collate.py:137-178``), extended
with the selection operators a 100 TB corpus needs first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.sampling import UniMaxSample
from warp_pipes_spark.text.bpe import train_wordpiece_vocab
from warp_pipes_spark.text.dedup import Decontaminate, MaximalSpanDedup
from warp_pipes_spark.text.dsir import DsirSelect
from warp_pipes_spark.text.packing import WordPieceChatTemplate

SF_DIR = "/root/testdata/sf0.001"


def run(spark: SparkSession) -> DataFrame:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # ---- stage 1: exact-substring hygiene --------------------------------
    # remove every maximal >=10-token span that occurs twice anywhere in
    # the corpus (Lee et al. ExactSubstr); the cleaned text feeds the rest
    spans = MaximalSpanDedup(min_len=10)(docs)
    cleaned = docs.drop("text").join(
        spans.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )

    # ---- stage 2: benchmark decontamination ------------------------------
    # src0 plays the eval suite; drop any training doc containing >=30%
    # of a benchmark item's trigrams
    bench = cleaned.filter(F.col("source") == "src0")
    train = cleaned.filter(F.col("source") != "src0")
    train = Decontaminate(benchmark=bench, n=3, threshold=0.3, mode="filter")(train)

    # ---- stage 3: DSIR selection toward the target domain ----------------
    # keep the 300 docs whose hashed-ngram distribution is most src0-like
    selected_ids = DsirSelect(target=bench, n_buckets=1024, k=300)(train)
    selected = train.join(
        F.broadcast(selected_ids.select("doc_id")), "doc_id"
    )

    # ---- stage 4: UniMax budget across surviving sources -----------------
    balanced_ids = UniMaxSample(budget_num=4, budget_den=5, epoch_cap=2)(selected)
    balanced = selected.join(
        F.broadcast(balanced_ids.select("doc_id")), "doc_id"
    )

    # ---- stage 5: SFT examples with REAL vocabulary ids ------------------
    # vocab trained on the selected corpus itself; each doc becomes a
    # (prompt, response) pair with ids + loss mask a collator consumes
    vocab = train_wordpiece_vocab(balanced, n_merges=50, max_words=2000)
    from warp_pipes_spark.text.analysis import tokens_expr

    toks = tokens_expr(F.col("text"))
    pairs = balanced.select(
        "doc_id",
        "source",
        F.array_join(F.slice(toks, 1, 8), " ").alias("prompt"),
        F.array_join(
            F.slice(toks, 9, F.greatest(F.size(toks) - 8, F.lit(0))), " "
        ).alias("response"),
    )
    return WordPieceChatTemplate(vocab)(pairs).select(
        "doc_id", "source", "input_ids", "loss_mask",
        "n_prompt_tokens", "n_response_tokens",
    )


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="selection-and-sft")
    out = run(spark)
    out.show(5, truncate=80)
    print(f"{out.count()} SFT examples")

"""Tokenize → passages (with prepended title) → collate, as ONE lazy plan.

Spark-first rewrite of the reference user guide's
``passages_and_collate.py``: the same chain the reference builds from
Parallel/Sequential/TokenizerPipe, GeneratePassages(prepend_field="title")
and CollateField — expressed as three pipes composed over a DataFrame, so
the whole thing stays a single Catalyst plan (tokenization fused into the
explode; no intermediate materialization).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.collate import CollateField
from warp_pipes_spark.pipes.basics import AddPrefix
from warp_pipes_spark.pipes.passages import GeneratePassages
from warp_pipes_spark.pipes.pipelines import Sequential
from warp_pipes_spark.pipes.tokenizer import RegexTokenizer

DOC = (
    "Fipple flutes are found in many cultures around the world. Often with "
    "six holes, the shepherd's pipe is a common pastoral image. Shepherds "
    "often piped both to soothe the sheep and to amuse themselves. Modern "
    "manufactured six-hole folk pipes are referred to as pennywhistle or "
    "tin whistle."
)


def run(spark: SparkSession) -> DataFrame:
    batch = spark.createDataFrame(
        [(0, DOC, "Title: Pipe. ")], "idx long, text string, title string"
    )

    # tokenize the document and the title with the same tokenizer
    tokenize = Sequential(
        RegexTokenizer(text_col="text"),
        RegexTokenizer(text_col="title", prefix="title."),
    )

    # window the document tokens; each window carries the title tokens
    # after [CLS] (the reference's prepend_field="title")
    passages = GeneratePassages(
        token_col="input_ids",
        size=16,
        stride=12,
        field_cols=["attention_mask"],
        global_cols=["idx"],
        start_tokens={"input_ids": [-1], "attention_mask": [1]},   # [CLS]
        end_tokens={"input_ids": [-2], "attention_mask": [1]},     # [SEP]
        prepend_cols={
            "input_ids": "title.input_ids",
            "attention_mask": "title.attention_mask",
        },
    )

    # namespace the passage rows and pad them to the model's fixed length
    collate = Sequential(
        AddPrefix("document."),
        CollateField(
            field="document",
            pad_keys=["input_ids", "attention_mask"],
            length=16,
            pad_value=0,
        ),
    )
    return Sequential(tokenize, passages, collate)(batch)


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    run(get_spark(shuffle_partitions=4)).show(truncate=60)

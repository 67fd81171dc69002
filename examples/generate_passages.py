"""Generate strided passages with [CLS]/[SEP] injection and a prepended title.

Spark-first rewrite of the reference user guide's ``generate_passages.py``:
``GeneratePassages(size=30, stride=20, start_tokens=[cls],
end_tokens=[sep], prepend_field="title")`` becomes a 1-row -> N-rows
array-expression explode — the title's tokens ride after [CLS] in every
window (``prepend_cols``), and every source token is mask-owned by exactly
one window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.passages import GeneratePassages, hf_field_tokens

CLS, SEP, PAD = 101, 102, 0


def build_tokenized_batch(spark: SparkSession) -> DataFrame:
    """A pre-tokenized batch: document token ids + aligned attention mask,
    plus the title's token ids (what TokenizerPipe would produce)."""
    rows = [
        (0, list(range(1000, 1064)), [1] * 64, [7001, 7002]),
        (1, list(range(2000, 2023)), [1] * 23, [7003]),
    ]
    return spark.createDataFrame(
        rows,
        "idx long, input_ids array<long>, attention_mask array<long>, "
        "title_ids array<long>",
    )


def run(spark: SparkSession) -> DataFrame:
    injected = hf_field_tokens(start_tokens=[CLS], end_tokens=[SEP])
    passages_pipe = GeneratePassages(
        token_col="input_ids",
        size=30,
        stride=20,
        field_cols=["attention_mask"],
        global_cols=["idx"],
        pad_value=PAD,
        pad_values={"attention_mask": 0},
        start_tokens={k: injected[k]["start"] for k in ("input_ids", "attention_mask")},
        end_tokens={k: injected[k]["end"] for k in ("input_ids", "attention_mask")},
        prepend_cols={"input_ids": "title_ids", "attention_mask": "title_mask"},
    )
    batch = build_tokenized_batch(spark).withColumn(
        "title_mask", F.transform("title_ids", lambda _: F.lit(1))
    )
    return passages_pipe(batch)


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    run(get_spark(shuffle_partitions=4)).show(truncate=70)

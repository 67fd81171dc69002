"""Collate the `document` field of a passage batch to fixed-length arrays.

Spark-first rewrite of the reference user guide's ``collate_documents.py``:
``CollateField(field="document", to_tensor=[...])`` becomes a gated
strip→pad→re-prefix combinator. Tensorization dissolves — Arrow hands the
model fixed-shape columnar batches directly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from warp_pipes_spark.pipes.collate import CollateField


def build_passages(spark: SparkSession) -> DataFrame:
    """Ragged passage rows as GeneratePassages would emit them, under the
    ``document.`` field prefix."""
    rows = [
        (0, 0, [101, 5, 6, 7, 102], [1, 1, 1, 1, 1]),
        (0, 1, [101, 8, 9, 102], [1, 1, 1, 1]),
        (1, 0, [101, 11, 102], [1, 1, 1]),
    ]
    return spark.createDataFrame(
        rows,
        "`document.idx` long, `document.passage_idx` int, "
        "`document.input_ids` array<long>, `document.attention_mask` array<long>",
    )


def run(spark: SparkSession) -> DataFrame:
    collate_docs = CollateField(
        field="document",
        pad_keys=["input_ids", "attention_mask"],
        length=6,
        pad_value=0,
    )
    return collate_docs(build_passages(spark))


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    run(get_spark(shuffle_partitions=4)).show(truncate=40)

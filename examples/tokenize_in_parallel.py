"""Tokenize two dotted-prefix fields through the combinator algebra.

Spark-first rewrite of the reference user guide's
``tokenize_in_parallel.py``: the same ``Parallel(Sequential(TokenizerPipe,
input_filter=HasPrefix(...)), ...)`` composition, but "in parallel" means
cluster-parallel Catalyst execution over a DataFrame — no process pool, no
dill. Offsets are emitted so downstream passages can slice source text
back out (the reference's ``return_offsets_mapping=True``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from warp_pipes_spark.core.condition import HasPrefix, In, Reduce
from warp_pipes_spark.io import with_row_id
from warp_pipes_spark.pipes.basics import FilterKeys, ReplaceInKeys
from warp_pipes_spark.pipes.pipelines import Parallel, Sequential
from warp_pipes_spark.pipes.tokenizer import RegexTokenizer

BATCH = [
    (
        0,
        "Fipple flutes are found in many cultures around the world. "
        "Often with six holes, the shepherd's pipe is a common pastoral "
        "image. Modern manufactured six-hole folk pipes are referred to "
        "as pennywhistle or tin whistle.",
        "Title: Pipe. ",
    ),
]


def build_batch(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BATCH, "`document.idx` long, `document.text` string, `title.text` string"
    )


def run(spark: SparkSession) -> DataFrame:
    # Each branch: gate its input to the field's columns (+ the shared
    # row_id the Parallel merge zips on), strip the prefix so the
    # tokenizer sees `text`, tokenize with the field's output prefix —
    # the reference CollateField's gate→strip→transform→re-prefix shape.
    def branch(field: str) -> Sequential:
        keep = Reduce(HasPrefix(field), In(["row_id"]), reduce_op=any)
        return Sequential(
            ReplaceInKeys(f"{field}.", ""),
            RegexTokenizer(text_col="text", prefix=f"{field}.", emit_offsets=True),
            FilterKeys(keep),  # emit only the new prefixed columns + row_id
            input_filter=keep,
        )

    # update=True: merge each branch's new columns back onto the input
    # batch (the reference example's `update=True`), zipped on row_id.
    tokenizer_pipe = Parallel(
        branch("document"), branch("title"), update=True
    )
    return tokenizer_pipe(with_row_id(build_batch(spark)))


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    out = run(get_spark(shuffle_partitions=4))
    out.show(truncate=60, vertical=True)

"""Top-k re-ranker engine.

Parity with the reference's ``TopkSearch`` (``warp_pipes/search/topk.py:21-87``):
given previous engine results, keep the k best per query. A pure window
operation — no data movement beyond the partition-by-query shuffle that the
result set already has."""

from __future__ import annotations

from pyspark.sql import DataFrame

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.search.result import topk_results


class TopkSearch(Pipe):
    def __init__(self, k: int = 10, **kwargs):
        super().__init__(**kwargs)
        self.k = k
        # like the reference, a re-ranker never merges with previous results
        self.merge_previous_results = False

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return topk_results(df, self.k)

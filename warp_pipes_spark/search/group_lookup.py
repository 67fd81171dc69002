"""Group-membership lookup engine.

Parity with the reference's ``GroupLookupSearch``
(``warp_pipes/search/group_lookup.py:22-121``): for each query carrying a
group id, return every corpus row belonging to that group, score 0 for hits.
The reference materializes a dense ``[n_groups, max_group_size]`` tensor;
relationally this is just a broadcast equi-join on the group key — no dense
table, no padding waste, and it scales to arbitrarily many groups."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class GroupLookupSearch(Pipe):
    def __init__(
        self,
        corpus: DataFrame,
        group_key: str = "group_id",
        corpus_id: str = "row_id",
        query_id: str = "query_id",
        query_group_key: str | None = None,
        broadcast: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.group_key = group_key
        self.corpus_id = corpus_id
        self.query_id = query_id
        self.query_group_key = query_group_key or group_key
        self.broadcast = broadcast

    _no_fingerprint = ("corpus",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        lookup = self.corpus.select(
            F.col(self.group_key).alias("__group"),
            F.col(self.corpus_id).alias("idx"),
        )
        if self.broadcast:
            lookup = F.broadcast(lookup)
        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.query_group_key).alias("__group"),
        )
        joined = q.join(lookup, on="__group", how="left")
        return joined.select(
            "query_id",
            F.coalesce(F.col("idx"), F.lit(-1)).alias("idx"),
            F.when(F.col("idx").isNotNull(), F.lit(0.0))
            .otherwise(F.lit(float("-inf")))
            .alias("score"),
        )

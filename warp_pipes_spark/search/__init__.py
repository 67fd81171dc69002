from warp_pipes_spark.search.result import (
    merge_results,
    pad_results,
    rrf_fuse,
    topk_results,
)
from warp_pipes_spark.search.topk import TopkSearch
from warp_pipes_spark.search.group_lookup import GroupLookupSearch
from warp_pipes_spark.search.bm25 import Bm25Search
from warp_pipes_spark.search.dense import DenseSearch
from warp_pipes_spark.search.index import Index
from warp_pipes_spark.search.auto import ENGINES, auto_engine, auto_index

__all__ = [
    "ENGINES",
    "auto_engine",
    "auto_index",
    "merge_results",
    "pad_results",
    "rrf_fuse",
    "topk_results",
    "TopkSearch",
    "GroupLookupSearch",
    "Bm25Search",
    "DenseSearch",
    "Index",
]

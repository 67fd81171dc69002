"""Custom Python data sources (Spark 4 Python Data Source API).

Fills the crawl-ingestion end of the pipeline: a WARC web-archive reader
(the standard storage format of web crawls feeding LLM corpora — no native
Spark source exists for it) and a deterministic synthetic-corpus generator
(batch + streaming) for tests and benchmarks that need unbounded input
without storage.

Register once per session::

    from warp_pipes_spark.sources import register_sources
    register_sources(spark)
    df = spark.read.format("warc").load("/path/to/*.warc")
"""

from __future__ import annotations

from warp_pipes_spark.sources.csv import (
    csv_to_parquet,
    read_csv,
    read_orc,
    to_orc,
)
from warp_pipes_spark.sources.jsonl import jsonl_to_parquet, read_jsonl
from warp_pipes_spark.sources.synthetic import SyntheticDocsDataSource
from warp_pipes_spark.sources.warc import WarcDataSource

__all__ = [
    "WarcDataSource",
    "SyntheticDocsDataSource",
    "register_sources",
    "read_jsonl",
    "jsonl_to_parquet",
    "read_csv",
    "csv_to_parquet",
    "to_orc",
    "read_orc",
]


def register_sources(spark) -> None:
    spark.dataSource.register(WarcDataSource)
    spark.dataSource.register(SyntheticDocsDataSource)

"""Deterministic synthetic-corpus generator as a Spark Python data source.

Batch mode generates ``num_docs`` seeded word-soup documents with zero
storage — each input partition generates its own id-slice from
``(seed, partition_index)``, so the same options always produce the same
rows at ANY parallelism (the generator is the partition plan, not a file
list). Streaming mode (``readStream``) emits the same documents in
deterministic micro-batches of ``batch_size`` via the simple-stream API,
giving streaming tests a replayable, offset-tracked source with no rate
limiter or external system.

Scale shape: generation is embarrassingly parallel and the per-partition
cost is O(docs_in_slice); ``num_partitions`` bounds task count. This is the
"unbounded benchmark input" source — at 100 TB you point the engine at real
WARC/Parquet, but plan-shape and soak tests want data whose size is a
parameter, not an artifact.
"""

from __future__ import annotations

import random
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"

_VOCAB = (
    "spark data table row column scan filter join group window sort merge "
    "hash batch stream query plan shuffle cache index token corpus sample "
    "split value key range stage task node executor driver metric"
).split()
_LANGS = ("en", "de", "fr", "es")
_SOURCES = ("web", "books", "code", "wiki")


def _gen_doc(seed: int, doc_id: int) -> Tuple[int, str, str, str]:
    rng = random.Random((seed << 32) ^ doc_id)
    n = rng.randint(20, 60)
    text = " ".join(rng.choice(_VOCAB) for _ in range(n))
    return (doc_id, text, rng.choice(_LANGS), rng.choice(_SOURCES))


class _SlicePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.num_docs = int(options.get("num_docs", 1000))
        self.seed = int(options.get("seed", 0))
        self.num_partitions = max(1, int(options.get("num_partitions", 8)))

    def partitions(self):
        per = -(-self.num_docs // self.num_partitions)  # ceil
        return [
            _SlicePartition(lo, min(lo + per, self.num_docs), self.seed)
            for lo in range(0, self.num_docs, per)
        ]

    def read(self, partition: _SlicePartition) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_doc(partition.seed, i)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"next": first_unemitted_doc_id}; each micro-batch emits the
    next ``batch_size`` documents until ``num_docs`` (then empty batches).
    Deterministic and replayable: readBetweenOffsets regenerates any range
    bit-identically, so checkpoint recovery replays exact data."""

    def __init__(self, options):
        self.num_docs = int(options.get("num_docs", 1000))
        self.seed = int(options.get("seed", 0))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.num_docs)
        return (
            iter([_gen_doc(self.seed, i) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_gen_doc(self.seed, i) for i in range(int(start["next"]), int(end["next"]))]
        )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("num_docs", N).load()``
    (batch) or ``spark.readStream.format("synthetic_docs")...`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return DOCS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)

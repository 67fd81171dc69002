"""WARC (Web ARChive, ISO 28500) reader as a Spark Python data source.

Web crawls — the raw feedstock of LLM pretraining corpora — ship as WARC
files; Spark has no native source for them. This reader implements the
public WARC/1.0 record framing: each record is a header block
(``WARC/1.0`` version line + ``Name: value`` lines, CRLF-terminated, blank
line ends the block) followed by exactly ``Content-Length`` payload bytes
and a ``CRLF CRLF`` record separator.

Scale shape: one ``InputPartition`` per WARC file — the standard crawl
layout is many ~1 GB files, so file-level parallelism saturates a cluster
without byte-range splitting (which plain-concatenated or per-record-gzip
WARCs would defeat anyway; this reader handles uncompressed ``.warc`` and
whole-file ``.warc.gz``). Records stream through a bounded buffer: memory
is O(record), not O(file).

Cited reference parity: the reference ingests corpora through HF datasets
(``warp_pipes/support/caching.py``); crawl-archive ingestion is a
north-star extension on the same "get documents into the engine" axis.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
from typing import Iterator, List, Tuple

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "content_type string, content_length long, payload binary"
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def parse_warc_stream(fh) -> Iterator[Tuple[str, str, str, str, int, bytes]]:
    """Yield (record_id, warc_type, target_uri, content_type,
    content_length, payload) per WARC record. Tolerant of leading blank
    lines between records; stops cleanly at EOF."""
    reader = io.BufferedReader(fh) if not isinstance(fh, io.BufferedReader) else fh
    while True:
        line = reader.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            raise ValueError(f"malformed WARC version line: {line[:40]!r}")
        headers = {}
        while True:
            hline = reader.readline()
            if not hline or hline in (b"\r\n", b"\n"):
                break
            if b":" in hline:
                k, v = hline.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        payload = reader.read(length)
        yield (
            headers.get(b"warc-record-id", b"").decode("utf-8", "replace"),
            headers.get(b"warc-type", b"").decode("utf-8", "replace"),
            headers.get(b"warc-target-uri", b"").decode("utf-8", "replace"),
            headers.get(b"content-type", b"").decode("utf-8", "replace"),
            length,
            payload,
        )


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")

    def _files(self) -> List[str]:
        if os.path.isdir(self.path):
            pats = [os.path.join(self.path, "*.warc"), os.path.join(self.path, "*.warc.gz")]
            files = [f for p in pats for f in glob.glob(p)]
        else:
            files = glob.glob(self.path)
        return sorted(files)

    def partitions(self):
        return [_WarcFilePartition(f) for f in self._files()]

    def read(self, partition: _WarcFilePartition):
        with _open(partition.path) as fh:
            yield from parse_warc_stream(fh)


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(path)`` — path may be a directory,
    a file, or a glob over ``.warc`` / ``.warc.gz`` files."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WarcReader(self.options)

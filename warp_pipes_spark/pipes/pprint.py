"""Debug/inspection pipes.

Capability parity with ``warp_pipes/pipes/pprint.py`` (PrintBatch ``:22-72``,
PrintContent ``:75-127``): tabular shape/type reports and content dumps.
Both are identity transforms (the input plan passes through untouched) with
a driver-side side effect, so they compose anywhere in a pipeline exactly
like the reference's versions — but report schema/plan facts instead of
eager batch shapes, since the plan is lazy."""

from __future__ import annotations

import sys
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from warp_pipes_spark.core.pipe import Pipe


def _type_name(dt: T.DataType) -> str:
    return dt.simpleString()


def _nesting_level(dt: T.DataType) -> int:
    level = 0
    while isinstance(dt, T.ArrayType):
        level += 1
        dt = dt.elementType
    return level


class PrintBatch(Pipe):
    """Report column name / type / nesting level (and optionally a row
    count, which triggers a job) to ``file``; returns the input unchanged."""

    def __init__(
        self,
        header: Optional[str] = None,
        count_rows: bool = False,
        file=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.header = header
        self.count_rows = count_rows
        self._file = file

    _no_fingerprint = ("_file",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = self._file or sys.stdout
        title = self.header or self.id
        print(f"=== {title} ===", file=out)
        if self.count_rows:
            print(f"rows: {df.count()}", file=out)
        width = max((len(c) for c in df.columns), default=0)
        for field in df.schema.fields:
            lvl = _nesting_level(field.dataType)
            print(
                f"  {field.name:<{width}}  {_type_name(field.dataType):<24}"
                f"  nesting={lvl}",
                file=out,
            )
        return df


class PrintContent(Pipe):
    """Dump the first ``n`` rows (vertical, untruncated) to ``file``;
    returns the input unchanged. Triggers a job for the sample."""

    def __init__(self, n: int = 5, header: Optional[str] = None, file=None, **kwargs):
        super().__init__(**kwargs)
        self.n = n
        self.header = header
        self._file = file

    _no_fingerprint = ("_file",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = self._file or sys.stdout
        title = self.header or self.id
        print(f"=== {title} ===", file=out)
        for i, row in enumerate(df.take(self.n)):
            print(f"--- row {i} ---", file=out)
            for k, v in row.asDict().items():
                print(f"  {k}: {v!r}", file=out)
        return df

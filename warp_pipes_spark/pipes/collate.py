"""Collation / row↔batch conversion and padding.

Capability parity with ``warp_pipes/pipes/collate.py``. Most of the
reference module converts between list-of-rows and columnar batches —
machinery Spark subsumes (DataFrames ARE columnar; Arrow batches flow
through ``mapInPandas``). What remains meaningful:

- ``FirstEg``  -> ``df.limit(1)``
- ``DeCollate``-> ``collect()`` / ``toLocalIterator()`` (driver-side escape)
- ``Padding``  -> pad array columns to fixed length (model boundary)
- ``CollateField`` -> per-field collate pipeline (gate on prefix, strip,
  tensorize/pad, re-prefix) — reproduced as a combinator composition.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.condition import HasKeyWithPrefix
from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.pipes.basics import AddPrefix, ReplaceInKeys
from warp_pipes_spark.pipes.pipelines import Gate, Sequential


class FirstEg(Pipe):
    """First example (reference ``collate.py:89-99``)."""

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.limit(1)


def decollate(df: DataFrame) -> Iterator[dict]:
    """Batch -> rows (reference ``DeCollate``, ``collate.py:70-86``);
    streaming iterator to avoid driver OOM on large results."""
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)


def pad_expr(col: Column, length: int, pad_value) -> Column:
    """Pad/truncate an array column to exactly ``length`` elements:
    ``concat(slice(col, 1, n), repeat(pad, n - size))`` — the relational
    form of ``tokenizer.pad`` (reference ``collate.py:160-174``)."""
    truncated = F.slice(col, 1, length)
    fill = F.array_repeat(F.lit(pad_value), F.greatest(F.lit(0), F.lit(length) - F.size(col)))
    return F.concat(truncated, fill)


class Padding(Pipe):
    """Pad token-sequence columns to fixed length (model boundary).
    ``special_values`` overrides the fill per column (the reference pads
    ``*attention_mask`` with 0 and ``*offset_mapping`` with (-1,-1),
    ``collate.py:160-174``)."""

    def __init__(
        self,
        keys: List[str],
        length: int,
        pad_value=0,
        special_values: Optional[dict] = None,
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.keys = list(keys)
        self.length = length
        self.pad_value = pad_value
        self.special_values = dict(special_values or {})

    def _columns(self, df: DataFrame, **kwargs):
        out = {}
        for k in self.keys:
            if k not in df.columns:
                continue
            fill = self.special_values.get(k, self.pad_value)
            out[k] = pad_expr(F.col(k), self.length, fill)
        return out


def CollateField(
    field: str,
    pad_keys: Optional[List[str]] = None,
    length: Optional[int] = None,
    pad_value=0,
) -> Pipe:
    """Per-field collate pipeline (reference ``CollateField``,
    ``collate.py:181-268``, built as Gate(Sequential(Collate,
    ReplaceInKeys, Parallel(tensorize, pad), AddPrefix))): gate on the
    dotted prefix being present, strip the prefix, pad the token keys,
    re-prefix. Collate/tensorize steps are identities in Spark (columnar
    already)."""
    prefix = f"{field}."
    steps = [ReplaceInKeys(prefix, "")]
    if pad_keys and length is not None:
        steps.append(Padding(pad_keys, length, pad_value))
    steps.append(AddPrefix(prefix))
    return Gate(HasKeyWithPrefix(prefix), Sequential(*steps), id=f"collate:{field}")

"""Column-level operators.

Capability parity with ``warp_pipes/pipes/basics.py`` (Identity..Partial,
lines 19-328). Every operator here is a pure projection: Catalyst collapses
chains of them into a single project node and pushes column pruning down to
the scan, so at 100 TB these cost exactly one pass that reads only the
referenced columns.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Mapping, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.condition import Condition, as_condition, select_columns
from warp_pipes_spark.core.pipe import Pipe

ColumnOp = Union[Column, Callable[[Column], Column], str]


def _apply_op(op: ColumnOp, col: Column) -> Column:
    """Interpret a per-column op: a Column expression, a Column->Column
    function, or a SQL expression string with `{col}` placeholder."""
    if isinstance(op, Column):
        return op
    if isinstance(op, str):
        return F.expr(op)
    return op(col)


class Identity(Pipe):
    """No-op (reference: ``basics.py:19-30``)."""

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df


class Lambda(Pipe):
    """Apply an arbitrary ``DataFrame -> DataFrame`` function
    (reference ``Lambda`` applies a fn to the whole batch, ``basics.py:33-63``)."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame], **kwargs):
        super().__init__(**kwargs)
        self.fn = fn

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return self.fn(df)


class GetKey(Pipe):
    """Keep a single column (``basics.py:66-78``)."""

    def __init__(self, key: str, **kwargs):
        super().__init__(**kwargs)
        self.key = key

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.select(F.col(f"`{self.key}`"))


class FilterKeys(Pipe):
    """Keep columns matching a Condition (``basics.py:81-92``).
    This is column pruning — Catalyst pushes it to the Parquet reader."""

    def __init__(self, condition, **kwargs):
        super().__init__(**kwargs)
        self.condition = as_condition(condition)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        keep = select_columns(df.columns, self.condition)
        # backtick-quote: dotted field names are plain columns, not paths
        return df.select(*[F.col(f"`{c}`") for c in keep])


class DropKeys(Pipe):
    """Drop columns by list or condition (``basics.py:95-126``)."""

    def __init__(self, keys: Union[Iterable[str], Condition], **kwargs):
        super().__init__(**kwargs)
        if isinstance(keys, (list, tuple, set)):
            self.keys = list(keys)
            self.condition = None
        else:
            self.keys = None
            self.condition = as_condition(keys)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        if self.keys is not None:
            return df.drop(*self.keys)
        drop = select_columns(df.columns, self.condition)
        return df.drop(*drop)


class AddPrefix(Pipe):
    """Rename every column ``k -> prefix + k`` (``basics.py:129-143``).
    Used for dotted-field namespacing (e.g. ``document.text``)."""

    def __init__(self, prefix: str, **kwargs):
        super().__init__(**kwargs)
        self.prefix = prefix

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.select(*[F.col(f"`{c}`").alias(self.prefix + c) for c in df.columns])


class ReplaceInKeys(Pipe):
    """Substring-replace in every column name (``basics.py:146-166``);
    ``ReplaceInKeys('document.', '')`` strips a field prefix."""

    def __init__(self, a: str, b: str, **kwargs):
        super().__init__(**kwargs)
        self.a = a
        self.b = b

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.select(
            *[F.col(f"`{c}`").alias(c.replace(self.a, self.b)) for c in df.columns]
        )


class RenameKeys(Pipe):
    """Rename via mapping; like the reference (``basics.py:169-186``) unmapped
    columns are DROPPED."""

    def __init__(self, mapping: Mapping[str, str], **kwargs):
        super().__init__(**kwargs)
        self.mapping = dict(mapping)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.select(
            *[F.col(f"`{old}`").alias(new) for old, new in self.mapping.items()]
        )


class Apply(Pipe):
    """Per-column ops ``{name: op}`` (``basics.py:189-220``). ``op`` may be a
    Column expression, a ``Column -> Column`` fn, or a SQL string. With
    ``element_wise=True`` the op is applied to each element of an array
    column via ``F.transform`` (flatten+apply+nest fused, no explode)."""

    def __init__(self, ops: Mapping[str, ColumnOp], element_wise: bool = False, **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.ops = dict(ops)
        self.element_wise = element_wise

    def _columns(self, df: DataFrame, **kwargs) -> Optional[Dict[str, Column]]:
        out: Dict[str, Column] = {}
        for name, op in self.ops.items():
            base = F.col(f"`{name}`") if name in df.columns else F.lit(None)
            if self.element_wise:
                out[name] = F.transform(base, lambda x: _apply_op(op, x))
            else:
                out[name] = _apply_op(op, base)
        return out


class ApplyToAll(Pipe):
    """One op applied to every column (``basics.py:223-263``)."""

    def __init__(self, op: ColumnOp, element_wise: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.op = op
        self.element_wise = element_wise

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        cols = select_columns(df.columns, self.input_filter)
        out: Dict[str, Column] = {}
        for c in cols:
            base = F.col(f"`{c}`")
            if self.element_wise:
                out[c] = F.transform(base, lambda x: _apply_op(self.op, x))
            else:
                out[c] = _apply_op(self.op, base)
        return out


class CopyBatch(Pipe):
    """Copy (``basics.py:266-289``) — DataFrames are immutable; alias only."""

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.alias(self.id)


class Partial(Pipe):
    """Bind kwargs to an inner pipe (``basics.py:292-328``)."""

    def __init__(self, pipe: Pipe, **bound):
        super().__init__()
        self.pipe = pipe
        self.bound = bound

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        merged = {**self.bound, **kwargs}
        return self.pipe.transform(df, **merged)

    def to_json_struct(self) -> dict:
        return {
            "__pipe__": "Partial",
            "pipe": self.pipe.to_json_struct(),
            "bound": {k: repr(v) for k, v in self.bound.items()},
        }

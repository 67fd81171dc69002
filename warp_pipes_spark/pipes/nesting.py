"""Nested-data algebra over ArrayType columns.

Capability parity with ``warp_pipes/pipes/nesting.py`` +
``warp_pipes/support/nesting.py`` (Flatten, Nest, ApplyAsFlatten,
NestedLevel1, Nested, Expand). The reference infers ragged nesting levels at
runtime (``support/shapes.py:162-179``); in Spark the nesting level IS the
ArrayType depth in the static schema, so shape inference is a schema
recursion (`nesting_level`), and the whole shapes module reduces to a few
lines.

Two physical strategies, chosen by the operator:

- **In-place** (preferred): ``F.transform`` applies an element function
  inside the array — flatten+apply+nest fused into one projection. No row
  multiplication, no shuffle, codegen-friendly.
- **Explode/re-nest** (general): ``posexplode`` rows out, apply an arbitrary
  row-level pipe, then ``groupBy(row_id).agg(collect_list)`` ordered by the
  saved position. Costs one shuffle on re-nest; requires a ``row_id``.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warp_pipes_spark.core.pipe import Pipe


def nesting_level(dtype: T.DataType) -> int:
    """ArrayType depth of a column type (the reference's
    ``infer_nesting_level`` over data, here over schema)."""
    level = 0
    while isinstance(dtype, T.ArrayType):
        level += 1
        dtype = dtype.elementType
    return level


def infer_missing_dims(total: int, shape: List[int]) -> List[int]:
    """np.reshape-style ``-1`` dimension inference (parity with
    ``support/shapes.py:182-203``)."""
    if -1 not in shape:
        return shape
    known = 1
    for s in shape:
        if s != -1:
            known *= s
    missing = total // known
    return [missing if s == -1 else s for s in shape]


class Flatten(Pipe):
    """Flatten an array column by ``level`` levels, multiplying rows
    (reference ``Flatten``: ``nesting.py:41-62``). Uses ``explode`` per
    level; positions are retained as ``{col}__pos_{i}`` so a later ``Nest``
    can rebuild the original shape."""

    def __init__(self, column: str, level: int = 1, keep_positions: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.column = column
        self.level = level
        self.keep_positions = keep_positions

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = df
        for i in range(self.level):
            pos_col = f"{self.column}__pos_{i}"
            others = [c for c in out.columns if c != self.column]
            out = out.select(
                *others, F.posexplode(self.column).alias(pos_col, self.column)
            )
            if not self.keep_positions:
                out = out.drop(pos_col)
        return out


class Nest(Pipe):
    """Inverse of Flatten: collect a flat column back into arrays of
    ``stride`` elements per group (reference ``Nest`` reshapes flat columns,
    ``nesting.py:65-115``). Order inside each group is pinned by
    ``order_col`` (a position column from Flatten or any total order) —
    Spark has no implicit row order, so ordering must be explicit."""

    def __init__(
        self,
        column: str,
        group_cols: List[str],
        order_col: str,
        out_col: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.column = column
        self.group_cols = list(group_cols)
        self.order_col = order_col
        self.out_col = out_col or column

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        collected = (
            df.groupBy(*self.group_cols)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col(self.order_col), F.col(self.column)))
                ).alias("__pairs")
            )
            .withColumn(
                self.out_col, F.transform("__pairs", lambda p: p[self.column])
            )
            .drop("__pairs")
        )
        return collected


class ApplyAsFlatten(Pipe):
    """Flatten → apply → re-nest, preserving shape (reference:
    ``nesting.py:118-335``, which asserts output shape == input shape at
    ``nesting.py:222-234``). Two modes:

    - ``fn`` = element-wise Column function: fused into nested
      ``F.transform`` calls — zero explode, zero shuffle, shape preservation
      by construction (the schema assertion holds statically).
    - ``pipe`` = an arbitrary row-level ``Pipe`` (the reference's dataset
      path, ``nesting.py:253-331``): the nested column(s) posexplode to rows
      (positions kept), the inner pipe runs over the flat rows, and the
      outputs re-nest order-pinned under the original shape — with the
      reference's runtime shape assertion (``F.assert_true`` on the rebuilt
      array sizes). One shuffle per nesting level on the (row, position)
      keys. ``extra_cols`` are co-flattened token-aligned columns (lockstep
      explode via ``arrays_zip``); every column the pipe ADDS is re-nested
      alongside. The inner pipe must be row-preserving (assert catches
      violations) and must keep the ``__aaf_*`` bookkeeping columns (any
      ``update=True`` pipe does)."""

    def __init__(
        self,
        column: str,
        fn: Optional[Callable[[Column], Column]] = None,
        level: int = 1,
        pipe: Optional[Pipe] = None,
        extra_cols: Optional[List[str]] = None,
        id_col: Optional[str] = None,
        check_shape: bool = True,
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        if (fn is None) == (pipe is None):
            raise ValueError("ApplyAsFlatten: pass exactly one of fn= or pipe=")
        self.column = column
        self.fn = fn
        self.pipe = pipe
        self.level = level
        self.extra_cols = list(extra_cols or [])
        self.id_col = id_col
        self.check_shape = check_shape

    def _check_level(self, df: DataFrame) -> None:
        col_level = nesting_level(df.schema[self.column].dataType)
        if col_level < self.level:
            raise ValueError(
                f"ApplyAsFlatten: column {self.column!r} has nesting level "
                f"{col_level}, need >= {self.level}"
            )

    def _columns(self, df: DataFrame, **kwargs):
        if self.pipe is not None:
            return None
        self._check_level(df)

        def rec(col: Column, depth: int) -> Column:
            if depth == 0:
                return self.fn(col)
            return F.transform(col, lambda x: rec(x, depth - 1))

        return {self.column: rec(F.col(self.column), self.level)}

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        self._check_level(df)
        cols = [self.column, *self.extra_cols]
        work = df
        idc = self.id_col
        if idc is None:
            idc = "__aaf_id"
            work = work.withColumn(idc, F.monotonically_increasing_id())
        carried = [c for c in work.columns if c not in cols]
        pos_cols: List[str] = []
        size_cols: List[str] = []
        for lv in range(self.level):
            pc, szc = f"__aaf_pos{lv}", f"__aaf_n{lv}"
            zipped = (
                F.arrays_zip(*[F.col(c).alias(c) for c in cols])
                if len(cols) > 1
                else F.col(cols[0])
            )
            # posexplode_outer keeps empty/null-array rows as a (null, null)
            # sentinel so the row (and its carried columns) survives the
            # round-trip; sentinels are dropped again at re-nest
            work = work.select(
                *carried,
                *pos_cols,
                *size_cols,
                F.size(zipped).alias(szc),
                F.posexplode_outer(zipped).alias(pc, "__aaf_v"),
            )
            if len(cols) > 1:
                work = work.select(
                    "*", *[F.col(f"__aaf_v.{c}").alias(c) for c in cols]
                ).drop("__aaf_v")
            else:
                work = work.withColumnRenamed("__aaf_v", cols[0])
            pos_cols.append(pc)
            size_cols.append(szc)

        out = self.pipe.transform(work, **kwargs)
        missing = [c for c in [idc, *pos_cols, *size_cols] if c not in out.columns]
        if missing:
            raise ValueError(
                f"ApplyAsFlatten: inner pipe dropped bookkeeping columns "
                f"{missing}; it must preserve non-target columns (update=True)"
            )

        helper = {idc, *pos_cols, *size_cols} if self.id_col is None else {*pos_cols, *size_cols}
        new_cols = [
            c
            for c in out.columns
            if c not in carried and c not in pos_cols and c not in size_cols
        ]
        for lv in reversed(range(self.level)):
            pc, szc = pos_cols[lv], size_cols[lv]
            keys = [idc, *pos_cols[:lv]]
            other = [
                c
                for c in out.columns
                if c not in new_cols and c not in keys and c not in (pc, szc)
            ]
            packed = (
                out.groupBy(*keys)
                .agg(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(pc).alias("__p"),
                                *[F.col(c).alias(c) for c in new_cols],
                            )
                        )
                    ).alias("__aaf_packed"),
                    F.first(szc).alias(szc),
                    *[F.first(c).alias(c) for c in other],
                )
            )
            elems = F.filter(F.col("__aaf_packed"), lambda s: s["__p"].isNotNull())

            def _field(name):
                # closure factory, NOT a default-arg lambda: a 2-param lambda
                # would be read by F.transform as (element, index)
                return lambda s: s[name]

            for c in new_cols:
                base = F.transform(elems, _field(c))
                # NULL source arrays (size() == -1) round-trip to NULL
                arr = F.when(F.col(szc) >= 0, base)
                if self.check_shape:
                    # the reference's runtime shape assertion
                    # (nesting.py:222-234): the rebuilt array must have
                    # exactly the source length at this level
                    ok = (F.col(szc) < 0) | (F.size(base) == F.col(szc))
                    arr = F.when(
                        F.assert_true(
                            ok, "ApplyAsFlatten: inner pipe changed the flattened shape"
                        ).isNull(),
                        arr,
                    )
                packed = packed.withColumn(c, arr)
            out = packed.drop("__aaf_packed", szc)
        return out.drop(*[c for c in helper if c in out.columns])


class NestedLevel1(Pipe):
    """Apply an array-level function to each row's level-1 group as its own
    batch — enables within-group sort/filter (reference ``NestedLevel1``:
    ``nesting.py:338-379``; its tests sort/drop within groups). ``fn`` maps
    an ArrayType Column to an ArrayType Column: use ``F.filter``,
    ``F.array_sort``, ``F.reverse``, ``F.slice`` etc.

    Note: unlike the reference, changing the group size is ALLOWED (ragged
    output arrays are first-class in Spark); the reference requires
    equal-size groups only to re-concatenate into rectangular batches
    (``nesting.py:364-375``) — a constraint its storage imposes, not the
    semantics."""

    def __init__(self, column: str, fn: Callable[[Column], Column], **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.column = column
        self.fn = fn

    def _columns(self, df: DataFrame, **kwargs):
        return {self.column: self.fn(F.col(self.column))}


class Nested(Pipe):
    """Apply an array-level fn at depth ``level`` (reference ``Nested`` =
    ApplyAsFlatten(NestedLevel1(pipe), level-1), ``nesting.py:382-403``):
    outer levels are traversed with ``F.transform``, the innermost array is
    handed to ``fn``."""

    def __init__(self, column: str, fn: Callable[[Column], Column], level: int = 1, **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.column = column
        self.fn = fn
        self.level = level

    def _columns(self, df: DataFrame, **kwargs):
        def rec(col: Column, depth: int) -> Column:
            if depth == 1:
                return self.fn(col)
            return F.transform(col, lambda x: rec(x, depth - 1))

        return {self.column: rec(F.col(self.column), self.level)}


class Expand(Pipe):
    """Insert an axis and repeat ``n`` times (reference ``Expand``:
    ``nesting.py:406-426``): ``axis=0``-style row repetition =
    ``explode(array_repeat)``, in-place new axis = ``array_repeat``."""

    def __init__(self, column: str, n: int, as_rows: bool = False, **kwargs):
        kwargs.setdefault("update", not as_rows)
        super().__init__(**kwargs)
        self.column = column
        self.n = n
        self.as_rows = as_rows

    def _columns(self, df: DataFrame, **kwargs):
        if self.as_rows:
            return None
        return {self.column: F.array_repeat(F.col(self.column), self.n)}

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        others = [c for c in df.columns if c != self.column]
        return df.select(
            *others,
            F.explode(F.array_repeat(F.col(self.column), self.n)).alias(self.column),
        )

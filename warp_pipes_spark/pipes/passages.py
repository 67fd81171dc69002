"""Passage (chunk) generation: fixed-size strided windows with ownership masks.

Capability parity with ``warp_pipes/pipes/passages.py`` (``gen_passages``
``:292-368`` and ``GeneratePassages`` ``:16-289``): split each document's
token sequence into windows of ``size`` with step ``stride``, optionally
padded to full size, and emit for every window an **ownership mask** that
assigns every input token to exactly one window (the reference's core
invariant, tested at ``tests/pipes/test_passages.py:63-86``): overlapping
margins are split midway between neighboring windows.

This is a 1-row -> N-rows operator, i.e. ``explode`` semantics. Everything
is built from array expressions (sequence/slice/transform/posexplode) —
JVM-side, no Python in the hot path — so passage generation runs at scan
speed over 100 TB of token arrays.

Window algebra for window starting at ``s`` (0-based), ending at
``e = min(s + size, n)``:

- ownership start ``os = s + ceil((size - stride) / 2)`` for every window
  except the first (``os = 0``);
- ownership end ``oe = e`` for the last window, else
  ``oe = next_os`` (the next window's ownership start);

which partitions ``[0, n)`` exactly like the reference's margin split
(``passages.py:340-344``: left margin = floor(margin/2) kept by previous,
right margin = margin - floor(margin/2) taken by next).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class GeneratePassages(Pipe):
    """Explode token-array columns into passage rows.

    Parameters mirror the reference: ``size``, ``stride``, ``pad_value``
    (None = keep ragged tails), ``field_cols`` = token-aligned array columns
    windowed coherently (e.g. input_ids + attention_mask + offsets),
    ``global_cols`` = per-document scalars carried onto every passage
    (reference ``global_keys``, ``passages.py:219-241``).

    Output: one row per passage with ``passage_idx``, windowed arrays, the
    ownership mask ``passage_mask`` (array<int> aligned with the window:
    1 = this passage owns the token), and the originals of ``global_cols``."""

    def __init__(
        self,
        token_col: str,
        size: int,
        stride: Optional[int] = None,
        field_cols: Optional[List[str]] = None,
        global_cols: Optional[List[str]] = None,
        pad_value=None,
        pad_values: Optional[dict] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.token_col = token_col
        self.size = size
        self.stride = stride if stride is not None else size
        if self.stride > size:
            raise ValueError("stride must be <= size (windows must tile the input)")
        self.field_cols = list(field_cols or [])
        self.global_cols = list(global_cols or [])
        self.pad_value = pad_value
        self.pad_values = dict(pad_values or {})

    def _window(self, col: Column, start: Column, fill) -> Column:
        w = F.slice(col, start + 1, self.size)  # slice() is 1-based
        if fill is None:
            return w
        pad = F.array_repeat(
            F.lit(fill), F.greatest(F.lit(0), F.lit(self.size) - F.size(w))
        )
        return F.concat(w, pad)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        size, stride = self.size, self.stride
        n = F.size(F.col(self.token_col))
        # 0-based window starts: 0, stride, 2*stride, ... while start < n
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
        n_windows = F.size(starts)
        overlap = size - stride
        left_keep = overlap // 2  # tokens of the overlap kept by the previous window

        exploded = df.select(
            *[c for c in df.columns],
            F.posexplode(starts).alias("passage_idx", "__start"),
        ).filter((n > 0) & (F.col("__start") < n))

        own_start = F.when(
            F.col("passage_idx") == 0, F.lit(0)
        ).otherwise(F.col("__start") + F.lit(overlap - left_keep))
        is_last = F.col("passage_idx") == F.size(
            F.sequence(F.lit(0), F.greatest(F.size(F.col(self.token_col)) - 1, F.lit(0)), F.lit(stride))
        ) - 1
        win_end = F.least(F.col("__start") + F.lit(size), F.size(F.col(self.token_col)))
        next_own_start = F.col("__start") + F.lit(stride) + F.lit(overlap - left_keep)
        own_end = F.when(is_last, win_end).otherwise(F.least(next_own_start, win_end))

        # ownership mask aligned with the (unpadded) window
        token_positions = F.sequence(
            F.col("__start"),
            win_end - 1,
        )
        mask = F.transform(
            token_positions,
            lambda p: ((p >= own_start) & (p < own_end)).cast("int"),
        )
        mask_fill = self.pad_values.get("passage_mask", 0)
        if self.pad_value is not None:
            mask = F.concat(
                mask,
                F.array_repeat(
                    F.lit(mask_fill), F.greatest(F.lit(0), F.lit(size) - F.size(mask))
                ),
            )

        windowed = {
            self.token_col: self._window(
                F.col(self.token_col), F.col("__start"), self.pad_value
            )
        }
        for c in self.field_cols:
            fill = self.pad_values.get(c, self.pad_value)
            windowed[c] = self._window(F.col(c), F.col("__start"), fill)
        # Alias windowed arrays to temp names first: re-using the source column
        # name in the same projection would let Spark's lateral-column-alias
        # resolution bind the mask lambda's references to the *windowed* array
        # instead of the original, corrupting win_end/own_end.
        out_cols = [
            *[F.col(c) for c in self.global_cols],
            F.col("passage_idx"),
            *[expr.alias(f"__w_{name}") for name, expr in windowed.items()],
            mask.alias("passage_mask"),
        ]
        staged = exploded.select(*out_cols)
        return staged.select(
            *self.global_cols,
            "passage_idx",
            *[F.col(f"__w_{name}").alias(name) for name in windowed],
            "passage_mask",
        )

"""Passage (chunk) generation: fixed-size strided windows with ownership masks.

Capability parity with ``warp_pipes/pipes/passages.py`` (``gen_passages``
``:292-368`` and ``GeneratePassages`` ``:16-289``): split each document's
token sequence into windows of ``size`` with step ``stride``, optionally
padded to full size, optionally wrapped in per-key start/end tokens
([CLS]/[SEP]-style, ``passages.py:219-241``), and emit for every window an
**ownership mask** that assigns every input token to exactly one window
(the reference's core invariant, tested at
``tests/pipes/test_passages.py:63-86``): overlapping margins are split
midway between neighboring windows.

This is a 1-row -> N-rows operator, i.e. ``explode`` semantics. Everything
is built from array expressions (sequence/slice/transform/posexplode) —
JVM-side, no Python in the hot path — so passage generation runs at scan
speed over 100 TB of token arrays.

Window algebra (mirroring ``gen_passages``): with ``ns``/``ne`` start/end
tokens per window, the *effective* window over the source sequence is
``eff_size = size - ns - ne`` advancing by ``eff_stride = stride - ns - ne``;
``margin = eff_size - eff_stride``; window ``i`` starting at source offset
``s = i * eff_stride``:

- ``left_pad  = ceil(margin/2)`` for every window except the first (0);
- ``right_pad = floor(margin/2)``;
- a window is emitted only when it owns at least one token
  (``win_len > left_pad``, the reference's "only return if there are
  unmasked tokens" rule);
- mask position ``p`` (over the emitted passage incl. injected tokens) is 1
  iff ``ns + left_pad <= p < ns + eff_size - right_pad`` and ``p`` lies
  before the pad region — the reference's fixed-array mask reproduced as a
  closed form (including its behavior on ragged tails).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


def hf_field_tokens(start_tokens: List, end_tokens: List) -> Dict[str, Dict[str, List]]:
    """Per-key start/end values for the standard HF column triple, mirroring
    the reference's ``get_passage_args`` (``passages.py:219-241``):
    input_ids get the real tokens, attention_mask gets 1s, offset_mapping
    gets (-1, -1) sentinel spans."""
    return {
        "input_ids": {"start": list(start_tokens), "end": list(end_tokens)},
        "attention_mask": {
            "start": [1 for _ in start_tokens],
            "end": [1 for _ in end_tokens],
        },
        "offset_mapping": {
            "start": [[-1, -1] for _ in start_tokens],
            "end": [[-1, -1] for _ in end_tokens],
        },
    }


class GeneratePassages(Pipe):
    """Explode token-array columns into passage rows.

    Parameters mirror the reference: ``size``, ``stride``, ``pad_value``
    (None = keep ragged tails), ``field_cols`` = token-aligned array columns
    windowed coherently (e.g. input_ids + attention_mask + offsets),
    ``global_cols`` = per-document scalars carried onto every passage
    (reference ``global_keys``), ``start_tokens``/``end_tokens`` = per-key
    injected window prefix/suffix (reference ``passages.py:219-241``; pass a
    plain list to apply to ``token_col`` only, or a ``{col: list}`` dict
    covering ``field_cols`` too — every key must inject the SAME count so
    columns stay token-aligned).

    ``prepend_cols`` mirrors the reference's ``prepend_field``
    (``passages.py:48``, applied at ``:244-271``): the named array column's
    per-row contents (e.g. the tokenized title) are injected after the static
    ``start_tokens`` of EVERY window of that document, so the effective
    window over the source shrinks per row by the prepend length — exactly
    the reference's ``start_tokens += aux_input_ids`` rule. Pass a plain
    column name to prepend to ``token_col`` only, or a ``{col: prepend_col}``
    dict covering ``field_cols`` too (each windowed column gets its own
    aligned prepend source, reference ``get_eg_args``). A row whose prepend
    array leaves no effective window (``size - starts - prepend - ends <=
    0``) fails at runtime with Spark's sequence-bounds error — size your
    windows above the longest title, as the reference requires.

    Output: one row per passage with ``passage_idx``, windowed arrays, the
    ownership mask ``passage_mask`` (array<int> aligned with the emitted
    passage incl. injected tokens: 1 = this passage owns the token), and the
    originals of ``global_cols``."""

    def __init__(
        self,
        token_col: str,
        size: int,
        stride: Optional[int] = None,
        field_cols: Optional[List[str]] = None,
        global_cols: Optional[List[str]] = None,
        pad_value=None,
        pad_values: Optional[dict] = None,
        start_tokens: Union[List, Dict[str, List], None] = None,
        end_tokens: Union[List, Dict[str, List], None] = None,
        prepend_cols: Union[str, Dict[str, str], None] = None,
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
        self.start_tokens = self._norm_tokens(start_tokens, "start_tokens")
        self.end_tokens = self._norm_tokens(end_tokens, "end_tokens")
        self.prepend_cols = self._norm_prepend(prepend_cols)
        self.n_start = len(next(iter(self.start_tokens.values()), []))
        self.n_end = len(next(iter(self.end_tokens.values()), []))
        self.eff_size = size - self.n_start - self.n_end
        self.eff_stride = self.stride - self.n_start - self.n_end
        if self.eff_size <= 0 or self.eff_stride <= 0:
            raise ValueError(
                "start/end tokens leave no effective window "
                f"(eff_size={self.eff_size}, eff_stride={self.eff_stride})"
            )

    def _norm_prepend(self, prepend) -> Dict[str, str]:
        if prepend is None:
            return {}
        if isinstance(prepend, str):
            if self.field_cols:
                raise ValueError(
                    "prepend_cols: pass a {col: prepend_col} dict when "
                    "field_cols are windowed too (every windowed column must "
                    "inject the same per-row count to stay token-aligned)"
                )
            return {self.token_col: prepend}
        windowed = {self.token_col, *self.field_cols}
        if set(prepend) != windowed:
            raise ValueError(
                f"prepend_cols keys {sorted(prepend)} must cover exactly the "
                f"windowed columns {sorted(windowed)}"
            )
        return dict(prepend)

    def _norm_tokens(self, tokens, what: str) -> Dict[str, List]:
        if tokens is None:
            return {}
        if isinstance(tokens, dict):
            lens = {len(v) for v in tokens.values()}
            if len(lens) > 1:
                raise ValueError(f"{what}: all keys must inject the same count")
            return {k: list(v) for k, v in tokens.items()}
        if self.field_cols:
            raise ValueError(
                f"{what}: pass a {{col: tokens}} dict when field_cols are "
                "windowed too (each column needs its own injected values)"
            )
        return {self.token_col: list(tokens)}

    def _window(self, name: str, start: Column, win_len: Column, eff_size) -> Column:
        """Windowed array for one column: start tokens + per-row prepend +
        source slice + end tokens + optional padding to full ``size``.
        ``eff_size`` is an int (static path) or a per-row Column (prepend
        path — the reference's per-example shrunken window)."""
        col = F.col(f"`{name}`")
        parts = []
        if self.n_start:
            parts.append(F.array(*[F.lit(v) for v in self.start_tokens[name]]))
        if self.prepend_cols:
            parts.append(
                F.coalesce(F.col(f"`{self.prepend_cols[name]}`"), F.array())
            )
        parts.append(F.slice(col, start + 1, eff_size))  # slice() is 1-based
        if self.n_end:
            parts.append(F.array(*[F.lit(v) for v in self.end_tokens[name]]))
        fill = self.pad_values.get(name, self.pad_value)
        if self.pad_value is not None:
            parts.append(
                F.array_repeat(
                    F.lit(fill), F.greatest(F.lit(0), (eff_size - win_len).cast("int"))
                )
            )
        return F.concat(*parts) if len(parts) > 1 else parts[0]

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        ns, ne = self.n_start, self.n_end
        if self.prepend_cols:
            # Per-row window algebra (reference get_eg_args: start_tokens +=
            # aux tokens): everything the static path computes as a Python
            # int becomes a Column derived from the prepend array's length.
            pre_len = F.size(
                F.coalesce(
                    F.col(f"`{self.prepend_cols[self.token_col]}`"), F.array()
                )
            )
            ns = F.lit(self.n_start) + pre_len
            eff_size = F.lit(self.size) - ns - F.lit(ne)
            eff_stride = F.lit(self.stride) - ns - F.lit(ne)
            margin = eff_size - eff_stride
            left_pad = ((margin + F.lit(1)) / F.lit(2)).cast("int")
            right_pad = (margin / F.lit(2)).cast("int")
        else:
            eff_size, eff_stride = self.eff_size, self.eff_stride
            margin = eff_size - eff_stride
            left_pad = margin // 2 + margin % 2  # reference: ceil for i > 0
            right_pad = margin // 2

        if self.n_start and self.field_cols:
            missing = [
                c
                for c in [self.token_col, *self.field_cols]
                if c not in self.start_tokens
            ]
            if missing:
                raise ValueError(f"start_tokens missing for columns {missing}")
        if self.n_end and self.field_cols:
            missing = [
                c for c in [self.token_col, *self.field_cols] if c not in self.end_tokens
            ]
            if missing:
                raise ValueError(f"end_tokens missing for columns {missing}")

        n = F.size(F.col(f"`{self.token_col}`"))
        # 0-based window starts: 0, eff_stride, ... while start < n
        step = eff_stride if isinstance(eff_stride, Column) else F.lit(eff_stride)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), step)

        exploded = df.select(
            *[F.col(f"`{c}`") for c in df.columns],
            F.posexplode(starts).alias("passage_idx", "__start"),
        ).filter((n > 0) & (F.col("__start") < n))

        src_n = F.size(F.col(f"`{self.token_col}`"))
        win_len = F.least(F.col("__start") + eff_size, src_n) - F.col("__start")
        lp_w = F.when(F.col("passage_idx") == 0, F.lit(0)).otherwise(left_pad)
        # the reference's skip rule (gen_passages: "only return if there are
        # unmasked tokens"): a window whose tokens are all owned by its
        # predecessor is not emitted
        exploded = exploded.filter(win_len > lp_w)

        padding = (
            F.greatest(F.lit(0), (eff_size - win_len).cast("int"))
            if self.pad_value is not None
            else F.lit(0)
        )
        out_len = ns + win_len + ne + padding
        ones_lo = ns + lp_w
        ones_hi = ns + eff_size - right_pad
        unpadded = out_len - padding
        mask = F.transform(
            F.sequence(F.lit(0), out_len - 1),
            lambda p: ((p >= ones_lo) & (p < ones_hi) & (p < unpadded)).cast("int"),
        )

        windowed = {
            name: self._window(name, F.col("__start"), win_len, eff_size)
            for name in [self.token_col, *self.field_cols]
        }
        # Alias windowed arrays to temp names first: re-using the source column
        # name in the same projection would let Spark's lateral-column-alias
        # resolution bind the mask lambda's references to the *windowed* array
        # instead of the original, corrupting win_len/ones_hi.
        out_cols = [
            *[F.col(f"`{c}`") for c in self.global_cols],
            F.col("passage_idx"),
            *[expr.alias(f"__w_{name}") for name, expr in windowed.items()],
            mask.alias("passage_mask"),
        ]
        staged = exploded.select(*out_cols)
        return staged.select(
            *[F.col(f"`{c}`") for c in self.global_cols],
            "passage_idx",
            *[F.col(f"`__w_{name}`").alias(name) for name in windowed],
            "passage_mask",
        )

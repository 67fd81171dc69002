"""Dataset utilities (SURVEY §2.9 parity).

- ``TakeSubset`` — seeded random / fractional / head subset
  (``warp_pipes/support/datasets_utils.py:22-62``): ``df.sample`` for
  fractions, seeded hash-order limit for exact-n (deterministic regardless
  of partitioning, unlike ``limit`` after ``sample``).
- ``concat_rows`` — axis-0 concatenation = ``unionByName``
  (``datasets_utils.py:130-147``).
- ``concat_columns`` — axis-1 concatenation = join on ``row_id``; the
  reference binds columns positionally, which has no distributed meaning —
  the explicit row_id contract replaces it (SURVEY §7.4 risk 1).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class TakeSubset(Pipe):
    """Deterministic subset: ``fraction`` -> seeded Bernoulli sample;
    ``n`` -> first n rows in seeded-hash order (stable across partitioning);
    both -> sample then exact-n."""

    def __init__(
        self,
        n: Optional[int] = None,
        fraction: Optional[float] = None,
        seed: int = 0,
        key_col: Optional[str] = "row_id",
        **kwargs,
    ):
        if n is None and fraction is None:
            raise ValueError("TakeSubset needs n and/or fraction")
        super().__init__(**kwargs)
        self.n = n
        self.fraction = fraction
        self.seed = seed
        self.key_col = key_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = df
        if self.fraction is not None:
            out = out.sample(fraction=self.fraction, seed=self.seed)
        if self.n is not None:
            if self.key_col and self.key_col in out.columns:
                out = out.orderBy(
                    F.xxhash64(F.col(self.key_col), F.lit(self.seed))
                ).limit(self.n)
            else:
                out = out.limit(self.n)
        return out


def concat_rows(*dfs: DataFrame, allow_missing_columns: bool = False) -> DataFrame:
    """Axis-0 concat: union by column name."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing_columns)
    return out


def concat_columns(
    a: DataFrame, b: DataFrame, on: str = "row_id", how: str = "inner"
) -> DataFrame:
    """Axis-1 concat: join on the stable row id (the reference's positional
    column-bind has no meaning under distributed partitioning)."""
    dup = [c for c in b.columns if c != on and c in a.columns]
    if dup:
        raise ValueError(f"concat_columns: overlapping columns {dup}")
    return a.join(b, on=on, how=how)

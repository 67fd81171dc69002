"""Skew-handling plan utilities for 100 TB workloads.

AQE's skew-join splitting (enabled in the session factory) handles most
sort-merge skew transparently; these helpers cover the two cases it does
not:

- ``salted_join``: an equi-join where a handful of hot keys dominate one
  side. The hot side gets a random salt in ``[0, n_salts)``; the other side
  is replicated ``n_salts`` times, so one hot key spreads over ``n_salts``
  shuffle partitions. Result set is identical to the unsalted join.
- ``salted_collect_list``: ``groupBy(key).collect_list`` has no map-side
  partial aggregation (the list is the whole point), so one hot key funnels
  every row to a single task. Two-stage salting: collect per (key, salt),
  then flatten the per-salt chunks. Order within the list is pinned by an
  explicit sort column, so the result is deterministic (Spark's
  collect_list is otherwise shuffle-order-dependent).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side: salt the skewed
    rows, replicate the ``other`` side across all salts, join on
    key + salt, drop the salt. Supports inner and left joins (the
    replicated side must be the lookup side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt = (F.rand(seed) * n_salts).cast("int")
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(o, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def salted_collect_list(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    order_col: str,
    n_salts: int = 16,
    out_col: Optional[str] = None,
    seed: int = 42,
) -> DataFrame:
    """groupBy(key).collect_list(value) with bounded per-task fan-in:
    stage 1 collects per (key, salt) chunk, stage 2 concatenates the chunks
    and sorts by ``order_col`` so the final list order is deterministic.

    Emits ``key_cols + [out_col]`` where ``out_col`` is the ordered list of
    ``value_col``."""
    out_col = out_col or f"{value_col}s"
    salt = (F.rand(seed) * n_salts).cast("int")
    staged = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v"))).alias(
                "__chunk"
            )
        )
    )
    merged = staged.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("__chunk")).alias("__all")
    )
    ordered = F.transform(F.array_sort("__all"), lambda s: s["v"])
    return merged.select(*key_cols, ordered.alias(out_col))

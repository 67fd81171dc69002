"""Incremental aggregate maintenance: mergeable partial-aggregate state.

At 100 TB the daily pipeline never re-aggregates history — it maintains a
per-group STATE of mergeable partials (count / decimal sum / min / max) and
folds each new batch in: ``new_state = merge(state, partials(batch))``. The
merge cost is O(|state groups| + |batch groups|) — one shuffle on the group
key, independent of how much history the state summarizes. Write the state
bucketed on the group key (``io.write_bucketed``) and even that shuffle
disappears on the state side.

The partials are chosen to be ASSOCIATIVE and order-free:

- ``n``   — exact count (long)
- ``s``   — sum of DECIMAL-cast values (exact, order/partitioning-proof;
            the same cast discipline as every catalog aggregate)
- ``mn`` / ``mx`` — min / max

so any split of the input into batches, merged in any order, yields the
bit-identical state as one direct aggregation — the invariant the oracle
(direct GROUP BY over the full input) and the property tests pin.
``finalize`` derives the presentation row (sum/avg as DOUBLE) from state.

Same pattern as the streaming incremental term counts
(``streaming/events.py``), generalized to batch state maintenance.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

_DEC = "decimal(28,4)"


def partial_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One batch -> mergeable partials per group (map-side combined by
    Catalyst; the only wide operation is the groupBy on the keys)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).cast(_DEC).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def merge_states(state: DataFrame, other: DataFrame, keys: Sequence[str]) -> DataFrame:
    """merge(state, state) -> state; associative + commutative, so batches
    can fold in any order (property-tested)."""
    return (
        state.unionByName(other)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").cast(_DEC).alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def finalize_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """State -> presentation row: exact decimal sum rendered as DOUBLE,
    avg = s/n divided in decimal then rendered (both engine and oracle
    divide the identical exact operands)."""
    return state.select(
        *keys,
        F.col("n"),
        F.col("s").cast("double").alias("sum_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
        (F.col("s") / F.col("n")).cast("decimal(28,8)").cast("double").alias("avg_value"),
    )


class IncrementalAgg(Pipe):
    """Pipe form: input = the NEW batch; ``state`` (optional) = the
    previously-maintained partials. Returns the UPDATED state (or the
    finalized presentation when ``finalize=True``)."""

    def __init__(
        self,
        keys: List[str],
        value_col: str,
        state: Optional[DataFrame] = None,
        finalize: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.keys = list(keys)
        self.value_col = value_col
        self.state = state
        self.finalize = finalize

    _no_fingerprint = ("state",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        inc = partial_state(df, self.keys, self.value_col)
        out = inc if self.state is None else merge_states(self.state, inc, self.keys)
        return finalize_state(out, self.keys) if self.finalize else out

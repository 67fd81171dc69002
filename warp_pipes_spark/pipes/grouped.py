"""Grouped-map operator: the UDAF/grouped-transform extension surface.

Completes the UDF coverage triad (SURVEY §2.10): scalar pandas UDFs
(element-wise), ``mapInPandas`` (table-function, 1->N rows), and this —
``groupBy().applyInPandas`` (grouped map: each group arrives as one pandas
DataFrame, the function returns any number of rows). The reference's only
extension mechanism is "subclass Pipe / pass a callable"
(``warp_pipes/pipes/basics.py:33-63``); this is the grouped form of that
hook.

Scale notes: one shuffle on the group key; a single group must fit in one
executor's memory (Arrow-batched within the group). For skewed keys,
pre-aggregate or salt (see ``warp_pipes_spark.plans.skew``).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from warp_pipes_spark.core.pipe import Pipe


class GroupedApply(Pipe):
    """``df.groupBy(group_cols).applyInPandas(fn, schema)`` as a Pipe.

    ``fn``: pandas DataFrame (one group) -> pandas DataFrame rows;
    ``schema``: output schema DDL string (must include any group columns
    the caller wants carried through)."""

    def __init__(
        self,
        group_cols: Sequence[str],
        fn: Callable,
        schema: str,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.group_cols = list(group_cols)
        self.fn = fn
        self.schema = schema

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.groupBy(*self.group_cols).applyInPandas(self.fn, schema=self.schema)

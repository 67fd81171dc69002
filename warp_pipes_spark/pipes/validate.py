"""Data-quality validation operators (profile + constraint checks).

Extensions beyond the reference (north-star additions): a 100 TB ingest
pipeline needs machine-checkable data quality gates *inside* the engine —
per-column profiles (completeness, cardinality, extremes) and declarative
constraint checks (rule -> violation count) that run as ONE aggregation pass
over the data, not a per-rule scan.

Scale shape: ``DataProfile`` and ``CheckConstraints`` each compile to a
single global aggregate — every statistic is an agg expression evaluated in
the same whole-stage-codegen pass, so profiling N columns or checking N
rules costs one scan + a 1-row reduce regardless of N. Exact
``count_distinct`` over many columns expands rows on a cluster (Spark's
Expand operator multiplies input by the distinct-agg count); at data sizes
where that matters pass ``approx=True`` to switch to HyperLogLog
``approx_count_distinct`` (constant memory, no expand) — the exact mode is
the DuckDB-oracle path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class DataProfile(Pipe):
    """Long-form per-column profile: one output row per profiled column with
    ``(column, n, n_null, n_distinct, min_num, max_num, min_str, max_str)``.
    Numeric columns fill ``min_num``/``max_num`` (exact data values — no
    arithmetic, so cross-engine bit parity is free); string columns fill the
    lexicographic ``min_str``/``max_str``.
    """

    def __init__(
        self,
        numeric_cols: Sequence[str] = (),
        string_cols: Sequence[str] = (),
        approx: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.numeric_cols = list(numeric_cols)
        self.string_cols = list(string_cols)
        self.approx = approx

    def _distinct(self, c: str) -> Column:
        if self.approx:
            return F.approx_count_distinct(c).cast("long")
        return F.count_distinct(F.col(c)).cast("long")

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        aggs: List[Column] = [F.count(F.lit(1)).alias("__n")]
        for c in self.numeric_cols + self.string_cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__null_{c}")
            )
            aggs.append(self._distinct(c).alias(f"__dist_{c}"))
        for c in self.numeric_cols:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
        for c in self.string_cols:
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
        row = df.agg(*aggs)

        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        entries = []
        for c in self.numeric_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_num"),
                    F.col(f"__max_{c}").alias("max_num"),
                    null_s.alias("min_str"),
                    null_s.alias("max_str"),
                )
            )
        for c in self.string_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    null_d.alias("min_num"),
                    null_d.alias("max_num"),
                    F.col(f"__smin_{c}").alias("min_str"),
                    F.col(f"__smax_{c}").alias("max_str"),
                )
            )
        return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def data_profile_sql(
    table: str,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> str:
    """DuckDB oracle: one UNION ALL branch per column computing the same
    statistics (the oracle needs correctness, not the one-pass shape)."""
    parts = []
    for c in numeric_cols:
        parts.append(
            f"SELECT '{c}' AS \"column\", COUNT(*) AS n,"
            f" SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" MIN(CAST({c} AS DOUBLE)) AS min_num,"
            f" MAX(CAST({c} AS DOUBLE)) AS max_num,"
            f" CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            f" FROM {table}"
        )
    for c in string_cols:
        parts.append(
            f"SELECT '{c}' AS \"column\", COUNT(*) AS n,"
            f" SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,"
            f" MIN({c}) AS min_str, MAX({c}) AS max_str"
            f" FROM {table}"
        )
    body = " UNION ALL ".join(parts)
    return (
        f"SELECT \"column\", CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,"
        f" CAST(n_distinct AS BIGINT) AS n_distinct, min_num, max_num, min_str, max_str"
        f" FROM ({body}) t ORDER BY \"column\""
    )


class CheckConstraints(Pipe):
    """Declarative data-quality rules -> one row per rule with its violation
    count and pass/fail flag. ``rules`` maps rule name to a boolean Column
    (or SQL expression string) that is TRUE when the row SATISFIES the rule;
    NULL counts as a violation (unknown is not proof of quality).

    All rules evaluate in one aggregation pass — adding a rule adds an agg
    expression, not a scan."""

    def __init__(self, rules: Dict[str, object], **kwargs):
        super().__init__(**kwargs)
        self.rules = dict(rules)

    _no_fingerprint = ()

    def to_json_struct(self) -> dict:
        base = super().to_json_struct()
        base["rules"] = {k: str(v) for k, v in sorted(self.rules.items())}
        return base

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__n")]
        names = sorted(self.rules)
        for name in names:
            cond = self.rules[name]
            col = F.expr(cond) if isinstance(cond, str) else cond
            aggs.append(
                F.sum(F.when(col, 0).otherwise(1)).cast("long").alias(f"__v_{name}")
            )
        row = df.agg(*aggs)
        entries = [
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n"),
                F.col(f"__v_{name}").alias("n_violations"),
                (F.col(f"__v_{name}") == 0).alias("passed"),
            )
            for name in names
        ]
        return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def check_constraints_sql(table: str, rules: Dict[str, str]) -> str:
    """DuckDB oracle: same NULL-is-violation semantics via COALESCE."""
    parts = [
        f"SELECT '{name}' AS rule, COUNT(*) AS n,"
        f" SUM(CASE WHEN COALESCE(({expr}), FALSE) THEN 0 ELSE 1 END) AS n_violations"
        f" FROM {table}"
        for name, expr in sorted(rules.items())
    ]
    body = " UNION ALL ".join(parts)
    return (
        f"SELECT rule, CAST(n AS BIGINT) AS n,"
        f" CAST(n_violations AS BIGINT) AS n_violations,"
        f" n_violations = 0 AS passed FROM ({body}) t ORDER BY rule"
    )

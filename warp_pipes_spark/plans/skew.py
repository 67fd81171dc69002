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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


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


class KeySkewProfile(Pipe):
    """One-row skew report over a prospective shuffle key — the diagnostic
    to run BEFORE keying a 100 TB join/groupBy on a column, deciding
    between plain hash partitioning, AQE skew handling and explicit
    salting (``salted_join`` above): key cardinality, top-key share,
    the Gini coefficient of the per-key count distribution, p99/mean
    and the coefficient of variation.

    Exactness: per-key counts are exact BIGINTs; Gini rides the closed
    form over counts sorted ascending (rank i by (count, key) —
    permutations of equal counts leave sum(i*c_i) invariant, so the
    tie-break is cosmetic),

        G = (2*sum(i*c_i) - (n+1)*S) / (n*S)

    — exact integer numerator/denominator, ONE IEEE division, rounded
    once. p99 is the exact count at rank ceil(.99 n) (pure integers);
    p99/mean = (c_p99 * n) / S and cv = sqrt(v)/S with
    v = n*sum(c^2) - S^2 — each a couple of IEEE ops on exact-integer
    doubles (sqrt is correctly rounded), so every statistic is
    engine-independent.

    Scale shape: one groupBy(key) scan, then ONE sort of the key-count
    table (vocabulary-sized, not corpus-sized) — the same cost class as
    any top-k ranking. sum(i*c_i) <= n_keys * n_rows bounds the exact
    BIGINT path at ~1e18 (n_keys * n_rows), plenty for any real key."""

    def __init__(self, key_col: str, **kwargs):
        super().__init__(**kwargs)
        self.key_col = key_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        counts = (
            df.select(F.col(self.key_col).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.orderBy(F.asc("c"), F.asc("k"))
        ranked = counts.withColumn("i", F.row_number().over(w))
        agg = ranked.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("s"),
            F.sum(F.col("i") * F.col("c")).alias("sic"),
            F.sum(F.col("c") * F.col("c")).alias("sc2"),
        )
        top = counts.orderBy(F.desc("c"), F.asc("k")).limit(1).select(
            F.col("k").alias("top_key"), F.col("c").alias("top_c")
        )
        # exact integer ceil(.99 n) = (99n + 99) div 100 — `div` (not `/`:
        # a double divide + cast can land off-by-one at representability
        # edges; both operands are nonnegative so div == floor division)
        p99_rank = F.expr("(99 * n_keys + 99) div 100").cast("long")
        base = agg.crossJoin(F.broadcast(top))
        p99c = (
            ranked.select("i", F.col("c").alias("c99"))
            .join(
                F.broadcast(
                    base.select(p99_rank.alias("i"))
                ),
                "i",
            )
        )
        out = base.crossJoin(F.broadcast(p99c.select("c99")))
        gini = (
            (2 * F.col("sic") - (F.col("n_keys") + 1) * F.col("s")).cast(
                "double"
            )
            / (F.col("n_keys") * F.col("s")).cast("double")
        ).cast(D).cast("double")
        v = F.col("n_keys") * F.col("sc2") - F.col("s") * F.col("s")
        cv = (
            F.sqrt(v.cast("double")) / F.col("s").cast("double")
        ).cast(D).cast("double")
        return out.select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("s").cast("long").alias("n_rows"),
            F.col("top_key"),
            (
                F.col("top_c").cast("double") / F.col("s").cast("double")
            ).cast(D).cast("double").alias("top_share"),
            gini.alias("gini"),
            (
                (F.col("c99") * F.col("n_keys")).cast("double")
                / F.col("s").cast("double")
            ).cast(D).cast("double").alias("p99_over_mean"),
            cv.alias("cv"),
        )


def key_skew_sql(table: str, key: str) -> str:
    """DuckDB oracle for :class:`KeySkewProfile` — identical integer
    algebra, single rounded division per statistic."""
    return f"""
WITH counts AS MATERIALIZED (
  SELECT CAST({key} AS VARCHAR) AS k, COUNT(*) AS c FROM {table} GROUP BY 1
),
ranked AS (
  SELECT k, c, ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i FROM counts
),
agg AS (
  SELECT COUNT(*) AS n_keys, SUM(c) AS s, SUM(i * c) AS sic,
         SUM(c * c) AS sc2
  FROM ranked
),
top AS (
  SELECT k AS top_key, c AS top_c FROM counts
  ORDER BY c DESC, k ASC LIMIT 1
),
p99 AS (
  SELECT r.c AS c99 FROM ranked r, agg
  WHERE r.i = (99 * agg.n_keys + 99) // 100
)
SELECT CAST(n_keys AS BIGINT) AS n_keys,
       CAST(s AS BIGINT) AS n_rows,
       top_key,
       CAST(CAST(CAST(top_c AS DOUBLE) / CAST(s AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS top_share,
       CAST(CAST(CAST(2 * sic - (n_keys + 1) * s AS DOUBLE)
                 / CAST(n_keys * s AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS gini,
       CAST(CAST(CAST(c99 * n_keys AS DOUBLE) / CAST(s AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS p99_over_mean,
       CAST(CAST(sqrt(CAST(n_keys * sc2 - s * s AS DOUBLE))
                 / CAST(s AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS cv
FROM agg CROSS JOIN top CROSS JOIN p99
"""

"""Model-evaluation metrics over scored rows: exact ROC-AUC.

The quality-classifier loop (train -> score corpus -> gate on score) needs
an evaluation pass; AUC is the standard threshold-free metric. The exact
rank formulation (Mann-Whitney U) is usually written as a GLOBAL rank over
all rows — a single-partition window that dies at scale. This module uses
the grouped-by-distinct-score formulation instead:

    per distinct score s: (n_pos_s, n_neg_s)          -- one keyed groupBy
    ordered over distinct scores ascending:
        2U = sum_s n_pos_s * (2 * cum_neg_below(s) + n_neg_s)
    AUC = 2U / (2 * n_pos * n_neg)

Ties get the standard half credit — folded into integer arithmetic by
carrying 2U (a pure BIGINT; no fractional intermediate anywhere), so the
result is bit-exact across engines: one final integer division renders
the double. The only ordered pass runs over DISTINCT scores (score
cardinality, not row count — a quantized/bucketed classifier emits few);
row-count-sized work is all in the first keyed aggregation.

Reference: warp-pipes has no evaluation operators; this extends the
text-classifier stack (`text/classifier.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class BinaryAuc(Pipe):
    """Input df: one row per example with ``score_col`` (orderable) and
    ``label_col`` (1 = positive, 0 = negative). Output: ONE row
    (n_pos, n_neg, auc) — exact, tie-corrected."""

    def __init__(self, score_col: str = "score", label_col: str = "label", **kwargs):
        super().__init__(**kwargs)
        self.score_col = score_col
        self.label_col = label_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        per_score = df.groupBy(F.col(self.score_col).alias("s")).agg(
            F.sum(F.col(self.label_col).cast("long")).alias("np"),
            F.sum(F.lit(1) - F.col(self.label_col).cast("long")).alias("nn"),
        )
        # ordered pass over DISTINCT scores only (bounded cardinality);
        # cum_below excludes the current score group
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        with_cum = per_score.withColumn(
            "cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0))
        )
        return with_cum.agg(
            F.sum("np").alias("n_pos"),
            F.sum("nn").alias("n_neg"),
            F.sum(F.col("np") * (2 * F.col("cum_nn") + F.col("nn"))).alias("u2"),
        ).select(
            "n_pos",
            "n_neg",
            (
                F.col("u2").cast("double")
                / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
        )


def binary_auc_sql(scored_sql: str, score: str = "score", label: str = "label") -> str:
    """DuckDB oracle: identical grouped 2U formulation over
    ``scored_sql`` (must yield the score and 0/1 label columns)."""
    return f"""
        WITH per_score AS (
            SELECT {score} AS s,
                   SUM(CAST({label} AS BIGINT)) AS np,
                   SUM(1 - CAST({label} AS BIGINT)) AS nn
            FROM ({scored_sql}) GROUP BY 1
        ),
        cum AS (
            SELECT np, nn,
                   COALESCE(SUM(nn) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_nn
            FROM per_score
        )
        SELECT SUM(np) AS n_pos, SUM(nn) AS n_neg,
               CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE)
                   / CAST(2 * SUM(np) * SUM(nn) AS DOUBLE) AS auc
        FROM cum
    """

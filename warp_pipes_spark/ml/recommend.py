"""Item-item collaborative filtering over co-occurrence baskets.

The classic neighborhood recommender (Sarwar et al. 2001, "Item-Based
Collaborative Filtering Recommendation Algorithms"): two items are similar
when the baskets (orders) containing them overlap — cosine over binary
basket-membership vectors reduces to ``c_ij / sqrt(n_i * n_j)`` with pure
co-occurrence counts, so the whole model trains relationally: one
basket-keyed self-join for the pair counts (fan-out bounded by basket
size, never corpus size — the q98 market-basket shape), one item-count
rollup, a broadcast join for the normalizers, and a per-item top-k window.

Reference scope note: the reference engine has no recommender; this is
part of the LLM/analytics extension surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class ItemItemRecs(Pipe):
    """Per-item top-``k`` recommendations by co-occurrence cosine.

    Input: an interaction table with ``basket_col`` and ``item_col``
    (duplicates collapse — membership is binary). Output: one row per
    (item, rank): ``(part_id, rank, rec_part_id, sim, support)`` where
    ``sim = c_ij / sqrt(n_i * n_j)`` and pairs below ``min_support``
    co-baskets are pruned (the noise floor — and the candidate-volume
    bound at scale).

    Determinism: ranking orders by (sim desc, rec id asc); sim is the
    identical IEEE double expression from exact integer counts in both
    engines, so the window is engine-stable."""

    def __init__(
        self,
        basket_col: str = "l_orderkey",
        item_col: str = "l_partkey",
        k: int = 3,
        min_support: int = 2,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.basket_col = basket_col
        self.item_col = item_col
        self.k = k
        self.min_support = min_support

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        li = df.select(
            F.col(self.basket_col).alias("b"), F.col(self.item_col).alias("i")
        ).distinct()
        n_i = li.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
        a = li.select("b", F.col("i").alias("ia"))
        bb = li.select("b", F.col("i").alias("ib"))
        pairs = (
            a.join(bb, "b")
            .where(F.col("ia") < F.col("ib"))
            .groupBy("ia", "ib")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= self.min_support)
        )
        # both directions from the one (ia < ib) pair table: executor-local
        # struct explode, not a second self-join
        sym = pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("ia").alias("i"), F.col("ib").alias("j"), F.col("c")
                    ),
                    F.struct(
                        F.col("ib").alias("i"), F.col("ia").alias("j"), F.col("c")
                    ),
                )
            ).alias("e")
        ).select("e.i", "e.j", "e.c")
        na = n_i.select(F.col("i"), F.col("n").alias("n_self"))
        nb = n_i.select(F.col("i").alias("j"), F.col("n").alias("n_other"))
        scored = (
            sym.join(F.broadcast(na), "i")
            .join(F.broadcast(nb), "j")
            .withColumn(
                "sim",
                F.col("c").cast("double")
                / F.sqrt(
                    (F.col("n_self") * F.col("n_other")).cast("double")
                ),
            )
        )
        w = Window.partitionBy("i").orderBy(F.desc("sim"), F.asc("j"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select(
                F.col("i").alias("part_id"),
                F.col("rank").cast("int").alias("rank"),
                F.col("j").alias("rec_part_id"),
                F.col("sim"),
                F.col("c").cast("long").alias("support"),
            )
        )


def item_recs_sql(
    table: str = "lineitem",
    basket: str = "l_orderkey",
    item: str = "l_partkey",
    k: int = 3,
    min_support: int = 2,
) -> str:
    """DuckDB oracle for :class:`ItemItemRecs` — identical counts, cosine
    expression and (sim desc, id asc) ranking."""
    return f"""
WITH li AS (
  SELECT DISTINCT {basket} AS b, {item} AS i FROM {table}
), n_i AS (
  SELECT i, COUNT(*) AS n FROM li GROUP BY 1
), pairs AS (
  SELECT a.i AS ia, b.i AS ib, COUNT(*) AS c
  FROM li a JOIN li b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
), sym AS (
  SELECT ia AS i, ib AS j, c FROM pairs
  UNION ALL
  SELECT ib AS i, ia AS j, c FROM pairs
), scored AS (
  SELECT sym.i, sym.j, sym.c,
         CAST(sym.c AS DOUBLE)
         / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS sim
  FROM sym JOIN n_i na ON na.i = sym.i JOIN n_i nb ON nb.i = sym.j
), ranked AS (
  SELECT i, j, c, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY i ORDER BY sim DESC, j) AS INTEGER)
             AS rank
  FROM scored
)
SELECT i AS part_id, rank, j AS rec_part_id, sim,
       CAST(c AS BIGINT) AS support
FROM ranked WHERE rank <= {k} ORDER BY part_id, rank
"""

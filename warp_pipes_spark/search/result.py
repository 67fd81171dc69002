"""Search-result algebra in exploded long form.

The reference keeps results as dense ``[batch, k]`` index/score arrays
(``warp_pipes/search/result.py:155-177``) with ``-1``/``-inf`` padding and a
merge algebra that unions indices per row and **sums scores of duplicate
indices** (``result.py:199-239``, ``:280-329``). A dense rectangle is the
wrong layout for a shuffle engine, so the canonical representation here is
the long form::

    (query_id long, idx long, score double)

which makes the whole algebra relational:

- merge  = union → groupBy(query_id, idx) sum(score)   (map-side combine)
- top-k  = Window.partitionBy(query_id).orderBy(desc(score)) row_number <= k
- pad    = left-join against the query set + coalesce to (-1, -inf)

The reference's refill-missing-with-random-ids behavior
(``result.py:265-271``) is intentionally dropped (nondeterministic); ``-1``
sentinels are kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RESULT_COLS = ("query_id", "idx", "score")


def merge_results(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two result sets, summing scores of duplicate (query, idx) pairs
    — same semantics as the reference's ``SearchResult.__add__ + sum_scores``
    dict-accumulation oracle. Padding sentinels (idx = -1) are dropped before
    the merge so they never acquire mass."""
    u = a.select(*RESULT_COLS).unionByName(b.select(*RESULT_COLS))
    u = u.filter(F.col("idx") >= 0)
    return u.groupBy("query_id", "idx").agg(F.sum("score").alias("score"))


def topk_results(results: DataFrame, k: int) -> DataFrame:
    """Keep the k best rows per query (desc score, idx tie-break)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("idx"))
    return (
        results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "idx", "score")
    )


def pad_results(results: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Guarantee exactly k rows per query: rank-fill missing slots with
    (idx=-1, score=-inf), mirroring the reference's pad-to-length semantics
    (``result.py:253-263``)."""
    spark = results.sparkSession
    ranks = spark.range(1, k + 1).select(F.col("id").cast("int").alias("rank"))
    slots = queries.select("query_id").distinct().crossJoin(ranks)
    ranked = topk_results(results, k)
    return (
        slots.join(ranked, on=["query_id", "rank"], how="left")
        .select(
            "query_id",
            "rank",
            F.coalesce(F.col("idx"), F.lit(-1)).alias("idx"),
            F.coalesce(F.col("score"), F.lit(float("-inf"))).alias("score"),
        )
    )


def results_to_arrays(results: DataFrame, k: int) -> DataFrame:
    """Long form → the reference's dense per-query arrays
    (``idx array<long>, score array<double>`` sorted by rank), for consumers
    that want the ``[batch, k]`` shape."""
    ranked = topk_results(results, k)
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("rank", "idx", "score"))).alias("rows")
        )
        .select(
            "query_id",
            F.transform("rows", lambda r: r["idx"]).alias("idx"),
            F.transform("rows", lambda r: r["score"]).alias("score"),
        )
    )


def rrf_fuse(*ranked: DataFrame, c: float = 60.0, k: int = 10) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) over N ranked
    result sets: ``rrf(q, d) = Σ_engines 1/(c + rank_e(d))``, then top-k per
    query — the standard score-free combiner for heterogeneous engines
    (lexical + dense), robust to incomparable score scales where
    :func:`merge_results`'s raw score sums are not.

    Inputs are ``(query_id, rank, idx, ...)`` frames (any engine's top-k
    output). Contributions round through DECIMAL(18,6) so the fused sum is
    order- and partitioning-free; output is ``(query_id, rank, idx,
    rrf DOUBLE)`` with deterministic idx tie-break. One narrow shuffle on
    (query_id, idx) over inputs already truncated to k rows per engine."""
    contribs = [
        r.select(
            "query_id",
            "idx",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double")))
            .cast("decimal(18,6)")
            .alias("rr"),
        )
        for r in ranked
    ]
    u = contribs[0]
    for nxt in contribs[1:]:
        u = u.unionByName(nxt)
    fused = u.groupBy("query_id", "idx").agg(F.sum("rr").alias("rrf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("idx"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "idx",
            F.col("rrf").cast("decimal(18,6)").cast("double").alias("rrf"),
        )
    )

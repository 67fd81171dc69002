"""Distributed graph algorithms as relational iteration.

Connected components via hash-min label propagation (the map-reduce CC
algorithm of Rastogi et al., "Finding Connected Components in Map-Reduce
in Logarithmic Rounds", ICDE 2013 — simplified to the synchronous
hash-min variant): every node carries the minimum node id it has seen;
each round a node takes the min of its own label and its neighbors'
labels. After ``iters`` rounds the label equals the minimum id within
``iters`` hops — with enough rounds (graph diameter) that is the
component id.

Everything is exact integer MIN — associative, commutative, no floats —
so the result is bit-identical under any partitioning and matches an
unrolled SQL oracle. Each round costs one shuffle (the neighbor-min
groupBy); the label vector stays node-sized. Spark-side the same loop
discipline as PageRank (q97): materialize the edge list once, let each
round's plan reference it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def hash_min_components(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``edges`` (directed pairs; pass both directions for an undirected
    graph) -> ``(node, component)`` where component = min node id within
    ``iters`` hops (the component id once ``iters`` >= diameter)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iters):
        nbr_min = (
            e.join(labels, e.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("m"))
            .withColumnRenamed("src", "node")
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("m"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
    return labels.select("node", F.col("label").alias("component"))


def hash_min_components_sql(edges_cte: str, iters: int = 4) -> str:
    """Unrolled-iteration DuckDB oracle; ``edges_cte`` must define
    ``edges(src, dst)`` (both directions)."""
    parts = [
        edges_cte,
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    prev = "l0"
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS (SELECT e.src AS node, MIN(l.label) AS m "
            f"FROM edges e JOIN {prev} l ON e.dst = l.node GROUP BY 1)"
        )
        parts.append(
            f"l{i} AS (SELECT {prev}.node, "
            f"LEAST({prev}.label, COALESCE(s{i}.m, {prev}.label)) AS label "
            f"FROM {prev} LEFT JOIN s{i} ON {prev}.node = s{i}.node)"
        )
        prev = f"l{i}"
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT node, label AS component FROM {prev} ORDER BY node"
    )

"""TextRank keyword extraction (Mihalcea & Tarau 2004, EMNLP).

TF-IDF keywords (q195) score words by counting; TextRank scores them by
GRAPH CENTRALITY: build a word co-occurrence graph over the corpus
(vertices = normalized tokens, edges = adjacency in the filtered token
sequence, weights = corpus-wide co-occurrence counts) and run weighted
PageRank over it — a word matters because it co-occurs with words that
matter. The classic unsupervised keyword extractor for curation
datasheets and topic drift audits.

Plan shape (100 TB posture):

* ONE corpus scan: tokens explode to adjacent-pair rows, a map-side-
  combined groupBy collapses them to the VOCABULARY-sized weighted edge
  list — everything after that first shuffle is vocabulary-sized, so
  the iterations never touch the corpus again;
* weighted PageRank runs ``iters`` synchronous rounds over the edge
  list (one shuffle per round on a vocab-sized table), contributions
  carried as floor-scaled exact BIGINTs — the q97 discipline that makes
  every iteration bit-stable under any partitioning and lets the
  distributed loop match an unrolled SQL oracle exactly;
* the top-k select is a row_number over the vocab-sized rank vector.

The DuckDB oracle unrolls the same iterations with the same scaled
casts (shared tokenizer via ``text/analysis.py`` ``tokens_sql``), so
the differential proves the distributed loop bit-exact.

Reference anchor: text-analysis extension family (SURVEY.md §2 "Text
analysis"); the graph machinery mirrors ``queries.py`` q97 PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class TextRankKeywords(Pipe):
    """Corpus-level TextRank: input df = documents with ``text_col``;
    output = top-``k`` words as (word, rank, rk), rank the damped
    weighted-PageRank score after ``iters`` synchronous iterations over
    the adjacency (window = 2) co-occurrence graph of tokens with
    length >= ``min_token_len``, ties broken by word."""

    def __init__(
        self,
        k: int = 50,
        iters: int = 5,
        damping: float = 0.85,
        min_token_len: int = 4,
        text_col: str = "text",
        **kwargs,
    ):
        if iters < 1:
            raise ValueError(f"need iters >= 1, got {iters}")
        super().__init__(**kwargs)
        self.k = k
        self.iters = iters
        self.damping = damping
        self.min_token_len = min_token_len
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.text.analysis import tokens_expr

        ts = F.filter(
            tokens_expr(F.col(self.text_col)),
            lambda t: F.length(t) >= self.min_token_len,
        )
        # adjacent pairs WITHIN the filtered sequence (the original
        # algorithm windows over the filtered text); sequence() steps
        # DOWNWARD when stop < start, so the < 2-token case needs an
        # explicit empty fallback
        pair_idx = F.when(
            F.size(F.col("__ts")) >= 2,
            F.sequence(F.lit(0), F.size(F.col("__ts")) - 2),
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            df.select(ts.alias("__ts"))
            .select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.get(F.col("__ts"), i).alias("a"),
                            F.get(F.col("__ts"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
            .filter(F.col("a") != F.col("b"))
        )
        # undirected weighted graph: corpus-wide co-occurrence counts on
        # the unordered pair, then both directions for the iteration
        und = pairs.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        ).groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
        edges = (
            und.select(
                F.col("u").alias("src"), F.col("v").alias("dst"), "w"
            )
            .unionAll(
                und.select(
                    F.col("v").alias("src"), F.col("u").alias("dst"), "w"
                )
            )
            # every iteration references the edge list; localCheckpoint
            # (eager, GC-released) pins it once instead of re-deriving
            # the corpus scan per iteration branch
            .localCheckpoint()
        )
        wsum = edges.groupBy("src").agg(F.sum("w").alias("wtot"))
        # nodes is referenced by every iteration's left join (and the
        # scalar count below): one eager, GC-released materialization
        # instead of re-running the distinct's exchange per round
        nodes = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        # ONE driver scalar replaces the per-iteration n_nodes broadcast
        # crossJoin (the q97 PageRank discipline): n is a plain long
        # literal in the same IEEE expressions, so ranks are unchanged
        n = nodes.count()
        rank = nodes.select(
            "node", (F.lit(1.0) / F.lit(n)).alias("rank")
        )
        d = float(self.damping)
        for _ in range(self.iters):
            # floor-scaled BIGINT contributions: exact, order-free sums
            # (bit-identical to the unrolled oracle under any
            # partitioning — the q97 discipline). rank/wtot pre-join on
            # the NODE-sized table so each round touches edges in ONE
            # join instead of two edge-sized ones; the arithmetic stays
            # rank * (w / wtot) verbatim, so the doubles are identical.
            rw = rank.join(
                wsum.withColumnRenamed("src", "node"), "node"
            ).select(F.col("node").alias("src"), "rank", "wtot")
            contrib = edges.join(rw, "src").select(
                F.col("dst").alias("node"),
                F.floor(
                    (
                        F.col("rank")
                        * (
                            F.col("w").cast("double")
                            / F.col("wtot").cast("double")
                        )
                    )
                    * F.lit(1.0e14)
                )
                .cast("long")
                .alias("c"),
            )
            sums = contrib.groupBy("node").agg(
                (F.sum("c").cast("double") / F.lit(1.0e14)).alias("s")
            )
            rank = nodes.join(sums, "node", "left").select(
                "node",
                (
                    (1.0 - d) / F.lit(n)
                    + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        w = Window.orderBy(F.desc("rank"), F.asc("node"))
        return (
            rank.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= self.k)
            .select(
                F.col("node").alias("word"),
                "rank",
                F.col("rk").cast("int").alias("rk"),
            )
        )


def textrank_sql(
    docs_sql: str,
    k: int = 50,
    iters: int = 5,
    damping: float = 0.85,
    min_token_len: int = 4,
    text: str = "text",
) -> str:
    """DuckDB oracle for :class:`TextRankKeywords` — unrolled iterations
    with the SAME floor-scaled casts and double literals (1.0 - 0.85
    pinned to the binary double Spark computes)."""
    from warp_pipes_spark.text.analysis import tokens_sql

    base = (
        f"toks AS (SELECT list_filter({tokens_sql(text)},"
        f" t -> length(t) >= {min_token_len}) AS ts FROM ({docs_sql})), "
        # DuckDB lists are 1-based; range(0, len-1) is empty when
        # len < 2, mirroring the Spark guard
        "prs AS (SELECT ts[CAST(i + 1 AS INTEGER)] AS a,"
        " ts[CAST(i + 2 AS INTEGER)] AS b"
        " FROM toks, UNNEST(range(0, len(ts) - 1)) AS r(i)"
        " WHERE ts[CAST(i + 1 AS INTEGER)] <> ts[CAST(i + 2 AS INTEGER)]), "
        "und AS (SELECT least(a, b) AS u, greatest(a, b) AS v,"
        " COUNT(*) AS w FROM prs GROUP BY 1, 2), "
        "edges AS (SELECT u AS src, v AS dst, w FROM und"
        " UNION ALL SELECT v, u, w FROM und), "
        "wsum AS (SELECT src, SUM(w) AS W FROM edges GROUP BY 1), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        "nn AS (SELECT COUNT(*) AS n FROM nodes), "
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS rank"
        " FROM nodes CROSS JOIN nn)"
    )
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"s{i} AS (SELECT e.dst AS node, "
            f"CAST(SUM(CAST(FLOOR((r.rank * (CAST(e.w AS DOUBLE)"
            f" / CAST(ws.W AS DOUBLE))) * 1.0e14) AS BIGINT)) AS DOUBLE)"
            f" / 1.0e14 AS s "
            f"FROM edges e JOIN {prev} r ON e.src = r.node "
            f"JOIN wsum ws ON e.src = ws.src GROUP BY 1), "
            f"r{i} AS (SELECT nodes.node, "
            f"CAST({1.0 - damping!r} AS DOUBLE) / nn.n "
            f"+ CAST({damping!r} AS DOUBLE)"
            f" * COALESCE(s{i}.s, CAST(0.0 AS DOUBLE)) AS rank "
            f"FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node"
            f" CROSS JOIN nn)"
        )
        prev = f"r{i}"
    return (
        "WITH " + base + ", " + ", ".join(steps)
        + f", ranked AS (SELECT node AS word, rank,"
        f" CAST(ROW_NUMBER() OVER (ORDER BY rank DESC, node ASC)"
        f" AS INTEGER) AS rk FROM {prev})"
        f" SELECT word, rank, rk FROM ranked WHERE rk <= {k}"
        " ORDER BY rk"
    )

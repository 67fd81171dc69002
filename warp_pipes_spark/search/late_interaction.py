"""Late-interaction retrieval: ColBERT-style MaxSim scoring.

score(q, d) = sum over query token positions t of
              max over (distinct) doc tokens u of cos(E(t), E(u))

— the multi-vector ranking family between single-vector dense retrieval
(q30) and term-exact BM25 (q32): every query token independently finds its
best-matching doc token, so partial/lexical-variant matches score without
exact term overlap.

Execution shape (100 TB-literate): token tables are scan-level projections
(slice + explode — tokens stay on their document's partition); the scoring
join streams DOC tokens against BROADCAST query tokens (queries are the
bounded side by contract, exactly the BM25 layout); MaxSim reduces with
two key-partitioned aggregations (max per (query, q_pos, doc), then an
exact decimal sum per (query, doc)) before the top-k window. No shuffle
ever carries a token stream wider than the candidate pair rows.

Token embeddings are pluggable Column expressions. The default
``toy_token_embed_expr`` is the catalog's deterministic integer-arithmetic
stand-in (the q96/q112 'model'; honest placeholder for the container's
missing model runtimes) — pure integer math, so the DuckDB oracle
(``maxsim_sql``) reproduces every double bit-for-bit; per-pair cosines
round to DECIMAL(18,6) (the q30 recipe) making max/sum/rank order-free.

Reference: warp-pipes has single-vector engines and ES BM25
(`warp_pipes/search/`); late interaction extends the same Search surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.ml.similarity import _dot, _norm

_DEC = "decimal(18,6)"

# the catalog's deterministic embedding stand-in (q96/q112 constants)
EMBED_DIM = 8
EMBED_K = 2654435761
EMBED_P = 1000003


def toy_token_embed_expr(tok):
    """token string -> array<double> embedding; component i (1-based) =
    ((i*K + len(tok)*31 + ascii(tok[0])*7) % P) / P. Integer-exact, so
    both engines produce identical doubles."""
    n = F.length(tok)
    c1 = F.when(n > 0, F.ascii(F.substring(tok, 1, 1))).otherwise(F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), F.lit(EMBED_DIM)),
        lambda i: ((i * EMBED_K + n * 31 + c1 * 7) % EMBED_P).cast("double")
        / EMBED_P,
    )


def toy_token_embed_sql(tok: str) -> str:
    """The identical embedding as a DuckDB list literal."""
    comps = ", ".join(
        f"CAST(({i} * {EMBED_K} + length({tok}) * 31 + "
        f"(CASE WHEN length({tok}) > 0 THEN ascii(substr({tok}, 1, 1)) "
        f"ELSE 0 END) * 7) % {EMBED_P} AS DOUBLE) / {EMBED_P}"
        for i in range(1, EMBED_DIM + 1)
    )
    return f"[{comps}]"


class MaxSimTopK(Pipe):
    """Input df = queries (``query_id``, ``query_text``); ``corpus``
    (``corpus_id``, ``corpus_text``) given at construction. Returns
    (query_id, rank, doc_id, score) with rank <= k.

    ``m_query`` / ``m_doc`` cap the token positions considered (the
    ColBERT max-sequence-length knob): the first m_query query tokens each
    contribute a MaxSim term; doc tokens dedupe to a set (max over a
    multiset equals max over its support).
    """

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 5,
        m_query: int = 3,
        m_doc: int = 6,
        char_window: int = 512,
        corpus_id: str = "doc_id",
        corpus_text: str = "text",
        query_id: str = "query_id",
        query_text: str = "text",
        embed_expr=toy_token_embed_expr,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.k = k
        self.m_query = m_query
        self.m_doc = m_doc
        # tokens come from the first char_window chars only — the
        # max-sequence-length truncation every late-interaction system
        # applies, and what keeps the regex split from scanning multi-KB
        # documents for 6 tokens; the oracle applies the identical substr
        self.char_window = char_window
        self.corpus_id = corpus_id
        self.corpus_text = corpus_text
        self.query_id = query_id
        self.query_text = query_text
        self.embed_expr = embed_expr

    _no_fingerprint = ("corpus", "embed_expr")

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.text.analysis import tokens_expr

        def _win(col):
            return F.substring(col, 1, self.char_window)

        q_toks = df.select(
            F.col(self.query_id).alias("query_id"),
            F.posexplode(
                F.slice(tokens_expr(_win(F.col(self.query_text))), 1, self.m_query)
            ).alias("q_pos", "q_tok"),
        )
        qt = q_toks.withColumn("qv", self.embed_expr(F.col("q_tok"))).withColumn(
            "qn", _norm(F.col("qv"))
        )
        from warp_pipes_spark.text.dedup import widen_partitions

        # tokenize FIRST (scan-level, char_window bounds the regex), widen
        # AFTER: the repartition that spreads a single-row-group local read
        # across cores then shuffles m_doc-token arrays, not document text
        d_toks = widen_partitions(
            self.corpus.select(
                F.col(self.corpus_id).alias("doc_id"),
                F.array_distinct(
                    F.slice(tokens_expr(_win(F.col(self.corpus_text))), 1, self.m_doc)
                ).alias("__toks"),
            )
        ).select("doc_id", F.explode("__toks").alias("d_tok"))
        # factor the cosine by DISTINCT token string (embedding depends only
        # on the token): vocabulary x query-token sims are computed once —
        # Zipf makes |vocab| << |token occurrences| — then hash-join back to
        # occurrences, which feed straight into a map-side partial max.
        # The expensive fold never runs per occurrence pair.
        vocab = d_toks.select("d_tok").distinct()
        vt = vocab.withColumn("dv", self.embed_expr(F.col("d_tok"))).withColumn(
            "dn", _norm(F.col("dv"))
        )
        # per-pair sims round through DECIMAL(18,6) (the q30 recipe), then
        # ride the hot path as SCALED LONGS (sim * 1e6 — exact integers,
        # order-isomorphic to the decimals): long max/sum/sort-key beats
        # decimal in the 100M-row aggregation and the top-k window, and
        # the final score rebuilds the exact decimal by an exact /1e6
        sim_dec = (
            _dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn"))
        ).cast(_DEC)
        tok_sims = vt.crossJoin(F.broadcast(qt)).select(
            "query_id",
            "q_pos",
            "d_tok",
            (sim_dec * 1000000).cast("long").alias("sim"),
        )
        # pivot the per-position sims into m_query COLUMNS keyed by
        # (query_id, d_tok): the scoring join then fans out one row per
        # (doc occurrence x query) instead of per (doc occurrence x query
        # TOKEN) — an m_query-fold cut of the dominant fan-out — and the
        # per-position max + cross-position sum collapse into ONE keyed
        # aggregation (m_query max columns) plus a row-local sum.
        # The pivoted broadcast is |vocab| x |queries| rows, the same
        # scale as the unpivoted tok_sims it replaces.
        sim_cols = [
            F.max(F.when(F.col("q_pos") == p, F.col("sim"))).alias(f"__s{p}")
            for p in range(self.m_query)
        ]
        tok_sim_row = tok_sims.groupBy("query_id", "d_tok").agg(*sim_cols)
        # ONE exchange for the aggregation + window (the BM25 idiom,
        # bm25.py): hash partitioning on query_id alone satisfies both the
        # (query_id, doc_id) grouping (subset-key clustered distribution)
        # and the top-k window's partitionBy — without it Spark plans two
        # back-to-back |queries| x |docs|-row shuffles
        best = (
            d_toks.join(F.broadcast(tok_sim_row), "d_tok")
            .repartition("query_id")
            .groupBy("query_id", "doc_id")
            .agg(*[F.max(f"__s{p}").alias(f"__b{p}") for p in range(self.m_query)])
        )
        # a null per-position max = the query has no token at that position
        # (fewer than m_query tokens): it contributes nothing to the sum,
        # exactly as its absent rows did in the row-form aggregation
        score_expr = None
        for p in range(self.m_query):
            term = F.coalesce(F.col(f"__b{p}"), F.lit(0))
            score_expr = term if score_expr is None else score_expr + term
        scored = best.select("query_id", "doc_id", score_expr.alias("__ss"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("__ss"), F.asc("doc_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select(
                "query_id",
                F.col("rank").cast("int").alias("rank"),
                "doc_id",
                # exact rebuild of the decimal(28,6) score: __ss is an
                # integer number of millionths, so /1e6 at scale 6 is exact
                (F.col("__ss").cast("decimal(28,0)") / 1000000)
                .cast("decimal(28,6)")
                .cast("double")
                .alias("score"),
            )
        )


def maxsim_sql(
    queries_sql: str,
    k: int = 5,
    m_query: int = 3,
    m_doc: int = 6,
    char_window: int = 512,
    corpus: str = "documents",
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
) -> str:
    """DuckDB oracle: identical tokenization (incl. the char_window
    truncation), embedding, rounding and aggregation discipline.
    ``queries_sql`` must yield (query_id, qtext)."""
    from warp_pipes_spark.text.analysis import tokens_sql

    corpus_text = f"substr({corpus_text}, 1, {char_window})"

    qe = toy_token_embed_sql("q_tok")
    de = toy_token_embed_sql("d_tok")
    cos = (
        f"CAST(list_dot_product({qe}, {de}) / "
        f"(sqrt(list_dot_product({qe}, {qe})) * "
        f"sqrt(list_dot_product({de}, {de}))) AS DECIMAL(18,6))"
    )
    return f"""
        WITH q AS (SELECT query_id,
                          ({tokens_sql(f"substr(qtext, 1, {char_window})")})[1:{m_query}] AS toks
                   FROM ({queries_sql})),
        qt AS (SELECT query_id, i AS q_pos, toks[i] AS q_tok
               FROM q CROSS JOIN (SELECT unnest(generate_series(1, {m_query})) AS i) g
               WHERE i <= len(toks)),
        dt AS (SELECT {corpus_id} AS doc_id,
                      unnest(list_distinct(({tokens_sql(corpus_text)})[1:{m_doc}])) AS d_tok
               FROM {corpus}),
        sims AS (SELECT qt.query_id, qt.q_pos, dt.doc_id, {cos} AS sim
                 FROM dt CROSS JOIN qt),
        best AS (SELECT query_id, q_pos, doc_id, MAX(sim) AS best
                 FROM sims GROUP BY 1, 2, 3),
        scored AS (SELECT query_id, doc_id,
                          CAST(SUM(best) AS DECIMAL(28,6)) AS score
                   FROM best GROUP BY 1, 2),
        ranked AS (SELECT query_id, doc_id, score,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT) AS rank
                   FROM scored)
        SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score
        FROM ranked WHERE rank <= {k}
    """

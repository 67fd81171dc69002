"""Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001).

The language-modeling alternative to BM25 — the second classic lexical
ranker every retrieval stack A/B-tests against (reference analogue: the
ES engine surface `support/elasticsearch.py`, which exposes exactly one
ranking family; this extends the repo's engine set the way `search/mmr.py`
and `search/prf.py` extend its fusion set). Scores the RANK-EQUIVALENT
Dirichlet QL decomposition:

    score(q, d) = sum_{t in q, tf>0} ln(1 + tf_td * T / (mu * cf_t))
                  + |q_v| * ln(mu / (dl_d + mu))

where cf_t is the collection frequency, T the collection token count and
|q_v| the count of the query's IN-VOCABULARY distinct terms (the constant
sum_t ln(mu*cf_t/T) is dropped — it shifts every candidate of a query
equally, so rankings are unchanged; documented deviation from the full
log-likelihood). OOV query terms contribute nothing (their smoothed
probability is 0 under the pure Dirichlet collection model).

Exactness: both log arguments are ratios of exact BIGINT products
((mu*cf + tf*T) / (mu*cf) and mu / (dl + mu)), so the engines feed libm
identical doubles; each contribution is DECIMAL(18,6)-rounded and summed
exactly (scaled longs here, DECIMAL in the oracle — the same integers),
and the final score is the one correctly-rounded long/1e6 division.

Shares the tokenization-keyed raw-postings Parquet artifact with
:class:`~warp_pipes_spark.search.bm25.Bm25Search` — building a QL engine
over an already-BM25-indexed corpus re-tokenizes NOTHING; collection
stats are one aggregation over the cached postings.

Scale shape: broadcast query terms ⋈ postings (shuffle-free fan-out),
one (query, doc) aggregation, one top-k window — the exhaustive BM25
plan shape. The MaxScore seed prune does NOT port: the per-doc length
norm is negative and varies by dl, so a seed partial no longer lower-
bounds the k-th best total (documented; candidate sets here are the
same size BM25's exhaustive path handles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.search.bm25 import Bm25Search
from warp_pipes_spark.text.analysis import tokens_expr, tokens_sql


class DirichletQLSearch(Pipe):
    """Query pipe: input df = queries (query_id, text); returns
    (query_id, rank, idx, score) long-form top-k, ranked by Dirichlet
    query likelihood with smoothing parameter ``mu``."""

    def __init__(
        self,
        corpus: DataFrame,
        k: int = 10,
        mu: int = 2000,
        corpus_id: str = "doc_id",
        corpus_text: str = "text",
        query_id: str = "query_id",
        query_text: str = "text",
        broadcast_queries: bool = True,
        index_cache_dir: str | None = None,
        materialize_index: bool = True,
        **kwargs,
    ):
        if mu <= 0:
            raise ValueError(f"mu must be a positive integer, got {mu}")
        super().__init__(**kwargs)
        self.corpus = corpus
        self.k = k
        self.mu = int(mu)
        self.corpus_id = corpus_id
        self.corpus_text = corpus_text
        self.query_id = query_id
        self.query_text = query_text
        self.broadcast_queries = broadcast_queries
        self.index_cache_dir = index_cache_dir
        self.materialize_index = materialize_index

    _no_fingerprint = ("corpus",)

    def _bm(self) -> Bm25Search:
        # postings provider only — shares the tokenization-keyed artifact
        return Bm25Search(
            corpus=self.corpus,
            corpus_id=self.corpus_id,
            corpus_text=self.corpus_text,
            index_cache_dir=self.index_cache_dir,
            materialize_index=self.materialize_index,
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        mu = self.mu
        raw = self._bm()._raw_postings()  # (term, doc_id, dl, tf)
        cf = (
            raw.where(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.sum("tf").alias("cf"))
        )
        tot = cf.agg(F.sum("cf").alias("t_coll"))

        q_terms = df.select(
            F.col(self.query_id).alias("query_id"),
            F.explode(
                F.array_distinct(tokens_expr(F.col(self.query_text)))
            ).alias("term"),
        )
        if self.broadcast_queries:
            q_terms = F.broadcast(q_terms)

        # per-query in-vocabulary term count (the doc-norm multiplier)
        nqt = (
            q_terms.join(cf, "term", "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_qt"))
        )

        # matched-term contributions: ln((mu*cf + tf*T) / (mu*cf)),
        # decimal-rounded and carried as scaled longs (exact)
        matched = (
            q_terms.join(raw, "term")
            .join(cf, "term")
            .crossJoin(F.broadcast(tot))
        )
        arg = (
            (
                F.lit(mu) * F.col("cf") + F.col("tf") * F.col("t_coll")
            ).cast("double")
            / (F.lit(mu) * F.col("cf")).cast("double")
        )
        ts = (F.log(arg).cast("decimal(18,6)") * F.lit(1000000)).cast("long")
        sums = (
            matched.select(
                "query_id",
                F.col("doc_id").alias("idx"),
                ts.alias("ts"),
                F.col("dl"),
            )
            .groupBy("query_id", "idx")
            .agg(F.sum("ts").alias("s_match"), F.max("dl").alias("dl"))
        )

        norm = (
            F.log(
                F.lit(mu).cast("double")
                / (F.col("dl") + F.lit(mu)).cast("double")
            ).cast("decimal(18,6)")
            * F.lit(1000000)
        ).cast("long")
        scores = (
            sums.join(F.broadcast(nqt), "query_id")
            .select(
                "query_id",
                "idx",
                (
                    (F.col("s_match") + F.col("n_qt") * norm)
                    / F.lit(1000000.0)
                ).alias("score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("idx")
        )
        return (
            scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "rank", "idx", "score")
        )


def ql_oracle_sql(
    corpus_table: str,
    queries_cte: str,
    k: int = 10,
    mu: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :class:`DirichletQLSearch` — identical
    tokenization, exact-integer log arguments, rounded per-term
    contributions summed exactly."""
    toks = tokens_sql(text_col)
    return f"""
WITH queries AS ({queries_cte}),
doc_tokens AS (
  SELECT {id_col} AS doc_id, {toks} AS tokens FROM {corpus_table}
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, unnest(tokens) AS term FROM doc_tokens
),
tf AS (
  SELECT term, doc_id, dl, COUNT(*) AS tf FROM postings GROUP BY ALL
),
cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
tot AS (SELECT SUM(cf) AS t_coll FROM cf),
q_terms AS (
  SELECT query_id, unnest(list_distinct({tokens_sql('qtext')})) AS term
  FROM queries
),
nqt AS (
  SELECT query_id, COUNT(*) AS n_qt
  FROM q_terms WHERE term IN (SELECT term FROM cf)
  GROUP BY 1
),
sums AS (
  SELECT q.query_id, t.doc_id AS idx,
         SUM(CAST(ln(CAST({mu} * c.cf + t.tf * s.t_coll AS DOUBLE)
                     / CAST({mu} * c.cf AS DOUBLE)) AS DECIMAL(18,6)))
           AS s_match,
         MAX(t.dl) AS dl
  FROM q_terms q
  JOIN tf t ON q.term = t.term
  JOIN cf c ON t.term = c.term
  CROSS JOIN tot s
  GROUP BY 1, 2
),
scores AS (
  SELECT s.query_id, s.idx,
         s.s_match + n.n_qt * CAST(ln(CAST({mu} AS DOUBLE)
                                      / CAST(s.dl + {mu} AS DOUBLE))
                                   AS DECIMAL(18,6)) AS score
  FROM sums s JOIN nqt n ON s.query_id = n.query_id
),
ranked AS (
  SELECT query_id, idx, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, idx) AS rank
  FROM scores
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, idx,
       CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""

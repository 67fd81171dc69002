"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
distribution looks like a TARGET corpus, by importance weight under two
bag-of-ngrams models. The standard pretraining-data curation move when a
small high-quality target (Wikipedia, textbooks, an eval-adjacent domain)
should steer what's kept from a 100 TB crawl.

Method, exactly as published: features are unigrams + bigrams hashed into
``n_buckets``; fit add-1-smoothed bucket distributions p (target) and q
(raw); each raw document scores ``log w = sum_b count_b * (ln p_b -
ln q_b)``; select the top-k by weight.

Spark-first shape: the only corpus-sized shuffle is the per-(doc, bucket)
count (map-side combined); both models are ``n_buckets``-sized tables that
broadcast back, and the final selection is a global top-k
(TakeOrderedAndProject — no single-partition window). Bucket hashing uses
md5 (portable across Spark / DuckDB / hashlib), and per-bucket log-ratios
round through DECIMAL(18,6) so document sums (int count x decimal) are
exact and order-independent — the whole selection replays bit-exactly in
the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import tokens_expr, tokens_sql


def _features_of_tokens(toks):
    """Unigrams + bigrams from an ALREADY-MATERIALIZED token array column.
    Taking the column (not the text) matters: referencing the tokenizer
    expression here would inline split/lower/filter once per mention —
    five interpreted evaluations per row inside one Generate node."""
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.when(
        n_bi > 0,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _features_sql(text: str) -> str:
    toks = tokens_sql(text)
    return (
        f"list_concat({toks}, "
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(range(1, len({toks})), i -> "
        f"array_to_string(({toks})[i:i+1], ' ')) "
        f"ELSE []::VARCHAR[] END)"
    )


def _bucket_expr(feature, n_buckets: int):
    """md5-hashed feature -> bucket in [0, n_buckets): first 8 hex chars
    as uint32, mod B — portable (DuckDB: ('0x'||substr(md5,1,8))::UBIGINT)."""
    return (
        F.conv(F.substring(F.md5(feature), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


class DsirSelect(Pipe):
    """Select the ``k`` raw documents most target-like by DSIR importance
    weight. Input: the raw corpus. ``target``: the (bounded) exemplar
    corpus. Output: ``(doc_id, <passthrough>, logw)`` for the top-k, by
    (logw DESC, doc_id ASC)."""

    def __init__(
        self,
        target: DataFrame,
        n_buckets: int = 1024,
        k: int = 100,
        id_col: str = "doc_id",
        text_col: str = "text",
        passthrough: tuple = ("source",),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.target = target
        self.n_buckets = n_buckets
        self.k = k
        self.id_col = id_col
        self.text_col = text_col
        self.passthrough = tuple(passthrough)

    _no_fingerprint = ("target",)

    def _bucket_counts(self, df: DataFrame, per_doc: bool) -> DataFrame:
        toks = df.select(
            F.col(self.id_col).alias("doc_id"),
            tokens_expr(F.col(self.text_col)).alias("__toks"),
        )
        feats = toks.select(
            "doc_id", F.explode(_features_of_tokens(F.col("__toks"))).alias("f")
        ).select("doc_id", _bucket_expr(F.col("f"), self.n_buckets).alias("b"))
        keys = ["doc_id", "b"] if per_doc else ["b"]
        return feats.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        B = self.n_buckets
        # ONE pass over each corpus: the per-doc bucket table is persisted
        # (it feeds both the raw model and the scoring join — without the
        # persist each consumer re-scans and re-hashes the 100 TB side),
        # and every later quantity (bucket models, corpus totals) derives
        # from B-bounded tables, never from corpus lineage
        doc_counts = self._bucket_counts(df, per_doc=True).localCheckpoint()
        raw = doc_counts.groupBy("b").agg(F.sum("c").alias("crb"))
        tgt = self._bucket_counts(self.target, per_doc=False).withColumnRenamed(
            "c", "ctb"
        )
        # corpus totals as windows over the B-sized model join: an
        # unpartitioned window is fine here because the frame is bounded
        # at n_buckets rows by construction, and it avoids re-deriving the
        # corpora through separate agg branches
        w = Window.partitionBy(F.lit(1))
        joined = (
            tgt.join(raw, "b", "full")
            .na.fill({"ctb": 0, "crb": 0})
            .withColumn("ct", F.sum("ctb").over(w))
            .withColumn("cr", F.sum("crb").over(w))
        )
        # add-1-smoothed bucket log-ratio, DECIMAL(18,6)-rounded once per
        # bucket so downstream sums are exact integers-of-millionths
        lr = joined.select(
            "b",
            (
                F.log(
                    (F.col("ctb") + 1).cast("double")
                    / (F.col("ct") + B).cast("double")
                ).cast("decimal(18,6)")
                - F.log(
                    (F.col("crb") + 1).cast("double")
                    / (F.col("cr") + B).cast("double")
                ).cast("decimal(18,6)")
            ).alias("lr"),
        )
        scores = (
            doc_counts.join(F.broadcast(lr), "b")
            .groupBy("doc_id")
            .agg(F.sum(F.col("c") * F.col("lr")).alias("s"))
            .select("doc_id", F.col("s").cast("double").alias("logw"))
        )
        out = df.select(
            F.col(self.id_col).alias("doc_id"), *self.passthrough
        ).join(scores, "doc_id")
        return out.orderBy(F.desc("logw"), F.asc("doc_id")).limit(self.k)


def dsir_sql(
    raw_sql: str,
    target_sql: str,
    n_buckets: int = 1024,
    k: int = 100,
    passthrough: str = "source",
) -> str:
    """DuckDB oracle for :class:`DsirSelect`. ``raw_sql`` / ``target_sql``
    must yield (doc_id, text [, passthrough...])."""
    feats = _features_sql("text")
    B = n_buckets
    return f"""
WITH raw_docs AS ({raw_sql}),
tgt_docs AS ({target_sql}),
raw_f AS (
  SELECT doc_id, ('0x' || substring(md5(u.f), 1, 8))::UBIGINT % {B} AS b
  FROM raw_docs, UNNEST({feats}) AS u(f)
),
tgt_f AS (
  SELECT doc_id, ('0x' || substring(md5(u.f), 1, 8))::UBIGINT % {B} AS b
  FROM tgt_docs, UNNEST({feats}) AS u(f)
),
raw_b AS (SELECT b, COUNT(*) AS crb FROM raw_f GROUP BY 1),
tgt_b AS (SELECT b, COUNT(*) AS ctb FROM tgt_f GROUP BY 1),
tot AS (
  SELECT (SELECT COALESCE(SUM(crb), 0) FROM raw_b) AS cr,
         (SELECT COALESCE(SUM(ctb), 0) FROM tgt_b) AS ct
),
lr AS (
  SELECT COALESCE(t.b, r.b) AS b,
         CAST(ln(CAST(COALESCE(ctb, 0) + 1 AS DOUBLE) / (ct + {B})) AS DECIMAL(18,6))
         - CAST(ln(CAST(COALESCE(crb, 0) + 1 AS DOUBLE) / (cr + {B})) AS DECIMAL(18,6)) AS lr
  FROM tgt_b t FULL JOIN raw_b r ON t.b = r.b CROSS JOIN tot
),
doc_b AS (SELECT doc_id, b, COUNT(*) AS c FROM raw_f GROUP BY 1, 2),
scores AS (
  SELECT doc_id, CAST(SUM(c * lr) AS DOUBLE) AS logw
  FROM doc_b JOIN lr USING (b) GROUP BY 1
)
SELECT d.doc_id, d.{passthrough}, s.logw
FROM raw_docs d JOIN scores s USING (doc_id)
ORDER BY s.logw DESC, d.doc_id ASC
LIMIT {k}
"""

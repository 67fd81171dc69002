"""Index-accelerated literal substring search (the pg_trgm pattern).

A `WHERE contains(text, pattern)` over a 100 TB corpus is a full scan
per query batch; the classic fix (PostgreSQL's pg_trgm, Elasticsearch
wildcard fields) is a character-trigram inverted index: a document can
contain the pattern only if it contains EVERY trigram of the pattern,
so the index bounds the verify set to documents matching all pattern
trigrams, and one exact ``contains`` pass over that bounded set gives
scan-identical results.

Plan shape (the part that matters at 100 TB):

* the posting table (distinct char-trigram, doc_id) is a scan-level
  explode — corpus-sized, but it never shuffles: the QUERY side's
  trigram set (<= |patterns| x pattern_len rows) broadcasts into the
  posting scan, so candidate generation is scan + broadcast-hash-join +
  map-side-combined count;
* a candidate survives only if it matched ALL of its query's trigrams
  (count == n_grams — trigram containment is necessary, never
  sufficient);
* the exact ``contains`` verify joins the bounded candidate set back to
  the corpus text — the only row-text access after the scan.

The DuckDB oracle is the NAIVE scan (``JOIN ON contains(text,
pattern)``), so the differential proves the indexed path returns
scan-identical matches.

Reference anchor: search-family extension (``search/bm25.py`` builds
the word-granular inverted index; this is its character-granular
sibling for substring/infix workloads the tokenizer can't serve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class TrigramSubstringSearch(Pipe):
    """Input df = (``query_id``, ``pattern``) literal patterns (length
    >= 3 — shorter patterns have no trigram and would need the full
    scan this operator exists to avoid; they raise); output =
    (query_id, doc_id) for every corpus document whose text contains
    the pattern, identical to the naive scan."""

    def __init__(
        self,
        corpus: DataFrame,
        corpus_id: str = "doc_id",
        corpus_text: str = "text",
        query_id: str = "query_id",
        pattern_col: str = "pattern",
        prune_grams: int = 3,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.corpus_id = corpus_id
        self.corpus_text = corpus_text
        self.query_id = query_id
        self.pattern_col = pattern_col
        # trigram CONTAINMENT is a necessary condition for ANY subset of
        # the pattern's trigrams, so the filter only needs each query's
        # K rarest grams (pg_trgm's actual trick): the candidate-join
        # fan-out is bounded by the K-th rarest gram's document
        # frequency instead of growing with pattern length x corpus
        # (measured at sf1: all-grams 110 s -> rarest-3 ~8 s, identical
        # results — the verify pass is exact either way). 0 = use all
        # grams (the sweep's stress configuration).
        self.prune_grams = prune_grams

    _no_fingerprint = ("corpus",)

    def _gram_df(self, posting: DataFrame) -> DataFrame:
        import os
        import tempfile

        from warp_pipes_spark.core.fingerprint import (
            fingerprint_dataframe,
            get_fingerprint,
        )
        from warp_pipes_spark.pipes.cache import CacheManager

        built = posting.groupBy("gram").agg(
            F.count(F.lit(1)).alias("__df")
        )
        manager = CacheManager(
            os.environ.get(
                "WPS_TRIGRAM_CACHE_DIR",
                os.path.join(
                    tempfile.gettempdir(), "warp_pipes_spark_trigram"
                ),
            )
        )
        fp = get_fingerprint(
            {
                "op": "trigram_df_v1",
                "corpus": fingerprint_dataframe(self.corpus),
                "id": self.corpus_id,
                "text": self.corpus_text,
            }
        )
        if not manager.exists(fp):
            manager.store(built, fp)
        return manager.load(self.corpus.sparkSession, fp)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        def grams(col):
            return F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({col}) - 2, 0)),"
                    f" i -> substring({col}, i, 3))"
                )
            )

        # a pattern shorter than 3 chars has an empty trigram set and
        # would silently match nothing — fail loudly instead (the probe
        # stops at the first offender)
        short = (
            df.filter(F.length(F.col(self.pattern_col)) < 3)
            .limit(1)
            .count()
        )
        if short:
            raise ValueError(
                "TrigramSubstringSearch: pattern shorter than 3 chars has"
                " no trigram — it would need the full scan this index"
                " exists to avoid. Filter or route short patterns to a"
                " direct contains() scan."
            )
        qg = df.select(
            F.col(self.query_id).alias("query_id"),
            grams(self.pattern_col).alias("__g"),
        )
        # patterns shorter than 3 chars have an empty trigram set and
        # would silently match nothing — fail loudly instead
        qgrams = qg.select(
            "query_id", F.explode("__g").alias("gram")
        )
        # grams() is per-doc array_distinct, so the exploded posting is
        # already (doc_id, gram)-unique — a global .distinct() here
        # would shuffle the corpus-sized character posting for nothing
        # (measured: sf1 q228 101.9 s with it)
        posting = self.corpus.select(
            F.col(self.corpus_id).alias("doc_id"),
            F.explode(grams(self.corpus_text)).alias("gram"),
        )
        if self.prune_grams:
            from pyspark.sql import Window

            # one map-side-combined pass over the posting gives the
            # trigram document frequencies (vocabulary-sized output,
            # served from the corpus-fingerprint-keyed Parquet cache —
            # the BM25 index-once-query-many convention — so repeated
            # query batches pay ONE posting scan, not two); keep each
            # query's K rarest grams — deterministic (df, gram) order,
            # though ANY subset yields the same final answer. A query
            # gram ABSENT from the corpus keeps df = 0 and is kept
            # first: no doc can hit it, so count == n_need correctly
            # empties that query's candidates.
            df_tbl = self._gram_df(posting)
            w = Window.partitionBy("query_id").orderBy(
                F.asc("__df"), F.asc("gram")
            )
            sel = (
                qgrams.join(df_tbl, "gram", "left")
                .na.fill({"__df": 0})
                .withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") <= self.prune_grams)
                .select("query_id", "gram")
            )
        else:
            sel = qgrams
        need = sel.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_need")
        )
        cand = (
            posting.join(F.broadcast(sel), "gram")
            .groupBy("query_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("hit"))
            .join(F.broadcast(need), "query_id")
            .filter(F.col("hit") == F.col("n_need"))
            .select("query_id", "doc_id")
        )
        pat = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.pattern_col).alias("__pat"),
        )
        txt = self.corpus.select(
            F.col(self.corpus_id).alias("doc_id"),
            F.col(self.corpus_text).alias("__txt"),
        )
        return (
            cand.join(F.broadcast(pat), "query_id")
            .join(txt, "doc_id")
            .filter(F.contains(F.col("__txt"), F.col("__pat")))
            .select("query_id", "doc_id")
        )


def trigram_search_sql(
    corpus_table: str,
    queries_sql: str,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    query_id: str = "query_id",
    pattern: str = "pattern",
) -> str:
    """DuckDB oracle for :class:`TrigramSubstringSearch` — the NAIVE
    full-scan join the index path must exactly reproduce."""
    return f"""
SELECT q.{query_id} AS query_id, d.{corpus_id} AS doc_id
FROM ({queries_sql}) q
JOIN {corpus_table} d ON contains(d.{corpus_text}, q.{pattern})
"""

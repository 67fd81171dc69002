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
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.corpus_id = corpus_id
        self.corpus_text = corpus_text
        self.query_id = query_id
        self.pattern_col = pattern_col

    _no_fingerprint = ("corpus",)

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
            "query_id",
            F.explode("__g").alias("gram"),
            F.size("__g").alias("n_grams"),
        )
        posting = self.corpus.select(
            F.col(self.corpus_id).alias("doc_id"),
            F.explode(grams(self.corpus_text)).alias("gram"),
        ).distinct()
        cand = (
            posting.join(F.broadcast(qgrams), "gram")
            .groupBy("query_id", "doc_id", "n_grams")
            .agg(F.count(F.lit(1)).alias("hit"))
            .filter(F.col("hit") == F.col("n_grams"))
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

"""Boolean (conjunctive + negation) retrieval over an inverted index —
the Elasticsearch ``bool`` query surface (``must`` / ``must_not``) next
to the ``match`` (BM25), ``match_phrase`` (positional) and ``wildcard``
(trigram) engines the repo already serves; the reference drives exactly
this ES surface (``warp_pipes/support/elasticsearch.py`` es_search
bodies compose bool filters around the match clause).

Plan shape (100 TB posture, the ``search/trigram.py`` conventions):

* the DISTINCT (term, doc_id) posting is built once per corpus
  fingerprint and materialized gram-clustered by term — repeated query
  batches never re-tokenize the corpus;
* ``must``: the batch's required terms (tiny) BROADCAST into the
  posting; a doc survives iff it matched ALL its query's required
  terms (count == n_must — one map-side-combined aggregation);
* ``must_not``: excluded-term hits reduce to distinct (query, doc)
  pairs and LEFT ANTI join the survivors — negation never scans
  documents, only posting slices;
* document text is never touched after indexing (exact-match semantics
  need no verify pass, unlike the trigram engines).

Contract guards (one planning job, the trigram convention): unique
query ids and a non-empty ``must`` set per query — an empty
conjunction would match the whole corpus, which is a full-scan
request, not an index lookup.

The DuckDB oracle is the naive per-document token-array check
(``list_has_all`` / ``NOT list_has_any`` over the shared tokenizer),
so the differential proves the posting path scan-identical.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


def boolean_cache_dir() -> str:
    """Override with ``WPS_BOOL_CACHE_DIR`` (shared storage on a
    cluster so every driver reuses the posting)."""
    return os.environ.get(
        "WPS_BOOL_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "warp_pipes_spark_bool"),
    )


class BooleanSearch(Pipe):
    """Input df = (``query_id``, ``must`` array<string>, ``must_not``
    array<string>) of NORMALIZED terms (run the shared tokenizer on
    free text first); output = (query_id, doc_id) for every corpus
    document containing ALL ``must`` terms and NONE of the
    ``must_not`` terms, identical to the naive token-array scan."""

    def __init__(
        self,
        corpus: DataFrame,
        corpus_id: str = "doc_id",
        corpus_text: str = "text",
        query_id: str = "query_id",
        must_col: str = "must",
        must_not_col: str = "must_not",
        materialize_index: bool = True,
        index_cache_dir: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.corpus_id = corpus_id
        self.corpus_text = corpus_text
        self.query_id = query_id
        self.must_col = must_col
        self.must_not_col = must_not_col
        self.materialize_index = materialize_index
        self.index_cache_dir = index_cache_dir or boolean_cache_dir()

    _no_fingerprint = ("corpus",)

    def _index_fingerprint(self) -> str:
        from warp_pipes_spark.core.fingerprint import (
            fingerprint_dataframe,
            get_fingerprint,
        )

        return get_fingerprint(
            {
                "op": "bool_posting_v1",
                "corpus": fingerprint_dataframe(self.corpus),
                "id": self.corpus_id,
                "text": self.corpus_text,
            }
        )

    def _posting(self) -> DataFrame:
        """DISTINCT (term, doc_id) posting, term-clustered Parquet under
        the corpus fingerprint (tokens_expr emits duplicates within a
        doc, so distinct is per-doc via array_distinct BEFORE the
        explode — no corpus-sized distinct shuffle)."""
        from warp_pipes_spark.text.analysis import tokens_expr

        built = self.corpus.select(
            F.col(self.corpus_id).alias("doc_id"),
            F.explode(
                F.array_distinct(tokens_expr(F.col(self.corpus_text)))
            ).alias("term"),
        )
        if not self.materialize_index:
            return built
        from warp_pipes_spark.pipes.cache import CacheManager

        manager = CacheManager(self.index_cache_dir)
        fp = self._index_fingerprint()
        if not manager.exists(fp):
            manager.store(
                built.repartitionByRange("term").sortWithinPartitions(
                    "term"
                ),
                fp,
            )
        return manager.load(self.corpus.sparkSession, fp)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.array_distinct(F.col(self.must_col)).alias("__must"),
            F.array_distinct(
                F.coalesce(
                    F.col(self.must_not_col),
                    F.array().cast("array<string>"),
                )
            ).alias("__not"),
        )
        # single planning job: unique ids + non-empty must (the trigram
        # guard convention — never raise_error folded into the plan)
        guards = q.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.size("__must")).alias("__m"),
        ).groupBy().agg(
            F.max("__n").alias("max_dup"), F.min("__m").alias("min_must")
        )
        row = guards.collect()[0]
        if row["max_dup"] is not None and row["max_dup"] > 1:
            raise ValueError(
                "BooleanSearch: duplicate query_id — each id must map"
                " to ONE (must, must_not) pair."
            )
        if row["min_must"] is not None and row["min_must"] < 1:
            raise ValueError(
                "BooleanSearch: empty must set — an empty conjunction"
                " matches the whole corpus; that's a scan, not an index"
                " lookup."
            )
        posting = self._posting()
        must = q.select(
            "query_id",
            F.size("__must").alias("n_must"),
            F.explode("__must").alias("term"),
        )
        hits = (
            posting.join(F.broadcast(must), "term")
            .groupBy("query_id", "doc_id", "n_must")
            .agg(F.count(F.lit(1)).alias("hit"))
            .filter(F.col("hit") == F.col("n_must"))
            .select("query_id", "doc_id")
        )
        excl = q.select("query_id", F.explode("__not").alias("term"))
        bad = (
            posting.join(F.broadcast(excl), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        return hits.join(bad, ["query_id", "doc_id"], "left_anti")


def boolean_search_sql(
    corpus_table: str,
    queries_sql: str,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    query_id: str = "query_id",
    must: str = "must",
    must_not: str = "must_not",
) -> str:
    """DuckDB oracle for :class:`BooleanSearch` — the NAIVE per-document
    token-array scan (shared tokenizer) the posting path must exactly
    reproduce."""
    from warp_pipes_spark.text.analysis import tokens_sql

    return f"""
SELECT q.{query_id} AS query_id, d.{corpus_id} AS doc_id
FROM ({queries_sql}) q
JOIN {corpus_table} d
  ON list_has_all({tokens_sql(corpus_text)}, q.{must})
 AND NOT list_has_any({tokens_sql(corpus_text)}, q.{must_not})
"""

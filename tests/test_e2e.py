"""End-to-end pipeline chains over driver testdata — the reference's
user-guide workflow (tokenize -> passages -> index -> search -> re-rank)
re-expressed as one lazy DataFrame plan, plus the predict-cache -> dense
retrieval chain."""

import numpy as np

from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table, with_row_id
from warp_pipes_spark.ml.similarity import BruteForceCosineTopK
from warp_pipes_spark.pipes.cache import CacheManager
from warp_pipes_spark.pipes.passages import GeneratePassages
from warp_pipes_spark.pipes.predict import Predict
from warp_pipes_spark.pipes.tokenizer import RegexTokenizer
from warp_pipes_spark.search.bm25 import Bm25Search
from warp_pipes_spark.search.index import Index
from warp_pipes_spark.search.topk import TopkSearch

SF = "/root/testdata/sf0.001"


def test_tokenize_passages_bm25_chain(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    tok = RegexTokenizer()(docs.select("doc_id", "text"))
    passages = GeneratePassages(
        token_col="tokens", size=16, stride=12, global_cols=["doc_id"]
    )(tok.select("doc_id", "tokens"))
    corpus = passages.select(
        (F.col("doc_id") * 1000 + F.col("passage_idx")).alias("passage_id"),
        "doc_id",
        F.array_join("tokens", " ").alias("text"),
    )
    # every document token lands in exactly one passage row (ownership)
    tok_counts = tok.select("doc_id", F.size("tokens").alias("n"))
    owned = passages.select(
        "doc_id",
        F.aggregate(
            "passage_mask", F.lit(0), lambda acc, x: acc + x
        ).alias("owned"),
    ).groupBy("doc_id").agg(F.sum("owned").alias("owned"))
    joined = tok_counts.join(owned, "doc_id")
    assert joined.filter(F.col("n") != F.col("owned")).count() == 0

    queries = docs.select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(RegexTokenizer()._columns(docs)["tokens"], 1, 8), " "
        ).alias("text"),
    ).limit(20)
    idx = Index(
        corpus=corpus,
        engines=[
            Bm25Search(corpus=corpus, k=20, corpus_id="passage_id"),
            TopkSearch(k=5),
        ],
        k=5,
    )
    out = idx(queries).collect()
    assert len(out) > 0
    # the top-ranked passage for a query made of a doc's first tokens should
    # usually come from that very document
    top1 = {r["query_id"]: r["idx"] // 1000 for r in out if r["rank"] == 1}
    hits = sum(1 for q, d in top1.items() if q == d)
    assert hits >= len(top1) // 2, f"only {hits}/{len(top1)} self-hits"


def test_predict_cache_dense_chain(spark, tmp_path):
    docs = with_row_id(load_table(spark, SF, "documents").limit(64), key="doc_id")

    def fake_embed(texts):
        out = []
        for t in texts:
            rng = np.random.RandomState(abs(hash(t)) % (2**32))
            out.append(rng.randn(16))
        return np.stack(out)

    manager = CacheManager(str(tmp_path / "cache"))
    predict = Predict(
        fake_embed,
        manager,
        model_fingerprint="fake-embed-v1",
        input_fingerprint="docs-sf0.001-64",
    )
    embedded = predict(docs)
    # second call must hit the parquet cache (same fingerprints)
    fp = predict.cache_fingerprint(docs)
    assert manager.exists(fp)

    corpus = embedded.select("row_id", "vector")
    engine = BruteForceCosineTopK(
        corpus=corpus,
        k=3,
        query_id="row_id",
        query_vec="vector",
        corpus_id="row_id",
        corpus_vec="vector",
        exclude_self=False,
    )
    res = Index(corpus=corpus, engines=[engine, TopkSearch(k=1)], k=1)(
        corpus.limit(10)
    ).collect()
    # with self-matches allowed, every query's nearest neighbor is itself
    assert all(r["idx"] == r["query_id"] for r in res)
    assert all(abs(float(r["score"]) - 1.0) < 1e-4 for r in res)

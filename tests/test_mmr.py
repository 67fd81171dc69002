"""MmrRerank: strategy equivalence + greedy-selection invariants."""

from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table
from warp_pipes_spark.search.mmr import MmrRerank


def _run(spark, sf_dir, strategy, k=4, n=8, lam=0.7):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    op = MmrRerank(corpus=emb, k=k, n_candidates=n, lam=lam, strategy=strategy)
    return op(queries)


def test_pandas_matches_relational(spark, sf_dir):
    """The cogrouped-Arrow greedy and the unrolled relational plan are the
    same algorithm — results must be bit-identical."""
    a = sorted(map(tuple, _run(spark, sf_dir, "pandas").collect()))
    b = sorted(map(tuple, _run(spark, sf_dir, "relational").collect()))
    assert a == b
    assert len(a) > 0


def test_mmr_invariants(spark, sf_dir):
    out = _run(spark, sf_dir, "pandas", k=3, n=6).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    emb = load_table(spark, sf_dir, "embeddings")
    n_queries = emb.filter(F.col("vec_id") % 50 == 0).count()
    assert len(by_q) == n_queries
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        # k distinct picks, ranks contiguous from 1
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len({r["doc_id"] for r in rows}) == len(rows)
        assert len(rows) == 3
        # scores can only decrease along the greedy order for rank >= 2
        # (each later pick had the same or worse mmr objective available)
        for a_row, b_row in zip(rows[1:], rows[2:]):
            assert a_row["mmr_score"] >= b_row["mmr_score"]


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR with lam < 1 must never pick a WORSE-relevance doc first, and
    rank-1 equals the plain relevance argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = MmrRerank(corpus=emb, k=2, n_candidates=6, lam=0.7)(queries)
    first = {r["query_id"]: r["doc_id"] for r in out.filter("rank = 1").collect()}
    cand = MmrRerank(corpus=emb, k=1, n_candidates=1, lam=0.7)(queries)
    top1 = {r["query_id"]: r["doc_id"] for r in cand.collect()}
    assert first == top1

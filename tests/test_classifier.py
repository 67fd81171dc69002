"""HashedLinearClassifier: bit-exact default scoring and the trained-weights path."""

from __future__ import annotations

import re

from warp_pipes_spark.text.classifier import _KNUTH, _PRIME, HashedLinearClassifier


def _bucket_py(tok, dim):
    return (7 * len(tok) + ord(tok[0]) + 3 * ord(tok[-1])) % dim


def _score_py(text, dim):
    toks = [t for t in re.split("[^a-z]+", text.lower()) if t]
    if not toks:
        return 0, 0.0
    total = sum((_bucket_py(t, dim) + 1) * _KNUTH % _PRIME - _PRIME // 2 for t in toks)
    return len(toks), total / (len(toks) * _PRIME)


def test_default_weights_match_python_reference(spark):
    texts = ["the quick brown fox", "a b c", "Hello, World! 123", "zzz"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in HashedLinearClassifier(dim=64)(df).collect()}
    for i, t in enumerate(texts):
        n, s = _score_py(t, 64)
        assert out[i]["n_tokens"] == n
        assert out[i]["score"] == s, (t, out[i]["score"], s)
        assert out[i]["label"] == (s > 0.0)


def test_empty_doc_scores_zero(spark):
    df = spark.createDataFrame([(0, ""), (1, "123 456")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in HashedLinearClassifier(dim=64)(df).collect()}
    for i in (0, 1):  # both tokenize to nothing ([^a-z]+ split)
        assert out[i]["n_tokens"] == 0
        assert out[i]["score"] == 0.0
        assert out[i]["label"] is False


def test_explicit_weight_vector(spark):
    dim = 8
    weights = [float(i) - 3.5 for i in range(dim)]  # [-3.5 .. 3.5]
    df = spark.createDataFrame([(0, "ab cd ab")], "doc_id long, text string")
    out = HashedLinearClassifier(dim=dim, weights=weights, threshold=-10.0)(df).collect()[0]
    toks = ["ab", "cd", "ab"]
    expect = sum(weights[_bucket_py(t, dim)] for t in toks) / len(toks)
    assert abs(out["score"] - expect) < 1e-12
    assert out["label"] is True  # threshold -10 < any mean here


def test_stupid_backoff_branches(spark):
    """All three backoff branches on a hand-built corpus: seen trigram
    (ratio of counts), unseen trigram / seen bigram (0.4 * ratio), and
    full backoff to the unigram (0.16 * c/N)."""
    from warp_pipes_spark.text.analysis import StupidBackoffScore

    corpus = spark.createDataFrame(
        [(100, "a b c d"), (101, "b c e")],
        ["doc_id", "text"],
    )
    # N = 7 tokens; trigrams: (a b c), (b c d), (b c e); bigrams incl (c e)
    score = StupidBackoffScore(corpus=corpus)
    # doc 1: trigram (a b c) seen once, c(a b)=1 -> S=1, no backoff
    # doc 2: (a b e): unseen tri, bigram (b e) unseen -> 0.16 * c(e)/7
    # doc 3: (d c e): unseen tri, bigram (c e) seen, c(c)=2 -> 0.4 * 1/2
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b e"), (3, "d c e")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in score(df).collect()}
    assert rows[1]["sb_score"] == 1.0 and rows[1]["backoff_rate"] == 0.0
    assert abs(rows[2]["sb_score"] - 0.16 * 1 / 7) < 1e-5
    assert rows[2]["backoff_rate"] == 1.0
    assert abs(rows[3]["sb_score"] - 0.4 * 0.5) < 1e-6

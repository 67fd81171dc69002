"""BPE trainer + encoder: algorithm correctness, round-trip, determinism."""

from __future__ import annotations

from warp_pipes_spark.text.bpe import END, BpeTokenizer, encode_word, train_bpe


def test_trainer_learns_frequent_pairs(spark):
    # 'aaab' x 10: the dominant pair is (a, a); then (aa, a) etc.
    df = spark.createDataFrame(
        [(i, "aaab aaab aaab") for i in range(10)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=3)
    assert merges[0] == ("a", "a")
    # after (a,a): word is (aa, a, b, </w>) — all pairs tie at count 1, so
    # the lexicographically smallest pair (a, b) merges next (deterministic)
    assert merges[1] == ("a", "b")
    assert merges[2] == ("aa", "ab")


def test_encode_word_follows_merge_ranks():
    ranks = {("a", "a"): 0, ("aa", "b"): 1, ("b", END): 2}
    assert encode_word("aab", ranks) == ["aab", END]
    assert encode_word("ab", ranks) == ["a", "b" + END]  # only rank-2 applies
    assert encode_word("xyz", ranks) == ["x", "y", "z", END]  # no merges match


def test_round_trip_reconstructs_words(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps the fence the end")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=50)
    toks = BpeTokenizer(merges)(docs).collect()[0]["bpe_tokens"]
    # concatenating tokens and splitting on the end-of-word marker must
    # reproduce the original word sequence exactly
    words = "".join(toks).split(END)
    assert words[:-1] == "the quick brown fox jumps the fence the end".split()


def test_encoding_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = train_bpe(docs, n_merges=30)
    one = BpeTokenizer(merges)(docs.coalesce(1)).select("doc_id", "n_bpe_tokens")
    many = BpeTokenizer(merges)(docs.repartition(8)).select("doc_id", "n_bpe_tokens")
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_more_merges_never_increase_token_count(spark):
    docs = spark.createDataFrame(
        [(0, "banana bandana banana bandana cabana")], "doc_id long, text string"
    )
    m10 = train_bpe(docs, n_merges=10)
    m40 = train_bpe(docs, n_merges=40)
    assert m40[:10] == m10  # merge list is a prefix-stable sequence
    n10 = BpeTokenizer(m10)(docs).collect()[0]["n_bpe_tokens"]
    n40 = BpeTokenizer(m40)(docs).collect()[0]["n_bpe_tokens"]
    assert n40 <= n10

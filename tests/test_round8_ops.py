"""Round-8 behavioral tests: trigram index materialization + in-plan
contract guards, gram-literal scan pruning, and the posting's short-doc
hygiene (ADVICE round 7)."""

import pytest
from pyspark.sql import functions as F


def test_trigram_duplicate_query_id_raises(spark):
    from warp_pipes_spark.search.trigram import TrigramSubstringSearch

    docs = spark.createDataFrame(
        [(1, "the quick brown fox")], ["doc_id", "text"]
    )
    dup = spark.createDataFrame(
        [(7, "quick"), (7, "brown")], ["query_id", "pattern"]
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        TrigramSubstringSearch(corpus=docs)(dup)


def test_trigram_short_docs_emit_no_posting_rows(spark):
    # round-7 ADVICE: sequence(1, 0) steps DOWNWARD, so unguarded grams
    # emitted junk sub-3-char 'grams' for short/empty docs
    from warp_pipes_spark.search.trigram import grams_expr

    df = spark.createDataFrame(
        [("ab",), ("",), ("x",), ("abc",)], ["text"]
    )
    rows = df.select(
        grams_expr(F.col("text")).alias("g")
    ).collect()
    assert [r["g"] for r in rows] == [[], [], [], ["abc"]]


def test_trigram_short_docs_never_match_but_dont_pollute(spark):
    from warp_pipes_spark.search.trigram import TrigramSubstringSearch

    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abcdef")], ["doc_id", "text"]
    )
    qs = spark.createDataFrame([(1, "bcd")], ["query_id", "pattern"])
    out = TrigramSubstringSearch(corpus=docs)(qs).collect()
    assert [tuple(r) for r in out] == [(1, 3)]


def test_trigram_pushdown_and_materialization_invariance(spark, tmp_path):
    # same answers with/without the materialized index and with/without
    # the gram-literal IN pushdown; and a materialized index is REUSED
    # (the posting parquet exists after the first run)
    import os

    from warp_pipes_spark.search.trigram import TrigramSubstringSearch

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "pack my box with five dozen jugs"),
            (3, "sphinx of black quartz judge my vow"),
            (4, "quick quartz fox"),
        ],
        ["doc_id", "text"],
    )
    qs = spark.createDataFrame(
        [(10, "quick"), (20, "quartz"), (30, "zebra")],
        ["query_id", "pattern"],
    )
    cache = str(tmp_path / "trgm")
    configs = [
        dict(materialize_index=False),
        dict(materialize_index=True, index_cache_dir=cache),
        dict(
            materialize_index=True,
            index_cache_dir=cache,
            gram_pushdown_max=0,
        ),
        dict(materialize_index=False, prune_grams=0),
    ]
    outs = [
        sorted(
            map(
                tuple,
                TrigramSubstringSearch(corpus=docs, **cfg)(qs).collect(),
            )
        )
        for cfg in configs
    ]
    assert all(o == outs[0] for o in outs)
    assert outs[0] == [(10, 1), (10, 4), (20, 3), (20, 4)]
    # the index artifact landed on disk and is corpus-fingerprint-keyed
    entries = [
        d
        for d in os.listdir(cache)
        if not d.startswith(".") and os.path.isdir(os.path.join(cache, d))
    ]
    assert len(entries) >= 2  # posting + gram-df stats

"""URL canonicalization, HTML stripping, and length-bucketed batching."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.text.packing import LengthBucketBatches
from warp_pipes_spark.text.web import HtmlStrip, UrlParse


def _parse_one(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return UrlParse()(df).collect()[0]


def test_url_parse_components(spark):
    r = _parse_one(spark, "HTTPS://WWW.Example.COM:443/A/b//?q=1#frag")
    assert r["scheme"] == "https"
    assert r["host"] == "example.com"
    assert r["domain"] == "example.com"
    assert r["port"] is None  # 443 is default for https
    assert r["path"] == "/A/b"  # trailing slash run trimmed, case kept
    assert r["canon_url"] == "https://example.com/A/b"


def test_url_parse_explicit_port_and_userinfo(spark):
    r = _parse_one(spark, "http://user:pw@sub.site.org:8080")
    assert r["host"] == "sub.site.org"
    assert r["domain"] == "site.org"
    assert r["port"] == 8080
    assert r["path"] == "/"  # empty path canonicalizes to /
    assert r["canon_url"] == "http://sub.site.org/"


def test_url_parse_single_label_host(spark):
    r = _parse_one(spark, "http://localhost/x")
    assert r["host"] == "localhost"
    assert r["domain"] == ""  # two-label approximation: no registrable domain
    assert r["canon_url"] == "http://localhost/x"


def test_url_canon_is_dedup_key(spark):
    variants = [
        "https://www.shop.example.com/item/1?utm=a#x",
        "HTTPS://shop.example.com:443/item/1/",
        "https://shop.example.com/item/1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = UrlParse()(df).select("canon_url").distinct().collect()
    assert len(out) == 1
    assert out[0]["canon_url"] == "https://shop.example.com/item/1"


def test_html_strip_basic(spark):
    df = spark.createDataFrame(
        [
            (1, '<p>hello <b>world</b></p>'),
            (2, '<script>var x = 1 < 2;</script>after'),
            (3, 'no markup at all'),
            (4, 'a &amp; b &#169; c'),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HtmlStrip()(df).collect()}
    assert rows[1]["clean_text"] == "hello world"
    assert rows[1]["n_tags"] == 4
    # script contents (with a bare '<') removed wholesale, one counted removal
    assert rows[2]["clean_text"] == "after"
    assert rows[2]["n_tags"] == 1
    assert rows[3]["clean_text"] == "no markup at all"
    assert rows[3]["n_tags"] == 0
    assert rows[4]["clean_text"] == "a b c"


def test_html_strip_multiline_script(spark):
    df = spark.createDataFrame(
        [(1, "x<style>\n.a { color: red }\n</style>y")], "doc_id long, text string"
    )
    r = HtmlStrip()(df).collect()[0]
    assert r["clean_text"] == "x y"


def test_length_bucket_batches(spark):
    rows = [("s", i, "w " * (i % 7 + 1)) for i in range(23)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    df = df.withColumn("n_tokens", F.size(F.split(F.trim("text"), " ")))
    out = LengthBucketBatches(batch_size=8)(df).collect()
    assert len(out) == 23
    by_batch = {}
    for r in out:
        by_batch.setdefault(r["batch_id"], []).append(r)
    # full batches of 8 except the last
    sizes = sorted(len(v) for v in by_batch.values())
    assert sizes == [7, 8, 8]
    for rows_ in by_batch.values():
        mx = max(r["n_tokens"] for r in rows_)
        for r in rows_:
            assert r["pad_cost"] == mx - r["n_tokens"]
    # batches are length-sorted: every length in batch 0 >= every in batch 1
    assert min(r["n_tokens"] for r in by_batch[0]) >= max(
        r["n_tokens"] for r in by_batch[1]
    )


def test_length_bucket_deterministic_across_partitionings(spark):
    rows = [("s%d" % (i % 2), i, i % 11 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens int")
    a = sorted(map(tuple, LengthBucketBatches(batch_size=4)(df).collect()))
    b = sorted(
        map(tuple, LengthBucketBatches(batch_size=4)(df.repartition(7)).collect())
    )
    assert a == b


def test_length_bucket_rejects_bad_batch_size():
    with pytest.raises(ValueError):
        LengthBucketBatches(batch_size=0)


def test_fix_encoding_repairs_classic_mojibake(spark):
    from warp_pipes_spark.text.web import FixEncoding

    rows = [
        (0, "cafÃ©"),                      # Ã© -> é
        (1, "donâ€™t"),               # â€™ -> ’
        (2, "itâ€“orâ€”"),  # en/em dash forms
        (3, "a​b﻿c"),                      # zero-width + BOM
        (4, "x y"),                             # nbsp -> space
        (5, "p\x07q\x00r"),                          # control chars
        (6, "plain text"),                           # unchanged
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["fixed_text"], r["changed"])
           for r in FixEncoding()(df).collect()}
    assert got[0] == ("café", True)
    assert got[1] == ("don’t", True)
    assert got[2] == ("it–or—", True)
    assert got[3] == ("abc", True)
    assert got[4] == ("x y", True)
    assert got[5] == ("pqr", True)
    assert got[6] == ("plain text", False)


def test_mojibake_map_is_derived_and_longest_first(spark):
    from warp_pipes_spark.text.web import MOJIBAKE_MAP

    lens = [len(b) for b, _ in MOJIBAKE_MAP]
    assert lens == sorted(lens, reverse=True)
    for bad, good in MOJIBAKE_MAP:
        assert good.encode("utf-8").decode("cp1252") == bad


def test_badwords_exact_token_matching(spark):
    """C4 rule: exact token hits only — 'class' must not trip 'ass';
    filter mode returns survivors with the original schema."""
    from warp_pipes_spark.text.web import BadWordsFilter

    df = spark.createDataFrame(
        [
            (1, "this class is clean"),
            (2, "what an ass remark"),
            (3, "Ass capitalized still caught"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in BadWordsFilter(["ass"])(df).collect()}
    assert out[1]["keep"] is True and out[1]["bad_terms"] == []
    assert out[2]["keep"] is False and out[2]["bad_terms"] == ["ass"]
    assert out[3]["keep"] is False  # lowercased tokenization
    kept = BadWordsFilter(["ass"], mode="filter")(df)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]


def test_line_filter_newline_unit_and_attribution(spark):
    """Rule precedence (blocklist > punct > words), newline split, doc
    gate, and reassembly on a hand-built document."""
    from warp_pipes_spark.text.web import LineFilter

    text = "\n".join(
        [
            "the quick brown fox jumps.",      # kept
            "bad javascript line here now.",   # blocklist (precedence over punct)
            "no terminal punctuation here",    # no punct
            "too short.",                      # short
            "another good line stays here.",   # kept
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = LineFilter(min_words=5, min_lines=3)(df).collect()[0]
    assert r["n_lines"] == 5
    assert r["n_kept"] == 2
    assert r["drop_blocklist"] == 1
    assert r["drop_no_punct"] == 1
    assert r["drop_short"] == 1
    assert not r["keep"]  # 2 < min_lines=3
    assert r["clean_text"] == (
        "the quick brown fox jumps.\nanother good line stays here."
    )


def test_unicode_fold_known_folds(spark):
    """Each fold family lands on its ASCII form; plain ASCII is a no-op
    (changed = False); replace mode rewrites in place."""
    from warp_pipes_spark.text.web import UnicodeFold

    df = spark.createDataFrame(
        [
            (1, "Ｈｅｌｌｏ！"),   # fullwidth Hello!
            (2, "“q” ‘s’ – —"),
            (3, "wait… ﬁne ßuper"),
            (4, "plain ascii"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in UnicodeFold()(df).collect()}
    assert rows[1]["folded_text"] == "Hello!"
    assert rows[2]["folded_text"] == '"q" \'s\' - -'
    assert rows[3]["folded_text"] == "wait... fine ssuper"
    assert rows[4]["folded_text"] == "plain ascii" and not rows[4]["changed"]
    rep = {r["doc_id"]: r["text"] for r in UnicodeFold(mode="replace")(df).collect()}
    assert rep[1] == "Hello!"

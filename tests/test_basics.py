"""Per-operator tests for column ops + combinators (mirrors the reference's
test matrix in tests/core/test_pipe.py and tests/pipes/test_pipelines.py)."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.core.condition import Contains, HasPrefix, In, Not, Static
from warp_pipes_spark.pipes.basics import (
    AddPrefix,
    Apply,
    ApplyToAll,
    DropKeys,
    FilterKeys,
    GetKey,
    Identity,
    Lambda,
    RenameKeys,
    ReplaceInKeys,
)
from warp_pipes_spark.pipes.pipelines import Gate, Parallel, PipeProcessError, Sequential


@pytest.fixture(scope="module")
def ab(spark):
    return spark.createDataFrame([(1, 4), (2, 5), (3, 6)], "a long, b long")


def rows(df, *cols):
    out = df
    if cols:
        out = df.select(*cols)
    return sorted(tuple(r) for r in out.collect())


def test_identity(ab):
    assert rows(Identity()(ab)) == rows(ab)


def test_get_key(ab):
    assert GetKey("a")(ab).columns == ["a"]


def test_filter_keys(ab):
    assert FilterKeys(In(["b"]))(ab).columns == ["b"]
    assert FilterKeys(Contains("a"))(ab).columns == ["a"]


def test_drop_keys(ab):
    assert DropKeys(["a"])(ab).columns == ["b"]
    assert DropKeys(Not(In(["a"])))(ab).columns == ["a"]


def test_add_prefix_and_replace(ab):
    out = AddPrefix("doc.")(ab)
    assert out.columns == ["doc.a", "doc.b"]
    back = ReplaceInKeys("doc.", "")(out)
    assert back.columns == ["a", "b"]


def test_rename_drops_unmapped(ab):
    out = RenameKeys({"a": "x"})(ab)
    assert out.columns == ["x"]  # reference drops unmapped columns


def test_apply_update_semantics(ab):
    out = Apply({"a": F.col("a") * 10})(ab)
    assert rows(out) == [(10, 4), (20, 5), (30, 6)]
    # update=False -> only the op outputs remain
    out2 = Apply({"a": F.col("a") * 10}, update=False)(ab)
    assert out2.columns == ["a"]


def test_apply_new_column(ab):
    out = Apply({"c": F.col("a") + F.col("b")})(ab)
    assert rows(out, "c") == [(5,), (7,), (9,)]


def test_apply_to_all(ab):
    out = ApplyToAll(lambda c: c * 2, update=False)(ab)
    assert rows(out) == [(2, 8), (4, 10), (6, 12)]


def test_lambda(ab):
    out = Lambda(lambda df: df.filter(F.col("a") > 1))(ab)
    assert rows(out) == [(2, 5), (3, 6)]


def test_input_filter_prunes(ab):
    p = Lambda(lambda df: df, input_filter=In(["a"]))
    assert p(ab).columns == ["a"]


def test_sequential(ab):
    pipe = Sequential(
        Apply({"c": F.col("a") + F.col("b")}),
        FilterKeys(In(["c"])),
    )
    assert rows(pipe(ab)) == [(5,), (7,), (9,)]


def test_sequential_error_context(ab):
    bad = Lambda(lambda df: df.select("nope"), id="bad_stage")
    with pytest.raises(PipeProcessError, match="bad_stage"):
        Sequential(Identity(), bad)(ab).collect()


def test_gate_truth_table(ab):
    take_a = FilterKeys(In(["a"]))
    take_b = FilterKeys(In(["b"]))
    assert Gate(True, take_a)(ab).columns == ["a"]
    assert Gate(False, take_a)(ab).columns == []
    assert Gate(False, take_a, alt=take_b)(ab).columns == ["b"]
    # schema-dependent condition resolves at plan time
    assert Gate(Contains("a"), take_a)(ab).columns == ["a"]
    assert Gate(Static(False), take_a, alt=take_b)(ab).columns == ["b"]


def test_parallel_conflict_detection(ab):
    p1 = Apply({"c": F.col("a") + 1}, update=False)
    p2 = Apply({"c": F.col("b") + 1}, update=False)
    with pytest.raises(ValueError, match="conflict|produced by both"):
        Parallel(p1, p2)(ab)


def test_parallel_merges_disjoint_columns(spark):
    df = spark.createDataFrame([(0, 1, 4), (1, 2, 5)], "row_id long, a long, b long")
    p1 = Apply({"c": F.col("a") + 1}, update=True)
    p2 = Apply({"d": F.col("b") + 1}, update=True)
    out = Parallel(p1, p2, update=True)(df)
    assert sorted(out.columns) == ["a", "b", "c", "d", "row_id"]
    got = sorted(tuple(r) for r in out.select("row_id", "c", "d").collect())
    assert got == [(0, 2, 5), (1, 3, 6)]


def test_print_pipes_pass_through(spark):
    import io as _io

    from warp_pipes_spark.pipes.pprint import PrintBatch, PrintContent

    df = spark.createDataFrame([(1, [1, 2]), (2, [3])], "a long, b array<long>")
    buf = _io.StringIO()
    out = PrintBatch(header="probe", count_rows=True, file=buf)(df)
    assert out is df  # identity transform
    report = buf.getvalue()
    assert "rows: 2" in report and "nesting=1" in report
    buf2 = _io.StringIO()
    out2 = PrintContent(n=1, file=buf2)(df)
    assert out2 is df
    assert "a: 1" in buf2.getvalue()


def test_all_values_of_type_condition(spark):
    from warp_pipes_spark.core.condition import AllValuesOfType

    df = spark.createDataFrame([(1, "x", 2.0)], "a bigint, b string, c double")
    assert AllValuesOfType("bigint", ["a"])(df.schema)
    assert AllValuesOfType("string", ["b"])(df.schema)
    assert not AllValuesOfType("bigint", ["a", "b"])(df.schema)
    assert not AllValuesOfType("bigint")(df.schema)
    assert AllValuesOfType("double", ["missing"])(df.schema) is False


def test_ngram_jaccard_prefix_filter_equals_full_join(spark):
    """AllPairs prefix filtering must produce exactly the full self-join's
    result set (it is a lossless candidate pruning, not an approximation)."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.text.dedup import NgramJaccardDedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = sorted(
        tuple(r)
        for r in NgramJaccardDedup(n=3, threshold=0.5, prefix_filter=False)(docs).collect()
    )
    pref = sorted(
        tuple(r)
        for r in NgramJaccardDedup(n=3, threshold=0.5, prefix_filter=True)(docs).collect()
    )
    assert full == pref


def test_gate_branches_on_data(spark):
    """Row-value gating (reference BatchCondition, condition.py:119-143):
    the Gate inspects DATA via a bounded probe, not just the schema."""
    from warp_pipes_spark.core.condition import AllRowsMatch, AnyRowMatches, NonEmpty
    from warp_pipes_spark.pipes.basics import FilterKeys

    df = spark.createDataFrame([(1, "en"), (2, "fr")], "id long, lang string")
    take_id = FilterKeys(["id"])
    take_lang = FilterKeys(["lang"])

    assert Gate(NonEmpty(), take_id)(df).columns == ["id"]
    assert Gate(NonEmpty(), take_id, alt=take_lang)(df.limit(0)).columns == ["lang"]
    assert Gate(AnyRowMatches("lang = 'fr'"), take_id)(df).columns == ["id"]
    assert Gate(AnyRowMatches("lang = 'de'"), take_id, alt=take_lang)(df).columns == ["lang"]
    assert Gate(AllRowsMatch("id > 0"), take_id)(df).columns == ["id"]
    assert Gate(AllRowsMatch("id > 1"), take_id, alt=take_lang)(df).columns == ["lang"]
    # vacuous truth on empty input (reference all() semantics)
    assert Gate(AllRowsMatch("id > 99"), take_id)(df.limit(0)).columns == ["id"]


def test_ngram_jaccard_max_df_paths_agree(spark):
    """With a df cap both paths must score the same capped-Jaccard measure
    (capped intersection over FULL set sizes) and return identical pairs."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.text.dedup import NgramJaccardDedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(n=3, threshold=0.4, max_df=5)
    full = sorted(
        tuple(r)
        for r in NgramJaccardDedup(prefix_filter=False, **kw)(docs).collect()
    )
    pref = sorted(
        tuple(r)
        for r in NgramJaccardDedup(prefix_filter=True, **kw)(docs).collect()
    )
    assert full == pref
    assert len(full) > 0  # the cap must not empty the result on this corpus


def test_simhash_banding_guard():
    from warp_pipes_spark.text.dedup import SimHashDedup

    with pytest.raises(AssertionError, match="max_hamming"):
        SimHashDedup(n_bands=4, max_hamming=4)


def test_auto_engine_registry(spark):
    """Config-driven engine construction (reference AutoSearchEngine /
    AutoVectorBase): an Index built from a plain config list matches the
    hand-built chain."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.search import Bm25Search, Index, TopkSearch, auto_engine, auto_index

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    queries = docs.filter(F.col("doc_id") % 50 == 0).selectExpr(
        "doc_id AS query_id", "text"
    )
    idx = auto_index(docs, [{"name": "bm25", "k": 20}, {"name": "topk", "k": 5}], k=5)
    manual = Index(corpus=docs, engines=[Bm25Search(corpus=docs, k=20), TopkSearch(k=5)], k=5)
    got = sorted(tuple(r) for r in idx(queries).collect())
    want = sorted(tuple(r) for r in manual(queries).collect())
    assert got == want and len(got) > 0

    with pytest.raises(KeyError, match="unknown engine"):
        auto_engine("nope")
    with pytest.raises(ValueError, match="requires a corpus"):
        auto_engine("bm25")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    lsh = auto_engine("lsh", corpus=emb, k=3, dim=64, n_planes=6, n_tables=4)
    assert lsh(emb.filter(F.col("vec_id") % 100 == 0)).count() > 0


def test_dedup_clusters_components(spark):
    """Connected components over chains, cliques and isolated edges: every
    node labeled with the min id of its component; convergence needs
    O(diameter) rounds (the chain here exercises multi-round propagation)."""
    from warp_pipes_spark.text.dedup import DedupClusters

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),   # chain: component 1
        (10, 11), (11, 12), (10, 12),     # triangle: component 10
        (20, 21),                          # isolated pair: component 20
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
              10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # both paths must produce the identical keep-min labeling: the bounded
    # single-task union-find (default) and the distributed label propagation
    # (forced by local_threshold=0)
    fast = {r["doc_id"]: r["cluster_id"] for r in DedupClusters()(df).collect()}
    iterative = {r["doc_id"]: r["cluster_id"]
                 for r in DedupClusters(local_threshold=0)(df).collect()}
    assert fast == expect
    assert iterative == expect


def test_run_batch_dict_roundtrip(spark):
    """Eager dict-batch convenience (reference pipe(batch) parity): dict in,
    dict out, order preserved for row-preserving pipes; update-merge keeps
    input columns; pipelines thread the batch."""
    from warp_pipes_spark.pipes.basics import AddPrefix, FilterKeys
    from warp_pipes_spark.pipes.pipelines import Sequential
    from warp_pipes_spark.text.analysis import TokenCount

    batch = {"doc_id": [1, 2, 3], "text": ["one two", "three", "four five six"]}
    out = TokenCount()(  # __call__ builds plans; run_batch is the eager path
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    assert "n_tokens" in out.columns  # plan path still works

    got = TokenCount().run_batch(batch, spark=spark)
    assert got["doc_id"] == [1, 2, 3]
    assert got["n_tokens"] == [2, 1, 3]

    piped = Sequential(TokenCount(), AddPrefix("d_")).run_batch(batch, spark=spark)
    assert piped["d_n_tokens"] == [2, 1, 3]

    only = FilterKeys(["doc_id"]).run_batch(batch, spark=spark)
    assert only == {"doc_id": [1, 2, 3]}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        TokenCount().run_batch({"doc_id": [1], "text": ["a", "b"]}, spark=spark)


def test_dedup_clusters_long_chain_pointer_jumping(spark):
    """A 200-node path graph (diameter 199): pointer jumping must converge
    well inside 12 rounds (one-hop propagation alone would need ~100);
    every node labels to the chain head."""
    from warp_pipes_spark.text.dedup import DedupClusters

    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in DedupClusters(max_iters=12, local_threshold=0)(df).collect()}
    assert got == {i: 0 for i in range(201)}


def test_dedup_clusters_paths_agree_random_graph(spark):
    """Fast (union-find) and distributed (label-propagation) paths produce
    the identical labeling on a seeded random graph with mixed component
    shapes."""
    import random

    from warp_pipes_spark.text.dedup import DedupClusters

    rng = random.Random(7)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(120), rng.randrange(120))
                               for _ in range(150)) if a != b})
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {r["doc_id"]: r["cluster_id"] for r in DedupClusters()(df).collect()}
    iterative = {r["doc_id"]: r["cluster_id"]
                 for r in DedupClusters(local_threshold=0)(df).collect()}
    assert fast == iterative


def test_pii_scrub(spark):
    from warp_pipes_spark.text.analysis import PiiScrub

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@ex-a.co thanks"),
            (2, "server 10.0.200.1 and backup 192.168.0.254"),
            (3, "call +1 (415) 555-0133 today"),
            (4, "nothing sensitive here"),
            (5, "a@b.io or c.d@e-f.org from 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in PiiScrub()(df).collect()}
    assert rows[1]["clean_text"] == "mail me at <EMAIL> thanks"
    assert rows[1]["n_redactions"] == 1
    assert rows[2]["clean_text"] == "server <IP> and backup <IP>"
    assert rows[2]["n_redactions"] == 2
    assert rows[3]["clean_text"] == "call <PHONE> today"
    assert rows[3]["n_redactions"] == 1
    assert rows[4]["clean_text"] == "nothing sensitive here"
    assert rows[4]["n_redactions"] == 0
    assert rows[5]["clean_text"] == "<EMAIL> or <EMAIL> from <IP>"
    assert rows[5]["n_redactions"] == 3


def test_sentence_split(spark):
    from warp_pipes_spark.text.analysis import SentenceSplit

    df = spark.createDataFrame(
        [
            (1, "One two. Three four! Five six? Seven"),
            (2, "No terminator at all"),
            (3, "Trailing dot."),
        ],
        "doc_id long, text string",
    )
    out = SentenceSplit()(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    assert by_doc[1] == [
        (0, "One two."),
        (1, "Three four!"),
        (2, "Five six?"),
        (3, "Seven"),
    ]
    assert by_doc[2] == [(0, "No terminator at all")]
    assert by_doc[3] == [(0, "Trailing dot.")]


def test_tfidf_ranks_rare_terms_highest(spark):
    from warp_pipes_spark.text.analysis import TfIdf

    df = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common unique"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = TfIdf(m=2)(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # 'common' appears in every doc -> idf = ln(1) = 0; rare terms win
    assert by_doc[1][0] == (1, "rare")
    assert by_doc[2][0] == (1, "unique")
    # doc 3 has only zero-idf terms; 'common' still emitted at rank 1
    assert by_doc[3][0] == (1, "common")


def test_unigram_perplexity_uniform_vs_rare(spark):
    import math

    from warp_pipes_spark.text.analysis import UnigramPerplexity

    # corpus: 'a' x6, 'b' x2 -> p(a)=0.75, p(b)=0.25
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a a a"), (3, "b b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in UnigramPerplexity()(df).collect()}
    assert out[1]["n_tokens"] == 3
    # docs of the frequent token score LOWER (more likely) than rare-token docs
    assert out[1]["avg_nll"] < out[3]["avg_nll"]
    assert abs(out[1]["avg_nll"] - (-math.log(0.75))) < 1e-4
    assert abs(out[3]["avg_nll"] - (-math.log(0.25))) < 1e-4


def test_sentence_dedup_first_occurrence_wins(spark):
    from warp_pipes_spark.text.dedup import SentenceDedup

    df = spark.createDataFrame(
        [
            (1, "Alpha beta. Gamma delta."),
            (2, "Gamma delta. Unique here."),
            (3, "Alpha beta. Gamma delta."),  # fully duplicated -> drops out
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in SentenceDedup()(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "Alpha beta. Gamma delta."
    assert out[1]["n_kept"] == 2
    # doc 2 keeps only the sentence doc 1 didn't already claim
    assert out[2]["text"] == "Unique here."
    assert out[2]["n_kept"] == 1


def test_domain_kl_identical_groups_are_zero(spark):
    from warp_pipes_spark.text.analysis import DomainKL

    df = spark.createDataFrame(
        [
            (1, "x x y", "s1"),
            (2, "x x y", "s2"),
            (3, "z z z", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in DomainKL(group_col="source")(df).collect()}
    # s1 and s2 have identical distributions -> identical KL; the divergent
    # group scores strictly higher
    assert out["s1"]["kl"] == out["s2"]["kl"]
    assert out["s3"]["kl"] > out["s1"]["kl"]
    assert out["s1"]["n_tokens"] == 3


def test_auto_engine_covers_new_engines(spark):
    """Round-2 engines resolve through the registry: matryoshka, pq,
    bm25f, and the champion-capped bm25 config all construct and run."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.search.auto import auto_engine

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    mat = auto_engine("matryoshka", corpus=emb, k=3, prefix_dim=8, prefilter_k=20)
    assert mat(queries).count() > 0

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    dq = docs.filter(F.col("doc_id") % 50 == 0).selectExpr(
        "doc_id AS query_id", "text"
    )
    champ = auto_engine("bm25", corpus=docs, k=3, champion_size=32)
    assert champ(dq).count() > 0


def test_bigram_perplexity_hand_model(spark):
    """Two tiny docs; add-one bigram model counts checked by hand: doc 1 =
    'a b a b' has bigrams ab, ba, ab; doc 2 = 'a b' has ab. Corpus: c(a,b)=3,
    c(b,a)=1, c1(a)=3, c1(b)=1, V=3 (doc 3's lone token counts toward the
    unigram vocabulary). avg_nll(doc2) = -ln((3+1)/(3+3))."""
    import math

    from warp_pipes_spark.text.analysis import BigramPerplexity

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in BigramPerplexity()(df).collect()}
    # doc 3 has one token -> no bigrams -> absent
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    want2 = -round(math.log(4.0 / 6.0), 6)
    assert abs(out[2]["avg_nll"] - want2) < 1e-9
    # doc 1: 2 x ln p(b|a) + 1 x ln p(a|b), decimal-rounded per bigram
    lab = round(math.log(4.0 / 6.0), 6)
    lba = round(math.log(2.0 / 4.0), 6)
    want1 = -(2 * lab + lba) / 3.0
    assert abs(out[1]["avg_nll"] - want1) < 1e-9


def test_dup_span_removal_hand_case(spark):
    """Two docs sharing the 4-token run 'a b c d' (n=3 -> grams abc, bcd
    shared): every covered position drops, surviving tokens reassemble in
    order, and a doc with no shared grams passes through untouched."""
    from warp_pipes_spark.text.dedup import DupSpanRemoval

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c d q"),
            (3, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in DupSpanRemoval(n=3)(df).collect()}
    assert out[1]["clean_text"] == "e f" and out[1]["n_removed"] == 4
    assert out[2]["clean_text"] == "x y q" and out[2]["n_removed"] == 4
    assert out[3]["clean_text"] == "totally unrelated words here"
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] == 4


def test_maximal_span_dedup_hand_case(spark):
    """Lee et al. ExactSubstr semantics: doc 1 repeats 'p q r' WITHIN
    itself (positions 1-3 and 6-8) — total-occurrence counting flags it
    even though no other document shares it (q130's distinct-doc rule
    would not); doc 2/3 share a cross-doc run. Maximal island boundaries
    are exact, 1-based inclusive."""
    from warp_pipes_spark.text.dedup import MaximalSpanDedup

    df = spark.createDataFrame(
        [
            (1, "p q r z z p q r"),
            (2, "a b c d e f"),
            (3, "x y a b c d"),
            (4, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in MaximalSpanDedup(min_len=3)(df).collect()}
    # doc 1: grams 'p q r' at 1 and 6 (count 2) -> spans [1,3] and [6,8]
    assert out[1]["span_starts"] == [1, 6] and out[1]["span_ends"] == [3, 8]
    assert out[1]["n_spans"] == 2 and out[1]["n_removed"] == 6
    assert out[1]["clean_text"] == "z z"
    # docs 2/3: shared 4-run 'a b c d' -> one maximal span each
    assert out[2]["span_starts"] == [1] and out[2]["span_ends"] == [4]
    assert out[2]["clean_text"] == "e f"
    assert out[3]["span_starts"] == [3] and out[3]["span_ends"] == [6]
    assert out[3]["clean_text"] == "x y"
    # untouched doc: empty spans, full passthrough
    assert out[4]["span_starts"] == [] and out[4]["n_spans"] == 0
    assert out[4]["clean_text"] == "nothing shared here at all"


def test_maximal_span_dedup_adjacent_islands_merge(spark):
    """Overlapping duplicated grams coalesce into ONE maximal span (the
    'maximal' in maximal-span): a 5-token shared run with min_len=3
    yields a single [start, start+4] island, not three gram-sized ones."""
    from warp_pipes_spark.text.dedup import MaximalSpanDedup

    df = spark.createDataFrame(
        [(1, "a b c d e x"), (2, "y a b c d e")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in MaximalSpanDedup(min_len=3)(df).collect()}
    assert out[1]["span_starts"] == [1] and out[1]["span_ends"] == [5]
    assert out[2]["span_starts"] == [2] and out[2]["span_ends"] == [6]
    assert out[1]["n_spans"] == 1 and out[2]["n_spans"] == 1


def test_decontaminate_hand_case(spark):
    """Train doc 10 fully contains bench doc 100's trigrams -> flagged
    (containment 1.0); doc 11 shares nothing -> kept. Filter mode returns
    only survivors with the original schema."""
    from warp_pipes_spark.text.dedup import Decontaminate

    train = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "completely different training content here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           Decontaminate(benchmark=bench, n=3, threshold=0.5)(train).collect()}
    assert out[10]["keep"] is False and out[10]["max_containment"] == 1.0
    assert out[10]["n_bench_hits"] == 1
    assert out[11]["keep"] is True and out[11]["max_containment"] == 0.0
    survivors = Decontaminate(benchmark=bench, n=3, threshold=0.5, mode="filter")(train)
    assert [r["doc_id"] for r in survivors.collect()] == [11]
    assert survivors.columns == ["doc_id", "text"]


def test_dsir_ranks_target_like_docs_first(spark):
    """DSIR importance weights: a raw doc written in the target's
    vocabulary outweighs one written in raw-only vocabulary; k truncates."""
    from warp_pipes_spark.text.dsir import DsirSelect

    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta"), (101, "beta gamma delta")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "zz", "alpha beta gamma"),       # target-like
            (2, "zz", "xx yy zz ww qq"),         # off-distribution
            (3, "zz", "beta gamma delta alpha"), # target-like
        ],
        "doc_id long, source string, text string",
    )
    out = DsirSelect(target=target, n_buckets=64, k=2)(raw).collect()
    assert [r["doc_id"] for r in out] != []
    ids = {r["doc_id"] for r in out}
    assert ids <= {1, 3} and len(out) == 2  # the off-distribution doc loses
    assert all(r["logw"] > 0 for r in out)  # target-like => positive weight


def test_item_recs_hand_case(spark):
    """Baskets {1,2},{1,2},{1,3},{2,3}: only the (1,2) pair reaches
    support 2; sim = 2/sqrt(3*3); item 3 gets no recommendations."""
    from warp_pipes_spark.ml.recommend import ItemItemRecs

    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (13, 2), (13, 3)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = sorted(
        (r["part_id"], r["rank"], r["rec_part_id"], round(r["sim"], 6), r["support"])
        for r in ItemItemRecs(k=3, min_support=2)(df).collect()
    )
    assert out == [(1, 1, 2, round(2 / 3, 6), 2), (2, 1, 1, round(2 / 3, 6), 2)]


def test_reference_import_surface():
    """A reference user's `from warp_pipes import X` one-liners port to
    `from warp_pipes_spark import X` (reference warp_pipes/__init__.py +
    pipes/__init__.py export lists, incl. the documented aliases)."""
    import warp_pipes_spark as w

    reference_names = [
        # warp_pipes/__init__.py
        "Fingerprintable", "Pipe", "get_fingerprint",
        # warp_pipes/pipes/__init__.py
        "CollateField", "Index", "GeneratePassages", "BlockSequential",
        "Gate", "Parallel", "ParallelbyField", "Sequential", "PrintBatch",
        "PrintContent", "Predict", "PredictWithCache", "PredictWithoutCache",
        "TokenizerPipe", "Flatten", "Nest", "ApplyAsFlatten",
        # condition family
        "Condition", "Contains", "In", "HasPrefix", "Not", "Reduce",
        "Static", "HasKeys", "HasKeyWithPrefix", "AllValuesOfType",
    ]
    missing = [n for n in reference_names if not hasattr(w, n)]
    assert not missing, missing
    assert not [n for n in w.__all__ if not hasattr(w, n)]


def test_simhash_sig_edges_connectivity_equivalent(spark):
    """'sig_edges' emits O(docs + sig_pairs) edges whose connected
    components EQUAL the full pair set's components — the scale shape for
    cluster formation over heavily duplicated corpora."""
    from warp_pipes_spark.text.dedup import DedupClusters, SimHashDedup

    base = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",   # near-dup of the first
        "one two three four five six seven",
        "totally different words here indeed",
    ]
    rows = []
    # duplicate each base doc 5x -> identical-signature cliques
    for copy in range(5):
        for j, t in enumerate(base):
            rows.append((copy * 10 + j, t))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(n_bands=8, max_hamming=3, materialize_signatures=False, persist=False)
    pairs = SimHashDedup(output="pairs", **kw)(df)
    edges = SimHashDedup(output="sig_edges", **kw)(df)
    n_pairs, n_edges = pairs.count(), edges.count()
    assert n_edges < n_pairs, (n_edges, n_pairs)

    def comps(pair_df):
        lab = DedupClusters()(pair_df.select("doc_a", "doc_b")).collect()
        return sorted((r["doc_id"], r["cluster_id"]) for r in lab)

    assert comps(pairs) == comps(edges)
    # the 5x clique of doc 3's copies must still cluster
    labels = dict(comps(edges))
    assert len({labels[3], labels[13], labels[23], labels[33], labels[43]}) == 1


def test_pii_pseudonymize_consistency(spark):
    """Same entity -> same token corpus-wide (case-insensitive for
    emails); different entities -> different tokens; raw values gone."""
    from warp_pipes_spark.text.analysis import PiiPseudonymize

    df = spark.createDataFrame(
        [
            (1, "mail Admin@Corp.example and 10.0.0.7 now"),
            (2, "re: admin@corp.example said call +1 (415) 555-0123"),
            (3, "other person bob@corp.example wrote"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in PiiPseudonymize()(df).collect()}
    tok1 = [w for w in rows[1]["clean_text"].split() if w.startswith("<EMAIL:")]
    tok2 = [w for w in rows[2]["clean_text"].split() if w.startswith("<EMAIL:")]
    tok3 = [w for w in rows[3]["clean_text"].split() if w.startswith("<EMAIL:")]
    assert tok1 and tok1 == tok2, (tok1, tok2)
    assert tok3 and tok3 != tok1
    assert "<IPV4:" in rows[1]["clean_text"]
    assert "<PHONE:" in rows[2]["clean_text"]
    assert "corp.example" not in rows[1]["clean_text"].lower()
    assert rows[1]["n_entities"] == 2
    assert rows[2]["n_entities"] == 2


def test_char_entropy_bands(spark):
    """Uniform text has maximal entropy ln(k); single-char text has 0;
    natural-ish text sits between."""
    import math

    from warp_pipes_spark.text.analysis import CharEntropy

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaa"),                      # H = 0
            (2, "abcdefghijklmnopqrstuvwxyz"),        # H = ln(26)
            (3, "the quick brown fox jumps over it"),  # 0 < H < ln(27)
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["entropy"] for r in CharEntropy()(df).collect()}
    assert rows[1] == 0.0
    assert abs(rows[2] - math.log(26)) < 1e-4
    assert 0.5 < rows[3] < math.log(27)


def test_gopher_repetition_signals(spark):
    """A looping doc trips the top-2-gram threshold; varied text passes;
    a doc with a repeated long phrase shows dup-5-gram mass."""
    from warp_pipes_spark.text.analysis import GopherRepetition

    loop = "spam ham " * 20
    # long doc of distinct words: on short docs even a count-1 gram
    # exceeds the top-n char thresholds (Gopher pairs these with the
    # min-token gate)
    import itertools
    import string

    varied = " ".join(
        a + b for a, b in itertools.product(string.ascii_lowercase[:10], repeat=2)
    )
    phrase = "alpha beta gamma delta epsilon zeta "
    dup = phrase + "filler words here " + phrase + "ending now"
    df = spark.createDataFrame(
        [(1, loop), (2, varied), (3, dup)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in GopherRepetition()(df).collect()}
    assert rows[1]["top_2gram_frac"] > 0.4
    assert not rows[1]["rep_keep"]
    assert rows[2]["rep_keep"], rows[2]
    assert rows[3]["dup_5gram_frac"] > 0.2


def test_gopher_repetition_keeps_degenerate_docs(spark):
    """Docs too short to produce any n-gram (< 2 tokens) and empty docs
    must still be EMITTED with zero fractions and rep_keep=true — the
    round-4 advisor found they silently vanished (absent from the pivot,
    dropped by the inner join), so a filter(rep_keep) pipeline lost them."""
    from warp_pipes_spark.text.analysis import GopherRepetition

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "spam ham " * 20)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in GopherRepetition()(df).collect()}
    assert set(rows) == {1, 2, 3}, "degenerate docs dropped from output"
    for d in (1, 2):
        assert rows[d]["rep_keep"] is True
        assert rows[d]["top_2gram_frac"] == 0.0
        assert rows[d]["dup_5gram_frac"] == 0.0
    assert not rows[3]["rep_keep"]


def test_lloyd_kmeans_centroids_are_member_means(spark):
    """Lloyd invariant: each output centroid is exactly the (nano-unit
    discretized) mean of its members under the final assignment, and on a
    well-separated 2-cluster set the assignment is the obvious one."""
    from warp_pipes_spark.ml.kmeans import LloydKMeans

    pts = [(i, [0.0 + i * 0.001, 0.0]) for i in range(4)] + [
        (10 + i, [1.0 + i * 0.001, 1.0]) for i in range(4)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = LloydKMeans(k=2, iters=3, dim=2)(df).collect()
    cells = {}
    for r in out:
        cells.setdefault(r.cell, {})[r.dim] = (r.value, r.n_members)
    assert len(cells) == 2
    sizes = sorted(v[0][1] for v in cells.values())
    assert sizes == [4, 4]
    # cluster centers ~ (0.0015, 0) and (1.0015, 1)
    xs = sorted(v[0][0] for v in cells.values())
    assert abs(xs[0] - 0.0015) < 1e-6 and abs(xs[1] - 1.0015) < 1e-6


def test_ngram_pair_cache_is_content_keyed(spark, tmp_path):
    """The round-6 pair-table cache must key on corpus CONTENT + measure
    params: two different corpora (and two different thresholds over the
    same corpus) must not collide; a repeated call must hit (same rows)."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.text.dedup import NgramJaccardDedup

    cache = str(tmp_path / "pairs")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    half = docs.filter("doc_id % 2 = 0")

    def run(frame, threshold):
        op = NgramJaccardDedup(
            n=3,
            threshold=threshold,
            prefix_filter=False,
            shingle_cache_dir=cache,
        )
        return sorted(tuple(r) for r in op(frame).collect())

    full_05 = run(docs, 0.5)
    assert run(docs, 0.5) == full_05  # cache hit reproduces
    half_05 = run(half, 0.5)
    assert half_05 != full_05  # different corpus -> different key
    assert all(r[0] % 2 == 0 and r[1] % 2 == 0 for r in half_05)
    full_03 = run(docs, 0.3)
    # looser threshold keeps at least the same pairs (equal on this tiny
    # corpus is fine) AND must occupy its own cache entry — count distinct
    # artifacts: 3 pair tables + the shingle tables
    assert set(full_03) >= set(full_05)
    import os

    entries = [
        d for d in os.listdir(str(tmp_path / "pairs"))
        if not d.startswith(".")
    ]
    assert len(entries) >= 4, entries

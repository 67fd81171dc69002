"""Hypothesis property tests: random data/configs against independent
oracles (the reference's test strategy, SURVEY §5, generalized beyond fixed
parameter sweeps). max_examples is kept small — every example is a real
Spark job."""

from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.nesting import Flatten, Nest
from warp_pipes_spark.pipes.passages import GeneratePassages
from warp_pipes_spark.search.result import merge_results

SETTINGS = dict(max_examples=8, deadline=None)

ragged = st.lists(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=6),
    min_size=1,
    max_size=5,
)


@settings(**SETTINGS)
@given(data=ragged)
def test_flatten_nest_round_trip(spark, data):
    rows = [(i, arr) for i, arr in enumerate(data)]
    df = spark.createDataFrame(rows, "row_id long, xs array<long>")
    flat = Flatten("xs", level=1, keep_positions=True)(df)
    back = Nest("xs", group_cols=["row_id"], order_col="xs__pos_0")(flat)
    got = {r["row_id"]: r["xs"] for r in back.collect()}
    # rows whose array was empty vanish on explode — the documented
    # difference from the reference's dense layout
    expected = {i: arr for i, arr in enumerate(data) if arr}
    assert got == expected


@settings(**SETTINGS)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=4),
    size=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
def test_passage_ownership_random(spark, lengths, size, overlap):
    stride = max(1, size - min(overlap, size - 1))
    rows = [(i, list(range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<long>")
    out = GeneratePassages(
        token_col="input_ids", size=size, stride=stride, global_cols=["doc_id"]
    )(df).collect()
    owned = defaultdict(list)
    for r in sorted(out, key=lambda r: (r["doc_id"], r["passage_idx"])):
        owned[r["doc_id"]] += [
            t for t, m in zip(r["input_ids"], r["passage_mask"]) if m == 1
        ]
    for i, n in enumerate(lengths):
        assert owned[i] == list(range(n)), (
            f"size={size} stride={stride} len={n}: {owned[i]}"
        )


@settings(**SETTINGS)
@given(
    a=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-1, max_value=6),
            st.floats(min_value=-4, max_value=4, allow_nan=False),
        ),
        max_size=12,
    ),
    b=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-1, max_value=6),
            st.floats(min_value=-4, max_value=4, allow_nan=False),
        ),
        max_size=12,
    ),
)
def test_merge_results_random_vs_dict_oracle(spark, a, b):
    schema = "query_id long, idx long, score double"
    da = spark.createDataFrame(a, schema) if a else spark.createDataFrame([], schema)
    db = spark.createDataFrame(b, schema) if b else spark.createDataFrame([], schema)
    got = {
        (r["query_id"], r["idx"]): r["score"]
        for r in merge_results(da, db).collect()
    }
    # reference offset-by-min semantics (result.py:199-239): within-side
    # sums; an absent side contributes its per-query finite min (else 0);
    # -1 sentinels never acquire mass
    import math

    def side(rows):
        acc = defaultdict(float)
        for q, i, s in rows:
            if i >= 0:
                acc[(q, i)] += s
        mins = {}
        for (q, _), s in acc.items():
            if math.isfinite(s):
                mins[q] = min(mins.get(q, s), s)
        return acc, mins

    sa, ma = side(a)
    sb, mb = side(b)
    oracle = {
        k: sa.get(k, ma.get(k[0], 0.0)) + sb.get(k, mb.get(k[0], 0.0))
        for k in {*sa, *sb}
    }
    assert got.keys() == oracle.keys()
    assert all(abs(got[k] - oracle[k]) < 1e-9 for k in oracle)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Zs", "Po")),
            max_size=60,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_shingle_udf_equals_expression(spark, texts):
    """The vectorized shingle kernel must be byte-identical to the Catalyst
    expression form (same regex, same first-occurrence dedup order)."""
    from warp_pipes_spark.text.dedup import shingles_expr, shingles_udf

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", shingles_expr(F.col("text"), 3).alias("sh")).collect()}
    udf = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", shingles_udf(3)(F.col("text")).alias("sh")).collect()}
    assert expr == udf


@settings(**SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=4),
    size=st.integers(min_value=3, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    n_start=st.integers(min_value=0, max_value=2),
    n_end=st.integers(min_value=0, max_value=1),
    pad=st.sampled_from([None, -1]),
)
def test_passages_match_reference_generator(
    spark, lens, size, overlap_frac, n_start, n_end, pad
):
    """Random sequences × window configs: passages, masks and the skip rule
    agree with the reference-semantics generator (incl. injected tokens and
    ragged tails)."""
    from tests.test_passages import _ref_gen_passages

    stride = max(1 + n_start + n_end, int(size - (size - 1) * overlap_frac))
    eff_size = size - n_start - n_end
    eff_stride = stride - n_start - n_end
    if eff_size <= 0 or eff_stride <= 0 or eff_stride > eff_size:
        return
    start = list(range(-100, -100 + n_start))
    end = list(range(-200, -200 + n_end))
    rows = [(i, list(range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<long>")
    pipe = GeneratePassages(
        token_col="input_ids",
        size=size,
        stride=stride,
        global_cols=["doc_id"],
        pad_value=pad,
        start_tokens=start or None,
        end_tokens=end or None,
    )
    got = defaultdict(list)
    for r in pipe(df).collect():
        got[r["doc_id"]].append(
            (r["passage_idx"], list(r["input_ids"]), list(r["passage_mask"]))
        )
    for i, n in enumerate(lens):
        expected = _ref_gen_passages(list(range(n)), size, stride, start, end, pad)
        actual = sorted(got.get(i, []))
        assert [(ids, m) for _, ids, m in actual] == expected


def _py_minhash_sig(text, n=3, n_hashes=32):
    """Pure-Python twin of portable_minhash_sig: same tokenizer regex, same
    first-occurrence-distinct shingles, same md5('<i>:'+s)[:16] string-min."""
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    sh = list(
        dict.fromkeys(
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        )
    )
    if not sh:
        return None
    return [
        min(
            hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:16] for s in sh
        )
        for i in range(n_hashes)
    ]


def test_minhash_estimate_vs_python_oracle(spark):
    """MinHashEstimate's signatures and estimates equal an independent
    pure-Python implementation; exact duplicates estimate jaccard 1.0."""
    from warp_pipes_spark.text.dedup import MinHashEstimate

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "the quick brown fox jumps over the lazy dog again and again",
        3: "the quick brown fox jumps over the lazy cat again and again",
        4: "completely different content with no overlap whatsoever here",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in MinHashEstimate(n=3, n_hashes=32, threshold=0.3)(df).collect()
    }
    assert (1, 2) in out  # exact duplicates qualify
    dup = out[(1, 2)]
    assert dup["est_jaccard"] == 1.0 and dup["jaccard"] == 1.0
    assert dup["abs_err"] == 0.0
    sigs = {k: _py_minhash_sig(v) for k, v in texts.items()}
    for (a, b), r in out.items():
        matches = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        assert r["n_matches"] == matches, (a, b)
        assert r["est_jaccard"] == matches / 32.0


def test_span_corruption_reconstruction(spark):
    """Input + target reassemble the original token stream: replacing
    <extra_id_i> in the input with target span i yields the original
    tokens; n_masked + unmasked input tokens == doc length."""
    import re

    from warp_pipes_spark.text.packing import SpanCorruption

    docs = spark.createDataFrame(
        [(i, " ".join(chr(97 + j // 26) + chr(97 + j % 26) for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    out = SpanCorruption(start_rate=0.2, max_span=3, seed=1)(docs).collect()
    assert any(r["n_spans"] > 0 for r in out)
    for r in out:
        spans = {}
        for m in re.finditer(r"<extra_id_(\d+)> ((?:(?!<extra_id_)\S+ ?)*)", r["target_text"]):
            spans[int(m.group(1))] = m.group(2).strip().split()
        rebuilt = []
        for piece in r["input_text"].split():
            m = re.match(r"<extra_id_(\d+)>$", piece)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
            else:
                rebuilt.append(piece)
        expected = [chr(97 + j // 26) + chr(97 + j % 26) for j in range(40)]
        assert rebuilt == expected, r["doc_id"]
        assert r["n_spans"] == len(spans)
        n_unmasked = sum(1 for p in r["input_text"].split() if not p.startswith("<extra_id_"))
        assert n_unmasked + r["n_masked"] == 40


# ---- round-3 operators ---------------------------------------------------

def _fix_text_py(s: str) -> str:
    """Independent pure-Python replica of text/web.py's repair chain."""
    import re as _re

    from warp_pipes_spark.text.web import MOJIBAKE_MAP

    for bad, good in MOJIBAKE_MAP:
        s = s.replace(bad, good)
    s = _re.sub("[​‌‍﻿]", "", s)
    s = s.replace(" ", " ")
    s = _re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
    return s


_artifact_alphabet = st.sampled_from(
    list("abc XYZ.!?'\n\t")
    + ["Ã©", "â€™", "Â«", "​",
       "﻿", " ", "\x07", "Ã", "Â", "â", "€",
       "cafÃ©"]
)


@settings(**SETTINGS)
@given(texts=st.lists(st.lists(_artifact_alphabet, max_size=12).map("".join),
                      min_size=1, max_size=6))
def test_fix_encoding_matches_python_replica(spark, texts):
    from warp_pipes_spark.text.web import FixEncoding

    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {r["id"]: r["fixed_text"] for r in FixEncoding()(df).collect()}
    assert got == {i: _fix_text_py(t) for i, t in enumerate(texts)}


_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=6
)


@settings(**SETTINGS)
@given(words=_words, vocab_words=_words)
def test_wordpiece_reassembly_and_offsets(spark, words, vocab_words):
    """For ANY vocab: non-UNK pieces of a word concatenate (## stripped)
    back to the word, offsets tile the word left-to-right, and every piece
    slices the source text at its offsets."""
    from warp_pipes_spark.pipes.tokenizer import WordPieceTokenizer

    text = " ".join(words)
    # vocab: all single chars (so encoding always succeeds) + random pieces
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    vocab += sorted({c for w in words for c in w})
    vocab += sorted({"##" + c for w in words for c in w})
    vocab += sorted(set(vocab_words) - set(vocab))
    vocab += sorted({"##" + w for w in vocab_words if "##" + w not in vocab})
    df = spark.createDataFrame([(0, text)], "id long, text string")
    out = WordPieceTokenizer(
        vocab, return_offsets_mapping=True, add_special_tokens=False
    )(df).collect()[0]
    toks, offs = out["tokens"], out["offset_mapping"]
    assert len(toks) == len(offs)
    rebuilt = []
    for t, o in zip(toks, offs):
        piece = t[2:] if t.startswith("##") else t
        assert text[o["start"]:o["end"]] == piece
        if not t.startswith("##"):
            rebuilt.append(piece)
        else:
            rebuilt[-1] += piece
    assert rebuilt == words


@settings(**SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
    cap=st.integers(min_value=64, max_value=512),
)
def test_best_fit_pack_random_vs_python_loop(spark, sizes, cap):
    """BFD packing on random sizes: the distributed result equals the
    shared Python loop run over the same deterministic order, and every
    multi-doc pack respects capacity with gap-free offsets."""
    from warp_pipes_spark.text.packing import BestFitPack

    rows = [(i, "s", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        r["id"]: (r["pack_id"], r["pack_offset"])
        for r in BestFitPack(capacity=cap)(df).collect()
    }
    order = sorted(rows, key=lambda r: (-r[2], r[0]))
    placed = BestFitPack.bfd([n for _, _, n in order], cap)
    want = {i: po for (i, _, _), po in zip(order, placed)}
    assert got == want
    fills = defaultdict(list)
    for i, (p, off) in got.items():
        fills[p].append((off, dict((r[0], r[2]) for r in rows)[i]))
    for spans in fills.values():
        spans.sort()
        end = 0
        for off, n in spans:
            assert off == end
            end = off + n
        if len(spans) > 1:
            assert end <= cap


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_maximal_spans_equal_python_gram_coverage(spark, docs, n):
    """ExactSubstr semantics on random corpora: the maximal spans equal
    the islands of positions covered by n-grams with total corpus count
    >= 2, computed by an independent pure-Python replica."""
    from warp_pipes_spark.text.dedup import MaximalSpanDedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in MaximalSpanDedup(min_len=n)(df).collect()}

    # independent replica: gram counts -> coverage -> islands
    toks = {i: [w for w in t.split() if w] for i, t in rows}
    counts = defaultdict(int)
    for i, ws in toks.items():
        for s in range(len(ws) - n + 1):
            counts[tuple(ws[s:s + n])] += 1
    for i, ws in toks.items():
        cov = set()
        for s in range(len(ws) - n + 1):
            if counts[tuple(ws[s:s + n])] >= 2:
                cov.update(range(s + 1, s + n + 1))  # 1-based inclusive
        spans = []
        for p in sorted(cov):
            if spans and spans[-1][1] == p - 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        assert out[i]["span_starts"] == [a for a, _ in spans]
        assert out[i]["span_ends"] == [b for _, b in spans]
        assert out[i]["n_removed"] == len(cov)
        kept = [w for j, w in enumerate(ws, start=1) if j not in cov]
        assert out[i]["clean_text"] == " ".join(kept)

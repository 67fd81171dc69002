"""Passage-generation invariants (ports the reference's property tests,
tests/pipes/test_passages.py:63-86): over a config sweep, every input token
is owned by exactly one window's mask; windows/masks have equal lengths;
padded windows have length == size."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.passages import GeneratePassages


@pytest.fixture(scope="module")
def token_df(spark):
    rows = [(i, list(range(n))) for i, n in enumerate([99, 100, 7, 1, 0, 25])]
    return spark.createDataFrame(rows, "doc_id long, input_ids array<long>")


@pytest.mark.parametrize("size,stride", [(10, 7), (10, 8), (10, 10), (8, 5)])
@pytest.mark.parametrize("pad", [None, -1])
def test_ownership_invariant(spark, token_df, size, stride, pad):
    pipe = GeneratePassages(
        token_col="input_ids",
        size=size,
        stride=stride,
        global_cols=["doc_id"],
        pad_value=pad,
        pad_values={"passage_mask": 0},
    )
    out = pipe(token_df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["input_ids"] for r in token_df.collect()}

    for doc_id, toks in originals.items():
        passages = sorted(by_doc.get(doc_id, []), key=lambda r: r["passage_idx"])
        if len(toks) == 0:
            assert passages == []
            continue
        owned = []
        for r in passages:
            ids, mask = r["input_ids"], r["passage_mask"]
            assert len(ids) == len(mask)
            if pad is not None:
                assert len(ids) == size
            else:
                assert len(ids) <= size
            owned += [t for t, m in zip(ids, mask) if m == 1]
        # every token owned exactly once, in order
        assert owned == toks, (
            f"doc {doc_id} size={size} stride={stride} pad={pad}: "
            f"owned {owned} != {toks}"
        )


def test_field_cols_windowed_coherently(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4, 5], [10, 20, 30, 40, 50])],
        "doc_id long, input_ids array<long>, attention array<long>",
    )
    pipe = GeneratePassages(
        token_col="input_ids",
        size=3,
        stride=2,
        field_cols=["attention"],
        global_cols=["doc_id"],
        pad_value=0,
        pad_values={"attention": 0},
    )
    out = sorted(pipe(df).collect(), key=lambda r: r["passage_idx"])
    for r in out:
        assert len(r["input_ids"]) == len(r["attention"]) == 3
        # aligned windows: attention = 10 * input_ids where unpadded
        for a, b in zip(r["input_ids"], r["attention"]):
            if b != 0:
                assert b == 10 * a


def test_stride_must_tile():
    with pytest.raises(ValueError, match="stride"):
        GeneratePassages(token_col="x", size=5, stride=6)


def test_offsets_slice_text_back(spark):
    """offset_mapping parity: token spans index the ORIGINAL text, and
    carried through passages they recover each passage's source span
    (reference GeneratePassages text slicing, passages.py:273-278)."""
    from warp_pipes_spark.pipes.tokenizer import RegexTokenizer

    rows = [(0, "Hello, world! This is a Test."), (1, "one two  three")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = RegexTokenizer(emit_offsets=True)(df)
    for r in tok.collect():
        text = r["text"]
        assert len(r["offset_mapping"]) == len(r["tokens"])
        for t, o in zip(r["tokens"], r["offset_mapping"]):
            assert text[o["start"]:o["end"]].lower() == t

    passages = GeneratePassages(
        token_col="tokens",
        size=3,
        stride=2,
        field_cols=["offset_mapping"],
        global_cols=["doc_id", "text"],
    )(tok.select("doc_id", "text", "tokens", "offset_mapping"))
    for r in passages.collect():
        span = r["text"][r["offset_mapping"][0]["start"]:r["offset_mapping"][-1]["end"]]
        # the recovered span contains exactly this passage's tokens in order
        import re
        toks = [x for x in re.split("[^a-z]+", span.lower()) if x]
        assert toks == list(r["tokens"])


def _ref_gen_passages(seq, size, stride, start_tokens, end_tokens, pad_token):
    """Reference-semantics generator (clean-room restatement of
    warp_pipes/pipes/passages.py:292-368 observed behavior) used as the
    oracle for injection/skip parity."""
    start_tokens = start_tokens or []
    end_tokens = end_tokens or []
    eff_size = size - len(start_tokens) - len(end_tokens)
    eff_stride = stride - len(start_tokens) - len(end_tokens)
    margin = eff_size - eff_stride
    out = []
    for i in range(0, len(seq), eff_stride):
        left_pad = margin // 2 + margin % 2 if i else 0
        right_pad = margin // 2
        center = eff_size - left_pad - right_pad
        chunk = seq[i : i + eff_size]
        padding = max(0, eff_size - len(chunk)) if pad_token is not None else 0
        if len(chunk) > left_pad:
            passage = start_tokens + chunk + end_tokens + padding * [pad_token]
            mask = (
                (len(start_tokens) + left_pad) * [0]
                + center * [1]
                + [0] * (len(end_tokens) + right_pad)
            )
            if padding > 0:
                mask[-padding:] = padding * [0]
            out.append((passage, mask[: len(passage)]))
    return out


@pytest.mark.parametrize("size,stride", [(10, 7), (8, 6), (8, 8)])
@pytest.mark.parametrize("pad", [None, -1])
@pytest.mark.parametrize("inject", [([101], [102]), ([101, 103], []), ([], [])])
def test_start_end_token_reference_parity(spark, token_df, size, stride, pad, inject):
    """Window contents, masks AND the skip rule match the reference's
    gen_passages for every (size, stride, pad, start/end) combination."""
    start, end = inject
    pipe = GeneratePassages(
        token_col="input_ids",
        size=size,
        stride=stride,
        global_cols=["doc_id"],
        pad_value=pad,
        start_tokens=start or None,
        end_tokens=end or None,
    )
    got = {}
    for r in pipe(token_df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["passage_idx"], list(r["input_ids"]), list(r["passage_mask"]))
        )
    for r in token_df.collect():
        expected = _ref_gen_passages(
            list(r["input_ids"]), size, stride, start, end, pad
        )
        actual = sorted(got.get(r["doc_id"], []))
        assert len(actual) == len(expected), (r["doc_id"], actual, expected)
        for (idx, ids, mask), (eids, emask) in zip(actual, expected):
            assert ids == eids, (r["doc_id"], idx, ids, eids)
            assert mask == emask, (r["doc_id"], idx, mask, emask)


@pytest.mark.parametrize("size,stride", [(10, 7), (8, 6)])
def test_ownership_invariant_with_injected_tokens(spark, token_df, size, stride):
    """Each SOURCE token is mask-owned exactly once even when windows are
    wrapped in [CLS]/[SEP]-style injected tokens (which are never source
    tokens)."""
    pipe = GeneratePassages(
        token_col="input_ids",
        size=size,
        stride=stride,
        global_cols=["doc_id"],
        start_tokens=[-101],
        end_tokens=[-102],
    )
    by_doc = {}
    for r in pipe(token_df).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for src in token_df.collect():
        toks = list(src["input_ids"])
        rows = sorted(by_doc.get(src["doc_id"], []), key=lambda r: r["passage_idx"])
        owned = []
        for r in rows:
            assert r["input_ids"][0] == -101 and r["input_ids"][-1] == -102
            owned += [
                t for t, m in zip(r["input_ids"], r["passage_mask"])
                if m == 1 and t >= 0
            ]
        assert owned == toks


@pytest.mark.parametrize("size,stride", [(12, 9), (10, 10)])
@pytest.mark.parametrize("pad", [None, -1])
def test_prepend_field_reference_parity(spark, size, stride, pad):
    """prepend_cols matches the reference's prepend_field rule
    (passages.py:244-271): per-example title tokens are appended to the
    static start_tokens, shrinking the effective window per row."""
    rows = [
        (0, list(range(30)), [900, 901]),
        (1, list(range(7)), [902]),
        (2, list(range(15)), []),       # empty title
        (3, list(range(4)), None),      # NULL title = no prepend
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, input_ids array<long>, title_ids array<long>"
    )
    pipe = GeneratePassages(
        token_col="input_ids",
        size=size,
        stride=stride,
        global_cols=["doc_id"],
        pad_value=pad,
        start_tokens=[101],
        end_tokens=[102],
        prepend_cols="title_ids",
    )
    got = {}
    for r in pipe(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["passage_idx"], list(r["input_ids"]), list(r["passage_mask"]))
        )
    for doc_id, toks, title in rows:
        expected = _ref_gen_passages(
            toks, size, stride, [101] + list(title or []), [102], pad
        )
        actual = sorted(got.get(doc_id, []))
        assert len(actual) == len(expected), (doc_id, actual, expected)
        for (idx, ids, mask), (eids, emask) in zip(actual, expected):
            assert ids == eids, (doc_id, idx, ids, eids)
            assert mask == emask, (doc_id, idx, mask, emask)
        # every SOURCE token still owned exactly once (injected/prepended
        # tokens are all >= 100 in this fixture; on ragged unpadded tails
        # the reference's mask can also cover the end token — parity with
        # that behavior is already asserted bit-exact above)
        owned = [
            t
            for _, ids, mask in actual
            for t, m in zip(ids, mask)
            if m == 1 and t < 100
        ]
        assert owned == toks


def test_prepend_field_cols_aligned(spark):
    """With field_cols, each windowed column takes its own prepend source
    and all windows stay token-aligned (reference get_eg_args injects into
    input_ids/attention_mask/offset_mapping coherently)."""
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4, 5, 6], [10, 20, 30, 40, 50, 60], [7, 8], [70, 80])],
        "doc_id long, input_ids array<long>, attention array<long>, "
        "t_ids array<long>, t_att array<long>",
    )
    pipe = GeneratePassages(
        token_col="input_ids",
        size=6,
        stride=5,
        field_cols=["attention"],
        global_cols=["doc_id"],
        pad_value=0,
        pad_values={"attention": 0},
        prepend_cols={"input_ids": "t_ids", "attention": "t_att"},
    )
    out = sorted(pipe(df).collect(), key=lambda r: r["passage_idx"])
    assert len(out) >= 2
    for r in out:
        assert len(r["input_ids"]) == len(r["attention"]) == 6
        assert r["input_ids"][:2] == [7, 8] and r["attention"][:2] == [70, 80]
        for a, b in zip(r["input_ids"][2:], r["attention"][2:]):
            if b != 0:
                assert b == 10 * a


def test_prepend_requires_dict_with_field_cols():
    with pytest.raises(ValueError, match="prepend_cols"):
        GeneratePassages(
            token_col="input_ids",
            size=8,
            stride=8,
            field_cols=["attention"],
            prepend_cols="t_ids",
        )


def test_skip_rule_drops_fully_owned_tail(spark):
    """A tail window whose tokens all belong to its predecessor is not
    emitted (reference 'only return if there are unmasked tokens')."""
    df = spark.createDataFrame([(0, list(range(11)))], "doc_id long, input_ids array<long>")
    out = GeneratePassages(
        token_col="input_ids", size=10, stride=7, global_cols=["doc_id"]
    )(df).collect()
    # starts 0 and 7: window@7 has len 4 > left_pad 2 -> emitted; but with
    # 9 tokens the window@7 would have len 2 <= left_pad 2 -> skipped
    assert len(out) == 2
    df2 = spark.createDataFrame([(0, list(range(9)))], "doc_id long, input_ids array<long>")
    out2 = GeneratePassages(
        token_col="input_ids", size=10, stride=7, global_cols=["doc_id"]
    )(df2).collect()
    assert len(out2) == 1

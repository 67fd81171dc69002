"""Text-analysis operators for LLM-data pipelines.

Extensions beyond the reference (north-star additions): token counting,
quality scoring, language identification, and document fingerprinting over a
``documents(doc_id, text, ...)`` table. All are pure column expressions —
JVM-side, whole-stage-codegen'd, zero shuffle, zero Python — so they run at
scan speed on 100 TB.

Each operator ships a matching DuckDB oracle-SQL generator built from the
SAME constants, so the driver's differential harness can verify them
bit-for-bit.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

# regex used to tokenize: runs of non-lowercase-letters separate tokens.
TOKEN_SPLIT_RE = "[^a-z]+"

# The tokenization contract lowers ASCII A-Z ONLY, via translate() in every
# engine. Full Unicode lower() is NOT portable: Python, the JVM and
# utf8proc disagree on expanding/contracting mappings (e.g. U+0130 'İ'),
# and Python's str.lower() isn't even length-preserving — which breaks
# offset mappings. ASCII translate is bit-identical across Spark, DuckDB
# and Python and length-preserving by construction; non-ASCII letters stay
# unlowered and fall to the `[^a-z]+` split like any other non-token byte.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_PY_ASCII_LOWER = str.maketrans(ASCII_UPPER, ASCII_LOWER)


def ascii_lower_py(s: str) -> str:
    return s.translate(_PY_ASCII_LOWER)


def ascii_lower_expr(text: Column) -> Column:
    return F.translate(text, ASCII_UPPER, ASCII_LOWER)


def ascii_lower_sql(text: str) -> str:
    return f"translate({text}, '{ASCII_UPPER}', '{ASCII_LOWER}')"

# tiny deterministic stopword lists for language scoring (public knowledge)
LANG_STOPWORDS: Dict[str, tuple] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "is", "of", "to", "in", "it"),
    "es": ("el", "la", "los", "que", "es", "un", "una", "por"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
}

# punctuation alphabet for quality ratios (explicit set => engine-agnostic)
PUNCT_CHARS = ".,;:!?"

# polynomial rolling-hash parameters for document fingerprints
FP_BASE = 31
FP_MOD = 1_000_000_007


def tokens_expr(text: Column) -> Column:
    """lowercase tokens, empty strings removed (split-regex parity with the
    DuckDB oracle is guaranteed because both use RE-class `[^a-z]+`)."""
    return F.filter(
        F.split(ascii_lower_expr(text), TOKEN_SPLIT_RE), lambda t: F.length(t) > 0
    )


def tokens_sql(text: str = "text") -> str:
    return (
        f"list_filter(string_split_regex({ascii_lower_sql(text)}, '{TOKEN_SPLIT_RE}'),"
        f" t -> length(t) > 0)"
    )


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


class TokenCount(Pipe):
    """Whitespace/regex token count per document (extension operator)."""

    def __init__(self, text_col: str = "text", out_col: str = "n_tokens", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        return {self.out_col: F.size(tokens_expr(F.col(self.text_col)))}


def token_count_sql(text: str = "text") -> str:
    return f"CAST(len({tokens_sql(text)}) AS INTEGER)"


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


class QualityScore(Pipe):
    """Deterministic quality features: char count, token count, mean token
    length, punctuation ratio. Ratios are rounded through DECIMAL(18,6)
    (engine-agnostic value) then emitted as DOUBLE so the driver's value
    hash canonicalizes identically across engines."""

    def __init__(self, text_col: str = "text", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        text = F.col(self.text_col)
        toks = tokens_expr(text)
        n_chars = F.length(text)
        n_tokens = F.size(toks)
        punct = n_chars - F.length(F.translate(text, PUNCT_CHARS, ""))
        mean_tok = (
            F.when(
                n_tokens > 0,
                (
                    F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
                    / n_tokens.cast("double")
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("decimal(18,6)")
            .cast("double")
        )
        punct_ratio = (
            F.when(n_chars > 0, punct.cast("double") / n_chars.cast("double"))
            .otherwise(F.lit(0.0))
            .cast("decimal(18,6)")
            .cast("double")
        )
        return {
            "q_chars": n_chars.cast("int"),
            "q_tokens": n_tokens.cast("int"),
            "q_mean_tok_len": mean_tok,
            "q_punct_ratio": punct_ratio,
        }


def quality_sql(text: str = "text") -> Dict[str, str]:
    toks = tokens_sql(text)
    return {
        "q_chars": f"CAST(length({text}) AS INTEGER)",
        "q_tokens": f"CAST(len({toks}) AS INTEGER)",
        "q_mean_tok_len": (
            f"CAST(CAST(CASE WHEN len({toks}) > 0 THEN "
            f"list_sum(list_transform({toks}, t -> length(t))) / CAST(len({toks}) AS DOUBLE) "
            f"ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE)"
        ),
        "q_punct_ratio": (
            f"CAST(CAST(CASE WHEN length({text}) > 0 THEN "
            f"CAST(length({text}) - length(translate({text}, '{PUNCT_CHARS}', '')) AS DOUBLE)"
            f" / CAST(length({text}) AS DOUBLE) ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE)"
        ),
    }


class GopherQualityFilter(Pipe):
    """Gopher/C4-style rule-based document quality gate (Rae et al. 2021
    §A1.1, Raffel et al. 2020 §2.2, adapted to the engine's tokenizer):
    each rule is an explicit boolean column — token-count bounds, mean
    token length bounds, punctuation-ratio cap, digit-free token fraction,
    minimum distinct-stopword hits — and ``keep`` is their conjunction.
    Emitting per-rule verdicts (not just the gate) is what makes the
    filter auditable: corpus curation reports 'why dropped' per rule.
    Pure column expressions over one scan — no UDF, no shuffle; ratios are
    exact-integer divisions so verdicts are engine-agnostic."""

    def __init__(
        self,
        text_col: str = "text",
        min_tokens: int = 24,
        max_tokens: int = 100_000,
        min_mean_tok_len: float = 3.9,
        max_mean_tok_len: float = 5.1,
        max_punct_ratio: float = 0.1,
        min_alpha_frac: float = 0.8,
        min_stopword_hits: int = 1,
        stopwords: tuple = LANG_STOPWORDS["en"],
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.min_mean_tok_len = min_mean_tok_len
        self.max_mean_tok_len = max_mean_tok_len
        self.max_punct_ratio = max_punct_ratio
        self.min_alpha_frac = min_alpha_frac
        self.min_stopword_hits = min_stopword_hits
        self.stopwords = tuple(stopwords)

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        text = F.col(self.text_col)
        toks = tokens_expr(text)
        n_tokens = F.size(toks)
        n_chars = F.length(text)
        sum_len = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        mean_tok = F.when(
            n_tokens > 0, sum_len / n_tokens.cast("double")
        ).otherwise(F.lit(0.0))
        punct = n_chars - F.length(F.translate(text, PUNCT_CHARS, ""))
        punct_ratio = F.when(
            n_chars > 0, punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0))
        alpha = F.size(F.filter(toks, lambda t: ~t.rlike("[0-9]")))
        alpha_frac = F.when(
            n_tokens > 0, alpha.cast("double") / n_tokens.cast("double")
        ).otherwise(F.lit(0.0))
        hits = F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in self.stopwords]),
            )
        )
        rules = {
            "r_token_count": (n_tokens >= self.min_tokens)
            & (n_tokens <= self.max_tokens),
            "r_mean_tok_len": (mean_tok >= self.min_mean_tok_len)
            & (mean_tok <= self.max_mean_tok_len),
            "r_punct_ratio": punct_ratio <= self.max_punct_ratio,
            "r_alpha_frac": alpha_frac >= self.min_alpha_frac,
            "r_stopwords": hits >= self.min_stopword_hits,
        }
        keep = None
        for c in rules.values():
            keep = c if keep is None else (keep & c)
        return {**rules, "keep": keep}


def gopher_sql(
    text: str = "text",
    min_tokens: int = 24,
    max_tokens: int = 100_000,
    min_mean_tok_len: float = 3.9,
    max_mean_tok_len: float = 5.1,
    max_punct_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 1,
    stopwords: tuple = LANG_STOPWORDS["en"],
) -> Dict[str, str]:
    """DuckDB twins of :class:`GopherQualityFilter`'s rule columns."""
    toks = tokens_sql(text)
    nt = f"len({toks})"
    mean = (
        f"CASE WHEN {nt} > 0 THEN "
        f"list_sum(list_transform({toks}, t -> length(t))) / CAST({nt} AS DOUBLE) "
        f"ELSE 0.0 END"
    )
    pr = (
        f"CASE WHEN length({text}) > 0 THEN "
        f"CAST(length({text}) - length(translate({text}, '{PUNCT_CHARS}', '')) AS DOUBLE)"
        f" / CAST(length({text}) AS DOUBLE) ELSE 0.0 END"
    )
    af = (
        f"CASE WHEN {nt} > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> NOT regexp_matches(t, '[0-9]'))) AS DOUBLE)"
        f" / CAST({nt} AS DOUBLE) ELSE 0.0 END"
    )
    sw = ", ".join(f"'{w}'" for w in stopwords)
    hits = f"len(list_intersect(list_distinct({toks}), [{sw}]))"
    rules = {
        "r_token_count": f"({nt} >= {min_tokens} AND {nt} <= {max_tokens})",
        "r_mean_tok_len": f"({mean} >= {min_mean_tok_len} AND {mean} <= {max_mean_tok_len})",
        "r_punct_ratio": f"({pr} <= {max_punct_ratio})",
        "r_alpha_frac": f"({af} >= {min_alpha_frac})",
        "r_stopwords": f"({hits} >= {min_stopword_hits})",
    }
    rules["keep"] = "(" + " AND ".join(rules.values()) + ")"
    return rules


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------


class LangId(Pipe):
    """Stopword-hit language scoring: count tokens present in each language's
    stopword list; predict argmax (alphabetical tie-break), 'und' if no hits.
    Pure column expressions — no UDF, no shuffle."""

    def __init__(self, text_col: str = "text", out_col: str = "pred_lang", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        toks = tokens_expr(F.col(self.text_col))

        def hit_counter(words):
            # NB: closure factory, not a default-arg lambda — a 2-param lambda
            # would be interpreted by F.filter as (element, index)
            return F.size(F.filter(toks, lambda t: t.isin(*words)))

        counts = {
            lang: hit_counter(words) for lang, words in sorted(LANG_STOPWORDS.items())
        }
        langs = sorted(counts)
        best = counts[langs[0]]
        for lang in langs[1:]:
            best = F.greatest(best, counts[lang])
        pred = F.lit("und")
        # alphabetical priority on ties: first language reaching the max wins
        for lang in reversed(langs):
            pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
        pred = F.when(best > 0, pred).otherwise(F.lit("und"))
        return {self.out_col: pred}


def langid_sql(text: str = "text") -> str:
    toks = tokens_sql(text)
    cnt = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    langs = sorted(cnt)
    greatest = f"greatest({', '.join(cnt[lang] for lang in langs)})"
    whens = " ".join(
        f"WHEN {cnt[lang]} = {greatest} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {greatest} = 0 THEN 'und' {whens} ELSE 'und' END"


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash)
# ---------------------------------------------------------------------------


class DocFingerprint(Pipe):
    """Polynomial rolling hash over the normalized text (keep [a-z ] only):
    ``h = fold(h*31 + code(char)) mod 1e9+7``. Integer arithmetic — exact
    parity with the DuckDB oracle, and a deterministic 64-bit-free content id
    usable for grouping/sharding at 100 TB."""

    def __init__(self, text_col: str = "text", out_col: str = "doc_fp", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        normalized = F.regexp_replace(
            ascii_lower_expr(F.col(self.text_col)), "[^a-z ]", ""
        )
        chars = F.filter(F.split(normalized, ""), lambda c: F.length(c) > 0)
        h = F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
        )
        return {self.out_col: h}


def doc_fingerprint_sql(text: str = "text") -> str:
    normalized = f"regexp_replace({ascii_lower_sql(text)}, '[^a-z ]', '', 'g')"
    codes = (
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split({normalized}, ''), c -> length(c) > 0), "
        f"c -> CAST(ord(c) AS BIGINT)))"
    )
    return f"list_reduce({codes}, (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})"


# ---------------------------------------------------------------------------
# corpus term statistics (heavy hitters)
# ---------------------------------------------------------------------------


class TermStats(Pipe):
    """Corpus-level heavy hitters: top-``k`` terms by document frequency
    (+ total term frequency). The exact companion to the sketch path
    (``q53``'s approximate aggregates). Two-stage aggregation: exploded
    tokens first collapse to per-(term, doc) counts — a doc's tokens are
    partition-local, so map-side partial aggregation removes in-document
    repeats before the first exchange (width = distinct (term, doc)
    incidences, the minimum any exact doc-frequency needs) — then the
    (term) rollup's exchange is vocabulary-sized. A ``countDistinct``
    formulation would shuffle the same incidences WITHOUT the map-side
    collapse of repeated tokens. Ties on count are broken by term so
    top-k is total and engine-independent."""

    def __init__(self, k: int = 20, text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.k = k
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        per_doc = (
            df.select("doc_id", F.explode(tokens_expr(F.col(self.text_col))).alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("__tf"))
        )
        stats = per_doc.groupBy("term").agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("__tf").alias("term_freq"),
        )
        return (
            stats.orderBy(F.desc("doc_freq"), F.desc("term_freq"), F.asc("term"))
            .limit(self.k)
            .select(
                "term",
                F.col("doc_freq").cast("long").alias("doc_freq"),
                F.col("term_freq").cast("long").alias("term_freq"),
            )
        )


def term_stats_sql(table: str = "documents", k: int = 20, text: str = "text") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql(text)}) AS term FROM {table}
)
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS BIGINT) AS term_freq
FROM toks GROUP BY term
ORDER BY doc_freq DESC, term_freq DESC, term ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# repetition scoring (quality filtering)
# ---------------------------------------------------------------------------


class RepetitionScore(Pipe):
    """Intra-document repetition fraction — the Gopher-style quality
    signal for generated/boilerplate text: 1 - distinct/total over the
    document's word n-grams (0 = no repetition, -> 1 = the same phrase
    over and over). Pure codegen'd array expressions, scan-speed; rounded
    through DECIMAL(18,6) then emitted DOUBLE (engine-identical)."""

    def __init__(self, n: int = 2, text_col: str = "text", out_col: str = "rep_frac", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.n = n
        self.text_col = text_col
        self.out_col = out_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        from warp_pipes_spark.core.exprs import bind_expr

        def rep_of(toks: Column) -> Column:
            # toks is a let-bound lambda variable: the gram lambda below
            # would otherwise re-tokenize the document once per gram
            n_sh = F.greatest(F.size(toks) - F.lit(self.n - 1), F.lit(0))
            idx = F.sequence(F.lit(1), n_sh)
            grams = F.when(
                n_sh > 0,
                F.transform(idx, lambda i: F.array_join(F.slice(toks, i, self.n), " ")),
            ).otherwise(F.array().cast("array<string>"))
            return F.when(
                n_sh > 0,
                (
                    F.lit(1.0)
                    - F.size(F.array_distinct(grams)).cast("double") / n_sh.cast("double")
                ),
            ).otherwise(F.lit(0.0))

        rep = bind_expr(tokens_expr(F.col(self.text_col)), rep_of)
        return {self.out_col: rep.cast("decimal(18,6)").cast("double")}


def repetition_sql(n: int = 2, text: str = "text") -> str:
    toks = tokens_sql(text)
    grams = (
        f"CASE WHEN len({toks}) >= {n} THEN list_transform("
        f"generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )
    return (
        f"CAST(CAST(CASE WHEN len({toks}) >= {n} "
        f"THEN 1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / CAST(len({grams}) AS DOUBLE) "
        f"ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# fused one-pass text features (Arrow kernel)
# ---------------------------------------------------------------------------


class TextFeatures(Pipe):
    """One Arrow pass computing (pred_lang, q_tokens, q_punct_ratio,
    rep_frac) — byte-identical semantics to the LangId / QualityScore /
    RepetitionScore column expressions (equivalence is asserted in tests),
    but ONE tokenization per document. The expression forms re-tokenize at
    every expression occurrence (Spark's higher-order array functions are
    interpreted and excluded from subexpression elimination, and filter
    pushdown through a projection re-substitutes them), so a fused kernel
    is the fast path for multi-feature pipelines; identical Python-UDF
    calls are deduplicated into a single ArrowEvalPython node, so the four
    struct-field projections cost one kernel invocation."""

    def __init__(self, text_col: str = "text", rep_n: int = 2, **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.rep_n = rep_n

    def _kernel(self):
        import decimal
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        tok_re = re.compile(TOKEN_SPLIT_RE)
        stop = {lang: frozenset(ws) for lang, ws in sorted(LANG_STOPWORDS.items())}
        langs = sorted(stop)
        punct = set(PUNCT_CHARS)
        n = self.rep_n
        q6 = decimal.Decimal("1e-6")

        def dec6(x: float) -> float:
            # Spark's double -> DECIMAL(18,6) cast: BigDecimal(shortest
            # repr).setScale(6, HALF_UP); Python repr is the same shortest
            # round-trip string, so this is bit-identical
            return float(
                decimal.Decimal(repr(x)).quantize(q6, rounding=decimal.ROUND_HALF_UP)
            )

        def kernel(texts):
            preds, qtoks, qpuncts, reps = [], [], [], []
            for t in texts:
                if t is None:
                    # expression-operator NULL semantics: pred 'und'
                    # (no stopword hits), q_tokens NULL (size of NULL
                    # array), ratios 0.0 (the otherwise() branches)
                    preds.append("und")
                    qtoks.append(None)
                    qpuncts.append(0.0)
                    reps.append(0.0)
                    continue
                toks = [x for x in tok_re.split(ascii_lower_py(t)) if x]
                counts = [sum(1 for x in toks if x in stop[l]) for l in langs]
                best = max(counts) if counts else 0
                if best == 0:
                    preds.append("und")
                else:
                    preds.append(langs[counts.index(best)])
                qtoks.append(len(toks))
                n_chars = len(t)
                p = sum(1 for c in t if c in punct)
                qpuncts.append(dec6(p / n_chars) if n_chars > 0 else 0.0)
                n_g = len(toks) - n + 1
                if n_g > 0:
                    grams = [" ".join(toks[i : i + n]) for i in range(n_g)]
                    reps.append(dec6(1.0 - len(set(grams)) / n_g))
                else:
                    reps.append(0.0)
            return pd.DataFrame(
                {
                    "pred_lang": preds,
                    # nullable Int32: NULL text yields a NULL token count
                    "q_tokens": pd.Series(qtoks, dtype="Int32"),
                    "q_punct_ratio": qpuncts,
                    "rep_frac": reps,
                }
            )

        kernel.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
        return pandas_udf(
            kernel,
            "pred_lang string, q_tokens int, q_punct_ratio double, rep_frac double",
        )

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        feats = self._kernel()(F.col(self.text_col))
        return {
            "pred_lang": feats["pred_lang"],
            "q_tokens": feats["q_tokens"],
            "q_punct_ratio": feats["q_punct_ratio"],
            "rep_frac": feats["rep_frac"],
        }


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied IN ORDER — order is part of the
# semantics (an IPv4 inside an already-redacted email can no longer match).
# Patterns restricted to syntax with identical behavior in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() .-]{7,}\d", "<PHONE>"),
)


class PiiScrub(Pipe):
    """PII redaction for training corpora: replaces emails, IPv4 addresses
    and phone-like digit runs with typed placeholder tags and counts the
    redactions. Pure ``regexp_replace``/``regexp_count`` column expressions
    — JVM-side, codegen'd, scan-speed at 100 TB (the scrub the reference
    lacks but every LLM-data pipeline runs before tokenization).

    Counting happens on the progressively-scrubbed text (pattern i counts
    matches AFTER patterns < i replaced), so ``n_redactions`` is exactly
    the number of replacements performed."""

    def __init__(
        self,
        text_col: str = "text",
        out_col: str = "clean_text",
        count_col: str = "n_redactions",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col
        self.count_col = count_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        scrubbed = F.col(self.text_col)
        total = F.lit(0)
        for _, pattern, repl in PII_PATTERNS:
            total = total + F.regexp_count(scrubbed, F.lit(pattern))
            scrubbed = F.regexp_replace(scrubbed, pattern, repl)
        return {self.out_col: scrubbed, self.count_col: total.cast("int")}


def pii_scrub_sql(text: str = "text") -> Dict[str, str]:
    """DuckDB expressions for (clean_text, n_redactions) — same patterns,
    same order, global replacement ('g' = Spark's default)."""
    scrubbed = text
    counts = []
    for _, pattern, repl in PII_PATTERNS:
        p = pattern.replace("'", "''")
        counts.append(f"len(regexp_extract_all({scrubbed}, '{p}'))")
        scrubbed = f"regexp_replace({scrubbed}, '{p}', '{repl}', 'g')"
    return {
        "clean_text": scrubbed,
        "n_redactions": "CAST(" + " + ".join(counts) + " AS INTEGER)",
    }


class PiiPseudonymize(Pipe):
    """PII pseudonymization with REFERENTIAL CONSISTENCY — the governance
    step :class:`PiiScrub` can't do: instead of collapsing every entity
    to one tag (``<EMAIL>``), each distinct entity maps to a STABLE
    type-tagged token ``<EMAIL:ab12cd34>`` derived from a salted md5 of
    the normalized value. The same address tokenizes identically across
    the whole corpus, so dedup / linkage / conversation-threading built
    on the column keep working, while the raw value never leaves the
    expression pipeline (pseudonym inversion needs the salt + a
    dictionary attack, the standard tokenization-vault trade).

    Mechanics: all three PII patterns extract from the ORIGINAL text in
    one pass; the combined entity list sorts by (type-rank, length DESC,
    value) — emails before IPs before phones, longest-first within a
    type so no literal replacement clobbers a longer match containing
    it — then a single array fold applies literal replacements.
    Everything is codegen'd expressions (regexp_extract_all + aggregate
    + replace): scan-speed, no UDF, no shuffle, and the identical fold
    replays in DuckDB (``pii_pseudonymize_sql``).

    ``n_entities`` counts distinct extracted entities (an entity of one
    type nested inside a longer entity of another — a phone inside an
    email local-part — is counted under both types; replacement order
    makes the outer one win in the text itself)."""

    def __init__(
        self,
        salt: str = "wps",
        text_col: str = "text",
        out_col: str = "clean_text",
        count_col: str = "n_entities",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.salt = salt
        self.text_col = text_col
        self.out_col = out_col
        self.count_col = count_col

    def _entity_struct_fn(self, rank: int, tag: str, norm):
        def build(m):
            return F.struct(
                F.lit(rank).alias("r"),
                (F.lit(1000) - F.length(m)).alias("k"),
                m.alias("v"),
                F.concat(
                    F.lit(f"<{tag}:"),
                    F.substring(
                        F.md5(
                            F.concat(F.lit(f"{self.salt}:{tag}:"), norm(m))
                        ),
                        1,
                        8,
                    ),
                    F.lit(">"),
                ).alias("p"),
            )

        return build

    def _entities(self, text: Column) -> Column:
        parts = []
        for rank, (name, pattern, _) in enumerate(PII_PATTERNS):
            tag = name.upper()
            norm = ascii_lower_expr if name == "email" else (lambda m: m)
            ms = F.array_distinct(F.regexp_extract_all(text, F.lit(pattern), 0))
            parts.append(
                F.transform(ms, self._entity_struct_fn(rank, tag, norm))
            )
        return F.array_sort(F.concat(*parts))

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        ents = self._entities(F.col(self.text_col))
        clean = F.aggregate(
            ents,
            F.col(self.text_col),
            lambda acc, x: F.replace(acc, x["v"], x["p"]),
        )
        return {
            self.out_col: clean,
            self.count_col: F.size(ents).cast("int"),
        }


def pii_pseudonymize_sql(text: str = "text", salt: str = "wps") -> Dict[str, str]:
    """DuckDB expressions for (clean_text, n_entities): identical
    extraction, (rank, -length, value) sort and literal-replace fold.
    The fold rides a VARCHAR list (``value <US> pseudonym`` joined with
    the unit separator, text prepended as the accumulator seed) because
    DuckDB's list_reduce needs a uniform element type."""
    parts = []
    for rank, (name, pattern, _) in enumerate(PII_PATTERNS):
        tag = name.upper()
        p = pattern.replace("'", "''")
        norm = ascii_lower_sql("m") if name == "email" else "m"
        pseudo = (
            f"'<{tag}:' || substr(md5('{salt}:{tag}:' || {norm}), 1, 8) || '>'"
        )
        parts.append(
            f"list_transform(list_distinct(regexp_extract_all({text}, '{p}')), "
            f"m -> {{'r': {rank}, 'k': 1000 - length(m), 'v': m, 'p': {pseudo}}})"
        )
    ents = "list_sort(" + " || ".join(parts) + ")"
    pairs = f"list_transform({ents}, x -> x.v || chr(31) || x.p)"
    clean = (
        f"list_reduce(list_prepend({text}, {pairs}), "
        f"(acc, e) -> replace(acc, string_split(e, chr(31))[1], "
        f"string_split(e, chr(31))[2]))"
    )
    return {
        "clean_text": clean,
        "n_entities": f"CAST(len({ents}) AS INTEGER)",
    }


# ---------------------------------------------------------------------------
# sentence splitting (1 doc row -> N sentence rows)
# ---------------------------------------------------------------------------

# sentence boundary = terminal punctuation followed by one space. RE2 has no
# lookbehind, so the split keeps the terminator by first marking boundaries
# with an out-of-band separator (U+001E) and splitting on that — identical
# mechanics on both engines.
SENT_BOUNDARY_RE = "([.!?]) "
_SENT_SEP = "\x1e"


class SentenceSplit(Pipe):
    """Explode documents into (doc_id, sent_idx, sentence) rows — the unit
    change (document -> sentence) that sentence-level dedup, alignment and
    quality filters run on. Boundary regex + explode are JVM expressions;
    the row multiplication is ``posexplode`` semantics, so partitioning
    stays narrow (no shuffle: sentences stay on their document's
    partition). ``carry_cols`` rides document-level label columns along
    on the exploded rows — free (same partition, a few bytes per row)
    where a downstream join-back would be corpus-sized."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        trim: bool = True,
        carry_cols: Sequence[str] = (),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col
        self.trim = trim
        self.carry_cols = list(carry_cols)

    def sentences_expr(self, text: Column) -> Column:
        marked = F.regexp_replace(text, SENT_BOUNDARY_RE, "$1" + _SENT_SEP)
        parts = F.split(marked, _SENT_SEP)
        if self.trim:
            parts = F.transform(parts, lambda s: F.trim(s))
        return F.filter(parts, lambda s: F.length(s) > 0)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df.select(
            F.col(self.id_col),
            *self.carry_cols,
            F.posexplode(self.sentences_expr(F.col(self.text_col))).alias(
                "sent_idx", "sentence"
            ),
        )


def sentence_split_sql(table: str = "documents", id_col: str = "doc_id",
                       text: str = "text") -> str:
    """DuckDB oracle: same marker trick (chr(30) = U+001E), 0-based index
    via zipped generate_subscripts."""
    marked = f"regexp_replace({text}, '([.!?]) ', '\\1' || chr(30), 'g')"
    sents = (
        f"list_filter(list_transform(string_split({marked}, chr(30)),"
        f" s -> trim(s)), s -> length(s) > 0)"
    )
    return (
        f"WITH s AS (SELECT {id_col}, {sents} AS sents FROM {table}) "
        f"SELECT {id_col}, CAST(generate_subscripts(sents, 1) - 1 AS INTEGER)"
        f" AS sent_idx, unnest(sents) AS sentence FROM s"
    )


# ---------------------------------------------------------------------------
# TF-IDF feature extraction
# ---------------------------------------------------------------------------


class TfIdf(Pipe):
    """Per-document top-``m`` terms by tf-idf (idf = ln(N/df)) — the
    feature-extraction companion to ``Bm25Search`` (which ranks documents
    for a query; this summarizes each document). Same scale shape as
    ``TermStats``: exploded tokens collapse map-side to per-(term, doc)
    counts, the df rollup's exchange is vocabulary-sized, and the final
    top-m is a per-document window over at most |doc vocabulary| rows.
    Scores round through DECIMAL(18,6) then emit DOUBLE (engine-identical
    ranking and rendering)."""

    def __init__(
        self, m: int = 3, id_col: str = "doc_id", text_col: str = "text", **kwargs
    ):
        super().__init__(**kwargs)
        self.m = m
        self.id_col = id_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        toks = df.select(
            F.col(self.id_col).alias("doc_id"),
            F.explode(tokens_expr(F.col(self.text_col))).alias("term"),
        )
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        n_docs = df.select(
            F.countDistinct(F.col(self.id_col)).alias("n_docs")
        )
        scored = (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id",
                "term",
                (
                    F.col("tf").cast("double")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                )
                .cast("decimal(18,6)")
                .alias("tfidf"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.m)
            .select(
                "doc_id",
                "rank",
                "term",
                F.col("tfidf").cast("double").alias("tfidf"),
            )
        )


def tfidf_sql(table: str = "documents", m: int = 3, id_col: str = "doc_id",
              text: str = "text") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({tokens_sql(text)}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}
), scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df)
              AS DECIMAL(18,6)) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, CAST(tfidf AS DOUBLE) AS tfidf
FROM ranked WHERE rank <= {m} ORDER BY doc_id, rank
"""


class UnigramPerplexity(Pipe):
    """Per-document average negative log-likelihood under a unigram language
    model trained on the corpus itself — the classic CCNet-style quality
    signal (documents whose token distribution diverges from the corpus read
    as noise and score high).

    Scale shape: the big shuffle is the per-(doc, term) count (map-side
    partial agg over the exploded tokens); the model itself — per-term
    ln p(term) — is a vocabulary-sized table that joins back via a broadcast
    (AQE picks it from the agg's runtime stats). Per-term log-probs round
    through DECIMAL(18,6) so the per-document sum (int tf x decimal) is
    exact and order-independent; the final average divides as DOUBLE
    (IEEE-exact given identical inputs) and re-rounds for rendering parity
    with the oracle.

    Documents with zero tokens carry no evidence and drop out (same group
    domain as the oracle's).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        toks = df.select(
            F.col(self.id_col).alias("doc_id"),
            F.explode(tokens_expr(F.col(self.text_col))).alias("term"),
        )
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
        total = vocab.agg(F.sum("cnt").alias("total"))
        lnp = vocab.crossJoin(F.broadcast(total)).select(
            "term",
            F.log(F.col("cnt").cast("double") / F.col("total"))
            .cast("decimal(18,6)")
            .alias("lnp"),
        )
        agg = tf.join(lnp, "term").groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("lnp")).alias("s"),
            F.sum("tf").alias("n"),
        )
        # no decimal re-round here: the decimal sum renders to double
        # correctly-rounded in both engines and the IEEE division of two
        # identical doubles is exactly rounded, so the quotient is already
        # bit-identical — a further double->decimal round would reintroduce
        # engine-specific boundary behavior
        avg_nll = -F.col("s").cast("double") / F.col("n").cast("double")
        return agg.select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            avg_nll.alias("avg_nll"),
        )


def unigram_perplexity_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, unnest({tokens_sql(text)}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT term, SUM(tf) AS cnt FROM tf GROUP BY 1
), total AS (
  SELECT SUM(cnt) AS total FROM vocab
), lnp AS (
  SELECT term, CAST(ln(CAST(cnt AS DOUBLE) / total) AS DECIMAL(18,6)) AS lnp
  FROM vocab CROSS JOIN total
), agg AS (
  SELECT doc_id, SUM(tf * lnp) AS s, SUM(tf) AS n
  FROM tf JOIN lnp USING (term) GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       -CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS avg_nll
FROM agg ORDER BY doc_id
"""


class DomainKL(Pipe):
    """Per-group KL divergence KL(P_group || P_corpus) between a group's
    unigram distribution and the whole corpus's — the mixture diagnostic
    that tells a pretraining pipeline which source/domain deviates most
    from the blend it is feeding the model.

    Everything reduces map-side: per-(group, term) counts are the only
    data-sized shuffle; group totals, the corpus distribution, and the
    per-term contributions are all vocabulary-sized. Contributions
    p_g * ln(p_g / p_c) round through DECIMAL(18,8) so the per-group sum is
    exact and order-free.
    """

    def __init__(self, group_col: str = "source", text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.group_col = group_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        toks = df.select(
            F.col(self.group_col).alias("grp"),
            F.explode(tokens_expr(F.col(self.text_col))).alias("term"),
        )
        gt = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
        g_tot = gt.groupBy("grp").agg(F.sum("cnt").alias("g_total"))
        c_term = gt.groupBy("term").agg(F.sum("cnt").alias("c_cnt"))
        c_tot = c_term.agg(F.sum("c_cnt").alias("c_total"))
        p_g = F.col("cnt").cast("double") / F.col("g_total").cast("double")
        p_c = F.col("c_cnt").cast("double") / F.col("c_total").cast("double")
        contrib = (p_g * F.log(p_g / p_c)).cast("decimal(18,8)")
        per_term = (
            gt.join(g_tot, "grp")
            .join(c_term, "term")
            .crossJoin(F.broadcast(c_tot))
            .select("grp", F.col("g_total"), contrib.alias("contrib"))
        )
        return (
            per_term.groupBy("grp", "g_total")
            .agg(F.sum("contrib").alias("kl_dec"))
            .select(
                F.col("grp").alias(self.group_col),
                F.col("g_total").cast("long").alias("n_tokens"),
                F.col("kl_dec").cast("double").alias("kl"),
            )
        )


def domain_kl_sql(
    table: str = "documents", group_col: str = "source", text: str = "text"
) -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp, unnest({tokens_sql(text)}) AS term FROM {table}
), gt AS (
  SELECT grp, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
), g_tot AS (
  SELECT grp, SUM(cnt) AS g_total FROM gt GROUP BY 1
), c_term AS (
  SELECT term, SUM(cnt) AS c_cnt FROM gt GROUP BY 1
), c_tot AS (
  SELECT SUM(c_cnt) AS c_total FROM c_term
), per_term AS (
  SELECT gt.grp, g_tot.g_total,
         CAST((CAST(cnt AS DOUBLE) / CAST(g_total AS DOUBLE))
              * ln((CAST(cnt AS DOUBLE) / CAST(g_total AS DOUBLE))
                   / (CAST(c_cnt AS DOUBLE) / CAST(c_total AS DOUBLE)))
           AS DECIMAL(18,8)) AS contrib
  FROM gt JOIN g_tot USING (grp) JOIN c_term USING (term) CROSS JOIN c_tot
)
SELECT grp AS {group_col}, CAST(g_total AS BIGINT) AS n_tokens,
       CAST(SUM(contrib) AS DOUBLE) AS kl
FROM per_term GROUP BY grp, g_total ORDER BY grp
"""


class BigramPerplexity(Pipe):
    """Per-document average negative log-likelihood under an add-one
    (Laplace) smoothed BIGRAM language model trained on the corpus itself —
    the next step up from :class:`UnigramPerplexity`: word-order glitches
    (shuffled text, keyword stuffing, boilerplate splices) that a unigram
    model cannot see score high here.

    p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V), with V = unigram
    vocabulary size. Scoring the training corpus itself means every scored
    bigram exists in the counts, so no backoff machinery is needed; the
    +1/+V smoothing still matters (it is what keeps rare continuations
    from collapsing to ln 1).

    Scale shape (same as the unigram operator): the only data-sized
    shuffle is the per-(doc, bigram) count; the model — ln p per distinct
    corpus bigram — is bigram-vocabulary-sized and broadcasts back.
    Per-bigram log-probs round through DECIMAL(18,6) so the per-document
    sum (int tf x decimal) is exact and order-independent; the final
    average divides as DOUBLE. Documents with < 2 tokens have no bigrams
    and drop out (same group domain as the oracle).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        d = df.select(
            F.col(self.id_col).alias("doc_id"),
            tokens_expr(F.col(self.text_col)).alias("l"),
        )
        # adjacent pairs, executor-local: element i of the 1..n-1 slice with
        # its successor (transform's 2-arg lambda receives (element, index);
        # element_at is 1-based, so the successor of slice index i is l[i+2])
        pairs = F.transform(
            F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"), F.element_at(F.col("l"), i + F.lit(2)).alias("w2")
            ),
        )
        bg = d.select("doc_id", F.explode(pairs).alias("bg")).select(
            "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
        c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
        c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
        vocab = (
            d.select(F.explode("l").alias("term"))
            .agg(F.countDistinct("term").alias("v"))
        )
        lnp = (
            c12.join(c1, "w1")
            .crossJoin(F.broadcast(vocab))
            .select(
                "w1",
                "w2",
                F.log(
                    (F.col("c12") + F.lit(1)).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                .cast("decimal(18,6)")
                .alias("lnp"),
            )
        )
        agg = tf.join(lnp, ["w1", "w2"]).groupBy("doc_id").agg(
            F.sum(F.col("tf") * F.col("lnp")).alias("s"),
            F.sum("tf").alias("n"),
        )
        # identical-rationale note to UnigramPerplexity: the decimal sum
        # renders to double correctly-rounded in both engines; the IEEE
        # division of two identical doubles is exact — no re-round
        avg_nll = -F.col("s").cast("double") / F.col("n").cast("double")
        return agg.select(
            "doc_id",
            F.col("n").cast("long").alias("n_bigrams"),
            avg_nll.alias("avg_nll"),
        )


def bigram_perplexity_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {tokens_sql(text)} AS l FROM {table}
), idx AS (
  SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM d
), bg AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2 FROM idx
), tf AS (
  SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3
), c12 AS (
  SELECT w1, w2, SUM(tf) AS c12 FROM tf GROUP BY 1, 2
), c1 AS (
  SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT term) AS v
  FROM (SELECT unnest(l) AS term FROM d)
), lnp AS (
  SELECT w1, w2,
         CAST(ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
              AS DECIMAL(18,6)) AS lnp
  FROM c12 JOIN c1 USING (w1) CROSS JOIN vocab
), agg AS (
  SELECT doc_id, SUM(tf * lnp) AS s, SUM(tf) AS n
  FROM tf JOIN lnp USING (w1, w2) GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
       -CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS avg_nll
FROM agg ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# character-level entropy (gibberish / boilerplate quality signal)
# ---------------------------------------------------------------------------


class CharEntropy(Pipe):
    """Per-document character-distribution entropy over the ``a-z`` +
    space alphabet — the Gopher-family quality signal the token-ratio
    gates miss: machine-generated keyboard mash and template boilerplate
    both sit far from natural-language character entropy (~2.8-3.1 nats
    for English), so a cheap two-sided entropy band flags them before
    any model-based scorer runs.

    ``H = ln(n) - (sum_c c * ln c) / n`` over the per-doc counts of
    in-alphabet characters; the cross-engine float budget is the
    engine-standard one: each ``ln`` decimal-rounded at 1e-6, count
    products and their sum exact decimal, then one IEEE division and one
    subtraction before the final rounding.

    Scale shape: one narrow char explode (bounded 27-way per-doc key
    space) with full map-side combine on (doc, char), then a doc-sized
    reduction — the q76-perplexity shuffle profile, nothing
    vocabulary-global.

    ROWS-DROPPED SEMANTICS: a document with ZERO in-alphabet characters
    (empty text, pure digits/punctuation/non-Latin) has no entropy
    defined and is ABSENT from the output — callers composing a keep/
    drop gate should anti-join or left-join from the corpus if such
    rows need an explicit verdict.

    ``carry_cols`` passes label columns that are functionally dependent
    on ``id_col`` (source, lang, split...) THROUGH the aggregation keys
    instead of forcing the caller to join them back — at 100 TB that
    join-back is corpus-sized, while widening the groupBy key is free
    (same shuffle rows, a few label bytes more per row)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        out_col: str = "entropy",
        carry_cols: Sequence[str] = (),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col
        self.out_col = out_col
        self.carry_cols = list(carry_cols)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        t = ascii_lower_expr(F.col(self.text_col))
        chars = F.filter(
            F.split(t, ""),
            lambda c: ((c >= "a") & (c <= "z")) | (c == " "),
        )
        carry = self.carry_cols
        ex = df.select(self.id_col, *carry, F.explode(chars).alias("__ch"))
        counts = ex.groupBy(self.id_col, *carry, "__ch").agg(
            F.count(F.lit(1)).alias("__c")
        )
        lnc = F.log(F.col("__c").cast("double")).cast("decimal(18,6)")
        agg = counts.groupBy(self.id_col, *carry).agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * lnc).alias("__s"),
        )
        h = (
            (
                F.log(F.col("__n").cast("double"))
                .cast("decimal(18,6)")
                .cast("double")
                - F.col("__s").cast("double") / F.col("__n").cast("double")
            )
            .cast("decimal(18,6)")
            .cast("double")
        )
        return agg.select(
            self.id_col,
            *carry,
            F.col("__n").cast("long").alias("n_chars_alpha"),
            h.alias(self.out_col),
        )


def char_entropy_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    out_col: str = "entropy",
) -> str:
    """DuckDB replay of :class:`CharEntropy`: identical alphabet filter,
    rounded logs, exact decimal sum and final float ops."""
    t = ascii_lower_sql(text)
    return f"""
WITH chars AS (
  SELECT {id_col},
         unnest(list_filter(string_split({t}, ''),
                c -> (c >= 'a' AND c <= 'z') OR c = ' ')) AS ch
  FROM {table}
),
counts AS (
  SELECT {id_col}, ch, COUNT(*) AS c FROM chars GROUP BY {id_col}, ch
),
agg AS (
  SELECT {id_col},
         SUM(c) AS n,
         SUM(c * CAST(ln(c) AS DECIMAL(18,6))) AS s
  FROM counts GROUP BY {id_col}
)
SELECT {id_col},
       CAST(n AS BIGINT) AS n_chars_alpha,
       CAST(CAST(CAST(CAST(ln(n) AS DECIMAL(18,6)) AS DOUBLE)
                 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS {out_col}
FROM agg
ORDER BY {id_col}
"""


class StupidBackoffScore(Pipe):
    """Trigram language-model scoring with STUPID BACKOFF (Brants et al.
    2007 — the smoothing designed for MapReduce-scale counts): the
    word-order model q127's bigram LM can't reach, trained on a separate
    reference ``corpus`` so held-out text actually exercises the backoff
    chain::

        S(w3|w1w2) = c(w1w2w3)/c(w1w2)            if the trigram is seen
                   = 0.4 * c(w2w3)/c(w2)          else if the bigram is
                   = 0.4 * 0.4 * c(w3)/N          else (0 for OOV w3)

    Scores stay LINEAR (stupid backoff yields scores, not probabilities
    — no log-space normalization exists); the per-doc output is the mean
    position score plus the backoff rate (fraction of positions that
    fell past the trigram level — a crisp domain-shift signal).

    Scale shape: counts are one explode + hash-aggregate per order
    (vocabulary-sized model tables, never doc-sized); scoring is a chain
    of LEFT equi-joins from the per-(doc, trigram) tf table into those
    model tables. Per-position scores round through DECIMAL(18,6) so the
    tf-weighted sum is exact and order-independent; each branch costs at
    most two IEEE multiplies and one divide — the engine-standard
    cross-float budget.

    ROWS-DROPPED SEMANTICS: a held-out document with fewer than 3 tokens
    has no trigram positions, so no score is defined and it is ABSENT
    from the output — callers gating on the score should left-join from
    the corpus if such rows need an explicit verdict."""

    ALPHA = 0.4

    def __init__(
        self,
        corpus: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.corpus = corpus
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def _grams_structs(n: int) -> Column:
        """Expression form over the token COLUMN ``l``: array of
        (w1..wn) structs (w2/w3 only for n >= 2/3)."""
        toks = F.col("l")
        return F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"),
                *[
                    F.element_at(toks, i + F.lit(d + 1)).alias(f"w{d + 1}")
                    for d in range(1, n)
                ],
            ),
        )

    @staticmethod
    def _wgrams(d: DataFrame, n: int, out_cols) -> DataFrame:
        """Explode each doc's order-n word grams: (doc_id, w1..wn)."""
        grams = F.transform(
            F.slice(
                F.col("l"), 1, F.greatest(F.size("l") - (n - 1), F.lit(0))
            ),
            lambda x, i: F.struct(
                x.alias("w1"),
                *[
                    F.element_at(F.col("l"), i + F.lit(d + 1)).alias(f"w{d + 1}")
                    for d in range(1, n)
                ],
            ),
        )
        ex = d.select("doc_id", F.explode(grams).alias("g"))
        return ex.select(
            "doc_id",
            *[F.col(f"g.w{j + 1}").alias(out_cols[j]) for j in range(n)],
        )

    def _tok(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("doc_id"),
            tokens_expr(F.col(self.text_col)).alias("l"),
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:

        a = self.ALPHA
        c = self._tok(self.corpus)
        # ONE corpus pass: tri/bi/uni grams ride a single order-tagged
        # explode into one hash aggregate; the resulting model table is
        # vocabulary-sized, so persisting IT (not the corpus tokens) is
        # cheap and stops the three order-filters + the total from
        # re-executing the corpus scan (the q170 lineage lesson)
        tri_t = F.transform(
            self._grams_structs(3),
            lambda x: F.struct(
                F.lit(3).alias("n"), x["w1"].alias("w1"),
                x["w2"].alias("w2"), x["w3"].alias("w3"),
            ),
        )
        bi_t = F.transform(
            self._grams_structs(2),
            lambda x: F.struct(
                F.lit(2).alias("n"), x["w1"].alias("w1"),
                x["w2"].alias("w2"), F.lit(None).cast("string").alias("w3"),
            ),
        )
        uni_t = F.transform(
            F.col("l"),
            lambda t: F.struct(
                F.lit(1).alias("n"), t.alias("w1"),
                F.lit(None).cast("string").alias("w2"),
                F.lit(None).cast("string").alias("w3"),
            ),
        )
        ex = c.select(
            F.explode(F.concat(tri_t, bi_t, uni_t)).alias("t")
        ).select("t.n", "t.w1", "t.w2", "t.w3")
        # model counts feed three downstream branches; localCheckpoint
        # (eager, GC-released) instead of a bare persist, which would leak
        # the cache entry for the session's lifetime
        cnts = (
            ex.groupBy("n", "w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint()
        )
        tri = cnts.filter(F.col("n") == 3).select(
            "w1", "w2", "w3", F.col("cnt").alias("c3")
        )
        bi = cnts.filter(F.col("n") == 2).select(
            "w1", "w2", F.col("cnt").alias("c2")
        )
        uni = cnts.filter(F.col("n") == 1).select(
            F.col("w1").alias("w"), F.col("cnt").alias("c1")
        )
        total = uni.agg(F.sum("c1").alias("nn"))
        tf = (
            self._wgrams(self._tok(df), 3, ("w1", "w2", "w3"))
            .groupBy("doc_id", "w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        j = (
            tf.join(tri, ["w1", "w2", "w3"], "left")
            .join(bi, ["w1", "w2"], "left")
            .join(
                bi.select(
                    F.col("w1").alias("w2"),
                    F.col("w2").alias("w3"),
                    F.col("c2").alias("c2b"),
                ),
                ["w2", "w3"],
                "left",
            )
            .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b")), "w2", "left")
            .join(uni.select(F.col("w").alias("w3"), F.col("c1").alias("c1c")), "w3", "left")
            .crossJoin(F.broadcast(total))
        )
        s = (
            F.when(
                F.col("c3").isNotNull(),
                F.col("c3").cast("double") / F.col("c2").cast("double"),
            )
            .when(
                F.col("c2b").isNotNull(),
                F.lit(a)
                * F.col("c2b").cast("double")
                / F.col("c1b").cast("double"),
            )
            .otherwise(
                F.lit(a * a)
                * F.coalesce(F.col("c1c"), F.lit(0)).cast("double")
                / F.col("nn").cast("double")
            )
            .cast("decimal(18,6)")
        )
        agg = j.groupBy("doc_id").agg(
            F.sum(F.col("tf") * s).alias("s"),
            F.sum("tf").alias("n"),
            F.sum(F.when(F.col("c3").isNull(), F.col("tf")).otherwise(F.lit(0))).alias(
                "b"
            ),
        )
        dec = lambda col: col.cast("decimal(18,6)").cast("double")
        return agg.select(
            "doc_id",
            F.col("n").cast("long").alias("n_trigrams"),
            dec(F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "sb_score"
            ),
            dec(F.col("b").cast("double") / F.col("n").cast("double")).alias(
                "backoff_rate"
            ),
        )


def stupid_backoff_sql(
    score_sql: str,
    corpus_sql: str,
    text: str = "text",
    alpha: float = 0.4,
) -> str:
    """DuckDB replay of :class:`StupidBackoffScore`: identical counts,
    branch order, float budget and rounding."""
    toks = tokens_sql(text)
    return f"""
WITH ctoks AS (SELECT doc_id, {toks} AS l FROM ({corpus_sql}) c),
stoks AS (SELECT doc_id, {toks} AS l FROM ({score_sql}) s),
ctri AS (
  SELECT l[i + 1] AS w1, l[i + 2] AS w2, l[i + 3] AS w3, COUNT(*) AS c3
  FROM ctoks, LATERAL (SELECT unnest(range(GREATEST(len(l) - 2, 0))) AS i) g
  GROUP BY 1, 2, 3
),
cbi AS (
  SELECT l[i + 1] AS w1, l[i + 2] AS w2, COUNT(*) AS c2
  FROM ctoks, LATERAL (SELECT unnest(range(GREATEST(len(l) - 1, 0))) AS i) g
  GROUP BY 1, 2
),
cuni AS (
  SELECT w, COUNT(*) AS c1
  FROM (SELECT unnest(l) AS w FROM ctoks) u GROUP BY w
),
ctot AS (SELECT COALESCE(SUM(len(l)), 0) AS nn FROM ctoks),
tf AS (
  SELECT doc_id, l[i + 1] AS w1, l[i + 2] AS w2, l[i + 3] AS w3, COUNT(*) AS tf
  FROM stoks, LATERAL (SELECT unnest(range(GREATEST(len(l) - 2, 0))) AS i) g
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT t.doc_id, t.tf, tr.c3,
         CAST(CASE
           WHEN tr.c3 IS NOT NULL
             THEN CAST(tr.c3 AS DOUBLE) / CAST(b1.c2 AS DOUBLE)
           WHEN b2.c2 IS NOT NULL
             THEN {alpha!r} * CAST(b2.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
           ELSE {alpha * alpha!r} * CAST(COALESCE(u3.c1, 0) AS DOUBLE)
                / CAST(ct.nn AS DOUBLE)
         END AS DECIMAL(18,6)) AS s
  FROM tf t
  LEFT JOIN ctri tr ON tr.w1 = t.w1 AND tr.w2 = t.w2 AND tr.w3 = t.w3
  LEFT JOIN cbi b1 ON b1.w1 = t.w1 AND b1.w2 = t.w2
  LEFT JOIN cbi b2 ON b2.w1 = t.w2 AND b2.w2 = t.w3
  LEFT JOIN cuni u2 ON u2.w = t.w2
  LEFT JOIN cuni u3 ON u3.w = t.w3
  CROSS JOIN ctot ct
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_trigrams,
       CAST(CAST(CAST(SUM(tf * s) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS sb_score,
       CAST(CAST(CAST(SUM(CASE WHEN c3 IS NULL THEN tf ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(tf) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS backoff_rate
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher repetition signals (top-n-gram / duplicated-n-gram char fractions)
# ---------------------------------------------------------------------------

GOPHER_TOP_NS = (2, 3, 4)
GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)
# Gopher Table A1 thresholds: keep iff fraction < threshold
GOPHER_REP_THRESHOLDS = {
    ("top", 2): 0.20, ("top", 3): 0.18, ("top", 4): 0.16,
    ("dup", 5): 0.15, ("dup", 6): 0.14, ("dup", 7): 0.13,
    ("dup", 8): 0.12, ("dup", 9): 0.11, ("dup", 10): 0.10,
}


class GopherRepetition(Pipe):
    """The full Gopher repetition-signal suite (Rae et al. 2021 Table A1)
    — the other half of the quality gate q140 covers: per document, the
    fraction of characters in the MOST FREQUENT n-gram (n = 2, 3, 4) and
    in DUPLICATED n-grams (n = 5..10), plus the conjunction of all nine
    thresholds as ``rep_keep``. These catch looping generations, SEO
    keyword stuffing and boilerplate splices that token-ratio gates and
    the distinct-token fraction (q62) miss.

    Character accounting: an n-gram's chars = summed token lengths
    (``length(joined) - (n-1)`` separators); the duplicated fraction is
    the standard implementation approximation ``sum over grams with
    count >= 2 of count x chars / total_chars`` clamped at 1 (the exact
    each-char-once semantics needs position sets; Dolma/RedPajama use
    the same relaxation). Ties for "most frequent" break on (chars,
    gram) so both engines pick the same gram.

    Scale shape: the per-doc, per-n integer masses (top-gram mass,
    duplicated mass) are ROW-LOCAL facts — one Arrow-batched pandas
    kernel computes them from a Counter per (row, n) over the shared
    tokenizer, so the corpus-sized gram explode + (doc, n, gram) hash
    aggregate + pivot + join disappear from the plan entirely (zero
    exchanges). Every division / decimal rounding stays in Spark
    expressions over those SAME integers, and the tie-break max is the
    identical (cnt, chars, gram) tuple order (gram strings are pure
    ``[a-z ]`` so Python and UTF8-byte ordering agree), so results are
    bit-identical to the exploded formulation by construction."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def _masses_udf():
        """Row-local repetition-mass kernel: per row, for each n, the
        exact integers the old (doc, n, gram) aggregate produced —
        ``tm`` = cnt*chars of the (cnt, chars, gram)-max gram, ``dm`` =
        Σ over grams with cnt >= 2 of cnt*chars, chars = summed token
        lengths. Gram-less (row, n) emits 0, matching the NULL →
        ``coalesce(…, 0)`` of the old pivot."""
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType, StructField, StructType

        ns = list(GOPHER_TOP_NS) + list(GOPHER_DUP_NS)
        tok_re = re.compile(TOKEN_SPLIT_RE)
        schema = StructType(
            [
                StructField(f"m{n}_{c}", LongType())
                for n in ns
                for c in ("tm", "dm")
            ]
        )
        cols = [f.name for f in schema.fields]

        def kernel(texts):
            from collections import Counter

            rows = []
            for t in texts:
                toks = (
                    []
                    if t is None
                    else [x for x in tok_re.split(ascii_lower_py(t)) if x]
                )
                row = []
                for n in ns:
                    if len(toks) < n:
                        row += [0, 0]
                        continue
                    cnts = Counter(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                    tm = dm = 0
                    best = None
                    for g, cnt in cnts.items():
                        ch = len(g) - (n - 1)
                        if best is None or (cnt, ch, g) > best:
                            best = (cnt, ch, g)
                        if cnt >= 2:
                            dm += cnt * ch
                    tm = best[0] * best[1]
                    row += [tm, dm]
                rows.append(row)
            return pd.DataFrame(rows, columns=cols, dtype="int64")

        kernel.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
        return pandas_udf(kernel, schema)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.text.dedup import widen_partitions

        # widened input: a single-row-group local parquet read would run
        # the Arrow kernel on one core
        d = widen_partitions(
            df.select(F.col(self.id_col).alias("doc_id"), F.col(self.text_col))
        )
        # __total keeps the exact JVM expression form (NULL text →
        # NULL total → NULL fractions, as before); the masses are exact
        # integers either way
        out = d.select(
            "doc_id",
            F.aggregate(
                tokens_expr(F.col(self.text_col)),
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.length(t),
            ).alias("__total"),
            self._masses_udf()(F.col(self.text_col)).alias("__m"),
        )
        dec = lambda c: c.cast("decimal(18,6)").cast("double")
        frac = lambda mass: dec(
            F.when(F.col("__total") <= 0, F.lit(0.0)).otherwise(
                F.least(
                    F.lit(1.0),
                    F.coalesce(mass, F.lit(0)).cast("double")
                    / F.col("__total").cast("double"),
                )
            )
        )
        cols = [F.col("doc_id")]
        keep = F.lit(True)
        for n in GOPHER_TOP_NS:
            m = F.col("__m").getField(f"m{n}_tm")
            cols.append(frac(m).alias(f"top_{n}gram_frac"))
            keep = keep & (frac(m) < F.lit(GOPHER_REP_THRESHOLDS[("top", n)]))
        for n in GOPHER_DUP_NS:
            m = F.col("__m").getField(f"m{n}_dm")
            cols.append(frac(m).alias(f"dup_{n}gram_frac"))
            keep = keep & (frac(m) < F.lit(GOPHER_REP_THRESHOLDS[("dup", n)]))
        return out.select(*cols, keep.alias("rep_keep"))


def gopher_repetition_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB replay of :class:`GopherRepetition`: identical grams, char
    accounting, tie-break, clamping and thresholds."""
    toks = tokens_sql(text)
    per_n_ctes = []
    ns = list(GOPHER_TOP_NS) + list(GOPHER_DUP_NS)
    for n in ns:
        joined = " || ' ' || ".join(f"l[i + {d + 1}]" for d in range(n))
        per_n_ctes.append(
            f"SELECT doc_id, {n} AS n, ({joined}) AS gram "
            f"FROM d, LATERAL (SELECT unnest(range(GREATEST(len(l) - {n - 1}, 0))) AS i) g"
        )
    grams_union = "\nUNION ALL\n".join(per_n_ctes)
    sels = [id_col]
    frac = (
        lambda mass: f"CASE WHEN t.total <= 0 THEN 0.0 ELSE "
        f"CAST(CAST(LEAST(1.0, CAST(COALESCE({mass}, 0) AS DOUBLE)"
        f" / CAST(t.total AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE) END"
    )
    keeps = []
    for n in GOPHER_TOP_NS:
        m = f"MAX(CASE WHEN n = {n} THEN topmass END)"
        sels.append(f"{frac(m)} AS top_{n}gram_frac")
        keeps.append(f"{frac(m)} < {GOPHER_REP_THRESHOLDS[('top', n)]!r}")
    for n in GOPHER_DUP_NS:
        m = f"MAX(CASE WHEN n = {n} THEN dupmass END)"
        sels.append(f"{frac(m)} AS dup_{n}gram_frac")
        keeps.append(f"{frac(m)} < {GOPHER_REP_THRESHOLDS[('dup', n)]!r}")
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {toks} AS l FROM {table}),
totals AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(l, t -> length(t))), 0) AS total
  FROM d
),
grams AS ({grams_union}),
counts AS (
  SELECT doc_id, n, gram, COUNT(*) AS cnt FROM grams GROUP BY ALL
),
per_n AS (
  SELECT doc_id, n,
         MAX({{'cnt': cnt, 'ch': length(gram) - (n - 1), 'g': gram}}).cnt
           * MAX({{'cnt': cnt, 'ch': length(gram) - (n - 1), 'g': gram}}).ch AS topmass,
         SUM(CASE WHEN cnt >= 2 THEN cnt * (length(gram) - (n - 1))
                  ELSE 0 END) AS dupmass
  FROM counts GROUP BY doc_id, n
)
SELECT t.doc_id AS {id_col}, {", ".join(sels[1:])},
       {" AND ".join(keeps)} AS rep_keep
FROM totals t
LEFT JOIN per_n pn ON pn.doc_id = t.doc_id
GROUP BY t.doc_id, t.total
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth (tokenizer sizing / OOV-decay analytic)
# ---------------------------------------------------------------------------


class VocabGrowth(Pipe):
    """Vocabulary growth curve over NESTED deterministic corpus samples
    (Heaps' law, V ~ k*N^beta): at each step p in 10%..100%, the number
    of documents, tokens and DISTINCT terms inside the md5-gated p-sample
    — the analytic that sizes a tokenizer vocabulary and predicts OOV
    decay before a training mix is committed.

    Nesting is the point: ``gate(doc) < t_p`` uses ONE hash per document
    with increasing thresholds, so every sample is a subset of the next
    and the curve is monotone by construction (independent random splits
    are not), reproducible across engines/partitionings/reruns, and
    stable under corpus appends (q57's SplitAssign property).

    Scale shape: one token explode -> per-term min(gate) (a
    vocabulary-sized aggregate with map-side combine) -> ``steps``
    conditional sums in ONE pass over that vocab table (an explode of
    per-step branches would re-execute the lineage per branch — the
    engine's measured N-branch lesson). Doc/token counts are one
    scan-level aggregation. Output = ``steps`` rows."""

    def __init__(
        self,
        steps: int = 10,
        seed: int = 17,
        id_col: str = "doc_id",
        text_col: str = "text",
        **kwargs,
    ):
        if steps < 1:
            raise ValueError(f"steps must be >= 1, got {steps}")
        super().__init__(**kwargs)
        self.steps = steps
        self.seed = seed
        self.id_col = id_col
        self.text_col = text_col

    def _thresholds(self):
        from warp_pipes_spark.pipes.sampling import _threshold_hex

        return [
            (s, _threshold_hex(s / self.steps))
            for s in range(1, self.steps + 1)
        ]

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.pipes.sampling import _gate_col

        gate = _gate_col(F.col(self.id_col), self.seed)
        d = df.select(
            gate.alias("g"), tokens_expr(F.col(self.text_col)).alias("__l")
        )
        # per-term first-inclusion gate: vocabulary-sized, map-side combined
        term_min = (
            d.select("g", F.explode("__l").alias("term"))
            .groupBy("term")
            .agg(F.min("g").alias("gmin"))
        )
        vocab_sums = [
            F.sum((F.col("gmin") < F.lit(t)).cast("long")).alias(f"v{s}")
            for s, t in self._thresholds()
        ]
        vrow = term_min.agg(*vocab_sums)
        doc_sums = []
        for s, t in self._thresholds():
            inside = F.col("g") < F.lit(t)
            doc_sums.append(F.sum(inside.cast("long")).alias(f"d{s}"))
            doc_sums.append(
                F.sum(
                    F.when(inside, F.size("__l")).otherwise(F.lit(0)).cast("long")
                ).alias(f"t{s}")
            )
        drow = d.agg(*doc_sums)
        row = vrow.crossJoin(F.broadcast(drow))
        stacked = ", ".join(
            f"{100 * s // self.steps}L, d{s}, t{s}, v{s}"
            for s, _ in self._thresholds()
        )
        return row.select(
            F.expr(
                f"stack({self.steps}, {stacked}) "
                f"AS (pct, n_docs, n_tokens, vocab_size)"
            )
        )


def vocab_growth_sql(
    table: str = "documents",
    steps: int = 10,
    seed: int = 17,
    id_col: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB oracle for :class:`VocabGrowth`: identical gate, nested
    thresholds and conditional sums."""
    from warp_pipes_spark.pipes.sampling import _gate_sql, _threshold_hex

    gate = _gate_sql(id_col, seed)
    toks = tokens_sql(text)
    steps_rows = []
    for s in range(1, steps + 1):
        t = _threshold_hex(s / steps)
        steps_rows.append(
            f"SELECT {100 * s // steps} AS pct, "
            f"(SELECT COUNT(*) FROM d WHERE g < '{t}') AS n_docs, "
            f"(SELECT COALESCE(SUM(len(l)), 0) FROM d WHERE g < '{t}') AS n_tokens, "
            f"(SELECT COUNT(*) FROM term_min WHERE gmin < '{t}') AS vocab_size"
        )
    union = "\nUNION ALL\n".join(steps_rows)
    return f"""
WITH d AS MATERIALIZED (
  SELECT {gate} AS g, {toks} AS l FROM {table}
),
term_min AS MATERIALIZED (
  SELECT term, MIN(g) AS gmin
  FROM (SELECT g, unnest(l) AS term FROM d) GROUP BY 1
)
SELECT CAST(pct AS BIGINT) AS pct, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab_size AS BIGINT) AS vocab_size
FROM ({union})
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit (power-law exponent)
# ---------------------------------------------------------------------------


class ZipfFit(Pipe):
    """OLS fit of ``ln(count) ~ ln(rank)`` over the top ``top_r`` term
    ranks — the Zipf exponent (natural language ~ -1; template or
    machine-generated corpora bend it) complementing :class:`VocabGrowth`
    on the distribution axis.

    Exactness: x = round6(ln rank) and y = round6(ln count) are
    DECIMAL(18,6); the OLS moments are exact decimal products/sums, the
    slope is ONE IEEE division of those exact sums, rounded once. Ranks
    tie-break on the term string, so both engines rank identically.

    Scale shape: term counts are one explode + vocabulary-sized
    hash-aggregate; only the top-``top_r`` rows (orderBy + limit — a
    TakeOrdered, not a global sort materialization) enter the fit."""

    def __init__(
        self,
        top_r: int = 100,
        text_col: str = "text",
        **kwargs,
    ):
        if top_r < 3:
            raise ValueError(f"top_r must be >= 3, got {top_r}")
        super().__init__(**kwargs)
        self.top_r = top_r
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        counts = (
            df.select(F.explode(tokens_expr(F.col(self.text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("term"))
            .limit(self.top_r)
        )
        w = Window.orderBy(F.desc("cnt"), F.asc("term"))
        ranked = counts.withColumn("rank", F.row_number().over(w))
        x = F.log(F.col("rank").cast("double")).cast("decimal(18,6)")
        y = F.log(F.col("cnt").cast("double")).cast("decimal(18,6)")
        m = ranked.agg(
            F.count(F.lit(1)).alias("r"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
        )
        rr = F.col("r").cast("double")
        num = rr * F.col("sxy").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sy").cast("double")
        den = rr * F.col("sxx").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sx").cast("double")
        return m.select(
            F.col("r").cast("long").alias("r_used"),
            (num / den).cast("decimal(18,6)").cast("double").alias("slope"),
        )


def zipf_fit_sql(
    table: str = "documents", top_r: int = 100, text: str = "text"
) -> str:
    """DuckDB oracle for :class:`ZipfFit`: identical ranking, rounded
    logs, exact decimal moments and final division."""
    toks = tokens_sql(text)
    return f"""
WITH counts AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT unnest({toks}) AS term FROM {table})
  GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {top_r}
),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank
  FROM counts
),
m AS (
  SELECT COUNT(*) AS r,
         SUM(CAST(ln(rank) AS DECIMAL(18,6))) AS sx,
         SUM(CAST(ln(cnt) AS DECIMAL(18,6))) AS sy,
         SUM(CAST(ln(rank) AS DECIMAL(18,6)) * CAST(ln(cnt) AS DECIMAL(18,6))) AS sxy,
         SUM(CAST(ln(rank) AS DECIMAL(18,6)) * CAST(ln(rank) AS DECIMAL(18,6))) AS sxx
  FROM ranked
)
SELECT CAST(r AS BIGINT) AS r_used,
       CAST(CAST(
         (CAST(r AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(r AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       AS DECIMAL(18,6)) AS DOUBLE) AS slope
FROM m
"""


# ---------------------------------------------------------------------------
# pairwise source-vocabulary Jensen-Shannon divergence (mixture redundancy)
# ---------------------------------------------------------------------------


class SourceDivergence(Pipe):
    """Pairwise Jensen-Shannon divergence between per-group unigram
    distributions — the mixture-redundancy matrix: two sources with
    near-zero JS carry the same text distribution and waste mixture
    share (q167 sees literal duplication; this sees distributional
    overlap even with zero shared documents). JS in [0, ln 2]; symmetric,
    finite without smoothing (zero-count terms contribute exactly 0 on
    their side).

    Exactness (the PSI/integer-numerator pattern): with per-source
    totals t1, t2 constant within a pair,

        JS = 0.5 * [ (sum_w c1 * L1) / t1 + (sum_w c2 * L2) / t2 ]
        L1 = round6(ln(2 * c1 * t2 / (c1 * t2 + c2 * t1)))   (c1 > 0)

    — integer-count x rounded-log decimal products summed exactly, ONE
    IEEE division per side, one final rounding. Log arguments are ratios
    of exact integers, so both engines feed ln identical doubles.

    Scale shape: one explode into a (group x vocab)-sized count table,
    then a (pairs x vocab)-bounded grid join — groups are few by
    construction (sources/languages), so the quadratic factor is the
    group count, never the corpus."""

    def __init__(
        self,
        group_col: str = "source",
        text_col: str = "text",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.group_col = group_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        g = self.group_col
        counts = (
            df.select(
                F.col(g).alias("grp"),
                F.explode(tokens_expr(F.col(self.text_col))).alias("term"),
            )
            .groupBy("grp", "term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        totals = counts.groupBy("grp").agg(F.sum("c").alias("t"))
        ga = totals.select(
            F.col("grp").alias("g1"), F.col("t").alias("t1")
        )
        gb = totals.select(
            F.col("grp").alias("g2"), F.col("t").alias("t2")
        )
        pairs = ga.crossJoin(gb).filter(F.col("g1") < F.col("g2"))
        terms = counts.select("term").distinct()
        # (pairs x vocab) grid: pairs is groups^2-bounded (broadcast),
        # terms is vocabulary-sized — the grid streams the vocab once
        grid = terms.crossJoin(F.broadcast(pairs))
        c1t = counts.select(
            F.col("grp").alias("g1"), "term", F.col("c").alias("c1")
        )
        c2t = counts.select(
            F.col("grp").alias("g2"), "term", F.col("c").alias("c2")
        )
        cells = (
            grid.join(c1t, ["g1", "term"], "left")
            .join(c2t, ["g2", "term"], "left")
            .na.fill({"c1": 0, "c2": 0})
            .filter((F.col("c1") > 0) | (F.col("c2") > 0))
        )
        arg1 = (2 * F.col("c1") * F.col("t2")).cast("double") / (
            F.col("c1") * F.col("t2") + F.col("c2") * F.col("t1")
        ).cast("double")
        arg2 = (2 * F.col("c2") * F.col("t1")).cast("double") / (
            F.col("c1") * F.col("t2") + F.col("c2") * F.col("t1")
        ).cast("double")
        l1 = F.log(arg1).cast("decimal(18,6)")
        l2 = F.log(arg2).cast("decimal(18,6)")
        term1 = F.when(F.col("c1") > 0, F.col("c1") * l1).otherwise(
            F.lit(0).cast("decimal(18,6)")
        )
        term2 = F.when(F.col("c2") > 0, F.col("c2") * l2).otherwise(
            F.lit(0).cast("decimal(18,6)")
        )
        agg = cells.groupBy("g1", "g2").agg(
            F.sum(term1).alias("s1"),
            F.sum(term2).alias("s2"),
            F.max("t1").alias("t1m"),
            F.max("t2").alias("t2m"),
        )
        js = (
            0.5
            * (
                F.col("s1").cast("double") / F.col("t1m").cast("double")
                + F.col("s2").cast("double") / F.col("t2m").cast("double")
            )
        ).cast("decimal(18,6)").cast("double")
        return agg.select(
            F.col("g1").alias("source_a"),
            F.col("g2").alias("source_b"),
            js.alias("js_divergence"),
        )


def source_divergence_sql(
    table: str = "documents",
    group: str = "source",
    text: str = "text",
) -> str:
    """DuckDB oracle for :class:`SourceDivergence`: identical counts,
    integer log arguments, rounded logs, exact sums and divisions."""
    toks = tokens_sql(text)
    return f"""
WITH counts AS MATERIALIZED (
  SELECT {group} AS grp, term, COUNT(*) AS c
  FROM (SELECT {group}, unnest({toks}) AS term FROM {table})
  GROUP BY 1, 2
),
totals AS (SELECT grp, SUM(c) AS t FROM counts GROUP BY 1),
pairs AS (
  SELECT a.grp AS g1, a.t AS t1, b.grp AS g2, b.t AS t2
  FROM totals a JOIN totals b ON a.grp < b.grp
),
cells AS (
  SELECT p.g1, p.g2, p.t1, p.t2,
         COALESCE(c1.c, 0) AS c1, COALESCE(c2.c, 0) AS c2
  FROM pairs p
  JOIN (SELECT DISTINCT term FROM counts) v ON TRUE
  LEFT JOIN counts c1 ON c1.grp = p.g1 AND c1.term = v.term
  LEFT JOIN counts c2 ON c2.grp = p.g2 AND c2.term = v.term
  WHERE COALESCE(c1.c, 0) > 0 OR COALESCE(c2.c, 0) > 0
),
agg AS (
  SELECT g1, g2, MAX(t1) AS t1, MAX(t2) AS t2,
         SUM(CASE WHEN c1 > 0 THEN c1 * CAST(ln(CAST(2 * c1 * t2 AS DOUBLE)
                    / CAST(c1 * t2 + c2 * t1 AS DOUBLE)) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS s1,
         SUM(CASE WHEN c2 > 0 THEN c2 * CAST(ln(CAST(2 * c2 * t1 AS DOUBLE)
                    / CAST(c1 * t2 + c2 * t1 AS DOUBLE)) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS s2
  FROM cells GROUP BY 1, 2
)
SELECT g1 AS source_a, g2 AS source_b,
       CAST(CAST(0.5 * (CAST(s1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                        + CAST(s2 AS DOUBLE) / CAST(t2 AS DOUBLE))
            AS DECIMAL(18,6)) AS DOUBLE) AS js_divergence
FROM agg ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# Flesch reading-ease readability (syllable-heuristic quality signal)
# ---------------------------------------------------------------------------


class FleschReadability(Pipe):
    """Flesch reading ease per document (Flesch 1948; the Kincaid-family
    formula every readability gate uses)::

        206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)

    Syllables use the standard vowel-group heuristic (maximal
    ``[aeiouy]+`` runs over the ASCII-lowered text), sentences the
    engine's ``[.!?] `` boundary (min 1), words the engine tokenizer —
    all three are exact integers, so the score is two IEEE divisions
    rounded at DECIMAL(18,6) and one literal-coefficient combination,
    identical across engines. Docs with zero words emit a NULL score
    (readability of nothing is undefined — the row is KEPT, the
    GopherRepetition lesson).

    Pure scan-level expressions: no shuffle, no UDF — scan speed at
    100 TB like the q24/q140 gates it complements (those measure
    lexical quality; this measures sentence complexity)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", **kwargs):
        super().__init__(**kwargs)
        self.id_col = id_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        low = ascii_lower_expr(F.col(self.text_col))
        words = F.size(tokens_expr(F.col(self.text_col))).cast("long")
        sents = F.greatest(
            F.lit(1).cast("long"),
            (F.size(F.split(low, r"[.!?] ")) - 0).cast("long"),
        )
        syll = F.regexp_count(low, F.lit("[aeiouy]+")).cast("long")
        dec6 = lambda c: c.cast("decimal(18,6)").cast("double")
        wps = dec6(words.cast("double") / sents.cast("double"))
        spw = dec6(syll.cast("double") / words.cast("double"))
        flesch = dec6(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        )
        return df.select(
            F.col(self.id_col),
            words.alias("n_words"),
            sents.alias("n_sentences"),
            syll.alias("n_syllables"),
            F.when(words > 0, flesch).otherwise(F.lit(None)).alias("flesch"),
        )


def flesch_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    """DuckDB oracle for :class:`FleschReadability`: identical token /
    sentence / vowel-group counting and rounding points."""
    low = ascii_lower_sql(text)
    toks = tokens_sql(text)
    wps = (
        "CAST(CAST(CAST(w AS DOUBLE) / CAST(s AS DOUBLE) "
        "AS DECIMAL(18,6)) AS DOUBLE)"
    )
    spw = (
        "CAST(CAST(CAST(sy AS DOUBLE) / CAST(w AS DOUBLE) "
        "AS DECIMAL(18,6)) AS DOUBLE)"
    )
    return f"""
WITH c AS (
  SELECT {id_col},
         CAST(len({toks}) AS BIGINT) AS w,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(len(string_split_regex({low}, '[.!?] ')) AS BIGINT)) AS s,
         CAST(len(regexp_extract_all({low}, '[aeiouy]+')) AS BIGINT) AS sy
  FROM {table}
)
SELECT {id_col}, w AS n_words, s AS n_sentences, sy AS n_syllables,
       CASE WHEN w > 0
            THEN CAST(CAST(206.835 - 1.015 * {wps} - 84.6 * {spw}
                 AS DECIMAL(18,6)) AS DOUBLE)
            ELSE NULL END AS flesch
FROM c ORDER BY {id_col}
"""


class TermBurstiness(Pipe):
    """Term burstiness report (Church & Gale 1995, "Poisson mixtures";
    Katz 1996): for each term with document frequency >= ``min_df`` emit

    * ``burstiness`` = cf/df — the mean number of occurrences in the
      documents where the term appears at all (Church-Gale E[c | c>0]);
    * ``vmr`` — the variance-to-mean ratio (index of dispersion) of the
      term's per-document count over ALL N documents, computed from exact
      BIGINT moments: vmr = (N*sum(c^2) - cf^2) / (N*cf). A Poisson
      (topic-blind) term has vmr ~= 1; content-bearing terms are bursty
      (vmr >> 1) — the signal that separates keywords from function words
      without any stopword list.

    Top-``k`` terms by vmr. Two aggregations, both vocabulary-keyed: the
    per-(term, doc) tf collapse (map-side partial on the token explode)
    and the per-term moment rollup; N joins in as a broadcast one-row
    aggregate. Both ratios are single IEEE divisions of exact integers,
    so ordering and values are engine-independent.

    Reference anchor: extension of the q60 term-stats family."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_df: int = 20,
        k: int = 20,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.text_col = text_col
        self.id_col = id_col
        self.min_df = min_df
        self.k = k

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        from warp_pipes_spark.text.dedup import widen_partitions

        n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
        # per-(term, doc) counts first, then per-term moments
        per_doc = (
            widen_partitions(
                df.select(F.col(self.id_col).alias("__doc"), self.text_col)
            )
            .select("__doc", F.explode(tokens_expr(F.col(self.text_col))).alias("term"))
            .groupBy("term", "__doc")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        stats = per_doc.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("c").alias("cf"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        scored = (
            stats.filter(F.col("df") >= self.min_df)
            .crossJoin(F.broadcast(n_docs))
            .select(
                "term",
                F.col("df").cast("long").alias("df"),
                F.col("cf").cast("long").alias("cf"),
                (F.col("cf") / F.col("df").cast("double")).alias("burstiness"),
                (
                    (F.col("__n") * F.col("s2") - F.col("cf") * F.col("cf"))
                    / (F.col("__n") * F.col("cf")).cast("double")
                ).alias("vmr"),
            )
        )
        w = Window.orderBy(F.desc("vmr"), F.asc("term"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= self.k)
            .select("rank", "term", "df", "cf", "burstiness", "vmr")
        )


def term_burstiness_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    min_df: int = 20,
    k: int = 20,
) -> str:
    """DuckDB oracle for :class:`TermBurstiness` — identical integer
    moments and single-division ratios."""
    return f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM {table}),
per_doc AS (
  SELECT t.term, d.{id_col} AS doc, COUNT(*) AS c
  FROM {table} d, unnest({tokens_sql(text)}) AS t(term)
  GROUP BY 1, 2
),
stats AS (
  SELECT term, COUNT(*) AS df, SUM(c) AS cf, SUM(c * c) AS s2
  FROM per_doc GROUP BY term
),
scored AS (
  SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
         cf / CAST(df AS DOUBLE) AS burstiness,
         (n.n_docs * s2 - cf * cf) / CAST(n.n_docs * cf AS DOUBLE) AS vmr
  FROM stats, n WHERE df >= {min_df}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY vmr DESC, term) AS INT) AS rank,
       term, df, cf, burstiness, vmr
FROM scored
QUALIFY rank <= {k}
ORDER BY rank
"""


class KneserNeyScore(Pipe):
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    Chen & Goodman 1998 formulation KenLM implements) — the standard LM
    the stupid-backoff family (q171) approximates:

      P_KN(w2 | w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                      + (D * N1+(w1 .) / c(w1 .)) * N1+(. w2) / N1+(. .)

    with discount ``D`` and the continuation counts N1+ (distinct
    successors / predecessors / bigram types). The model self-trains on
    the input corpus (the q76 pattern), so every scored bigram has
    c >= 1 and no OOV branch is needed; docs shorter than two tokens are
    skipped on both engines. Output per doc: bigram count and the mean
    KN log-probability (each ln rounds through DECIMAL(18,6) before the
    exact tf-weighted decimal sum — the engine's log-parity discipline).

    All model tables are vocabulary- or bigram-type-sized hash
    aggregates; scoring is a join chain off the per-(doc, bigram) tf
    table — the same shuffle shape as q171."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        discount: float = 0.75,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.text_col = text_col
        self.id_col = id_col
        self.discount = discount

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.text.dedup import widen_partitions

        t = tokens_expr(F.col(self.text_col))
        bi = F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        doc_bi = (
            widen_partitions(
                df.select(F.col(self.id_col).alias("doc_id"), self.text_col)
            )
            .where(F.size(t) >= 2)
            .select("doc_id", F.explode(bi).alias("b"))
            .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        big = doc_bi.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
        ctx = big.groupBy("w1").agg(
            F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_fw")
        )
        cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
        types = big.agg(F.count(F.lit(1)).alias("n_types"))
        D = self.discount
        p = (
            F.greatest(F.col("c12").cast("double") - F.lit(D), F.lit(0.0))
            / F.col("c1").cast("double")
            + (F.lit(D) * F.col("n1p_fw").cast("double") / F.col("c1").cast("double"))
            * (F.col("n1p_bw").cast("double") / F.col("n_types").cast("double"))
        )
        # lnp rides as a scaled long (millionths): the per-doc mean then
        # rounds half-up in EXACT INTEGER arithmetic — (2N + n) DIV (2n)
        # on the negated sum — because the IEEE-division-then-decimal-cast
        # recipe breaks exactly when sum/n lands on a .xxxxxx5 tie (the
        # double cannot represent the tie, and the two engines' double->
        # decimal conversions round the nearest double differently)
        lnp6 = (F.log(p).cast("decimal(18,6)") * 1000000).cast("long")
        scored = (
            doc_bi.join(big, ["w1", "w2"])
            .join(ctx, "w1")
            .join(cont, "w2")
            .crossJoin(F.broadcast(types))
            .select("doc_id", "tf", (F.col("tf") * lnp6).alias("__wl"))
        )
        agg = scored.groupBy("doc_id").agg(
            F.sum("tf").alias("n_bigrams"), (-F.sum("__wl")).alias("__npos")
        )
        mean_micro = F.expr("(2 * __npos + n_bigrams) DIV (2 * n_bigrams)")
        return agg.select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            # one IEEE division of exact integers — identical on any engine
            ((-mean_micro).cast("double") / F.lit(1000000.0)).alias(
                "mean_kn_logprob"
            ),
        )


def kneser_ney_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> str:
    """DuckDB oracle for :class:`KneserNeyScore` — identical bigram
    extraction, identical KN expression tree (same IEEE op order),
    identical decimal-rounded logs and exact weighted sums."""
    toks = tokens_sql(text)
    return f"""
WITH toksd AS (
  SELECT {id_col} AS doc_id, {toks} AS t FROM {table}
),
doc_bi AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, COUNT(*) AS tf
  FROM toksd, unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2, 3
),
big AS (
  SELECT w1, w2, SUM(tf) AS c12 FROM doc_bi GROUP BY 1, 2
),
ctx AS (
  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1p_fw FROM big GROUP BY 1
),
cont AS (
  SELECT w2, COUNT(*) AS n1p_bw FROM big GROUP BY 1
),
types AS (SELECT COUNT(*) AS n_types FROM big),
scored AS (
  SELECT d.doc_id, d.tf,
         d.tf * CAST(CAST(ln(
           GREATEST(CAST(b.c12 AS DOUBLE) - {discount!r}, 0.0)
             / CAST(x.c1 AS DOUBLE)
           + ({discount!r} * CAST(x.n1p_fw AS DOUBLE) / CAST(x.c1 AS DOUBLE))
             * (CAST(c.n1p_bw AS DOUBLE) / CAST(y.n_types AS DOUBLE))
         ) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS wl
  FROM doc_bi d
  JOIN big b ON d.w1 = b.w1 AND d.w2 = b.w2
  JOIN ctx x ON d.w1 = x.w1
  JOIN cont c ON d.w2 = c.w2
  CROSS JOIN types y
),
agg AS (
  SELECT doc_id, SUM(tf) AS nb, -SUM(wl) AS npos FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
       CAST(-((2 * npos + nb) // (2 * nb)) AS DOUBLE) / 1000000.0
         AS mean_kn_logprob
FROM agg
ORDER BY doc_id
"""


class ContingencyPanel(Pipe):
    """Association panel for two categorical document attributes — the
    one-row report a mixture curator reads to decide whether composition
    is independent of provenance (is language mix the same in every
    source?): mutual information, normalized MI, the marginal entropies
    and the chi-square statistic of the (row_col x col_col) contingency
    table (Shannon 1948; Pearson 1900; Strehl & Ghosh 2002 for the
    sqrt-normalized NMI).

    Exactness (the JS/PSI integer-numerator discipline): with exact
    BIGINT cell counts c_rc, margins c_r/c_c and total N,

        MI * N  = sum_cells c_rc * round6(ln(c_rc * N / (c_r * c_c)))
        H_r * N = sum_rows  c_r  * round6(ln(N / c_r))        (H_c alike)
        chi2    = sum_grid  round6(d^2 / (c_r * c_c * N)),
                  d = c_rc * N - c_r * c_c   (exact BIGINT)

    — every log/division argument derives from exact integers (both
    engines feed libm identical doubles), products are BIGINT x
    DECIMAL(18,6) (exact), sums are DECIMAL (exact), and each output is
    ONE final IEEE division rounded once. NMI re-derives from the
    already-rounded MI/H values, so it inherits their determinism.
    Numerator/denominator PRODUCTS are taken in DOUBLE (per-factor
    casts, fixed multiply order — identical IEEE results both engines,
    no BIGINT overflow cliff); only the chi-square difference d needs
    exact BIGINT products, bounding the run at N ~ 3e9 rows.

    Scale shape: ONE scan into a groupBy on the two keys (cells bounded
    by |rows| x |cols| — categorical by contract), margins re-aggregate
    the CELL table (never the corpus), the zero-including chi-square
    grid is a margins cross join. Nothing corpus-sized past the first
    aggregation."""

    def __init__(
        self,
        row_col: str = "source",
        col_col: str = "lang",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.row_col = row_col
        self.col_col = col_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        cells = (
            df.select(
                F.col(self.row_col).alias("r"), F.col(self.col_col).alias("c")
            )
            .groupBy("r", "c")
            .agg(F.count(F.lit(1)).alias("n_rc"))
        )
        rows = cells.groupBy("r").agg(F.sum("n_rc").alias("n_r"))
        cols = cells.groupBy("c").agg(F.sum("n_rc").alias("n_c"))
        tot = cells.agg(F.sum("n_rc").alias("n"))

        # MI: observed cells only (zero cells contribute exactly 0)
        mi_cells = (
            cells.join(F.broadcast(rows), "r")
            .join(F.broadcast(cols), "c")
            .crossJoin(F.broadcast(tot))
        )
        mi_term = F.col("n_rc") * F.log(
            (F.col("n_rc").cast("double") * F.col("n").cast("double"))
            / (F.col("n_r").cast("double") * F.col("n_c").cast("double"))
        ).cast(D)
        s_mi = mi_cells.agg(
            F.sum(mi_term).alias("s_mi"), F.max("n").alias("n")
        )

        # chi-square: the FULL margins grid (zero cells contribute e_rc)
        grid = (
            rows.crossJoin(cols)
            .join(cells, ["r", "c"], "left")
            .na.fill({"n_rc": 0})
            .crossJoin(F.broadcast(tot))
        )
        d = F.col("n_rc") * F.col("n") - F.col("n_r") * F.col("n_c")
        chi_term = (
            (d.cast("double") * d.cast("double"))
            / (
                F.col("n_r").cast("double")
                * F.col("n_c").cast("double")
                * F.col("n").cast("double")
            )
        ).cast(D)
        s_chi = grid.agg(
            F.sum(chi_term).alias("s_chi"),
            F.count_distinct(F.col("r")).alias("n_rows"),
            F.count_distinct(F.col("c")).alias("n_cols"),
        )

        def h_of(margin, cnt):
            t = F.col(cnt) * F.log(
                F.col("n").cast("double") / F.col(cnt).cast("double")
            ).cast(D)
            return margin.crossJoin(F.broadcast(tot)).agg(
                F.sum(t).alias("s_h")
            )

        s_hr = h_of(rows, "n_r").select(F.col("s_h").alias("s_hr"))
        s_hc = h_of(cols, "n_c").select(F.col("s_h").alias("s_hc"))

        panel = (
            s_mi.crossJoin(s_chi).crossJoin(s_hr).crossJoin(s_hc)
        )
        nd = F.col("n").cast("double")
        mi = (F.col("s_mi").cast("double") / nd).cast(D).cast("double")
        hr = (F.col("s_hr").cast("double") / nd).cast(D).cast("double")
        hc = (F.col("s_hc").cast("double") / nd).cast(D).cast("double")
        # NMI from the ALREADY-ROUNDED components: sqrt is correctly
        # rounded IEEE, so both engines divide identical doubles
        nmi = F.when(
            (hr > 0) & (hc > 0), (mi / F.sqrt(hr * hc)).cast(D).cast("double")
        ).otherwise(F.lit(0.0))
        return panel.select(
            F.col("n").cast("long").alias("n_docs"),
            mi.alias("mi_nats"),
            hr.alias("h_row"),
            hc.alias("h_col"),
            nmi.alias("nmi"),
            F.col("s_chi").cast("double").cast(D).cast("double").alias("chi2"),
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
            .cast("long")
            .alias("dof"),
        )


def contingency_panel_sql(
    table: str = "documents",
    row: str = "source",
    col: str = "lang",
) -> str:
    """DuckDB oracle for :class:`ContingencyPanel`: identical exact-BIGINT
    cells/margins, rounded logs, exact DECIMAL sums, one division each."""
    return f"""
WITH cells AS MATERIALIZED (
  SELECT {row} AS r, {col} AS c, COUNT(*) AS n_rc FROM {table} GROUP BY 1, 2
),
rws AS (SELECT r, SUM(n_rc) AS n_r FROM cells GROUP BY 1),
cls AS (SELECT c, SUM(n_rc) AS n_c FROM cells GROUP BY 1),
tot AS (SELECT SUM(n_rc) AS n FROM cells),
s_mi AS (
  SELECT SUM(n_rc * CAST(ln((CAST(n_rc AS DOUBLE) * CAST(n AS DOUBLE))
                            / (CAST(n_r AS DOUBLE) * CAST(n_c AS DOUBLE)))
                         AS DECIMAL(18,6)))
           AS s_mi
  FROM cells JOIN rws USING (r) JOIN cls USING (c) CROSS JOIN tot
),
grid AS (
  SELECT rws.r, cls.c, rws.n_r, cls.n_c, COALESCE(cells.n_rc, 0) AS n_rc, n
  FROM rws CROSS JOIN cls
  LEFT JOIN cells ON cells.r = rws.r AND cells.c = cls.c
  CROSS JOIN tot
),
s_chi AS (
  SELECT SUM(CAST(CAST(n_rc * n - n_r * n_c AS DOUBLE)
                  * CAST(n_rc * n - n_r * n_c AS DOUBLE)
                  / (CAST(n_r AS DOUBLE) * CAST(n_c AS DOUBLE)
                     * CAST(n AS DOUBLE)) AS DECIMAL(18,6)))
           AS s_chi,
         COUNT(DISTINCT r) AS n_rows, COUNT(DISTINCT c) AS n_cols
  FROM grid
),
s_hr AS (
  SELECT SUM(n_r * CAST(ln(CAST(n AS DOUBLE) / CAST(n_r AS DOUBLE))
                        AS DECIMAL(18,6))) AS s_hr
  FROM rws CROSS JOIN tot
),
s_hc AS (
  SELECT SUM(n_c * CAST(ln(CAST(n AS DOUBLE) / CAST(n_c AS DOUBLE))
                        AS DECIMAL(18,6))) AS s_hc
  FROM cls CROSS JOIN tot
),
panel AS (
  SELECT n,
    CAST(CAST(CAST(s_mi AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,6))
         AS DOUBLE) AS mi,
    CAST(CAST(CAST(s_hr AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,6))
         AS DOUBLE) AS hr,
    CAST(CAST(CAST(s_hc AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,6))
         AS DOUBLE) AS hc,
    s_chi, n_rows, n_cols
  FROM tot CROSS JOIN s_mi CROSS JOIN s_chi CROSS JOIN s_hr CROSS JOIN s_hc
)
SELECT CAST(n AS BIGINT) AS n_docs,
       mi AS mi_nats, hr AS h_row, hc AS h_col,
       CASE WHEN hr > 0 AND hc > 0
            THEN CAST(CAST(mi / sqrt(hr * hc) AS DECIMAL(18,6)) AS DOUBLE)
            ELSE 0.0 END AS nmi,
       CAST(CAST(CAST(s_chi AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS chi2,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof
FROM panel
"""


class CurriculumReport(Pipe):
    """Curriculum-phase report (Bengio et al. 2009 curriculum learning;
    the data-ordering recipe easy→hard pretraining runs use): each doc
    gets a difficulty composite = the mean of its corpus percentile
    under three scan-level hardness proxies — token count, chars per
    token, distinct-token ratio — and docs bucket into 4 phases by
    composite quartile. Output: per-phase doc count, composite
    min/mean/max and mean token count — the table that decides the
    phase boundaries before an ordered epoch is written.

    Percentiles WITHOUT a corpus-sized single-partition window (the
    classic percent_rank scale trap): each metric is DECIMAL(18,6)-
    discretized, grouped to a value-count table (bounded by value
    cardinality, <= 1e6+ buckets, never corpus-sized), cumulated with a
    window over DISTINCT VALUES, and joined back — the ECDF-join
    pattern (same algebra family as the KS panel). min-rank semantics:
    pr(v) = (#values < v) / (N - 1), ties share a percentile exactly
    like SQL PERCENT_RANK.

    Exactness: discretized metric values are exact decimals; ECDF
    counts are exact BIGINTs; pr is one IEEE division; the composite is
    one fixed-order sum of three doubles / 3, rounded once; phase =
    least(4, 1 + floor(composite * 4)) is row-local integer math; phase
    aggregates sum exact decimals/BIGINTs with one division each."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.text_col = text_col
        self.id_col = id_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        D = "decimal(18,6)"
        toks = tokens_expr(F.col(self.text_col))
        nt = F.size(toks)
        base = (
            df.select(
                F.col(self.id_col).alias("doc_id"),
                nt.alias("nt"),
                F.length(F.col(self.text_col)).alias("nc"),
                F.size(F.array_distinct(toks)).alias("nd"),
            )
            .filter(F.col("nt") > 0)
            .select(
                "doc_id",
                F.col("nt").cast("long").alias("n_tokens"),
                F.col("nt").cast(D).alias("m1"),
                (F.col("nc").cast("double") / F.col("nt").cast("double"))
                .cast(D)
                .alias("m2"),
                (F.col("nd").cast("double") / F.col("nt").cast("double"))
                .cast(D)
                .alias("m3"),
            )
        )
        n_tot = base.select(F.count(F.lit(1)).alias("n_all"))

        out = base
        for m in ("m1", "m2", "m3"):
            cnts = out.groupBy(m).agg(F.count(F.lit(1)).alias("__c"))
            w = (
                Window.orderBy(F.asc(m))
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            ecdf = cnts.select(
                m,
                F.coalesce(F.sum("__c").over(w), F.lit(0)).alias(
                    f"__lt_{m}"
                ),
            )
            out = out.join(ecdf, m)
        out = out.crossJoin(F.broadcast(n_tot))

        def pr(m):
            return F.col(f"__lt_{m}").cast("double") / (
                F.col("n_all") - 1
            ).cast("double")

        comp = (
            ((pr("m1") + pr("m2")) + pr("m3")) / F.lit(3.0)
        ).cast(D)
        out = out.select(
            "doc_id",
            "n_tokens",
            comp.alias("composite"),
        )
        phase = F.least(
            F.lit(4),
            F.lit(1)
            + F.floor(F.col("composite").cast("double") * F.lit(4.0)).cast(
                "int"
            ),
        )
        return (
            out.select(phase.alias("phase"), "composite", "n_tokens")
            .groupBy("phase")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min("composite").alias("__mn"),
                F.max("composite").alias("__mx"),
                F.sum("composite").alias("__sc"),
                F.sum("n_tokens").alias("__st"),
            )
            .select(
                F.col("phase").cast("int").alias("phase"),
                F.col("__n").cast("long").alias("n_docs"),
                F.col("__mn").cast("double").alias("min_composite"),
                (F.col("__sc").cast("double") / F.col("__n").cast("double"))
                .cast(D)
                .cast("double")
                .alias("mean_composite"),
                F.col("__mx").cast("double").alias("max_composite"),
                (F.col("__st").cast("double") / F.col("__n").cast("double"))
                .cast(D)
                .cast("double")
                .alias("mean_tokens"),
            )
            .orderBy("phase")
        )


def curriculum_report_sql(
    table: str = "documents", text: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle for :class:`CurriculumReport` — identical
    discretization, ECDF-join percentiles and phase algebra."""
    toks = tokens_sql(text)
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(len(t) AS DECIMAL(18,6)) AS m1,
         CAST(CAST(length({text}) AS DOUBLE) / CAST(len(t) AS DOUBLE)
              AS DECIMAL(18,6)) AS m2,
         CAST(CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
              AS DECIMAL(18,6)) AS m3
  FROM (SELECT {id_col}, {text}, {toks} AS t FROM {table})
  WHERE len(t) > 0
),
n_tot AS (SELECT COUNT(*) AS n_all FROM base),
e1 AS (
  SELECT m1, COALESCE(SUM(c) OVER (ORDER BY m1 ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt1
  FROM (SELECT m1, COUNT(*) AS c FROM base GROUP BY 1)
),
e2 AS (
  SELECT m2, COALESCE(SUM(c) OVER (ORDER BY m2 ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt2
  FROM (SELECT m2, COUNT(*) AS c FROM base GROUP BY 1)
),
e3 AS (
  SELECT m3, COALESCE(SUM(c) OVER (ORDER BY m3 ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt3
  FROM (SELECT m3, COUNT(*) AS c FROM base GROUP BY 1)
),
scored AS (
  SELECT b.doc_id, b.n_tokens,
         CAST(((CAST(lt1 AS DOUBLE) / CAST(n_all - 1 AS DOUBLE)
               + CAST(lt2 AS DOUBLE) / CAST(n_all - 1 AS DOUBLE))
               + CAST(lt3 AS DOUBLE) / CAST(n_all - 1 AS DOUBLE)) / 3.0
              AS DECIMAL(18,6)) AS composite
  FROM base b
  JOIN e1 USING (m1) JOIN e2 USING (m2) JOIN e3 USING (m3)
  CROSS JOIN n_tot
),
phased AS (
  SELECT LEAST(4, 1 + CAST(FLOOR(CAST(composite AS DOUBLE) * 4.0)
                           AS INTEGER)) AS phase,
         composite, n_tokens
  FROM scored
)
SELECT CAST(phase AS INTEGER) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(composite) AS DOUBLE) AS min_composite,
       CAST(CAST(CAST(SUM(composite) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS mean_composite,
       CAST(MAX(composite) AS DOUBLE) AS max_composite,
       CAST(CAST(CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS mean_tokens
FROM phased GROUP BY 1 ORDER BY 1
"""


class DiversityReport(Pipe):
    """Per-group lexical diversity: distinct-1 and distinct-2 (Li et al.
    2016 — the standard diversity metrics a generation/data team tracks),
    type-token ratio at the GROUP level and the repeated-bigram share —
    the panel that separates a source of templated near-clones (low
    distinct-2) from genuinely varied text BEFORE dedup has to prove it
    pairwise.

    distinct_1 = |unique unigrams| / n_tokens,
    distinct_2 = |unique bigrams| / n_bigrams — exact BIGINT counts,
    ONE IEEE division each, rounded once. Bigrams are executor-local
    adjacent pairs (the BigramPerplexity construction).

    Scale shape: one scan explodes tokens/bigrams; the shuffles are the
    per-(group, gram) distinct aggregations — the same cost class as any
    vocabulary count. Nothing pairwise, nothing corpus² — which is the
    point: this is the O(corpus) smell test you run before the O(pairs)
    dedup machinery."""

    def __init__(
        self, group_col: str = "source", text_col: str = "text", **kwargs
    ):
        super().__init__(**kwargs)
        self.group_col = group_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        d = df.select(
            F.col(self.group_col).alias("grp"),
            tokens_expr(F.col(self.text_col)).alias("l"),
        )
        uni = d.select("grp", F.explode("l").alias("t"))
        u_agg = uni.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("t").alias("u_uni"),
        )
        pairs = F.transform(
            F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
            lambda x, i: F.struct(
                x.alias("w1"),
                F.element_at(F.col("l"), i + F.lit(2)).alias("w2"),
            ),
        )
        bg = d.select("grp", F.explode(pairs).alias("bg")).select(
            "grp", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        b_agg = bg.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("w1", "w2").alias("u_bi"),
        )
        out = u_agg.join(b_agg, "grp")

        def ratio(a, b):
            return (
                (F.col(a).cast("double") / F.col(b).cast("double"))
                .cast(D)
                .cast("double")
            )

        return out.select(
            F.col("grp").alias(self.group_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("u_uni").cast("long").alias("n_unique_tokens"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("u_bi").cast("long").alias("n_unique_bigrams"),
            ratio("u_uni", "n_tokens").alias("distinct_1"),
            ratio("u_bi", "n_bigrams").alias("distinct_2"),
        )


def diversity_report_sql(
    table: str = "documents", group: str = "source", text: str = "text"
) -> str:
    """DuckDB oracle for :class:`DiversityReport` — identical exact
    counts and single rounded divisions."""
    toks = tokens_sql(text)
    return f"""
WITH toksd AS MATERIALIZED (
  SELECT {group} AS grp, {toks} AS t FROM {table}
),
uni AS (
  SELECT grp, COUNT(*) AS n_tokens, COUNT(DISTINCT u) AS u_uni
  FROM (SELECT grp, unnest(t) AS u FROM toksd) GROUP BY 1
),
bi AS (
  SELECT grp, COUNT(*) AS n_bigrams,
         COUNT(DISTINCT (w1, w2)) AS u_bi
  FROM (
    SELECT grp, t[i] AS w1, t[i + 1] AS w2
    FROM toksd, unnest(generate_series(1, len(t) - 1)) AS g(i)
  ) GROUP BY 1
)
SELECT grp AS {group},
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(u_uni AS BIGINT) AS n_unique_tokens,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(u_bi AS BIGINT) AS n_unique_bigrams,
       CAST(CAST(CAST(u_uni AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS distinct_1,
       CAST(CAST(CAST(u_bi AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS distinct_2
FROM uni JOIN bi USING (grp)
"""


class VocabularyProfile(Pipe):
    """Per-group vocabulary frequency-spectrum profile: Good-Turing
    unseen mass (Good 1953; Gale & Sampson 1995 "simple Good-Turing"),
    Simpson repeat-rate (Simpson 1949; the Hunter-Gaston 1988 unbiased
    form) and the modal-token share — the coverage panel a corpus team
    reads to answer "how much of this source's token distribution have
    we actually seen?" before sizing a held-out split or extrapolating
    vocabulary growth (the spectrum complements q187's Heaps fit).

    p_unseen = N1/N (the Good-Turing estimate of the probability mass
    on tokens never observed), gt_discount = 2*N2/N1 (the adjusted
    count r* for singletons — how much a single observation should be
    believed), simpson = sum f*(f-1) / (N*(N-1)) (probability two
    draws without replacement are the same type), top_share = max f/N.
    Every numerator/denominator is an exact BIGINT from one token-count
    table; each reported ratio is ONE IEEE division rounded once to
    DECIMAL(18,6) — the engine/oracle tie discipline used across the
    analysis family.

    Scale shape: one scan explodes tokens; the only shuffles are the
    per-(group, token) count and the per-group rollup of the
    vocabulary-sized frequency table. Nothing pairwise, no windows, no
    corpus-sized state — the same cost class as building a vocabulary."""

    def __init__(
        self, group_col: str = "source", text_col: str = "text", **kwargs
    ):
        super().__init__(**kwargs)
        self.group_col = group_col
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        tok = df.select(
            F.col(self.group_col).alias("grp"),
            F.explode(tokens_expr(F.col(self.text_col))).alias("t"),
        )
        freq = tok.groupBy("grp", "t").agg(F.count(F.lit(1)).alias("f"))
        agg = freq.groupBy("grp").agg(
            F.sum("f").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("n2"),
            F.sum(F.col("f") * (F.col("f") - 1)).alias("rep_num"),
            F.max("f").alias("top_f"),
        )

        def ratio(num, den):
            return (num.cast("double") / den.cast("double")).cast(D).cast(
                "double"
            )

        return agg.select(
            F.col("grp").alias(self.group_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.col("n1").cast("long").alias("n_singletons"),
            F.col("n2").cast("long").alias("n_doubletons"),
            ratio(F.col("n1"), F.col("n_tokens")).alias("p_unseen"),
            F.when(
                F.col("n1") > 0,
                ratio(F.lit(2) * F.col("n2"), F.col("n1")),
            ).alias("gt_discount"),
            # n_tokens == 1 would divide 0 by 0 (double NaN; the decimal
            # round then raises under ANSI while DuckDB errors on the
            # NaN cast) — NULL is the honest answer for a one-token
            # group, mirroring the gt_discount n1 > 0 guard
            F.when(
                F.col("n_tokens") > 1,
                ratio(
                    F.col("rep_num"),
                    F.col("n_tokens") * (F.col("n_tokens") - 1),
                ),
            ).alias("simpson"),
            ratio(F.col("top_f"), F.col("n_tokens")).alias("top_share"),
        )


def vocabulary_profile_sql(
    table: str = "documents", group: str = "source", text: str = "text"
) -> str:
    """DuckDB oracle for :class:`VocabularyProfile` — identical exact
    BIGINT spectrum and single rounded divisions."""
    toks = tokens_sql(text)
    return f"""
WITH freq AS MATERIALIZED (
  SELECT grp, t, COUNT(*) AS f FROM (
    SELECT {group} AS grp, unnest({toks}) AS t FROM {table}
  ) GROUP BY 1, 2
),
agg AS (
  SELECT grp,
         SUM(f) AS n_tokens,
         COUNT(*) AS vocab,
         SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS n2,
         SUM(f * (f - 1)) AS rep_num,
         MAX(f) AS top_f
  FROM freq GROUP BY 1
)
SELECT grp AS {group},
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       CAST(n1 AS BIGINT) AS n_singletons,
       CAST(n2 AS BIGINT) AS n_doubletons,
       CAST(CAST(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS p_unseen,
       CASE WHEN n1 > 0 THEN
         CAST(CAST(CAST(2 * n2 AS DOUBLE) / CAST(n1 AS DOUBLE)
              AS DECIMAL(18,6)) AS DOUBLE)
       END AS gt_discount,
       CASE WHEN n_tokens > 1 THEN
         CAST(CAST(CAST(rep_num AS DOUBLE)
              / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
              AS DECIMAL(18,6)) AS DOUBLE)
       END AS simpson,
       CAST(CAST(CAST(top_f AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS top_share
FROM agg
"""

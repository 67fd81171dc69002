"""Web-corpus operators: URL canonicalization and HTML boilerplate removal.

Every crawl-derived training corpus (Common Crawl and friends) starts with
two scan-level cleanups the reference engine has no analogue for:

- **URL canonicalization** — the dedup/quota key for web documents is the
  *canonical* URL (lowercased host, ``www.`` and default ports stripped,
  query string and fragment dropped, trailing slashes trimmed), never the
  raw string. Per-domain statistics and quotas hang off the same parse.
- **HTML stripping** — tag/entity removal and whitespace collapse before
  any text analysis or tokenization.

Both are pure ``regexp_extract``/``regexp_replace`` column expressions:
JVM-side, codegen'd, scan-speed at 100 TB — no shuffle, no Python. The
regex subset used (character classes, non-capturing groups, ``(?s)``
inline flag) is shared by Java regex and RE2, so the DuckDB oracles run
the *same* patterns (``*_sql`` helpers below).

Registrable-domain extraction is the two-label approximation (no public
suffix list in this environment); swap in a PSL lookup table (broadcast
join against ~9k suffixes) for production multi-label TLDs.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

# one regex family, used verbatim on both engines ------------------------

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_REG_DOMAIN = r"([^.]+\.[^.]+)$"

_TAG = r"<[^>]+>"
_SCRIPT_STYLE = r"(?s)<(?:script|style)[^>]*>.*?</(?:script|style)>"
_ENTITY = r"&[A-Za-z]+;|&#[0-9]+;"
_WS = r"\s+"


class UrlParse(Pipe):
    """Parse + canonicalize a URL column into typed components.

    Emits (all derived from one scan, no shuffle):

    - ``scheme`` — lowercased
    - ``host`` — lowercased, userinfo/port stripped, leading ``www.``
      removed
    - ``domain`` — registrable domain (two-label approximation)
    - ``port`` — explicit port, NULL when absent; default ports (80/443
      for http/https) are treated as absent
    - ``path`` — trailing ``/`` runs trimmed; empty path canonicalizes
      to ``/``
    - ``canon_url`` — ``scheme://host<path>``: the dedup/quota key (query
      string, fragment, userinfo, default port all dropped)
    """

    def __init__(self, url_col: str = "url", **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.url_col = url_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        u = F.col(self.url_col)
        scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
        raw_host = F.lower(F.regexp_extract(u, _HOST, 1))
        host = F.regexp_replace(raw_host, r"^www\.", "")
        port_s = F.regexp_extract(u, _PORT, 1)
        is_default = ((scheme == "http") & (port_s == "80")) | (
            (scheme == "https") & (port_s == "443")
        )
        port = F.when(
            (port_s != "") & ~is_default, port_s.cast("int")
        ).otherwise(F.lit(None).cast("int"))
        raw_path = F.regexp_extract(u, _PATH, 1)
        trimmed = F.regexp_replace(raw_path, r"/+$", "")
        path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
        domain = F.regexp_extract(host, _REG_DOMAIN, 1)
        canon = F.concat(scheme, F.lit("://"), host, path)
        return {
            "scheme": scheme,
            "host": host,
            "domain": domain,
            "port": port,
            "path": path,
            "canon_url": canon,
        }


def url_parse_sql(url: str = "url") -> Dict[str, str]:
    """DuckDB expressions mirroring :class:`UrlParse` component-for-
    component (same patterns — the Java/RE2 shared subset)."""

    def esc(p: str) -> str:
        # DuckDB single-quoted strings keep backslashes literal — only
        # quotes need escaping (doubling backslashes would corrupt \s etc.)
        return p.replace("'", "''")

    scheme = f"lower(regexp_extract({url}, '{esc(_SCHEME)}', 1))"
    raw_host = f"lower(regexp_extract({url}, '{esc(_HOST)}', 1))"
    host = f"regexp_replace({raw_host}, '^www\\.', '')"
    port_s = f"regexp_extract({url}, '{esc(_PORT)}', 1)"
    is_default = (
        f"(({scheme} = 'http' AND {port_s} = '80') OR "
        f"({scheme} = 'https' AND {port_s} = '443'))"
    )
    port = (
        f"CASE WHEN {port_s} <> '' AND NOT {is_default} "
        f"THEN CAST({port_s} AS INTEGER) ELSE NULL END"
    )
    raw_path = f"regexp_extract({url}, '{esc(_PATH)}', 1)"
    trimmed = f"regexp_replace({raw_path}, '/+$', '')"
    path = f"CASE WHEN {trimmed} = '' THEN '/' ELSE {trimmed} END"
    domain = f"regexp_extract({host}, '{esc(_REG_DOMAIN)}', 1)"
    canon = f"{scheme} || '://' || {host} || {path}"
    return {
        "scheme": scheme,
        "host": host,
        "domain": domain,
        "port": port,
        "path": path,
        "canon_url": canon,
    }


class HtmlStrip(Pipe):
    """HTML → text: script/style blocks removed wholesale, remaining tags
    and character entities replaced by spaces, whitespace collapsed and
    trimmed. ``n_tags`` counts tag removals (script/style contents count
    as the single enclosing removal, after-block tags individually) —
    the boilerplate-volume signal quality filters key off."""

    def __init__(
        self,
        text_col: str = "text",
        out_col: str = "clean_text",
        count_col: str = "n_tags",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col
        self.count_col = count_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        t = F.col(self.text_col)
        no_blocks = F.regexp_replace(t, _SCRIPT_STYLE, " ")
        n_tags = F.regexp_count(t, F.lit(_SCRIPT_STYLE)) + F.regexp_count(
            no_blocks, F.lit(_TAG)
        )
        no_tags = F.regexp_replace(no_blocks, _TAG, " ")
        no_entities = F.regexp_replace(no_tags, _ENTITY, " ")
        clean = F.trim(F.regexp_replace(no_entities, _WS, " "))
        return {self.out_col: clean, self.count_col: n_tags.cast("int")}


# ftfy-lite: UTF-8-bytes-decoded-as-cp1252 mojibake. The map is DERIVED,
# not hand-typed: bad = good.encode("utf-8").decode("cp1252") — i.e.
# exactly the artifact a cp1252 mis-decode produces for each intended
# character. Ordered longest-first so 3-byte artifacts repair before
# their 2-byte prefixes could match. (Characters whose UTF-8 bytes hit
# cp1252's five unmapped codepoints — e.g. U+201D — can't round-trip
# and are excluded.) Final entry: a stray mojibake "\u00c2" before nbsp
# reduces to nbsp, which the cleanup below folds to a plain space.
_MOJIBAKE_CHARS = (
    "\u2019\u2018\u201c\u2013\u2014\u2026\u2022"  # ’ ‘ “ – — … •
    "\u00e9\u00e8\u00e1\u00f3\u00fa\u00e4\u00f6"  # é è á ó ú ä ö
    "\u00fc\u00f1\u00e7\u00e0\u00ab\u00bb\u00b0"  # ü ñ ç à « » °
    "\u00a0"  # nbsp (bad form = "Â" + nbsp)
)
MOJIBAKE_MAP = tuple(
    sorted(
        ((g.encode("utf-8").decode("cp1252"), g) for g in _MOJIBAKE_CHARS),
        key=lambda kv: -len(kv[0]),
    )
)

_ZERO_WIDTH = "[\u200b\u200c\u200d\ufeff]"
_CONTROL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def fix_text_expr(col: Column) -> Column:
    """Mojibake repair + invisible-character cleanup as ONE chain of
    literal/regex replaces — JVM expressions, scan-speed, no Python.
    Order: mojibake map (longest first), zero-width strip, nbsp -> space,
    control-char strip. Deliberately conservative: no whitespace collapse,
    no case/Unicode normalization — those are separate ops."""
    out = col
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    out = F.regexp_replace(out, _ZERO_WIDTH, "")
    out = F.replace(out, F.lit("\u00a0"), F.lit(" "))
    out = F.regexp_replace(out, _CONTROL, "")
    return out


def fix_text_sql(text: str = "text") -> str:
    """The identical replacement chain as a DuckDB expression."""
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = f"replace({out}, '{bad}', '{good}')"
    out = f"regexp_replace({out}, '{_ZERO_WIDTH}', '', 'g')"
    out = f"replace({out}, chr(160), ' ')"
    out = f"regexp_replace({out}, '{_CONTROL}', '', 'g')"
    return out


class FixEncoding(Pipe):
    """Encoding-artifact repair (the ftfy pass every web-corpus pipeline
    runs before tokenization): cp1252-mojibake restoration, zero-width and
    control character stripping, nbsp normalization. Emits the repaired
    text plus a ``changed`` audit flag (the corpus-health signal: a spike
    in ``changed`` rate usually means an upstream decode regression)."""

    def __init__(
        self,
        text_col: str = "text",
        out_col: str = "fixed_text",
        flag_col: str = "changed",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.out_col = out_col
        self.flag_col = flag_col

    def _columns(self, df: DataFrame, **kwargs) -> Dict[str, Column]:
        fixed = fix_text_expr(F.col(self.text_col))
        return {
            self.out_col: fixed,
            self.flag_col: fixed != F.col(self.text_col),
        }


def html_strip_sql(text: str = "text") -> Dict[str, str]:
    """DuckDB expressions for (clean_text, n_tags) — same patterns, same
    replacement order as :class:`HtmlStrip`."""

    def esc(p: str) -> str:
        # DuckDB single-quoted strings keep backslashes literal — only
        # quotes need escaping (doubling backslashes would corrupt \s etc.)
        return p.replace("'", "''")

    no_blocks = f"regexp_replace({text}, '{esc(_SCRIPT_STYLE)}', ' ', 'g')"
    n_tags = (
        f"CAST(len(regexp_extract_all({text}, '{esc(_SCRIPT_STYLE)}')) + "
        f"len(regexp_extract_all({no_blocks}, '{esc(_TAG)}')) AS INTEGER)"
    )
    no_tags = f"regexp_replace({no_blocks}, '{esc(_TAG)}', ' ', 'g')"
    no_entities = f"regexp_replace({no_tags}, '{esc(_ENTITY)}', ' ', 'g')"
    clean = f"trim(regexp_replace({no_entities}, '{esc(_WS)}', ' ', 'g'))"
    return {"clean_text": clean, "n_tags": n_tags}


class BadWordsFilter(Pipe):
    """C4-style content blocklist (Raffel et al. 2020 §2.2's "Dirty,
    Naughty ... Word List" step): drop — or annotate — any document whose
    token set intersects a blocklist. Exact token-level matching (the C4
    rule), not substring: "class" never trips "ass".

    Output adds ``bad_terms`` (the sorted distinct blocklist hits) and
    ``keep``; ``mode='filter'`` returns the survivors with the original
    schema. The blocklist rides the closure as an expression literal
    (bounded by contract — thousands of terms), so the filter is
    scan-level: no join, no shuffle, pure codegen'd array intersection."""

    def __init__(
        self,
        blocklist,
        text_col: str = "text",
        mode: str = "annotate",
        **kwargs,
    ):
        if mode not in ("annotate", "filter"):
            raise ValueError(f"mode must be 'annotate' or 'filter', got {mode!r}")
        if not blocklist:
            raise ValueError("blocklist must be non-empty")
        kwargs.setdefault("update", mode == "annotate")
        super().__init__(**kwargs)
        self.blocklist = sorted({w.lower() for w in blocklist})
        self.text_col = text_col
        self.mode = mode

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.text.analysis import tokens_expr

        bad = F.array(*[F.lit(w) for w in self.blocklist])
        hits = F.array_sort(
            F.array_intersect(
                F.array_distinct(tokens_expr(F.col(self.text_col))), bad
            )
        )
        out = df.withColumn("bad_terms", hits).withColumn(
            "keep", F.size("bad_terms") == 0
        )
        if self.mode == "filter":
            return out.filter(F.col("keep")).drop("bad_terms", "keep")
        return out


def bad_words_sql(
    table_sql: str,
    blocklist,
    text: str = "text",
    columns: str = "doc_id, source",
) -> str:
    """DuckDB oracle for :class:`BadWordsFilter` (annotate mode):
    identical tokenization, identical sorted-distinct intersection."""
    from warp_pipes_spark.text.analysis import tokens_sql

    lits = ", ".join(f"'{w}'" for w in sorted({w.lower() for w in blocklist}))
    return f"""
SELECT {columns},
       list_sort(list_distinct(list_intersect({tokens_sql(text)}, [{lits}]))) AS bad_terms,
       len(list_distinct(list_intersect({tokens_sql(text)}, [{lits}]))) = 0 AS keep
FROM ({table_sql}) t
"""


class LineFilter(Pipe):
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2) — the
    within-document act step the doc-level gates (q140 Gopher/C4 rules)
    don't do: split each document into lines, drop lines that trip a
    rule, reassemble the survivors, and audit per-rule drop counts.

    Rules (C4's, parameterized), applied per line with fixed attribution
    precedence blocklist > terminal-punctuation > min-words:

    - ``blocklist``: any token of the line is a blocked word (C4's
      "any line with the word Javascript");
    - ``require_terminal_punct``: line must end in ``. ! ?`` (C4's
      "only retained lines that ended in a terminal punctuation mark");
    - ``min_words``: at least N whitespace words (C4 uses 5).

    Documents keeping fewer than ``min_lines`` surviving lines are
    flagged ``keep = false`` (C4's "discarded any page with fewer than
    3 sentences").

    ``unit='newline'`` splits on ``\\n``; ``unit='sentence'`` reuses the
    SentenceSplit boundary convention (terminal punct + space, marker
    trick — RE2-safe) for corpora without newlines.

    Scale shape: the ENTIRE operator is one projection of higher-order
    array expressions (split -> transform -> filter -> array_join) —
    no explode, no shuffle, no UDF; lines never leave their document's
    row. Reference scope: no counterpart (the reference has no text
    curation); C4 paper recipe.
    """

    def __init__(
        self,
        min_words: int = 5,
        min_lines: int = 3,
        require_terminal_punct: bool = True,
        blocklist=("javascript",),
        unit: str = "newline",
        join_sep: str = "\n",
        text_col: str = "text",
        **kwargs,
    ):
        if unit not in ("newline", "sentence"):
            raise ValueError(f"unit must be 'newline' or 'sentence', got {unit!r}")
        super().__init__(**kwargs)
        self.min_words = min_words
        self.min_lines = min_lines
        self.require_terminal_punct = require_terminal_punct
        self.blocklist = sorted({w.lower() for w in blocklist})
        self.unit = unit
        self.join_sep = join_sep
        self.text_col = text_col

    def _lines(self, text: Column) -> Column:
        if self.unit == "newline":
            parts = F.split(text, "\n")
        else:
            from warp_pipes_spark.text.analysis import SENT_BOUNDARY_RE, _SENT_SEP

            marked = F.regexp_replace(text, SENT_BOUNDARY_RE, "$1" + _SENT_SEP)
            parts = F.split(marked, _SENT_SEP)
        parts = F.transform(parts, lambda s: F.trim(s))
        return F.filter(parts, lambda s: F.length(s) > 0)

    def _blocked(self, line: Column) -> Column:
        from warp_pipes_spark.text.analysis import tokens_expr

        bad = F.array(*[F.lit(w) for w in self.blocklist])
        return F.size(F.array_intersect(tokens_expr(line), bad)) > 0

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        mw = self.min_words
        ends = lambda l: (
            l.rlike("[.!?]$")
            if self.require_terminal_punct
            else F.lit(True)
        )
        nw = lambda l: F.size(
            F.filter(F.split(l, " +"), lambda w: F.length(w) > 0)
        )
        # per-line verdict struct materialized ONCE as a column: inlining
        # the split + per-line tokenization into each of the six output
        # expressions would re-split the doc ~6x and re-tokenize each
        # line ~4x (interpreted HOF lambda bodies — the measured q170
        # lesson); NULL text coalesces to '' so NULL-text rows get the
        # empty-document outcome instead of engine-divergent NULL algebra
        lines = self._lines(F.coalesce(F.col(self.text_col), F.lit("")))
        info = F.transform(
            lines,
            lambda l: F.struct(
                l.alias("l"),
                self._blocked(l).alias("b"),
                ends(l).alias("e"),
                (nw(l) >= mw).alias("w"),
            ),
        )
        staged = df.withColumn("__info", info)
        i = F.col("__info")
        kept = F.filter(i, lambda x: ~x["b"] & x["e"] & x["w"])
        n_block = F.size(F.filter(i, lambda x: x["b"]))
        n_punct = F.size(F.filter(i, lambda x: ~x["b"] & ~x["e"]))
        n_short = F.size(F.filter(i, lambda x: ~x["b"] & x["e"] & ~x["w"]))
        return (
            staged.withColumn(
                "clean_text",
                F.array_join(
                    F.transform(kept, lambda x: x["l"]), self.join_sep
                ),
            )
            .withColumn("n_lines", F.size(i))
            .withColumn("drop_blocklist", n_block)
            .withColumn("drop_no_punct", n_punct)
            .withColumn("drop_short", n_short)
            .withColumn(
                "n_kept",
                F.col("n_lines")
                - F.col("drop_blocklist")
                - F.col("drop_no_punct")
                - F.col("drop_short"),
            )
            .withColumn("keep", F.col("n_kept") >= self.min_lines)
            .drop(self.text_col, "__info")
        )


def line_filter_sql(
    table_sql: str,
    min_words: int = 5,
    min_lines: int = 3,
    blocklist=("javascript",),
    unit: str = "newline",
    join_sep: str = "\n",
    text: str = "text",
    columns: str = "doc_id, source",
) -> str:
    """DuckDB oracle for :class:`LineFilter` (require_terminal_punct
    form): identical split, rule precedence and reassembly."""
    from warp_pipes_spark.text.analysis import tokens_sql

    safe = f"COALESCE({text}, '')"
    if unit == "newline":
        raw = f"string_split({safe}, chr(10))"
    else:
        marked = f"regexp_replace({safe}, '([.!?]) ', '\\1' || chr(30), 'g')"
        raw = f"string_split({marked}, chr(30))"
    lits = ", ".join(f"'{w}'" for w in sorted({w.lower() for w in blocklist}))
    blocked = f"len(list_intersect({tokens_sql('l')}, [{lits}])) > 0"
    ends = "regexp_matches(l, '[.!?]$')"
    nw = "len(list_filter(string_split_regex(l, ' +'), w -> length(w) > 0))"
    sep = join_sep.replace("'", "''")
    return f"""
WITH base AS (
  SELECT {columns},
         list_filter(list_transform({raw}, s -> trim(s)), s -> length(s) > 0) AS ls
  FROM ({table_sql}) t
)
SELECT {columns},
       COALESCE(array_to_string(list_filter(ls,
           l -> NOT ({blocked}) AND {ends} AND {nw} >= {min_words}), '{sep}'), '') AS clean_text,
       CAST(len(ls) AS INTEGER) AS n_lines,
       CAST(len(list_filter(ls, l -> NOT ({blocked}) AND {ends} AND {nw} >= {min_words})) AS INTEGER) AS n_kept,
       CAST(len(list_filter(ls, l -> {blocked})) AS INTEGER) AS drop_blocklist,
       CAST(len(list_filter(ls, l -> NOT ({blocked}) AND NOT {ends})) AS INTEGER) AS drop_no_punct,
       CAST(len(list_filter(ls, l -> NOT ({blocked}) AND {ends} AND {nw} < {min_words})) AS INTEGER) AS drop_short,
       len(list_filter(ls, l -> NOT ({blocked}) AND {ends} AND {nw} >= {min_words})) >= {min_lines} AS keep
FROM base
"""


# ---------------------------------------------------------------------------
# NFKC-lite unicode folding (the FixEncoding sibling for compatibility forms)
# ---------------------------------------------------------------------------

# 1:1 folds: the fullwidth ASCII block (U+FF01..U+FF5E), ideographic
# space, curly quotes, dash variants — derived programmatically (no
# normalization library), translate()-able so folding runs at scan speed
_FOLD_SRC = '！＂＃＄％＆＇（）＊＋，－．／０１２３４５６７８９：；＜＝＞？＠ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ［＼］＾＿｀ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ｛｜｝～\u3000‘’‚“”„–—−'
_FOLD_DST = '!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~ \'\'\'"""---'

# 1:N folds (translate can't grow strings): ellipsis, latin ligatures,
# sharp s — one literal replace each, bounded chain
_FOLD_MULTI = (
    ("\u2026", "..."),
    ("\ufb01", "fi"),
    ("\ufb02", "fl"),
    ("\u0153", "oe"),
    ("\u0152", "OE"),
    ("\u00e6", "ae"),
    ("\u00c6", "AE"),
    ("\u00df", "ss"),
)


def fold_text_expr(col: Column) -> Column:
    out = F.translate(col, _FOLD_SRC, _FOLD_DST)
    for k, v in _FOLD_MULTI:
        out = F.replace(out, F.lit(k), F.lit(v))
    return out


def fold_text_sql(text: str = "text") -> str:
    def lit(s: str) -> str:
        parts, run = [], ""
        for ch in s:
            if 32 <= ord(ch) < 127 and ch != "'":
                run += ch
            else:
                if run:
                    parts.append(f"'{run}'")
                    run = ""
                parts.append(f"chr({ord(ch)})")
        if run:
            parts.append(f"'{run}'")
        return " || ".join(parts) if parts else "''"

    out = f"translate({text}, {lit(_FOLD_SRC)}, {lit(_FOLD_DST)})"
    for k, v in _FOLD_MULTI:
        out = f"replace({out}, {lit(k)}, '{v}')"
    return out


class UnicodeFold(Pipe):
    """NFKC-lite compatibility folding — the sibling of
    :class:`FixEncoding` for text that is VALID unicode but uses
    compatibility forms that fragment tokenization and dedup: fullwidth
    ASCII (CJK keyboards emit ``ＡＢＣ１２３``), curly quotes, dash
    variants, ideographic spaces, ellipsis, latin ligatures. Folding is
    a DERIVED table (the fullwidth block maps by codepoint arithmetic),
    not a normalization library, so it is one scan-speed translate plus
    a bounded literal replace chain — identical in any engine, no UDF.

    Emits ``folded_text`` and ``changed``; ``mode='replace'``
    overwrites the text column in place."""

    def __init__(self, text_col: str = "text", mode: str = "annotate", **kwargs):
        if mode not in ("annotate", "replace"):
            raise ValueError(f"mode must be 'annotate' or 'replace', got {mode!r}")
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.mode = mode

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        folded = fold_text_expr(F.col(self.text_col))
        if self.mode == "replace":
            return df.withColumn(self.text_col, folded)
        return df.withColumn("folded_text", folded).withColumn(
            "changed", F.col(self.text_col) != F.col("folded_text")
        )

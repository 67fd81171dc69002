"""Byte-pair-encoding tokenization: corpus-trained merges + scan-speed encode.

The catalog's regex tokenizer (``text/analysis.py``) is the cross-engine
parity path; this module adds the real thing — a deterministic BPE trainer
(the classic Sennrich et al. merge loop over word frequencies) and an
encoder Pipe applying the learned merges with the standard greedy
lowest-rank loop (the GPT-2 ``bpe()`` shape), as an Arrow-batched pandas
UDF with per-executor word caching.

Scale split (how real tokenizers are built):

- **train** is bounded: word frequencies aggregate in Spark (one explode +
  groupBy — the only wide op), only the top ``max_words`` (a vocabulary,
  not a corpus) collect to the driver for the merge loop. 100 TB of text
  still collects only ``max_words`` rows.
- **encode** is a map: merges broadcast to executors; each Arrow batch
  encodes locally with a word→tokens cache (natural-language word
  distributions are Zipfian, so the cache hit rate is high).

Determinism: merge ties break by (count desc, pair lexicographic asc);
encode ties cannot occur (ranks are unique). Same corpus + params =>
identical merges on any cluster layout.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import ascii_lower_py, tokens_expr

END = "</w>"


def _merges_from_freqs(
    freqs: List[Tuple[str, int]], n_merges: int
) -> List[Tuple[str, str]]:
    """The Sennrich merge loop over a (word, count) frequency table. Shared
    by the Spark trainer and the pure-Python replica: same table in any
    order => identical merges (tie-break (count desc, pair lex asc) is
    order-free)."""
    vocab: Dict[Tuple[str, ...], int] = {
        tuple(list(w) + [END]): c for w, c in freqs
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 10000,
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus' word frequencies.
    The driver holds only the ``max_words``-row frequency table."""
    rows = (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return _merges_from_freqs([(r["w"], r["c"]) for r in rows], n_merges)


def train_bpe_local(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 10000,
) -> List[Tuple[str, str]]:
    """Bit-exact pure-Python replica of :func:`train_bpe` reading the raw
    Parquet directly (pyarrow + Counter, no Spark): same ``[^a-z]+`` split
    on lowercased text, same (count desc, word asc) frequency order with
    the same ``max_words`` cut, same merge loop — the honest
    merge-literals source for the q92 DuckDB oracle (the q47/q95
    deterministic-trainer pattern applied to the tokenizer)."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[text_col])
    counts: Counter = Counter()
    for text in t.column(text_col).to_pylist():
        counts.update(
            w for w in re.split("[^a-z]+", ascii_lower_py(text or "")) if w
        )
    freqs = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    return _merges_from_freqs(freqs, n_merges)


def encode_word(
    word: str,
    ranks: Dict[Tuple[str, str], int],
    cache: Optional[dict] = None,
) -> List[str]:
    """Greedy lowest-rank merge loop (the canonical BPE apply)."""
    if cache is not None and word in cache:
        return cache[word]
    parts: List[str] = list(word) + [END]
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts = parts[:best_i] + [parts[best_i] + parts[best_i + 1]] + parts[best_i + 2 :]
    if cache is not None:
        cache[word] = parts
    return parts


class BpeTokenizer(Pipe):
    """Adds ``bpe_tokens`` (array<string>) and ``n_bpe_tokens`` per row by
    applying the learned merges. The merges list rides the closure (Spark
    broadcasts it with the task); encoding is pure per-batch Python over
    Arrow with a word cache — no shuffle, no driver involvement."""

    def __init__(
        self,
        merges: List[Tuple[str, str]],
        text_col: str = "text",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.merges = [tuple(m) for m in merges]
        self.text_col = text_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from warp_pipes_spark.text.analysis import TOKEN_SPLIT_RE

        ranks = {m: i for i, m in enumerate(self.merges)}
        tok_re = re.compile(TOKEN_SPLIT_RE)

        def encode_batch(texts: pd.Series) -> pd.Series:
            cache: dict = {}
            out = []
            for t in texts:
                toks: List[str] = []
                for w in tok_re.split(ascii_lower_py(t or "")):
                    if w:
                        toks.extend(encode_word(w, ranks, cache))
                out.append(toks)
            return pd.Series(out)

        encode_batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        enc = pandas_udf(encode_batch, "array<string>")
        return df.withColumn("bpe_tokens", enc(F.col(self.text_col))).withColumn(
            "n_bpe_tokens", F.size("bpe_tokens")
        )


def train_wordpiece_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 10000,
    specials: Tuple[str, ...] = ("[PAD]", "[UNK]", "[CLS]", "[SEP]"),
) -> List[str]:
    """Derive a WordPiece-style vocabulary from the BPE trainer (the
    classic way a BERT vocab is bootstrapped): train ``n_merges`` merges
    over the corpus word frequencies, re-encode the frequency vocabulary,
    and collect every produced piece — word-initial pieces as-is,
    continuations prefixed ``##``. The returned list is ordered
    deterministically (specials, then single characters, then longer
    pieces lexicographically) so vocab ids are stable across runs and
    cluster layouts.

    Scale: identical to :func:`train_bpe` — the only wide op is the word
    frequency groupBy; the driver holds ``max_words`` rows, never the
    corpus. (Reference capability: ``warp_pipes/pipes/tokenizer.py:13-55``
    delegates vocab construction to HF; this is the self-contained
    equivalent.)"""
    rows = (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    freqs = [(r["w"], r["c"]) for r in rows]
    merges = _merges_from_freqs(freqs, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    pieces = set()
    cache: dict = {}
    for w, _ in freqs:
        parts = encode_word(w, ranks, cache)
        clean = [p[: -len(END)] if p.endswith(END) else p for p in parts]
        clean = [p for p in clean if p]
        for i, p in enumerate(clean):
            pieces.add(p if i == 0 else f"##{p}")
        # single characters always present (UNK only for unseen chars)
        for ch in w:
            pieces.add(ch)
            pieces.add(f"##{ch}")
    singles = sorted(p for p in pieces if len(p.lstrip("#")) == 1 or len(p) == 1)
    longer = sorted(p for p in pieces if p not in set(singles))
    return list(specials) + singles + longer


def bpe_count_sql(
    sf_dir: str,
    n_merges: int = 100,
    max_words: int = 5000,
    table: str = "documents",
) -> str:
    """DuckDB oracle for q92: retrains the merges bit-identically from
    ``{sf_dir}/{table}.parquet`` (:func:`train_bpe_local`), embeds them as
    a rank MAP literal, and replays the greedy lowest-rank merge loop with
    a recursive CTE over each distinct corpus word (state = the evolving
    piece list; each step merges the FIRST lowest-rank adjacent pair,
    exactly :func:`encode_word`'s scan). Per-doc piece counts come from
    re-joining encoded words to the doc word sequence. The '|' pair
    separator cannot collide: pieces are [a-z]+ and the '</w>' sentinel."""
    import os

    merges = train_bpe_local(
        os.path.join(sf_dir, f"{table}.parquet"),
        n_merges=n_merges,
        max_words=max_words,
    )
    if not merges:
        keys_sql, vals_sql = "['__none__']", "[0]"
    else:
        keys_sql = "[" + ", ".join(f"'{a}|{b}'" for a, b in merges) + "]"
        vals_sql = "[" + ", ".join(str(i) for i in range(len(merges))) + "]"
    big = 10**9
    return f"""
WITH RECURSIVE rm AS (SELECT MAP({keys_sql}, {vals_sql}) AS m),
docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z]+'),
                     x -> length(x) > 0) AS ws
  FROM {table}
),
words AS (SELECT DISTINCT unnest(ws) AS word FROM docs),
init AS (
  SELECT word,
         list_append(
           list_transform(generate_series(1, length(word)), i -> word[i]),
           '</w>') AS parts
  FROM words
),
enc AS (
  SELECT word, parts FROM init
  UNION ALL
  SELECT word,
         list_concat(
           list_concat(parts[1:bi-1], [parts[bi] || parts[bi+1]]),
           parts[bi+2:]) AS parts
  FROM (
    SELECT e.word, e.parts,
           list_transform(generate_series(1, len(e.parts) - 1),
             i -> coalesce(map_extract(rm.m, e.parts[i] || '|' || e.parts[i+1])[1],
                           {big})) AS rks
    FROM enc e CROSS JOIN rm
  ) t, LATERAL (SELECT list_position(t.rks, list_min(t.rks)) AS bi) l
  WHERE list_min(t.rks) < {big}
),
final AS (SELECT word, min(len(parts)) AS n FROM enc GROUP BY word),
doc_words AS (SELECT doc_id, unnest(ws) AS word FROM docs),
sums AS (
  SELECT dw.doc_id, SUM(f.n) AS n FROM doc_words dw
  JOIN final f USING (word) GROUP BY dw.doc_id
)
SELECT d.doc_id, CAST(COALESCE(s.n, 0) AS INTEGER) AS n_bpe_tokens
FROM docs d LEFT JOIN sums s USING (doc_id)
ORDER BY d.doc_id
"""

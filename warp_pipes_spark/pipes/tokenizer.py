"""Tokenization operators.

Capability parity with ``warp_pipes/pipes/tokenizer.py:13-55`` (HF tokenizer
over a text column emitting ``input_ids`` / ``attention_mask``, re-prefixed
by field). Three tiers:

- **HFTokenizer** — wraps a HuggingFace fast tokenizer in an Arrow-batched
  pandas UDF (the slow path, but vectorized; the tokenizer object is lazily
  constructed per executor, not shipped per row). Gated behind an import-try
  since ``transformers`` may not be installed.
- **WordPieceTokenizer** — self-contained WordPiece (greedy longest-prefix
  match, ``##`` continuations, ``[UNK]``/``[CLS]``/``[SEP]``, offsets)
  with the same output surface as HFTokenizer, no third-party dependency;
  vocabularies come from ``text/bpe.py``'s ``train_wordpiece_vocab`` or
  any word-piece list.
- **RegexTokenizer** — pure-SQL whitespace/regex tokenization with a
  vocabulary join or hash-based ids; JVM-side, codegen'd, the 100 TB path
  for corpus statistics, BM25, dedup shingling, etc.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import TOKEN_SPLIT_RE, ascii_lower_expr, ascii_lower_py


class RegexTokenizer(Pipe):
    """Split ``text_col`` into tokens; ids = non-cryptographic 64-bit hash
    (xxhash64) or a broadcast vocabulary join when ``vocab`` is given.
    Emits ``{prefix}tokens``, ``{prefix}input_ids``, ``{prefix}attention_mask``."""

    def __init__(
        self,
        text_col: str = "text",
        prefix: str = "",
        pattern: str = TOKEN_SPLIT_RE,
        lowercase: bool = True,
        emit_offsets: bool = False,
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.prefix = prefix
        self.pattern = pattern
        self.lowercase = lowercase
        self.emit_offsets = emit_offsets

    def _offsets_udf(self):
        """Character [start, end) spans of each token in the ORIGINAL text
        (the reference's ``offset_mapping``, which GeneratePassages uses to
        slice source text back out of token windows)."""
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        pattern = re.compile(self.pattern)
        lowercase = self.lowercase

        def offsets(texts):
            out = []
            for t in texts:
                s = ascii_lower_py(t) if lowercase else t
                spans = []
                pos = 0
                for m in pattern.finditer(s):
                    if m.start() > pos:
                        spans.append((pos, m.start()))
                    pos = m.end()
                if pos < len(s):
                    spans.append((pos, len(s)))
                out.append([{"start": a, "end": b} for a, b in spans])
            return pd.Series(out)

        offsets.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return pandas_udf(offsets, "array<struct<start:int,end:int>>")

    def _columns(self, df: DataFrame, **kwargs):
        text = F.col(self.text_col)
        if self.lowercase:
            text = ascii_lower_expr(text)
        toks = F.filter(F.split(text, self.pattern), lambda t: F.length(t) > 0)
        cols = {
            f"{self.prefix}tokens": toks,
            f"{self.prefix}input_ids": F.transform(toks, lambda t: F.xxhash64(t)),
            f"{self.prefix}attention_mask": F.transform(toks, lambda t: F.lit(1)),
        }
        if self.emit_offsets:
            cols[f"{self.prefix}offset_mapping"] = self._offsets_udf()(
                F.col(self.text_col)
            )
        return cols


class HFTokenizer(Pipe):
    """HuggingFace tokenizer via pandas UDF (Arrow batches). The tokenizer
    is constructed lazily inside the executor process and cached in a module
    global — broadcast-by-name, zero pickling of the tokenizer object."""

    def __init__(
        self,
        tokenizer_name: str,
        text_col: str = "text",
        prefix: str = "",
        max_length: Optional[int] = None,
        return_offsets_mapping: bool = False,
        add_special_tokens: bool = True,
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.tokenizer_name = tokenizer_name
        self.text_col = text_col
        self.prefix = prefix
        self.max_length = max_length
        # reference parity (warp_pipes/pipes/tokenizer.py:43-51): fast
        # tokenizers emit per-token [start, end) character spans so passage
        # windows can slice source text back out
        self.return_offsets_mapping = return_offsets_mapping
        self.add_special_tokens = add_special_tokens

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        try:
            import transformers  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env without HF
            raise NotImplementedError(
                "HFTokenizer requires the 'transformers' package; use "
                "WordPieceTokenizer (self-contained, same output columns) "
                "or RegexTokenizer for the pure-Spark path"
            ) from exc
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        name = self.tokenizer_name
        max_length = self.max_length
        text_col = self.text_col
        extra = [
            StructField(f"{self.prefix}input_ids", ArrayType(LongType()), True),
            StructField(f"{self.prefix}attention_mask", ArrayType(IntegerType()), True),
        ]
        if self.return_offsets_mapping:
            extra.append(
                StructField(
                    f"{self.prefix}offset_mapping",
                    ArrayType(
                        StructType(
                            [
                                StructField("start", IntegerType(), True),
                                StructField("end", IntegerType(), True),
                            ]
                        )
                    ),
                    True,
                )
            )
        out_schema = StructType(list(df.schema.fields) + extra)
        prefix = self.prefix
        want_offsets = self.return_offsets_mapping
        add_special = self.add_special_tokens

        def tokenize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            from transformers import AutoTokenizer

            global _WPS_TOKENIZER_CACHE  # per-executor singleton
            try:
                cache = _WPS_TOKENIZER_CACHE
            except NameError:
                cache = _WPS_TOKENIZER_CACHE = {}
            if name not in cache:
                cache[name] = AutoTokenizer.from_pretrained(name)
            tok = cache[name]
            for pdf in batches:
                enc = tok(
                    pdf[text_col].tolist(),
                    truncation=max_length is not None,
                    max_length=max_length,
                    add_special_tokens=add_special,
                    return_offsets_mapping=want_offsets,
                )
                pdf[f"{prefix}input_ids"] = enc["input_ids"]
                pdf[f"{prefix}attention_mask"] = enc["attention_mask"]
                if want_offsets:
                    pdf[f"{prefix}offset_mapping"] = [
                        [{"start": int(a), "end": int(b)} for a, b in spans]
                        for spans in enc["offset_mapping"]
                    ]
                yield pdf

        return df.mapInPandas(tokenize, schema=out_schema)


class WordPieceTokenizer(Pipe):
    """Self-contained WordPiece encoder with the EXACT HFTokenizer output
    surface (``{prefix}input_ids`` / ``{prefix}attention_mask`` /
    ``{prefix}offset_mapping`` / ``{prefix}tokens``), so HF-shaped
    tokenization executes with no third-party dependency — closing the one
    environment-gated reference path (``warp_pipes/pipes/tokenizer.py:13-55``;
    the HF wrapper below stays for real model vocabs when ``transformers``
    is installed).

    Semantics (BERT WordPiece):

    - pre-tokenize: lowercase + split on the same ``TOKEN_SPLIT_RE`` class
      as :class:`RegexTokenizer`, keeping [start, end) character spans into
      the ORIGINAL text (ASCII lowering is length-preserving);
    - per word: greedy longest-prefix match against the vocabulary,
      continuation pieces carry the ``##`` mark; un-encodable words become
      ``[UNK]`` spanning the whole word;
    - optional ``[CLS]``/``[SEP]`` wrapping (special tokens get (0, 0)
      offsets, as HF fast tokenizers emit) and ``max_length`` truncation
      (content is cut BEFORE the closing ``[SEP]`` is placed).

    Execution: ``mapInPandas`` over Arrow batches; the vocabulary rides the
    closure once per task and a per-batch word->pieces cache exploits the
    Zipfian word distribution. No shuffle, no driver participation — a map
    over any corpus size."""

    def __init__(
        self,
        vocab,
        text_col: str = "text",
        prefix: str = "",
        max_length: Optional[int] = None,
        return_offsets_mapping: bool = False,
        add_special_tokens: bool = True,
        lowercase: bool = True,
        unk_token: str = "[UNK]",
        cls_token: str = "[CLS]",
        sep_token: str = "[SEP]",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.vocab = list(vocab)
        self.text_col = text_col
        self.prefix = prefix
        self.max_length = max_length
        self.return_offsets_mapping = return_offsets_mapping
        self.add_special_tokens = add_special_tokens
        self.lowercase = lowercase
        self.unk_token = unk_token
        self.cls_token = cls_token
        self.sep_token = sep_token
        for t in (unk_token,) + ((cls_token, sep_token) if add_special_tokens else ()):
            if t not in self.vocab:
                raise ValueError(f"special token {t!r} missing from vocab")

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        import re

        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from warp_pipes_spark.text.analysis import TOKEN_SPLIT_RE, ascii_lower_expr, ascii_lower_py

        prefix = self.prefix
        extra = [
            StructField(f"{prefix}tokens", ArrayType(StringType()), True),
            StructField(f"{prefix}input_ids", ArrayType(LongType()), True),
            StructField(f"{prefix}attention_mask", ArrayType(IntegerType()), True),
        ]
        if self.return_offsets_mapping:
            extra.append(
                StructField(
                    f"{prefix}offset_mapping",
                    ArrayType(
                        StructType(
                            [
                                StructField("start", IntegerType(), True),
                                StructField("end", IntegerType(), True),
                            ]
                        )
                    ),
                    True,
                )
            )
        out_schema = StructType(list(df.schema.fields) + extra)

        ids = {p: i for i, p in enumerate(self.vocab)}
        vocab_set = set(self.vocab)
        text_col = self.text_col
        lowercase = self.lowercase
        unk, cls_, sep = self.unk_token, self.cls_token, self.sep_token
        add_special = self.add_special_tokens
        max_length = self.max_length
        want_offsets = self.return_offsets_mapping
        split_re = re.compile(TOKEN_SPLIT_RE)

        def encode_word(w):
            """greedy longest-prefix match -> (pieces, in-word offsets)"""
            pieces, offs, pos = [], [], 0
            while pos < len(w):
                end, hit = len(w), None
                while end > pos:
                    cand = w[pos:end] if pos == 0 else "##" + w[pos:end]
                    if cand in vocab_set:
                        hit = (cand, end)
                        break
                    end -= 1
                if hit is None:
                    return [unk], [(0, len(w))]
                pieces.append(hit[0])
                offs.append((pos, hit[1]))
                pos = hit[1]
            return pieces, offs

        # ASCII-only lowering (the engine-wide tokenization contract,
        # text/analysis.py): length-preserving by construction — offsets
        # computed on the lowered string index the ORIGINAL text 1:1 —
        # and bit-identical to the SQL oracle's translate()
        lower_preserving = ascii_lower_py

        def tokenize(batches):
            cache: dict = {}
            for pdf in batches:
                toks_col, ids_col, mask_col, offs_col = [], [], [], []
                for t in pdf[text_col]:
                    s = (t or "")
                    norm = lower_preserving(s) if lowercase else s
                    pieces, spans = [], []
                    # spans of split-complement runs in the ORIGINAL text
                    pos = 0
                    words = []
                    for m in split_re.finditer(norm):
                        if m.start() > pos:
                            words.append((pos, m.start()))
                        pos = m.end()
                    if pos < len(norm):
                        words.append((pos, len(norm)))
                    for a, b in words:
                        w = norm[a:b]
                        if w not in cache:
                            cache[w] = encode_word(w)
                        wp, wo = cache[w]
                        pieces.extend(wp)
                        spans.extend((a + x, a + y) for x, y in wo)
                    if max_length is not None:
                        budget = max_length - (2 if add_special else 0)
                        pieces = pieces[:budget]
                        spans = spans[: len(pieces)]
                    if add_special:
                        pieces = [cls_] + pieces + [sep]
                        spans = [(0, 0)] + spans + [(0, 0)]
                    toks_col.append(pieces)
                    ids_col.append([ids[p] for p in pieces])
                    mask_col.append([1] * len(pieces))
                    offs_col.append(
                        [{"start": int(a), "end": int(b)} for a, b in spans]
                    )
                pdf[f"{prefix}tokens"] = pd.Series(toks_col, index=pdf.index)
                pdf[f"{prefix}input_ids"] = pd.Series(ids_col, index=pdf.index)
                pdf[f"{prefix}attention_mask"] = pd.Series(mask_col, index=pdf.index)
                if want_offsets:
                    pdf[f"{prefix}offset_mapping"] = pd.Series(
                        offs_col, index=pdf.index
                    )
                yield pdf

        return df.mapInPandas(tokenize, schema=out_schema)

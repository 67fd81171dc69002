"""Hashed linear text classification — fasttext-style scoring at scan speed.

Production data pipelines gate documents on learned quality/toxicity
classifiers (fasttext / linear-over-hashed-ngrams). The expensive part at
100 TB is not the model — it is streaming every document through a scoring
pass. This operator keeps that pass entirely inside Catalyst: token ->
feature bucket (integer hash) -> weight lookup -> per-doc fold, all
higher-order array expressions (``transform``/``aggregate``), zero Python,
zero shuffle — the score is a scan-speed map column.

Two weight sources:

- ``weights=None`` (default): deterministic integer-arithmetic weights
  (multiplicative-hash residues), so the full pipeline is bit-exactly
  reproducible on any engine — this is the differential-oracle path (and an
  honest stand-in: the container has no model artifacts; see
  ``DecodeMedia`` for the same pattern on media kernels).
- ``weights=[...]``: a real trained weight vector (length ``dim``) embedded
  as an array literal — broadcast once inside the plan, same scan-speed
  execution. Token hashing then bucket-indexes it identically.

The hash is intentionally simple (length + first/last char codes mod dim):
expressible in ANY engine for verification. Swap ``bucket_expr`` /
``bucket_sql`` for xxhash64 when cross-engine parity is not needed.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import tokens_expr, tokens_sql

# multiplicative-hash constants for the deterministic default weights:
# w_int(b) = ((b+1) * KNUTH) % PRIME - PRIME//2  — an integer in
# (-PRIME/2, PRIME/2], summed exactly as BIGINT on both engines.
_KNUTH = 2654435761
_PRIME = 1000003


def bucket_expr(tok: Column, dim: int) -> Column:
    """token -> feature bucket in [0, dim): 7*len + code(first) + 3*code(last).
    Engine-portable (no engine-specific hash)."""
    return (
        F.length(tok) * 7
        + F.ascii(F.substring(tok, 1, 1))
        + F.ascii(tok.substr(F.length(tok), F.lit(1))) * 3
    ) % dim


def bucket_sql(tok: str, dim: int) -> str:
    return (
        f"(7 * length({tok}) + ascii(substr({tok}, 1, 1)) "
        f"+ 3 * ascii(substr({tok}, length({tok}), 1))) % {dim}"
    )


class HashedLinearClassifier(Pipe):
    """Adds ``n_tokens``, ``score`` (mean feature weight, DOUBLE) and
    ``label`` (score > threshold) per document.

    With default integer weights the score is
    ``sum(w_int(bucket(tok))) / (PRIME * n_tokens)`` — the sum is exact
    integer math, the single final division is IEEE-identical across
    engines. Empty docs score 0.0 / label false."""

    def __init__(
        self,
        text_col: str = "text",
        dim: int = 64,
        weights: Optional[List[float]] = None,
        threshold: float = 0.0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.text_col = text_col
        self.dim = dim
        self.weights = list(weights) if weights is not None else None
        self.threshold = threshold

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        toks = tokens_expr(F.col(self.text_col))
        n = F.size(toks)
        if self.weights is None:
            # integer weights: fold as exact BIGINT, one final double division
            w_of = lambda b: ((b + 1) * _KNUTH) % _PRIME - _PRIME // 2  # noqa: E731
            total = F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + w_of(bucket_expr(t, self.dim).cast("long")),
            )
            score = F.when(n > 0, total.cast("double") / (n * _PRIME).cast("double")
                           ).otherwise(F.lit(0.0))
        else:
            w_arr = F.array(*[F.lit(float(w)) for w in self.weights])
            # per-row left fold: order-stable (same order on every engine)
            total = F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc
                + F.element_at(w_arr, bucket_expr(t, self.dim).cast("int") + 1),
            )
            score = F.when(n > 0, total / n.cast("double")).otherwise(F.lit(0.0))
        return (
            df.withColumn("n_tokens", n.cast("long"))
            .withColumn("score", score)
            .withColumn("label", F.col("score") > F.lit(self.threshold))
        )


def classifier_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    threshold: float = 0.0,
) -> str:
    """DuckDB oracle for the default integer-weight scoring — identical
    bucket hash, identical exact integer sum, identical final division."""
    toks = tokens_sql(text)
    w = f"(((({bucket_sql('t', dim)}) + 1) * {_KNUTH}) % {_PRIME} - {_PRIME // 2})"
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
scored AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, t -> {w})) AS DOUBLE)
                   / CAST(len(toks) * {_PRIME} AS DOUBLE)
         END AS score
  FROM d
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score,
       score > {threshold} AS label
FROM scored ORDER BY doc_id
"""

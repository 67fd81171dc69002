"""Scalar quantization for embedding columns — the storage/memory lever
for ANN at 100 TB.

A float32 corpus of 100 TB becomes ~25 TB of uint8 codes under per-dimension
scalar quantization: code_i = round((x_i - min_i) / step_i) with
step_i = (max_i - min_i) / 255. Training is ONE aggregation producing
2*dim numbers (per-dimension min/max — a constant-size driver result, no
collect of rows); encode/decode are codegen'd array expressions. Dequantized
search plugs into the existing exact/LSH/IVF operators unchanged — the
standard faiss ``SQ8`` design re-expressed relationally.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ScalarQuantizer:
    """Per-dimension 8-bit scalar quantizer (faiss-SQ8 shape).

    ``fit`` computes per-dimension (min, step) from the corpus in one
    bounded aggregation; ``encode`` maps ``array<float>`` to
    ``array<smallint>`` codes (0..255); ``decode`` reconstructs the
    midpoint approximation min + code*step. Codes are exact fixed-point:
    encode(decode(encode(x))) == encode(x) (idempotent round-trip)."""

    def __init__(self, dim: int, levels: int = 256):
        self.dim = dim
        self.levels = levels
        self.mins: List[float] = []
        self.steps: List[float] = []

    def fit(self, corpus: DataFrame, col: str = "embedding") -> "ScalarQuantizer":
        aggs = []
        for i in range(self.dim):
            aggs.append(F.min(F.col(col)[i]).alias(f"mn{i}"))
            aggs.append(F.max(F.col(col)[i]).alias(f"mx{i}"))
        row = corpus.agg(*aggs).collect()[0]
        self.mins, self.steps = [], []
        for i in range(self.dim):
            mn, mx = float(row[f"mn{i}"]), float(row[f"mx{i}"])
            self.mins.append(mn)
            span = mx - mn
            self.steps.append(span / (self.levels - 1) if span > 0 else 1.0)
        return self

    def _check_fitted(self):
        if not self.mins:
            raise RuntimeError("ScalarQuantizer.fit must run before encode/decode")

    def encode_expr(self, col: Column) -> Column:
        self._check_fitted()
        mins = F.array(*[F.lit(m) for m in self.mins])
        steps = F.array(*[F.lit(s) for s in self.steps])
        lv = self.levels - 1
        return F.zip_with(
            col,
            F.zip_with(mins, steps, lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
            lambda x, ms: F.least(
                F.lit(lv),
                F.greatest(
                    F.lit(0), F.round((x - ms["m"]) / ms["s"]).cast("int")
                ),
            ).cast("smallint"),
        )

    def decode_expr(self, col: Column) -> Column:
        self._check_fitted()
        mins = F.array(*[F.lit(m) for m in self.mins])
        steps = F.array(*[F.lit(s) for s in self.steps])
        return F.zip_with(
            col,
            F.zip_with(mins, steps, lambda m, s: F.struct(m.alias("m"), s.alias("s"))),
            lambda c, ms: (ms["m"] + c.cast("double") * ms["s"]).cast("float"),
        )

    def encode(self, df: DataFrame, col: str = "embedding", out: str = "codes") -> DataFrame:
        return df.withColumn(out, self.encode_expr(F.col(col)))

    def decode(self, df: DataFrame, col: str = "codes", out: str = "embedding") -> DataFrame:
        return df.withColumn(out, self.decode_expr(F.col(col)))


def quantized_corpus(
    corpus: DataFrame, dim: int, col: str = "embedding"
) -> Tuple[DataFrame, "ScalarQuantizer"]:
    """Fit + encode in one call: returns (codes DataFrame, quantizer).
    The codes table is what you'd write to storage at scale (4x smaller);
    search decodes on the fly inside the scan projection."""
    sq = ScalarQuantizer(dim).fit(corpus, col)
    return sq.encode(corpus, col).drop(col), sq

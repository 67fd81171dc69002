"""Count-min sketch: sub-linear frequency estimation for heavy hitters.

Reference scope: the reference engine has no sketch operators; this is an
extension the 100 TB pipeline needs (frequency profiling without a
vocabulary-sized exact aggregate). Companion to ``q53``'s
HLL/percentile sketches (Spark-native aggregates) and ``TermStats``
(exact heavy hitters): the CMS bounds memory by ``depth * width``
counters REGARDLESS of vocabulary size, with the classic one-sided
guarantee ``exact <= estimate <= exact + eps * stream_len`` (w.h.p.).

Scale design: the sketch build is one explode + hash-aggregate whose
partial (map-side) combine collapses each partition to at most
``depth * width`` rows before the exchange — the shuffle is
sketch-sized, not stream-sized. Sketches MERGE by summing cells
(``merge_sketches``), which is what makes them distributable: per-day /
per-shard sketches union with a sketch-sized aggregation, never a
re-scan.

Cross-engine determinism: the pairwise-independent bucket hashes are
``((a_d * H(x) + b_d) mod P) mod width`` over the same rolling hash
``H`` as ``DocFingerprint`` (``text/analysis.py``), with ``(a_d, b_d)``
drawn from a seeded LCG that is plain integer arithmetic in both
engines — so a DuckDB oracle reproduces the sketch bit-for-bit
(``cms_bucket_sql``).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.text.analysis import FP_BASE, FP_MOD

# modulus for the bucket hash family (prime, > any width; a_d * H + b_d
# stays far below int64 overflow: a_d < 2**20, H < FP_MOD ~ 1e9)
CMS_P = 2_147_483_647


def cms_params(depth: int, seed: int) -> List[Tuple[int, int]]:
    """Seeded (a_d, b_d) per row — a fixed LCG so Spark and any oracle
    inline identical constants."""
    x = seed & 0x7FFFFFFF
    out = []
    for _ in range(depth):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % ((1 << 20) - 1) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % ((1 << 20) - 1)
        out.append((a, b))
    return out


def key_hash_expr(key: Column) -> Column:
    """Rolling hash of the key string (same recurrence as DocFingerprint,
    without its text normalization — CMS keys are already canonical)."""
    chars = F.filter(F.split(key, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def key_hash_sql(key: str) -> str:
    codes = (
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split({key}, ''), c -> length(c) > 0), "
        f"c -> CAST(ord(c) AS BIGINT)))"
    )
    return f"list_reduce({codes}, (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})"


def cms_bucket_sql(h: str, a: int, b: int, width: int) -> str:
    return f"(({a} * {h} + {b}) % {CMS_P}) % {width}"


class CountMinSketch(Pipe):
    """Builds/queries a count-min sketch over a key column.

    ``sketch(df)`` -> (d, bucket, cnt) rows (at most depth * width);
    ``estimate(df, sketch)`` -> df + ``cms_est`` = min over rows of the
    hashed cell, the standard CMS point query. ``merge_sketches`` sums
    cell-wise, so shard-local sketches combine without re-scanning."""

    def __init__(
        self,
        key_col: str = "term",
        depth: int = 4,
        width: int = 512,
        seed: int = 7,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if depth < 1 or width < 2:
            raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.seed = seed

    def _buckets(self) -> Column:
        """array<long> of the key's bucket per depth row (index = d)."""
        h = key_hash_expr(F.col(self.key_col))
        return F.array(
            *[
                ((F.lit(a) * h + F.lit(b)) % F.lit(CMS_P)) % F.lit(self.width)
                for a, b in cms_params(self.depth, self.seed)
            ]
        )

    def sketch(self, df: DataFrame) -> DataFrame:
        """One pass; the hash-aggregate's map-side combine caps every
        partition's exchange contribution at depth * width rows."""
        return (
            df.select(F.posexplode(self._buckets()).alias("d", "bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def estimate(self, keys: DataFrame, sketch: DataFrame) -> DataFrame:
        """Point query for each distinct key row in ``keys``; the sketch
        side is depth * width rows — broadcast it."""
        hashed = keys.withColumn("__bkts", self._buckets()).select(
            "*", F.posexplode("__bkts").alias("d", "bucket")
        )
        return (
            hashed.join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy(*keys.columns)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return self.sketch(df)


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — sketch(A ∪ B) == merge(sketch(A), sketch(B))."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))

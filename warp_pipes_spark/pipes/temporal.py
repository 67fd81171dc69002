"""Temporal join operators: as-of join and banded range join.

Spark has no native ASOF / interval join; these are the two standard
scale-correct formulations:

- **AsOfJoin** — for every left row, attach the most recent right row with
  ``right.ts <= left.ts`` for the same key. Implemented with the
  union + last_value(ignoreNulls) window trick: both sides are unioned,
  sorted per key by (ts, side), and the right-side payload is carried
  forward — ONE shuffle on the key, no per-row subqueries, no skewed
  nested-loop join. (DuckDB's native ``ASOF JOIN`` is the oracle.)
- **RangeJoin** — pairs (l, r) with the same key and ``r.ts`` inside
  ``[l.ts + lo, l.ts + hi]``. A naive non-equi join degenerates at scale;
  here each side is bucketed by a time granularity >= the band width and
  the left side explodes to the (at most 2–3) buckets its band can touch,
  so the join is an equi-join on (key, bucket) with a residual band filter
  — the standard interval-bucketing trick.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class AsOfJoin(Pipe):
    """``left.asof_join(right)``: latest right row with ts <= left ts per key.

    ``right_cols`` are the payload columns carried from the right side
    (renamed as given). The right side should be unique per (key, ts) —
    pre-aggregate if necessary — so the match is well-defined."""

    def __init__(
        self,
        right: DataFrame,
        on: Sequence[str],
        left_ts: str = "ts",
        right_ts: str = "ts",
        right_cols: Optional[List[str]] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.right = right
        self.on = list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.right_cols = list(right_cols or [])

    _no_fingerprint = ("right",)

    def _transform(self, left: DataFrame, **kwargs) -> DataFrame:
        rcols = self.right_cols
        lcols = [c for c in left.columns]
        l = left.select(
            *self.on,
            F.col(self.left_ts).alias("__ts"),
            F.lit(1).alias("__is_left"),
            *[F.col(c) for c in lcols if c not in self.on and c != self.left_ts],
            *[F.lit(None).cast(self.right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        )
        if self.left_ts in lcols:
            l = l.withColumn(self.left_ts, F.col("__ts"))
        r = self.right.select(
            *self.on,
            F.col(self.right_ts).alias("__ts"),
            F.lit(0).alias("__is_left"),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
                if c not in self.on and c != self.left_ts
            ],
            *[F.col(c).alias(f"__r_{c}") for c in rcols],
        )
        if self.left_ts in lcols:
            r = r.withColumn(self.left_ts, F.lit(None).cast(left.schema[self.left_ts].dataType))
        u = l.unionByName(r)
        # right rows sort before left rows at equal ts => ties (r.ts == l.ts)
        # are matched, same as ASOF JOIN's ts >= semantics
        w = (
            Window.partitionBy(*self.on)
            .orderBy(F.col("__ts"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in rcols:
            u = u.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
        out = u.filter(F.col("__is_left") == 1).drop("__is_left")
        out = out.withColumn(self.left_ts, F.col("__ts")).drop("__ts")
        for c in rcols:
            out = out.withColumnRenamed(f"__r_{c}", c)
        return out


class RangeJoin(Pipe):
    """Banded range join on a shared key: pairs where
    ``l.ts + lo <= r.ts <= l.ts + hi`` (seconds). ``bucket`` (seconds)
    must be >= the band width; defaults to it."""

    def __init__(
        self,
        right: DataFrame,
        on: Sequence[str],
        lo_seconds: int,
        hi_seconds: int,
        left_ts: str = "ts",
        right_ts: str = "ts",
        bucket_seconds: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if hi_seconds < lo_seconds:
            raise ValueError("hi_seconds must be >= lo_seconds")
        self.right = right
        self.on = list(on)
        self.lo = lo_seconds
        self.hi = hi_seconds
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.bucket = bucket_seconds or max(hi_seconds - lo_seconds, 1)

    _no_fingerprint = ("right",)

    def _transform(self, left: DataFrame, **kwargs) -> DataFrame:
        # microsecond arithmetic: bucket + band filter stay exact for
        # sub-second timestamps (unix_timestamp would truncate to seconds)
        b_us = self.bucket * 1_000_000
        lo_us, hi_us = self.lo * 1_000_000, self.hi * 1_000_000
        lus = F.unix_micros(F.col(self.left_ts))
        rus = F.unix_micros(F.col(self.right_ts))
        # buckets the left band [ts+lo, ts+hi] can overlap
        lo_b = F.floor((lus + lo_us) / b_us)
        hi_b = F.floor((lus + hi_us) / b_us)
        l_payload = [c for c in left.columns if c not in self.on and c != self.left_ts]
        r_payload = [
            c for c in self.right.columns if c not in self.on and c != self.right_ts
        ]
        clash = set(l_payload) & set(r_payload)
        if clash:
            raise ValueError(f"RangeJoin: rename clashing payload columns {clash}")
        l = left.select(
            *self.on,
            F.col(self.left_ts).alias("__lts"),
            *l_payload,
            F.explode(F.sequence(lo_b, hi_b)).alias("__bucket"),
        )
        r = self.right.select(
            *self.on,
            F.col(self.right_ts).alias("__rts"),
            *r_payload,
            F.floor(rus / b_us).alias("__bucket"),
        )
        joined = l.join(r, on=[*self.on, "__bucket"]).drop("__bucket")
        lts_us = F.unix_micros(F.col("__lts"))
        rts_us = F.unix_micros(F.col("__rts"))
        # no dedup needed: each right row lives in exactly one bucket, so a
        # (left, right) pair can match in at most one exploded bucket
        out = joined.where((rts_us >= lts_us + lo_us) & (rts_us <= lts_us + hi_us))
        return out.withColumnRenamed("__lts", "left_ts").withColumnRenamed(
            "__rts", "right_ts"
        )

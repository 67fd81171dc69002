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


def _us(col: Column) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP and TIMESTAMP_NTZ.

    ``unix_micros`` rejects TIMESTAMP_NTZ, so cast first — the session
    timezone is pinned to UTC (session.py), making the NTZ->TZ cast a pure
    reinterpretation applied identically to both join sides."""
    return F.unix_micros(col.cast("timestamp"))


class AsOfJoin(Pipe):
    """``left.asof_join(right)``: per key, attach the nearest right row —
    the latest with ``ts <= left.ts`` (``direction='backward'``, default) or
    the earliest with ``ts >= left.ts`` (``'forward'``) — the pandas
    ``merge_asof`` surface, executed as one carry-forward/backward window.

    ``right_cols`` are the payload columns carried from the right side
    (renamed as given). The right side should be unique per (key, ts) —
    pre-aggregate if necessary — so the match is well-defined.

    ``tolerance_seconds`` bounds the match distance: a match farther than
    the tolerance is dropped (payloads NULL, left row kept) — merge_asof's
    ``tolerance``. ``emit_right_ts`` optionally names an output column
    carrying the matched right timestamp (NULL when no match), which is
    both useful downstream and what lets the oracle verify tolerance
    handling. Both directions stay ONE shuffle on the key: ties at equal
    ts are matched in either direction (sort places the right row inside
    the left row's frame)."""

    def __init__(
        self,
        right: DataFrame,
        on: Sequence[str],
        left_ts: str = "ts",
        right_ts: str = "ts",
        right_cols: Optional[List[str]] = None,
        direction: str = "backward",
        tolerance_seconds: Optional[int] = None,
        emit_right_ts: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        if direction not in ("backward", "forward"):
            raise ValueError(f"unknown direction {direction!r}")
        self.right = right
        self.on = list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.right_cols = list(right_cols or [])
        self.direction = direction
        self.tolerance_seconds = tolerance_seconds
        self.emit_right_ts = emit_right_ts

    _no_fingerprint = ("right",)

    def _transform(self, left: DataFrame, **kwargs) -> DataFrame:
        rcols = self.right_cols
        lcols = [c for c in left.columns]
        rts_type = self.right.schema[self.right_ts].dataType
        l = left.select(
            *self.on,
            F.col(self.left_ts).alias("__ts"),
            F.lit(1).alias("__is_left"),
            *[F.col(c) for c in lcols if c not in self.on and c != self.left_ts],
            *[F.lit(None).cast(self.right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
            F.lit(None).cast(rts_type).alias("__rts"),
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
            F.col(self.right_ts).alias("__rts"),
        )
        if self.left_ts in lcols:
            r = r.withColumn(self.left_ts, F.lit(None).cast(left.schema[self.left_ts].dataType))
        u = l.unionByName(r)
        carried = [*[f"__r_{c}" for c in rcols], "__rts"]
        if self.direction == "backward":
            # right rows sort before left rows at equal ts => ties
            # (r.ts == l.ts) are matched, same as ASOF JOIN's ts <= semantics
            w = (
                Window.partitionBy(*self.on)
                .orderBy(F.col("__ts"), F.col("__is_left"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            for c in carried:
                u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
        else:
            # forward: left rows sort before right rows at equal ts, so the
            # equal-ts right row lies inside the left row's forward frame
            w = (
                Window.partitionBy(*self.on)
                .orderBy(F.col("__ts"), F.col("__is_left").desc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            for c in carried:
                u = u.withColumn(c, F.first(c, ignorenulls=True).over(w))
        out = u.filter(F.col("__is_left") == 1).drop("__is_left")
        if self.tolerance_seconds is not None:
            gap = (
                _us(F.col("__ts")) - _us(F.col("__rts"))
                if self.direction == "backward"
                else _us(F.col("__rts")) - _us(F.col("__ts"))
            )
            ok = F.col("__rts").isNotNull() & (
                gap <= self.tolerance_seconds * 1_000_000
            )
            for c in [*[f"__r_{c}" for c in rcols], "__rts"]:
                out = out.withColumn(c, F.when(ok, F.col(c)))
        out = out.withColumn(self.left_ts, F.col("__ts")).drop("__ts")
        if self.emit_right_ts:
            out = out.withColumnRenamed("__rts", self.emit_right_ts)
        else:
            out = out.drop("__rts")
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
        lus = _us(F.col(self.left_ts))
        rus = _us(F.col(self.right_ts))
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
        lts_us = _us(F.col("__lts"))
        rts_us = _us(F.col("__rts"))
        # no dedup needed: each right row lives in exactly one bucket, so a
        # (left, right) pair can match in at most one exploded bucket
        out = joined.where((rts_us >= lts_us + lo_us) & (rts_us <= lts_us + hi_us))
        return out.withColumnRenamed("__lts", "left_ts").withColumnRenamed(
            "__rts", "right_ts"
        )


class Resample(Pipe):
    """Per-key regular time grid with last-observation-carried-forward —
    the gap-filling/resampling companion to AsOfJoin (same union +
    carry-forward window kernel): for every key, emit one row per
    ``step_seconds`` bucket between the key's first and last observation,
    valued with the most recent observation at-or-before the grid point.

    Scale shape: one groupBy for per-key bounds (tiny result), grid rows
    generated with ``sequence``/``explode`` (executor-local fan-out), then
    ONE shuffle on the key for the carry-forward window — never a
    per-grid-point subquery or a non-equi join. Grid buckets are
    epoch-aligned so both engines agree on boundaries."""

    def __init__(
        self,
        step_seconds: int,
        key_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
        **kwargs,
    ):
        if step_seconds <= 0:
            raise ValueError("step_seconds must be positive")
        super().__init__(**kwargs)
        self.step_seconds = step_seconds
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col

    def _bucket(self, c: Column) -> Column:
        step = self.step_seconds
        return F.timestamp_seconds(
            (F.floor(F.unix_timestamp(c) / step) * step).cast("long")
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        key, ts, val = self.key_col, self.ts_col, self.value_col
        step = self.step_seconds
        bounds = df.groupBy(key).agg(
            F.min(ts).alias("__mn"), F.max(ts).alias("__mx")
        )
        payload = "__obs"
        grid = bounds.select(
            key,
            F.explode(
                F.sequence(
                    self._bucket(F.col("__mn")),
                    self._bucket(F.col("__mx")),
                    F.expr(f"interval {step} seconds"),
                )
            ).alias("__t"),
        ).select(
            key,
            "__t",
            F.lit(1).alias("__side"),
            F.lit(None)
            .cast("struct<v:double>")
            .alias(payload),
        )
        # carry the most recent OBSERVATION (a non-null struct even when its
        # VALUE is null) — carrying the bare value would skip null-valued
        # observations, which is as-of-join semantics' divergence point:
        # the grid point must see the matched row's value, null included
        obs = df.select(
            key,
            F.col(ts).alias("__t"),
            F.lit(0).alias("__side"),
            F.struct(F.col(val).cast("double").alias("v")).alias(payload),
        )
        w = (
            Window.partitionBy(key)
            .orderBy("__t", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = obs.unionByName(grid).withColumn(
            "__filled", F.last(payload, ignorenulls=True).over(w)
        )
        return (
            filled.filter(F.col("__side") == 1)
            .select(
                key,
                F.col("__t").alias("grid_ts"),
                F.col("__filled")["v"].alias(val),
            )
        )


def resample_sql(
    table: str = "events",
    step_seconds: int = 21600,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> str:
    """DuckDB oracle for :class:`Resample` via native ASOF LEFT JOIN over
    the identical epoch-aligned grid."""
    bucket = (
        lambda c: f"CAST(to_timestamp(floor(epoch({c}) / {step_seconds}) * {step_seconds}) AS TIMESTAMP)"
    )
    return f"""
WITH bounds AS (
  SELECT {key}, {bucket(f'min({ts})')} AS t0, {bucket(f'max({ts})')} AS t1
  FROM {table} GROUP BY {key}
), grid AS (
  SELECT {key}, unnest(generate_series(t0, t1, INTERVAL {step_seconds} SECOND)) AS grid_ts
  FROM bounds
)
SELECT g.{key}, g.grid_ts, e.{value} AS {value}
FROM grid g ASOF LEFT JOIN {table} e
  ON g.{key} = e.{key} AND e.{ts} <= g.grid_ts
"""


class RollingZScore(Pipe):
    """Rolling-window anomaly scoring: each event's z-score against the
    moving mean/stddev of its key's trailing time window (RANGE frame over
    epoch microseconds, current row inclusive) — the standard streaming
    outlier gate, in its batch form.

    Exactness: the window carries COUNT, an exact DECIMAL(18,4) sum and an
    exact DECIMAL(38,8) sum of squares (a scale-4 decimal squared is scale-8
    with no rounding), so the moving moments are order- and
    partitioning-independent; mean/variance/z then evaluate as the identical
    IEEE-double expression tree in both engines — bit-exact given the exact
    integer/decimal inputs. Variance is clamped at 0 (float cancellation can
    dip epsilon-negative) and z is 0 where the window has no spread.

    Scale shape: one shuffle on the key (the window exchange); the frame is
    time-bounded so per-row state is O(events in the window), never the
    whole partition.
    """

    def __init__(
        self,
        keys: Sequence[str] = ("user_id",),
        ts_col: str = "ts",
        value_col: str = "value",
        window_seconds: int = 7200,
        z_threshold: float = 2.0,
        id_cols: Sequence[str] = ("event_id",),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.value_col = value_col
        self.window_seconds = window_seconds
        self.z_threshold = z_threshold
        self.id_cols = list(id_cols)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        v4 = F.col(self.value_col).cast("decimal(18,4)")
        base = df.withColumn("__eus", _us(F.col(self.ts_col))).withColumn(
            "__v4", v4
        ).withColumn(
            # scale-4 x scale-4 = scale-8, exact (no rounding) in 38 digits
            "__sq", (F.col("__v4") * F.col("__v4")).cast("decimal(38,8)")
        )
        w = (
            Window.partitionBy(*self.keys)
            .orderBy("__eus")
            .rangeBetween(-self.window_seconds * 1_000_000, 0)
        )
        n = F.count(F.lit(1)).over(w)
        s = F.sum("__v4").over(w).cast("decimal(38,4)")
        ss = F.sum("__sq").over(w).cast("decimal(38,8)")
        mean = s.cast("double") / n.cast("double")
        var = F.greatest(
            ss.cast("double") / n.cast("double") - mean * mean, F.lit(0.0)
        )
        z = F.when(
            var > 0,
            (F.col("__v4").cast("double") - mean) / F.sqrt(var),
        ).otherwise(F.lit(0.0))
        return base.select(
            *self.keys,
            *self.id_cols,
            n.cast("long").alias("n_window"),
            z.alias("z"),
            (F.abs(z) > F.lit(self.z_threshold)).alias("is_anomaly"),
        )


def rolling_zscore_sql(
    table: str = "events",
    key: str = "user_id",
    id_col: str = "event_id",
    ts: str = "ts",
    value: str = "value",
    window_seconds: int = 7200,
    z_threshold: float = 2.0,
) -> str:
    """DuckDB oracle for :class:`RollingZScore` — the identical RANGE frame
    over epoch microseconds and the identical double expression tree."""
    return f"""
WITH base AS (
  SELECT {key}, {id_col}, epoch_us({ts}) AS eus,
         CAST({value} AS DECIMAL(18,4)) AS v4,
         CAST(CAST({value} AS DECIMAL(18,4)) * CAST({value} AS DECIMAL(18,4))
              AS DECIMAL(38,8)) AS sq
  FROM {table}
), moments AS (
  SELECT {key}, {id_col}, v4,
         COUNT(*) OVER w AS n,
         CAST(SUM(v4) OVER w AS DECIMAL(38,4)) AS s,
         CAST(SUM(sq) OVER w AS DECIMAL(38,8)) AS ss
  FROM base
  WINDOW w AS (PARTITION BY {key} ORDER BY eus
               RANGE BETWEEN {window_seconds * 1_000_000} PRECEDING AND CURRENT ROW)
), z AS (
  SELECT {key}, {id_col}, CAST(n AS BIGINT) AS n_window,
         CASE WHEN greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                            - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0) > 0
              THEN (CAST(v4 AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   / sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                                   - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                     * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
              ELSE 0.0 END AS z
  FROM moments
)
SELECT {key}, {id_col}, n_window, z, (abs(z) > {z_threshold}) AS is_anomaly
FROM z ORDER BY {key}, {id_col}
"""

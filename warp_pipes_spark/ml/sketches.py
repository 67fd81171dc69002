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


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant; a shared literal on both
    engines (computed once here, embedded verbatim in the oracle)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class PortableHll(Pipe):
    """Engine-portable HyperLogLog distinct-count estimate per group —
    the ORACLED companion to q53's Spark-native ``approx_count_distinct``
    (whose HLL++ register layout is engine-internal and can't be replayed
    elsewhere; this operator's can, the same md5 dual-family pattern as
    MinHash/LSH/SimHash).

    Register construction is classic HLL over an md5 hash: the first
    ``p_hex`` hex chars pick the register, the next 12 (48 bits) give
    ``rho`` = leading-zero position, computed EXACTLY via the binary
    string length (``bin(w)``) — no float log. The harmonic sum
    ``Σ 2^-M_j`` is accumulated as the exact integer ``Σ 2^(49-M_j)``
    (fits a BIGINT: <= m * 2^49), so the only cross-engine float ops are
    one division, one multiply by the shared alpha literal and (in the
    small-range branch) one ``ln`` — decimal-rounded at 1e-6, leaving the
    usual measure-zero boundary exposure.

    Plan shape: one narrow (group, register) pre-aggregation with map-side
    combine, then a register-sized per-group reduction — sketch-sized
    shuffles regardless of stream size, mergeable like the CMS."""

    def __init__(
        self,
        value_col: str,
        group_cols: Tuple[str, ...] = (),
        p_hex: int = 2,
        seed: int = 42,
        out_col: str = "hll_estimate",
        **kwargs,
    ):
        if p_hex not in (1, 2, 3):
            raise ValueError("p_hex must be 1..3 (16..4096 registers)")
        super().__init__(**kwargs)
        self.value_col = value_col
        self.group_cols = tuple(group_cols)
        self.p_hex = p_hex
        self.seed = seed
        self.out_col = out_col

    @property
    def m(self) -> int:
        return 16 ** self.p_hex

    def registers(self, df: DataFrame) -> DataFrame:
        """The sketch STATE: ``(group_cols..., __b register, __m max-rho)``.
        This is what makes the sketch distributable and incremental —
        register frames from shards / days / snapshots merge with
        :func:`merge_hll_registers` (a register-sized max-aggregation,
        never a re-scan), and :meth:`estimate` finishes any merged state."""
        h = F.md5(
            F.concat(
                F.lit(f"{self.seed}:"), F.col(self.value_col).cast("string")
            )
        )
        bucket = F.conv(F.substring(h, 1, self.p_hex), 16, 10).cast("int")
        w = F.conv(F.substring(h, self.p_hex + 1, 12), 16, 10).cast("long")
        rho = F.when(w == 0, F.lit(49)).otherwise(
            F.lit(49) - F.length(F.bin(w))
        )
        gcols = list(self.group_cols)
        return (
            df.select(*gcols, bucket.alias("__b"), rho.alias("__r"))
            .groupBy(*gcols, "__b")
            .agg(F.max("__r").alias("__m"))
        )

    def estimate(self, regs: DataFrame) -> DataFrame:
        """Finish a register frame (possibly merged) into per-group
        estimates."""
        m = self.m
        alpha = _hll_alpha(m)
        gcols = list(self.group_cols)
        # exact integer harmonic accumulator: empty registers contribute
        # 2^49 (F.shiftleft needs a literal shift in this PySpark — use the
        # SQL form for the column-valued amount)
        s_present = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - __m)"))
        n_present = F.count(F.lit(1))
        agg = regs.groupBy(*gcols).agg(
            s_present.alias("__s"), n_present.alias("__n")
        )
        S = F.col("__s") + (F.lit(m) - F.col("__n")) * F.lit(1 << 49)
        V = (F.lit(m) - F.col("__n")).cast("double")  # empty-register count
        e_raw = (
            F.lit(alpha * m * m * float(1 << 49)) / S.cast("double")
        )
        est = F.when(
            (e_raw <= F.lit(2.5 * m)) & (V > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / V),
        ).otherwise(e_raw)
        return agg.select(
            *gcols,
            est.cast("decimal(18,6)").cast("double").alias(self.out_col),
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return self.estimate(self.registers(df))


def merge_hll_registers(*regs: DataFrame) -> DataFrame:
    """HLL register merge = per-(group, register) max — the union of the
    underlying sets, exactly (register-sized aggregation, not a re-scan).
    ``estimate`` of the merge equals ``estimate`` over the concatenated
    inputs bit-for-bit (max is associative/commutative)."""
    u = regs[0]
    for r in regs[1:]:
        u = u.unionByName(r)
    keys = [c for c in u.columns if c != "__m"]
    return u.groupBy(*keys).agg(F.max("__m").alias("__m"))


def portable_hll_sql(
    value: str,
    table: str,
    group_cols: Tuple[str, ...] = (),
    p_hex: int = 2,
    seed: int = 42,
    out_col: str = "hll_estimate",
    where: str = "",
) -> str:
    """DuckDB replay of :class:`PortableHll`: same md5 registers, same
    exact-integer harmonic sum, same alpha literal and small-range
    correction."""
    m = 16 ** p_hex
    alpha = _hll_alpha(m)
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    wclause = f"WHERE {where}" if where else ""
    return f"""
WITH hashed AS (
  SELECT {gpfx}
         CAST(('0x' || substr(md5('{seed}:' || CAST({value} AS VARCHAR)), 1, {p_hex}))::BIGINT AS INTEGER) AS b,
         ('0x' || substr(md5('{seed}:' || CAST({value} AS VARCHAR)), {p_hex} + 1, 12))::BIGINT AS w
  FROM {table} {wclause}
),
regs AS (
  SELECT {gpfx} b,
         MAX(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS mreg
  FROM hashed GROUP BY {gpfx} b
),
agg AS (
  SELECT {gpfx}
         SUM((CAST(1 AS BIGINT) << (49 - mreg))) AS s_present,
         COUNT(*) AS n_present
  FROM regs {gby}
),
est AS (
  SELECT {gpfx}
         CAST(s_present + ({m} - n_present) * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS S,
         CAST({m} - n_present AS DOUBLE) AS V
  FROM agg
)
SELECT {gpfx}
       CAST(CAST(CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(1 << 49)!r} AS DOUBLE)) / S
                        <= CAST({2.5 * m!r} AS DOUBLE)
                       AND V > 0
                 THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / V)
                 ELSE (CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(1 << 49)!r} AS DOUBLE)) / S
            END AS DECIMAL(18,6)) AS DOUBLE) AS {out_col}
FROM est
{"ORDER BY " + gsel if group_cols else ""}
"""


class HistogramQuantiles(Pipe):
    """Engine-portable histogram quantile sketch per group — the
    PERCENTILE twin of :class:`PortableHll`: q53's Spark-native
    ``approx_percentile`` uses an engine-internal KLL-style summary that
    can't be replayed elsewhere; this one-pass-plus-minmax fixed-width
    histogram can, with every step in exact integer arithmetic.

    Construction over a DECIMAL(_, 2) value column (exact cents):

    - pass 1 (cheap agg): per-group min/max in integer cents;
    - pass 2: per-(group, bin) counts with
      ``bin = ((v - min) * B) // (max - min)`` (the max clamps to B-1) —
      all BIGINT, no float, mergeable by simple count addition;
    - quantile q: the smallest bin whose cumulative count reaches
      ``ceil(q * n)`` (type-1 / lower quantile over bins); the estimate
      is that bin's LOWER EDGE in cents, rendered as DOUBLE (exact for
      cent values below 2^53). Error is bounded by one bin width.

    Scale shape: two corpus scans (min/max, then bin counts — both
    map-side combined), then every remaining op runs on the bounded
    ``groups x B`` table; the cumulative window partitions by group over
    at most B rows. Histograms from disjoint shards MERGE by adding
    counts per (group, bin) given the same (min, max, B) frame —
    ``merge_histogram_counts`` below — the same register-style contract
    as ``merge_hll_registers``."""

    def __init__(
        self,
        value_col: str,
        group_cols=("l_returnflag",),
        n_bins: int = 1024,
        quantiles=(0.5, 0.95, 0.99),
        **kwargs,
    ):
        if n_bins < 2:
            raise ValueError(f"n_bins must be >= 2, got {n_bins}")
        super().__init__(**kwargs)
        self.value_col = value_col
        self.group_cols = list(group_cols)
        self.n_bins = n_bins
        self.quantiles = list(quantiles)

    def frame_of(self, df: DataFrame) -> DataFrame:
        """The sketch frame: per-group (vmin, vmax) in integer cents.
        Shard histograms are only mergeable when built over the SAME
        frame — compute it once over the whole corpus (a cheap min/max
        agg) and pass it to every shard's ``histogram`` call."""
        g = [F.col(c) for c in self.group_cols]
        cents = (F.col(self.value_col) * 100).cast("long")
        return df.groupBy(*g).agg(
            F.min(cents).alias("vmin"), F.max(cents).alias("vmax")
        )

    def histogram(self, df: DataFrame, frame: DataFrame = None) -> DataFrame:
        """The mergeable state: (group..., bin, cnt) + frame (vmin, vmax).
        Pass a shared ``frame`` (from :meth:`frame_of` over the WHOLE
        corpus) when building per-shard histograms for a later merge —
        a shard's own min/max generally differs, and histograms over
        different frames are incommensurable."""
        B = self.n_bins
        g = [F.col(c) for c in self.group_cols]
        cents = (F.col(self.value_col) * 100).cast("long")
        if frame is None:
            frame = self.frame_of(df)
        binned = (
            df.join(F.broadcast(frame), self.group_cols)
            .select(
                *g,
                "vmin",
                "vmax",
                ((cents - F.col("vmin")) * B).alias("__num"),
                (F.col("vmax") - F.col("vmin")).alias("__den"),
            )
            .select(
                *g,
                "vmin",
                "vmax",
                # integer `div`, NOT `/`: float division of longs loses
                # exactness past 2^53 and would break oracle parity
                F.when(
                    F.col("__den") > 0,
                    F.least(F.expr("__num div __den"), F.lit(B - 1)),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("bin"),
            )
            .groupBy(*g, "vmin", "vmax", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return binned

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        B = self.n_bins
        hist = self.histogram(df)
        w = (
            Window.partitionBy(*self.group_cols)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "n", F.sum("cnt").over(Window.partitionBy(*self.group_cols))
        )
        outs = [F.max("n").cast("long").alias("n")]
        for q in self.quantiles:
            # threshold = ceil(q * n) in exact integer arithmetic over
            # q expressed in basis points (q is a config literal); all
            # divisions are integer `div` for cross-engine exactness
            bp = int(round(q * 10_000))
            thr = F.expr(f"(n * {bp} + 9999) div 10000")
            edge = F.col("vmin") + F.expr(
                f"(bin * (vmax - vmin)) div {B}"
            )
            hit = F.when(F.col("cum") >= thr, edge)
            label = f"p{bp // 100 if bp % 100 == 0 else bp}"
            outs.append(
                (F.min(hit) / 100.0).alias(label)
            )
        return cum.groupBy(*self.group_cols).agg(*outs)


def merge_histogram_counts(*hists: DataFrame) -> DataFrame:
    """Merge histogram states from disjoint shards built over the SAME
    frame (group min/max and bin count): counts add per (group..., bin).

    Frames are VERIFIED, not assumed: shards whose (vmin, vmax) disagree
    for any group would silently mix incommensurable bin scales — that is
    a loud error here (build shard histograms with a shared
    ``HistogramQuantiles.frame_of`` frame)."""
    if not hists:
        raise ValueError("need at least one histogram")
    merged = hists[0]
    for h in hists[1:]:
        merged = merged.unionByName(h)
    group_keys = [
        c for c in merged.columns if c not in ("cnt", "bin", "vmin", "vmax")
    ]
    bad = (
        merged.groupBy(*group_keys)
        .agg(F.countDistinct("vmin", "vmax").alias("nf"))
        .filter(F.col("nf") > 1)
        .limit(5)
        .collect()
    )
    if bad:
        raise ValueError(
            "histogram frames disagree across shards for groups "
            f"{[tuple(r)[:-1] for r in bad]} — build each shard's histogram "
            "over a shared frame (HistogramQuantiles.frame_of on the whole "
            "corpus) before merging"
        )
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles_sql(
    value: str = "l_extendedprice",
    table: str = "lineitem",
    group_cols=("l_returnflag",),
    n_bins: int = 1024,
    quantiles=(0.5, 0.95, 0.99),
) -> str:
    """DuckDB oracle for :class:`HistogramQuantiles` — identical integer
    binning, cumulative selection, and lower-edge arithmetic."""
    B = n_bins
    gcols = ", ".join(group_cols)
    q_selects = []
    for q in quantiles:
        bp = int(round(q * 10_000))
        label = f"p{bp // 100 if bp % 100 == 0 else bp}"
        q_selects.append(
            f"MIN(CASE WHEN cum >= (n * {bp} + 9999) // 10000 "
            f"THEN CAST(vmin + (bin * (vmax - vmin)) // {B} AS BIGINT) END) "
            f"/ 100.0 AS {label}"
        )
    return f"""
WITH cents AS (
  SELECT {gcols}, CAST({value} * 100 AS BIGINT) AS v FROM {table}
),
frame AS (
  SELECT {gcols}, MIN(v) AS vmin, MAX(v) AS vmax FROM cents GROUP BY {gcols}
),
binned AS (
  SELECT c.*, f.vmin, f.vmax,
         CASE WHEN f.vmax > f.vmin
              THEN LEAST(((c.v - f.vmin) * {B}) // (f.vmax - f.vmin), {B - 1})
              ELSE 0 END AS bin
  FROM cents c JOIN frame f USING ({gcols})
),
hist AS (
  SELECT {gcols}, vmin, vmax, bin, COUNT(*) AS cnt
  FROM binned GROUP BY {gcols}, vmin, vmax, bin
),
cum AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY {gcols} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {gcols}) AS n
  FROM hist
)
SELECT {gcols}, CAST(MAX(n) AS BIGINT) AS n, {", ".join(q_selects)}
FROM cum GROUP BY {gcols}
"""

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
        # NULL values are EXCLUDED, not binned: a NULL survives the cents
        # cast as NULL, F.least would skip it and drop the row into the
        # top bin, silently counting it toward n and shifting every
        # quantile (round-4 advisor finding — unhit on lineitem, wrong on
        # nullable inputs). min/max in frame_of already skip NULLs, so the
        # filter keeps both paths consistent.
        binned = (
            df.where(F.col(self.value_col).isNotNull())
            .join(F.broadcast(frame), self.group_cols)
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
  WHERE {value} IS NOT NULL
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


# ---------------------------------------------------------------------------
# Bloom-filter admission gate (portable md5 bit positions)
# ---------------------------------------------------------------------------


def bloom_positions_expr(key: Column, m_bits: int, k: int, seed: int) -> Column:
    """The k bit positions of ``key`` — md5 over ``seed:i:key`` so any
    engine (and the DuckDB oracle) derives the identical filter. 8 hex
    chars (32 bits) per hash, reduced mod ``m_bits``."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{seed}:{i}:"), key)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            )
            for i in range(k)
        ]
    )


def bloom_position_sql(key: str, m_bits: int, i: int, seed: int) -> str:
    return (
        f"(('0x' || substr(md5('{seed}:{i}:' || {key}), 1, 8))::BIGINT % {m_bits})"
    )


class BloomFilterGate(Pipe):
    """Bloom-filter membership gate for a corpus increment — the
    constant-memory FIRST PASS of incremental dedup at 100 TB: before the
    exact anti-join (q79) or the MinHash gate (q158) touch the full
    history, a bloom filter of the history keys answers "definitely new"
    at scan speed with ``m_bits`` of state TOTAL, regardless of history
    size. ``bloom_hit = false`` is definite (no false negatives);
    ``bloom_hit = true`` is "maybe seen" and only those rows proceed to
    the expensive verify stage.

    Scale design: the filter is built as the DISTINCT set of md5 bit
    positions of the history keys — at most ``m_bits`` rows (a bounded,
    broadcastable table: 2^20 bits = at most ~1M narrow rows, far under
    the broadcast threshold after dedup), aggregated map-side. The gate
    side explodes each candidate into its k positions, broadcast-joins
    the position set and reduces back per candidate: no shuffle of the
    (huge) history, no driver-side bitset, no UDF. Filters from disjoint
    history shards merge by position-set union (``merge_bloom_bits``).

    With ``truth_audit=True`` the output also carries the exact-match
    truth (``true_dup``) and the derived ``false_positive`` flag — the
    audit a pipeline runs at small scale to size ``m_bits``/``k``
    before trusting the gate at full scale.

    No reference counterpart (the reference has no sketch operators);
    extension for the training-data pipeline, same family as
    :class:`PortableHll` / :class:`CountMinSketch`.
    """

    def __init__(
        self,
        corpus: DataFrame,
        key_col: str = "text",
        id_col: str = "doc_id",
        m_bits: int = 1 << 20,
        k: int = 4,
        seed: int = 13,
        truth_audit: bool = False,
        **kwargs,
    ):
        if m_bits < 2 or k < 1:
            raise ValueError(f"need m_bits >= 2, k >= 1; got {m_bits}, {k}")
        super().__init__(**kwargs)
        self.corpus = corpus
        self.key_col = key_col
        self.id_col = id_col
        self.m_bits = m_bits
        self.k = k
        self.seed = seed
        self.truth_audit = truth_audit

    def filter_bits(self, corpus: DataFrame) -> DataFrame:
        """The filter STATE: distinct set bit positions (<= m_bits rows).
        Shard-local states merge with :func:`merge_bloom_bits`."""
        pos = bloom_positions_expr(
            F.col(self.key_col), self.m_bits, self.k, self.seed
        )
        return (
            corpus.select(F.explode(pos).alias("pos")).distinct()
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        bits = self.filter_bits(self.corpus).withColumn("__set", F.lit(1))
        pos = bloom_positions_expr(
            F.col(self.key_col), self.m_bits, self.k, self.seed
        )
        exploded = df.select(
            self.id_col, F.explode(pos).alias("pos")
        )
        hits = (
            exploded.join(F.broadcast(bits), "pos", "left")
            .groupBy(self.id_col)
            .agg((F.count("__set") == self.k).alias("bloom_hit"))
        )
        if not self.truth_audit:
            return hits
        # NO broadcast hint on the truth set: it is one row per DISTINCT
        # history key, i.e. exactly the unbounded table this class's
        # constant-memory contract exists to avoid holding. Let AQE pick —
        # it broadcasts when the history is genuinely small and degrades
        # to a shuffle join (instead of a driver OOM) when audit mode is
        # ever pointed at real history (round-4 advisor finding).
        truth = (
            self.corpus.select(F.col(self.key_col).alias("__k"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        audited = (
            df.select(self.id_col, F.col(self.key_col).alias("__k"))
            .join(truth, "__k", "left")
            .select(
                self.id_col,
                F.coalesce(F.col("__dup"), F.lit(False)).alias("true_dup"),
            )
        )
        return (
            hits.join(audited, self.id_col)
            .select(
                self.id_col,
                "bloom_hit",
                "true_dup",
                (F.col("bloom_hit") & ~F.col("true_dup")).alias(
                    "false_positive"
                ),
            )
        )


def merge_bloom_bits(*bits: DataFrame) -> DataFrame:
    """Bloom-filter merge = union of set-bit positions (the bitwise OR of
    the filters) — a bounded aggregation, never a history re-scan."""
    u = bits[0]
    for b in bits[1:]:
        u = u.unionByName(b)
    return u.distinct()


def bloom_gate_sql(
    candidates_sql: str,
    corpus_sql: str,
    key: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: int = 13,
    truth_audit: bool = False,
) -> str:
    """DuckDB replay of :class:`BloomFilterGate`: identical md5 positions,
    identical distinct-position filter, identical k-of-k membership."""
    pos_union = " UNION ALL ".join(
        f"SELECT {bloom_position_sql(key, m_bits, i, seed)} AS pos "
        f"FROM corpus"
        for i in range(k)
    )
    cand_pos = " UNION ALL ".join(
        f"SELECT {id_col}, {bloom_position_sql(key, m_bits, i, seed)} AS pos "
        f"FROM cand"
        for i in range(k)
    )
    base = f"""
WITH corpus AS ({corpus_sql}),
cand AS ({candidates_sql}),
bits AS (SELECT DISTINCT pos FROM ({pos_union}) p),
cpos AS ({cand_pos}),
hits AS (
  SELECT {id_col},
         COUNT(*) FILTER (WHERE pos IN (SELECT pos FROM bits)) = {k} AS bloom_hit
  FROM cpos GROUP BY {id_col}
)"""
    if not truth_audit:
        return base + f"\nSELECT {id_col}, bloom_hit FROM hits ORDER BY {id_col}"
    return base + f""",
truth AS (
  SELECT c.{id_col},
         EXISTS (SELECT 1 FROM corpus x WHERE x.{key} = c.{key}) AS true_dup
  FROM cand c
)
SELECT h.{id_col}, h.bloom_hit, t.true_dup,
       h.bloom_hit AND NOT t.true_dup AS false_positive
FROM hits h JOIN truth t USING ({id_col})
ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta-style) distinct + set-overlap sketch
# ---------------------------------------------------------------------------

KMV_DENOM = float(1 << 48)  # md5 hashes are 48-bit -> exact in a double


class KmvSketch(Pipe):
    """K-minimum-values distinct sketch with SET-OPERATION estimates
    (Beyer et al. 2007, SIGMOD; the theta-sketch family) — the sketch the
    corpus team uses to answer "how much does source A overlap source B"
    WITHOUT a vocabulary-sized exact join: per group keep the k smallest
    48-bit md5 hashes of the distinct values; then for any pair,
    ``K(A u B)`` = the k smallest of the two sketches' union, and the
    Jaccard estimate is ``|K(A u B) n K(A) n K(B)| / |K(A u B)|``.
    Distinct estimate per group is exact below k, else the classic
    ``(k-1) * 2^48 / h_k`` (both operands exactly representable, ONE
    IEEE division, decimal-rounded — same portability budget as
    :class:`PortableHll`).

    Unlike HLL registers, KMV sketches support intersection/Jaccard,
    which is what cross-source contamination and mixture design need.
    Fully deterministic (md5, no RNG), so the DuckDB oracle replays it
    bit-for-bit — no other engine's theta sketch can be compared across
    engines at all.

    Scale shape: per-doc distinct tokens explode narrow; one
    distinct-sized shuffle on (group, hash); the per-group bottom-k is a
    window over that distinct table; the pair stage then touches only
    ``groups^2 / 2`` sketch rows of k values each — driver-free,
    broadcastable. Sketches from disjoint shards merge by
    union-then-bottom-k (:func:`merge_kmv_sketches`)."""

    def __init__(
        self,
        group_col: str = "source",
        text_col: str = "text",
        k: int = 64,
        seed: int = 7,
        **kwargs,
    ):
        if k < 2:
            raise ValueError(f"need k >= 2, got {k}")
        super().__init__(**kwargs)
        self.group_col = group_col
        self.text_col = text_col
        self.k = k
        self.seed = seed

    def _hash(self) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{self.seed}:"), F.col("__tok"))), 1, 12
            ),
            16,
            10,
        ).cast("long")

    def sketches(self, df: DataFrame) -> DataFrame:
        """The sketch STATE per group: sorted array of the k smallest
        distinct hashes + the exact distinct count floor (n_distinct is
        only exact when <= k; the estimate handles the rest)."""
        from pyspark.sql import Window

        from warp_pipes_spark.text.analysis import tokens_expr

        toks = df.select(
            self.group_col,
            F.explode(
                F.array_distinct(tokens_expr(F.col(self.text_col)))
            ).alias("__tok"),
        )
        dh = toks.select(
            self.group_col, self._hash().alias("__h")
        ).distinct()
        w = Window.partitionBy(self.group_col).orderBy("__h")
        rn = dh.withColumn("__rn", F.row_number().over(w))
        return rn.groupBy(self.group_col).agg(
            F.sort_array(
                F.collect_list(F.when(F.col("__rn") <= self.k, F.col("__h")))
            ).alias("sketch"),
            F.count(F.lit(1)).alias("n_distinct"),
        )

    def _est(self, sketch: Column, n: Column) -> Column:
        """Distinct estimate from a sketch: exact when the sketch holds
        every distinct value, else (k-1) * 2^48 / h_k."""
        hk = F.greatest(F.element_at(sketch, self.k), F.lit(1).cast("long"))
        return (
            F.when(n <= self.k, n.cast("double"))
            .otherwise(
                F.lit(float(self.k - 1) * KMV_DENOM) / hk.cast("double")
            )
            .cast("decimal(18,6)")
            .cast("double")
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        k = self.k
        sk = self.sketches(df)
        a = sk.select(
            F.col(self.group_col).alias("source_a"),
            F.col("sketch").alias("__sa"),
            F.col("n_distinct").alias("__na"),
        )
        b = sk.select(
            F.col(self.group_col).alias("source_b"),
            F.col("sketch").alias("__sb"),
            F.col("n_distinct").alias("__nb"),
        )
        pairs = a.join(
            F.broadcast(b), F.col("source_a") < F.col("source_b")
        )
        u = F.slice(F.array_sort(F.array_union("__sa", "__sb")), 1, k)
        inter = F.array_intersect(
            F.array_intersect(u, F.col("__sa")), F.col("__sb")
        )
        union_est = (
            F.when(F.size(u) < k, F.size(u).cast("double"))
            .otherwise(
                F.lit(float(k - 1) * KMV_DENOM)
                / F.greatest(
                    F.element_at(u, k), F.lit(1).cast("long")
                ).cast("double")
            )
            .cast("decimal(18,6)")
            .cast("double")
        )
        jac = (
            (F.size(inter).cast("double") / F.size(u).cast("double"))
            .cast("decimal(18,6)")
            .cast("double")
        )
        return pairs.select(
            "source_a",
            "source_b",
            self._est(F.col("__sa"), F.col("__na")).alias("distinct_a"),
            self._est(F.col("__sb"), F.col("__nb")).alias("distinct_b"),
            union_est.alias("union_est"),
            jac.alias("jaccard_est"),
        )


def merge_kmv_sketches(k: int, *sketches: DataFrame) -> DataFrame:
    """KMV merge: union the sketch arrays per group, keep the k smallest.
    ``n_distinct`` floors add only when shards are value-disjoint; the
    merged estimate therefore uses the sketch path (n is saturated to
    k+1 on merge when either side overflowed, keeping ``_est`` honest)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [c for c in u.columns if c not in ("sketch", "n_distinct")]
    merged = u.groupBy(*keys).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("sketch")))
            ),
            1,
            k,
        ).alias("sketch"),
        F.sum("n_distinct").alias("__nsum"),
        F.max("n_distinct").alias("__nmax"),
    )
    n = F.when(
        F.col("__nmax") > k, F.lit(k + 1).cast("long")
    ).otherwise(F.least(F.col("__nsum"), F.size("sketch").cast("long") + F.lit(k).cast("long")))
    # a merged sketch is only provably complete if it has < k entries;
    # otherwise force the estimator down the h_k path
    n = F.when(F.size("sketch") < k, F.size("sketch").cast("long")).otherwise(
        F.greatest(n, F.lit(k + 1).cast("long"))
    )
    return merged.select(*keys, "sketch", n.alias("n_distinct"))


def kmv_overlap_sql(
    table: str = "documents",
    group_col: str = "source",
    text: str = "text",
    k: int = 64,
    seed: int = 7,
) -> str:
    """DuckDB replay of :class:`KmvSketch`: identical md5 hashes, bottom-k
    window, union/intersection algebra and decimal rounding."""
    from warp_pipes_spark.text.analysis import tokens_sql

    denom = float(1 << 48)
    est = (
        lambda sk, n: f"CAST(CAST(CASE WHEN {n} <= {k} THEN CAST({n} AS DOUBLE) "
        f"ELSE CAST({float(k - 1) * denom!r} AS DOUBLE) / "
        f"CAST(GREATEST({sk}[{k}], 1) AS DOUBLE) END "
        f"AS DECIMAL(18,6)) AS DOUBLE)"
    )
    return f"""
WITH toks AS (
  SELECT {group_col} AS g, unnest(list_distinct({tokens_sql(text)})) AS tok
  FROM {table}
),
dh AS (
  SELECT DISTINCT g, ('0x' || substr(md5('{seed}:' || tok), 1, 12))::BIGINT AS h
  FROM toks
),
rk AS (
  SELECT g, h,
         row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS cnt
  FROM dh
),
sk AS (
  SELECT g,
         list_sort(list(h) FILTER (WHERE rn <= {k})) AS sketch,
         ANY_VALUE(cnt) AS n_distinct
  FROM rk GROUP BY g
),
pairs AS (
  SELECT a.g AS source_a, b.g AS source_b,
         a.sketch AS sa, a.n_distinct AS na,
         b.sketch AS sb, b.n_distinct AS nb,
         array_slice(list_sort(list_distinct(a.sketch || b.sketch)), 1, {k}) AS u
  FROM sk a JOIN sk b ON a.g < b.g
)
SELECT source_a, source_b,
       {est('sa', 'na')} AS distinct_a,
       {est('sb', 'nb')} AS distinct_b,
       CAST(CAST(CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
                 ELSE CAST({float(k - 1) * denom!r} AS DOUBLE) /
                      CAST(GREATEST(u[{k}], 1) AS DOUBLE) END
            AS DECIMAL(18,6)) AS DOUBLE) AS union_est,
       CAST(CAST(CAST(len(list_intersect(list_intersect(u, sa), sb)) AS DOUBLE)
                 / CAST(len(u) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS jaccard_est
FROM pairs
ORDER BY source_a, source_b
"""

"""Embedding / feature drift monitoring between dataset snapshots.

A 100 TB training-data pipeline re-embeds its corpus on every model or
crawl refresh; before the new snapshot replaces the old one, the data
team reads a per-dimension drift panel: Population Stability Index
(the standard model-monitoring metric — PSI < 0.1 stable, 0.1-0.25
watch, > 0.25 action) plus the mean shift. A silent preprocessing change
(normalization, truncation, tokenizer swap) shows up here before it
poisons an ANN index or a trained classifier.

Reference scope: extension — the reference pipelines embeddings
(``predict``/vector handling) but ships no monitoring. PSI per Karakoulas
(2004) / the credit-scoring literature; Laplace-smoothed so empty bins
are well-defined and the whole panel is exact-decimal oracle-able.

Cross-engine float budget (the engine standard): float32 components go
float -> double (exact) -> DECIMAL(18,6) (dyadic values cannot hit a
rounding tie), all counting is exact integers, each ln rounds to
DECIMAL(18,6), each per-bin PSI term rounds to DECIMAL(18,6) before the
exact decimal sum — bit-identical under any partitioning or engine.

Scale shape: one posexplode of each snapshot (narrow (dim, value)
rows with full map-side combine onto dim x bins keys), a dim-sized
broadcast frame, and dim x bins-sized reductions — nothing is ever
corpus-wide after the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

_SCALE = 1_000_000  # DECIMAL(18,6) as exact scaled longs


def _v6(col):
    """float -> double (exact) -> DECIMAL(18,6) -> scaled long (exact)."""
    return (
        (F.col(col).cast("double").cast("decimal(18,6)") * _SCALE)
        .cast("long")
    )


class EmbeddingDrift(Pipe):
    """Per-dimension drift panel between a reference snapshot (given at
    construction) and the current snapshot (the transform input): PSI
    over ``n_bins`` equal-width bins framed by the REFERENCE min/max
    (current values outside the frame clamp into the edge bins — they
    are drift and must count, not vanish), plus mean_ref/mean_cur/shift.

    ``p = (cnt + 1) / (n + n_bins)`` (Laplace) keeps empty bins finite
    without the engine-dependent epsilon the classic formula needs."""

    def __init__(
        self,
        reference: DataFrame,
        vec_col: str = "embedding",
        n_bins: int = 10,
        **kwargs,
    ):
        if n_bins < 2:
            raise ValueError(f"n_bins must be >= 2, got {n_bins}")
        super().__init__(**kwargs)
        self.reference = reference
        self.vec_col = vec_col
        self.n_bins = n_bins

    _no_fingerprint = ("reference",)

    def _components(self, df: DataFrame) -> DataFrame:
        # NULL components are dropped on BOTH engines: least(NULL, B-1)
        # would otherwise bin a NULL into the top bin while excluding it
        # from the frame min/max and the mean sums (the CalibrationReport
        # NULL lesson).
        return (
            df.select(F.posexplode(self.vec_col).alias("dim", "__x"))
            .where(F.col("__x").isNotNull())
            .select("dim", _v6("__x").alias("v"))
        )

    def _binned(self, comp: DataFrame, frame: DataFrame) -> DataFrame:
        B = self.n_bins
        den = F.col("vmax") - F.col("vmin")
        # integer `div` (not `/`): exact past 2^53 (the HistogramQuantiles
        # lesson). Spark div truncates while DuckDB // floors, but the two
        # only disagree on NEGATIVE numerators (below-frame values), where
        # both land <= 0 and the GREATEST(0, ..) clamp makes them equal.
        raw = F.expr(f"(v - vmin) * {B} div (vmax - vmin)")
        bin_ = (
            F.when(den > 0, F.greatest(F.lit(0), F.least(raw, F.lit(B - 1))))
            .otherwise(F.lit(0))
            .cast("long")
        )
        return (
            comp.join(F.broadcast(frame), "dim")
            .select("dim", bin_.alias("bin"))
            .groupBy("dim", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        B = self.n_bins
        ref_c = self._components(self.reference)
        cur_c = self._components(df)
        frame = ref_c.groupBy("dim").agg(
            F.min("v").alias("vmin"), F.max("v").alias("vmax")
        )
        ref_b = self._binned(ref_c, frame).withColumnRenamed("cnt", "cr")
        cur_b = self._binned(cur_c, frame).withColumnRenamed("cnt", "cc")
        cells = (
            ref_b.join(cur_b, ["dim", "bin"], "full")
            .na.fill({"cr": 0, "cc": 0})
        )
        totals = cells.groupBy("dim").agg(
            F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
        )
        # EXACT per-bin algebra (rounding a (pc-pr)*ln product hits
        # decimal ties — measured at sf0.001): with per-dim constant
        # denominator D = (nc+B)(nr+B),
        #   pc - pr = numer / D,  numer = (cc+1)(nr+B) - (cr+1)(nc+B)
        # so PSI = (sum_bins numer * round6(ln(pc/pr))) / D — an exact
        # integer x decimal(18,6) product summed exactly, then ONE IEEE
        # division and ONE final rounding. numer stays in long for
        # snapshots under ~3e9 rows per side; beyond that, subsample the
        # snapshots (a drift monitor needs no more).
        pr = (F.col("cr") + 1).cast("double") / (F.col("nr") + B).cast("double")
        pc = (F.col("cc") + 1).cast("double") / (F.col("nc") + B).cast("double")
        lnr = F.log(pc / pr).cast("decimal(18,6)")
        numer = (F.col("cc") + 1) * (F.col("nr") + B) - (F.col("cr") + 1) * (
            F.col("nc") + B
        )
        d_den = (F.col("nc") + B).cast("double") * (F.col("nr") + B).cast(
            "double"
        )
        psi = (
            cells.join(totals, "dim")
            .groupBy("dim")
            .agg(
                (
                    F.sum(numer.cast("long") * lnr).cast("double")
                    / F.max(d_den)
                )
                .cast("decimal(18,6)")
                .cast("double")
                .alias("psi")
            )
        )
        dec6 = lambda c: c.cast("decimal(18,6)").cast("double")
        means = (
            ref_c.groupBy("dim")
            .agg(F.sum("v").alias("sr"), F.count(F.lit(1)).alias("nr"))
            .join(
                cur_c.groupBy("dim").agg(
                    F.sum("v").alias("sc"), F.count(F.lit(1)).alias("nc")
                ),
                "dim",
            )
            .select(
                "dim",
                F.col("nr").cast("long").alias("n_ref"),
                F.col("nc").cast("long").alias("n_cur"),
                dec6(
                    F.col("sr").cast("double")
                    / F.lit(float(_SCALE))
                    / F.col("nr").cast("double")
                ).alias("mean_ref"),
                dec6(
                    F.col("sc").cast("double")
                    / F.lit(float(_SCALE))
                    / F.col("nc").cast("double")
                ).alias("mean_cur"),
            )
        )
        return (
            means.join(psi, "dim")
            .select(
                "dim",
                "n_ref",
                "n_cur",
                "mean_ref",
                "mean_cur",
                dec6(F.col("mean_cur") - F.col("mean_ref")).alias("mean_shift"),
                "psi",
            )
        )


def embedding_drift_sql(
    ref_sql: str,
    cur_sql: str,
    vec: str = "embedding",
    n_bins: int = 10,
) -> str:
    """DuckDB oracle for :class:`EmbeddingDrift`: identical scaled-long
    components, reference framing, clamped integer binning, Laplace
    fractions, rounded logs and per-term decimal rounding."""
    B = n_bins
    v6 = (
        f"CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * {_SCALE} AS BIGINT)"
    )
    comp = (
        lambda src: f"SELECT g.i AS dim, {v6} AS v FROM ({src}) t, "
        f"LATERAL (SELECT unnest(range(len({vec}))) AS i, "
        f"unnest({vec}) AS x) g WHERE g.x IS NOT NULL"
    )
    bin_ = (
        f"CASE WHEN f.vmax > f.vmin THEN GREATEST(0, LEAST("
        f"((c.v - f.vmin) * {B}) // (f.vmax - f.vmin), {B - 1})) "
        f"ELSE 0 END"
    )
    return f"""
WITH ref_c AS MATERIALIZED ({comp(ref_sql)}),
cur_c AS MATERIALIZED ({comp(cur_sql)}),
frame AS (SELECT dim, MIN(v) AS vmin, MAX(v) AS vmax FROM ref_c GROUP BY 1),
ref_b AS (
  SELECT c.dim, {bin_} AS bin, COUNT(*) AS cr
  FROM ref_c c JOIN frame f USING (dim) GROUP BY 1, 2
),
cur_b AS (
  SELECT c.dim, {bin_} AS bin, COUNT(*) AS cc
  FROM cur_c c JOIN frame f USING (dim) GROUP BY 1, 2
),
cells AS (
  SELECT COALESCE(r.dim, u.dim) AS dim, COALESCE(r.bin, u.bin) AS bin,
         COALESCE(r.cr, 0) AS cr, COALESCE(u.cc, 0) AS cc
  FROM ref_b r FULL JOIN cur_b u ON r.dim = u.dim AND r.bin = u.bin
),
totals AS (SELECT dim, SUM(cr) AS nr, SUM(cc) AS nc FROM cells GROUP BY 1),
psi AS (
  SELECT c.dim,
         CAST(CAST(
           CAST(SUM(
             ((cc + 1) * (nr + {B}) - (cr + 1) * (nc + {B}))
             * CAST(ln((CAST(cc + 1 AS DOUBLE) / CAST(nc + {B} AS DOUBLE))
                      / (CAST(cr + 1 AS DOUBLE) / CAST(nr + {B} AS DOUBLE)))
                    AS DECIMAL(18,6))
           ) AS DOUBLE)
           / MAX(CAST(nc + {B} AS DOUBLE) * CAST(nr + {B} AS DOUBLE))
         AS DECIMAL(18,6)) AS DOUBLE) AS psi
  FROM cells c JOIN totals USING (dim) GROUP BY 1
),
means AS (
  SELECT r.dim, r.nr AS n_ref, u.nc AS n_cur,
         CAST(CAST(CAST(r.sr AS DOUBLE) / {float(_SCALE)!r} / CAST(r.nr AS DOUBLE)
              AS DECIMAL(18,6)) AS DOUBLE) AS mean_ref,
         CAST(CAST(CAST(u.sc AS DOUBLE) / {float(_SCALE)!r} / CAST(u.nc AS DOUBLE)
              AS DECIMAL(18,6)) AS DOUBLE) AS mean_cur
  FROM (SELECT dim, SUM(v) AS sr, COUNT(*) AS nr FROM ref_c GROUP BY 1) r
  JOIN (SELECT dim, SUM(v) AS sc, COUNT(*) AS nc FROM cur_c GROUP BY 1) u
    USING (dim)
)
SELECT m.dim, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       mean_ref, mean_cur,
       CAST(CAST(mean_cur - mean_ref AS DECIMAL(18,6)) AS DOUBLE) AS mean_shift,
       p.psi
FROM means m JOIN psi p USING (dim)
ORDER BY m.dim
"""


class KsDrift(Pipe):
    """Two-sample Kolmogorov-Smirnov drift panel between every pair of
    sources (Kolmogorov 1933; Smirnov 1948; Massey 1951 for the
    two-sample test): per (source_a, source_b), the KS statistic
    D = max_v |F_a(v) - F_b(v)| over an integer-valued column (token
    counts, byte sizes) and the scaled statistic
    sqrt(n_a*n_b/(n_a+n_b)) * D that the KS significance tables read.
    The distribution-shift alarm with NO binning choice — the
    nonparametric companion to the binned PSI panel above.

    Exactness: ECDF differences are carried as the EXACT integer
    |n_b*cum_a(v) - n_a*cum_b(v)| (cum = docs with value <= v), maxed as
    a BIGINT; D and the scaled statistic are then two/three IEEE ops of
    exact integers — engine-independent, no decimal casts anywhere.

    Scale shape: one (source, value) aggregation off the scan, a
    |values| x |sources| grid with a per-source running-sum window
    (|values| is bounded — integer token counts — so the grid is tiny),
    then an n_sources^2-bounded pair join. Nothing corpus-wide after
    the first groupBy."""

    def __init__(
        self,
        value_col: str,
        group_col: str = "source",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.value_col = value_col
        self.group_col = group_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        counts = (
            df.select(
                F.col(self.group_col).alias("g"),
                F.col(self.value_col).cast("long").alias("v"),
            )
            .where(F.col("v").isNotNull())
            .groupBy("g", "v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        grid = (
            counts.select("v").distinct()
            .crossJoin(counts.select("g").distinct())
            .join(counts, ["g", "v"], "left")
            .na.fill({"n": 0})
        )
        w = (
            Window.partitionBy("g")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = grid.select(
            "g", "v", F.sum("n").over(w).alias("cum")
        )
        totals = counts.groupBy("g").agg(F.sum("n").alias("nt"))
        a = cum.join(totals, "g").select(
            F.col("g").alias("source_a"),
            "v",
            F.col("cum").alias("ca"),
            F.col("nt").alias("na"),
        )
        b = cum.join(totals, "g").select(
            F.col("g").alias("source_b"),
            "v",
            F.col("cum").alias("cb"),
            F.col("nt").alias("nb"),
        )
        pairs = (
            a.join(b, "v")
            .where(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b", "na", "nb")
            .agg(
                F.max(
                    F.abs(F.col("nb") * F.col("ca") - F.col("na") * F.col("cb"))
                ).alias("dnum")
            )
        )
        d = F.col("dnum").cast("double") / (F.col("na") * F.col("nb")).cast(
            "double"
        )
        scale = F.sqrt(
            (F.col("na") * F.col("nb")).cast("double")
            / (F.col("na") + F.col("nb")).cast("double")
        )
        return pairs.select(
            "source_a",
            "source_b",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            d.alias("ks_d"),
            (scale * d).alias("ks_stat"),
        )


def ks_drift_sql(
    table: str = "documents",
    value_expr: str = "n_chars",
    group_col: str = "source",
) -> str:
    """DuckDB oracle for :class:`KsDrift` — identical integer ECDF
    algebra, identical IEEE op order for D and the scaled statistic."""
    return f"""
WITH counts AS (
  SELECT {group_col} AS g, CAST({value_expr} AS BIGINT) AS v, COUNT(*) AS n
  FROM {table} WHERE {value_expr} IS NOT NULL GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, vs.v, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT v FROM counts) vs
  CROSS JOIN (SELECT DISTINCT g FROM counts) gs
  LEFT JOIN counts c ON c.g = gs.g AND c.v = vs.v
),
cum AS (
  SELECT g, v,
         SUM(n) OVER (PARTITION BY g ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM grid
),
totals AS (SELECT g, SUM(n) AS nt FROM counts GROUP BY g),
pairs AS (
  SELECT a.g AS source_a, b.g AS source_b, ta.nt AS na, tb.nt AS nb,
         MAX(ABS(tb.nt * a.cum - ta.nt * b.cum)) AS dnum
  FROM cum a
  JOIN cum b ON a.v = b.v AND a.g < b.g
  JOIN totals ta ON ta.g = a.g
  JOIN totals tb ON tb.g = b.g
  GROUP BY 1, 2, 3, 4
)
SELECT source_a, source_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(dnum AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks_d,
       sqrt(CAST(na * nb AS DOUBLE) / CAST(na + nb AS DOUBLE))
         * (CAST(dnum AS DOUBLE) / CAST(na * nb AS DOUBLE)) AS ks_stat
FROM pairs
ORDER BY source_a, source_b
"""

"""Model-evaluation metrics over scored rows: exact ROC-AUC.

The quality-classifier loop (train -> score corpus -> gate on score) needs
an evaluation pass; AUC is the standard threshold-free metric. The exact
rank formulation (Mann-Whitney U) is usually written as a GLOBAL rank over
all rows — a single-partition window that dies at scale. This module uses
the grouped-by-distinct-score formulation instead:

    per distinct score s: (n_pos_s, n_neg_s)          -- one keyed groupBy
    ordered over distinct scores ascending:
        2U = sum_s n_pos_s * (2 * cum_neg_below(s) + n_neg_s)
    AUC = 2U / (2 * n_pos * n_neg)

Ties get the standard half credit — folded into integer arithmetic by
carrying 2U (a pure BIGINT; no fractional intermediate anywhere), so the
result is bit-exact across engines: one final integer division renders
the double. The only ordered pass runs over DISTINCT scores (score
cardinality, not row count — a quantized/bucketed classifier emits few);
row-count-sized work is all in the first keyed aggregation.

Reference: warp-pipes has no evaluation operators; this extends the
text-classifier stack (`text/classifier.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class BinaryAuc(Pipe):
    """Input df: one row per example with ``score_col`` (orderable) and
    ``label_col`` (1 = positive, 0 = negative). Output: ONE row
    (n_pos, n_neg, auc) — exact, tie-corrected."""

    def __init__(self, score_col: str = "score", label_col: str = "label", **kwargs):
        super().__init__(**kwargs)
        self.score_col = score_col
        self.label_col = label_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        per_score = df.groupBy(F.col(self.score_col).alias("s")).agg(
            F.sum(F.col(self.label_col).cast("long")).alias("np"),
            F.sum(F.lit(1) - F.col(self.label_col).cast("long")).alias("nn"),
        )
        # ordered pass over DISTINCT scores only (bounded cardinality);
        # cum_below excludes the current score group
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        with_cum = per_score.withColumn(
            "cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0))
        )
        return with_cum.agg(
            F.sum("np").alias("n_pos"),
            F.sum("nn").alias("n_neg"),
            F.sum(F.col("np") * (2 * F.col("cum_nn") + F.col("nn"))).alias("u2"),
        ).select(
            "n_pos",
            "n_neg",
            (
                F.col("u2").cast("double")
                / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
        )


def binary_auc_sql(scored_sql: str, score: str = "score", label: str = "label") -> str:
    """DuckDB oracle: identical grouped 2U formulation over
    ``scored_sql`` (must yield the score and 0/1 label columns)."""
    return f"""
        WITH per_score AS (
            SELECT {score} AS s,
                   SUM(CAST({label} AS BIGINT)) AS np,
                   SUM(1 - CAST({label} AS BIGINT)) AS nn
            FROM ({scored_sql}) GROUP BY 1
        ),
        cum AS (
            SELECT np, nn,
                   COALESCE(SUM(nn) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_nn
            FROM per_score
        )
        SELECT SUM(np) AS n_pos, SUM(nn) AS n_neg,
               CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE)
                   / CAST(2 * SUM(np) * SUM(nn) AS DOUBLE) AS auc
        FROM cum
    """


class RougeScore(Pipe):
    """ROUGE-N between a candidate and a reference text column (Lin 2004)
    — the n-gram overlap metric summarization/RAG eval pipelines compute
    at corpus scale: clipped n-gram matches (each gram credits at most
    min(candidate, reference) multiplicity, the official ROUGE counting),
    precision, recall and F1 per row for every requested n.

    Shape (round-8): clipped counting is ROW-LOCAL, so the per-n
    integer facts (nc, nr, clip) come from one Arrow-batched pandas
    kernel over the shared tokenizer — no gram explode, no shuffle
    aggregate, no pivot, no join back (the previous exploded
    (row, n, gram) hash-aggregate shape shuffled the full gram stream;
    a pure higher-order-expression fold measured ~50x slower still).
    Every division / decimal rounding stays in Spark expressions over
    those integers, so scores are bit-identical to the oracle by
    construction. ``id_col`` must be unique per input row. Ratios are
    one IEEE division over integer counts, decimal-rounded — the DuckDB
    oracle reproduces every score bit-for-bit."""

    def __init__(
        self,
        cand_col: str = "cand_text",
        ref_col: str = "ref_text",
        id_col: str = "doc_id",
        ns=(1, 2),
        keep_counts: bool = False,
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.cand_col = cand_col
        self.ref_col = ref_col
        self.id_col = id_col
        self.ns = tuple(ns)
        # keep the per-n gram-count columns ({n}_nc/{n}_nr/{n}_clip) in
        # the output — subclasses (BLEU's brevity penalty needs the
        # unigram lengths) reuse them instead of re-tokenizing
        self.keep_counts = keep_counts

    @staticmethod
    def _ngrams(toks: Column, n: int) -> Column:
        if n == 1:
            return toks

        def gram(x, i):
            parts = [x]
            for d in range(1, n):
                parts.extend([F.lit(" "), F.element_at(toks, i + d + 1)])
            return F.concat(*parts)

        return F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            gram,
        )

    def _counts_udf(self):
        """Row-local clipped-count kernel (pandas UDF): per row, the
        per-n integer facts (nc, nr, clip) from two Python Counters over
        the SHARED tokenizer. The integers are exactly what the previous
        exploded (row, n, gram) hash aggregate summed (clip = Σ_g
        min(cc, rc) IS Counter intersection), and every division /
        decimal rounding stays in Spark expressions on those same
        integers — so scores are bit-identical by construction while the
        corpus-sized gram explode + shuffle aggregate + pivot disappear
        from the plan entirely (ROUGE/BLEU is row-local; nothing about
        it needs a shuffle). Measured at sf0.1 (min-of-3, warm): q181
        5.8 -> 1.76 s, q170 4.1 -> 1.08 s; plans collapse to one
        ArrowEvalPython with zero gram exchanges."""
        import re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType, StructField, StructType

        from warp_pipes_spark.text.analysis import (
            TOKEN_SPLIT_RE,
            ascii_lower_py,
        )

        ns = self.ns
        tok_re = re.compile(TOKEN_SPLIT_RE)
        schema = StructType(
            [
                StructField(f"{n}_{c}", LongType())
                for n in ns
                for c in ("nc", "nr", "clip")
            ]
        )
        cols = [f.name for f in schema.fields]

        def kernel(cands, refs):
            from collections import Counter

            def toks(t):
                if t is None:
                    return []
                return [x for x in tok_re.split(ascii_lower_py(t)) if x]

            rows = []
            for c, r in zip(cands, refs):
                ct, rt = toks(c), toks(r)
                row = []
                for n in ns:
                    cg = Counter(
                        " ".join(ct[i : i + n])
                        for i in range(len(ct) - n + 1)
                    )
                    rg = Counter(
                        " ".join(rt[i : i + n])
                        for i in range(len(rt) - n + 1)
                    )
                    clip = sum(min(v, rg[g]) for g, v in cg.items())
                    row += [sum(cg.values()), sum(rg.values()), clip]
                rows.append(row)
            return pd.DataFrame(rows, columns=cols, dtype="int64")

        kernel.__annotations__ = {
            "cands": pd.Series,
            "refs": pd.Series,
            "return": pd.DataFrame,
        }
        return pandas_udf(kernel, schema)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        dec = lambda c: c.cast("decimal(18,6)").cast("double")
        counts = self._counts_udf()(
            F.col(self.cand_col), F.col(self.ref_col)
        )
        out = df.withColumn("__cnt", counts)
        for n in self.ns:
            for c in ("nc", "nr", "clip"):
                out = out.withColumn(f"{n}_{c}", F.col(f"__cnt.{n}_{c}"))
        out = out.drop("__cnt")
        for n in self.ns:
            nc = F.coalesce(F.col(f"{n}_nc"), F.lit(0))
            nr = F.coalesce(F.col(f"{n}_nr"), F.lit(0))
            clip = F.coalesce(F.col(f"{n}_clip"), F.lit(0)).cast("double")
            p = F.when(nc > 0, clip / nc.cast("double")).otherwise(F.lit(0.0))
            r = F.when(nr > 0, clip / nr.cast("double")).otherwise(F.lit(0.0))
            out = out.withColumn(f"rouge{n}_p", dec(p)).withColumn(
                f"rouge{n}_r", dec(r)
            )
            pc, rc = F.col(f"rouge{n}_p"), F.col(f"rouge{n}_r")
            f1 = F.when(
                (pc + rc) > 0, F.lit(2.0) * pc * rc / (pc + rc)
            ).otherwise(F.lit(0.0))
            out = out.withColumn(f"rouge{n}_f1", dec(f1))
        if self.keep_counts:
            return out
        return out.drop(
            *[f"{n}_{c}" for n in self.ns for c in ("nc", "nr", "clip")]
        )


def rouge_sql(
    pairs_sql: str,
    cand: str = "cand_text",
    ref: str = "ref_text",
    ns=(1, 2),
    columns: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`RougeScore`: identical tokenization,
    n-gram construction, clipped counting and rounding."""
    from warp_pipes_spark.text.analysis import tokens_sql

    def grams_expr(toks: str, n: int) -> str:
        if n == 1:
            return toks
        joined = " || ' ' || ".join(f"({toks})[i + {d + 1}]" for d in range(n))
        return (
            f"list_transform(range(GREATEST(len({toks}) - {n - 1}, 0)), "
            f"i -> {joined})"
        )

    dec = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"
    sels = [columns]
    for n in ns:
        cg, rg = f"cg{n}", f"rg{n}"
        clip = (
            f"COALESCE(list_sum(list_transform(list_distinct({cg}), "
            f"g -> LEAST(len(list_filter({cg}, x -> x = g)), "
            f"len(list_filter({rg}, x -> x = g))))), 0)"
        )
        p = (
            f"CASE WHEN len({cg}) > 0 THEN CAST({clip} AS DOUBLE) / "
            f"CAST(len({cg}) AS DOUBLE) ELSE 0.0 END"
        )
        r = (
            f"CASE WHEN len({rg}) > 0 THEN CAST({clip} AS DOUBLE) / "
            f"CAST(len({rg}) AS DOUBLE) ELSE 0.0 END"
        )
        pd_, rd = dec(p), dec(r)
        f1 = (
            f"CASE WHEN ({pd_}) + ({rd}) > 0 "
            f"THEN 2.0 * ({pd_}) * ({rd}) / (({pd_}) + ({rd})) ELSE 0.0 END"
        )
        sels.append(f"{pd_} AS rouge{n}_p")
        sels.append(f"{rd} AS rouge{n}_r")
        sels.append(f"{dec(f1)} AS rouge{n}_f1")
    gram_cols = ", ".join(
        [columns]
        + [f"{grams_expr(tokens_sql(cand), n)} AS cg{n}" for n in ns]
        + [f"{grams_expr(tokens_sql(ref), n)} AS rg{n}" for n in ns]
    )
    return f"""
WITH pairs AS ({pairs_sql}),
gr AS (SELECT {gram_cols} FROM pairs)
SELECT {", ".join(sels)}
FROM gr
"""


class BleuScore(RougeScore):
    """Sentence-level BLEU-4 (Papineni et al. 2002) over candidate /
    reference pairs — the MT/generation eval companion to
    :class:`RougeScore`, and (applied to same-corpus pairs) the
    self-BLEU diversity probe of Zhu et al. 2018: modified n-gram
    precisions p_1..p_4 (clipped counting — the same exploded-aggregate
    clip as ROUGE), brevity penalty ``min(1, e^(1 - r/c))``, and
    ``BLEU = BP * exp(sum 1/4 ln p_n)`` (0 when any p_n is 0, the
    uns moothed definition).

    Float budget: each precision is one IEEE division decimal-rounded;
    the geometric mean takes one ln per n (decimal-rounded), an exact
    decimal weighted sum, one exp; BP adds one division and one exp —
    all shared-rounding deterministic, same exposure class as the
    engine's ln-based scores. Output columns: ``bleu``, ``bp``,
    ``p1..p4``."""

    def __init__(
        self,
        cand_col: str = "cand_text",
        ref_col: str = "ref_text",
        id_col: str = "doc_id",
        **kwargs,
    ):
        super().__init__(
            cand_col=cand_col,
            ref_col=ref_col,
            id_col=id_col,
            ns=(1, 2, 3, 4),
            keep_counts=True,
            **kwargs,
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        scored = super()._transform(df, **kwargs)
        dec = lambda c: c.cast("decimal(18,6)").cast("double")
        # the unigram gram counts ARE the token lengths — reuse them
        # (keep_counts=True) instead of re-tokenizing both text columns
        c_len = F.col("1_nc")
        r_len = F.col("1_nr")
        ps = [F.col(f"rouge{n}_p") for n in (1, 2, 3, 4)]
        any_zero = None
        for p in ps:
            z = p <= 0.0
            any_zero = z if any_zero is None else (any_zero | z)
        lnsum = None
        for p in ps:
            term = F.log(p).cast("decimal(18,6)") * F.lit(0.25).cast(
                "decimal(6,2)"
            )
            lnsum = term if lnsum is None else lnsum + term
        geo = F.exp(lnsum.cast("double"))
        bp = F.when(c_len >= r_len, F.lit(1.0)).otherwise(
            F.exp(
                F.lit(1.0)
                - r_len.cast("double") / c_len.cast("double")
            )
        )
        bp = F.when(c_len > 0, bp).otherwise(F.lit(0.0))
        bleu = F.when(any_zero | (c_len == 0), F.lit(0.0)).otherwise(
            dec(dec(bp) * dec(geo))
        )
        out = scored.withColumn("bp", dec(bp)).withColumn("bleu", bleu)
        renames = {f"rouge{n}_p": f"p{n}" for n in (1, 2, 3, 4)}
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out.drop(
            *[f"rouge{n}_r" for n in (1, 2, 3, 4)],
            *[f"rouge{n}_f1" for n in (1, 2, 3, 4)],
            *[f"{n}_{c}" for n in (1, 2, 3, 4) for c in ("nc", "nr", "clip")],
        )


def bleu_sql(
    pairs_sql: str,
    cand: str = "cand_text",
    ref: str = "ref_text",
    columns: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`BleuScore`: the rouge_sql precisions
    plus the identical BP / geometric-mean algebra."""
    from warp_pipes_spark.text.analysis import tokens_sql

    inner = rouge_sql(pairs_sql, cand=cand, ref=ref, ns=(1, 2, 3, 4),
                      columns=columns)
    key0 = columns.split(",")[0].strip()
    lens = (
        f"SELECT {key0}, len({tokens_sql(cand)}) AS c_len, "
        f"len({tokens_sql(ref)}) AS r_len FROM ({pairs_sql}) t"
    )
    dec = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"
    lnsum = " + ".join(
        f"CAST(ln(rouge{n}_p) AS DECIMAL(18,6)) * CAST(0.25 AS DECIMAL(6,2))"
        for n in (1, 2, 3, 4)
    )
    any_zero = " OR ".join(f"rouge{n}_p <= 0.0" for n in (1, 2, 3, 4))
    bp = (
        "CASE WHEN c_len = 0 THEN 0.0 "
        "WHEN c_len >= r_len THEN 1.0 "
        "ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)) END"
    )
    key_cols = columns
    return f"""
WITH pr AS ({inner}),
ln_ AS ({lens}),
j AS (SELECT pr.*, ln_.c_len, ln_.r_len FROM pr JOIN ln_ USING ({key0}))
SELECT {key_cols},
       rouge1_p AS p1, rouge2_p AS p2, rouge3_p AS p3, rouge4_p AS p4,
       {dec(bp)} AS bp,
       CASE WHEN {any_zero} OR c_len = 0 THEN 0.0
            ELSE {dec(f"{dec(bp)} * {dec(f'exp(CAST(({lnsum}) AS DOUBLE))')}")}
       END AS bleu
FROM j
"""


# ---------------------------------------------------------------------------
# calibration (reliability diagram + ECE)
# ---------------------------------------------------------------------------


class CalibrationReport(Pipe):
    """Reliability diagram + Expected Calibration Error for a scored,
    binary-labeled frame — the evaluation AUC (q123) cannot give: AUC
    only ranks; a gate that THRESHOLDS scores (every quality-classifier
    pipeline) needs the scores to MEAN something. Guo et al. 2017's
    equal-width-bin ECE over ``n_bins`` bins framed by the global score
    min/max.

    Exact cross-engine algebra: scores round through DECIMAL(18,6) into
    scaled longs (frame, binning and sums all exact integers); per-bin
    ``frac_pos``, ``mean_score`` and ``|gap|`` are each ONE IEEE division
    of exact integers, and ECE folds the per-bin absolute gaps as the
    exact integer ``sum_b |pos_b * 1e6 - ssum_b|`` over ONE division by
    ``1e6 * N`` — no rounded products anywhere, so no decimal-tie risk
    (the PSI lesson).

    Scale shape: one scan-level projection, a 2-row frame aggregate, one
    map-side-combined groupBy onto ``n_bins`` keys, and a bins-sized
    window for the ECE constant. Nothing row-sized after the first
    aggregation."""

    def __init__(
        self,
        score_col: str = "score",
        label_col: str = "label",
        n_bins: int = 10,
        **kwargs,
    ):
        if n_bins < 2:
            raise ValueError(f"n_bins must be >= 2, got {n_bins}")
        super().__init__(**kwargs)
        self.score_col = score_col
        self.label_col = label_col
        self.n_bins = n_bins

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        B = self.n_bins
        s6 = (
            (F.col(self.score_col).cast("double").cast("decimal(18,6)") * 1000000)
            .cast("long")
        )
        rows = df.where(
            F.col(self.score_col).isNotNull() & F.col(self.label_col).isNotNull()
        ).select(s6.alias("v"), F.col(self.label_col).cast("long").alias("y"))
        frame = rows.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
        raw = F.expr(f"(v - vmin) * {B} div (vmax - vmin)")
        bin_ = (
            F.when(
                F.col("vmax") > F.col("vmin"),
                F.greatest(F.lit(0), F.least(raw, F.lit(B - 1))),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        per_bin = (
            rows.crossJoin(F.broadcast(frame))
            .select(bin_.alias("bin"), "v", "y")
            .groupBy("bin")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("y").alias("pos"),
                F.sum("v").alias("ssum"),
            )
        )
        w = Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        gap_num = F.abs(F.col("pos") * 1000000 - F.col("ssum"))
        dec6 = lambda c: c.cast("decimal(18,6)").cast("double")
        return (
            per_bin.withColumn("__N", F.sum("n").over(w))
            .withColumn("__G", F.sum(gap_num).over(w))
            .select(
                "bin",
                F.col("n").cast("long").alias("n"),
                dec6(
                    F.col("pos").cast("double") / F.col("n").cast("double")
                ).alias("frac_pos"),
                dec6(
                    F.col("ssum").cast("double")
                    / (F.col("n") * 1000000).cast("double")
                ).alias("mean_score"),
                dec6(
                    gap_num.cast("double")
                    / (F.col("n") * 1000000).cast("double")
                ).alias("gap"),
                dec6(
                    F.col("__G").cast("double")
                    / (F.col("__N") * 1000000).cast("double")
                ).alias("ece"),
            )
        )


def calibration_report_sql(
    scored_sql: str,
    score: str = "score",
    label: str = "label",
    n_bins: int = 10,
) -> str:
    """DuckDB oracle for :class:`CalibrationReport`: identical scaled
    longs, framing, integer binning and exact gap algebra."""
    B = n_bins
    return f"""
WITH rows_ AS (
  SELECT CAST(CAST(CAST({score} AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
         CAST({label} AS BIGINT) AS y
  FROM ({scored_sql}) t
  WHERE {score} IS NOT NULL AND {label} IS NOT NULL
),
frame AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM rows_),
binned AS (
  SELECT CASE WHEN f.vmax > f.vmin
              THEN GREATEST(0, LEAST(((r.v - f.vmin) * {B}) // (f.vmax - f.vmin), {B - 1}))
              ELSE 0 END AS bin,
         r.v, r.y
  FROM rows_ r CROSS JOIN frame f
),
per_bin AS (
  SELECT bin, COUNT(*) AS n, SUM(y) AS pos, SUM(v) AS ssum
  FROM binned GROUP BY 1
),
tot AS (SELECT SUM(n) AS nn, SUM(ABS(pos * 1000000 - ssum)) AS gg FROM per_bin)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
       CAST(CAST(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS frac_pos,
       CAST(CAST(CAST(ssum AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS mean_score,
       CAST(CAST(CAST(ABS(pos * 1000000 - ssum) AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS gap,
       CAST(CAST(CAST(gg AS DOUBLE) / CAST(nn * 1000000 AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE) AS ece
FROM per_bin CROSS JOIN tot
ORDER BY bin
"""


def _poisson1_thresholds(cap: int = 7) -> list:
    """CDF of Poisson(lambda=1) at j = 0..cap-1, as plain double literals.
    Computed once in Python and embedded IDENTICALLY into the Spark plan
    and the DuckDB oracle, so the inverse-CDF draw compares the same u
    against the same constants on both engines."""
    import math

    e1 = math.exp(-1.0)
    out, term, acc = [], e1, 0.0
    for j in range(cap):
        acc += term
        out.append(acc)
        term /= j + 1
    return out


class BootstrapCI(Pipe):
    """Percentile-bootstrap confidence interval for a corpus mean in ONE
    scan — the deterministic Poisson multiplier bootstrap (online
    bootstrap, Oza & Russell 2001; the resample-free regime of Kleiner et
    al.'s Bag of Little Bootstraps): replica b reweights every row by
    w = Poisson_1^{-1}(u) with u the row's md5 uniform (the engine's
    keyed-gate family, ``pipes/sampling.py``) salted by b — E[w] = 1, so
    each replica is a with-replacement resample in expectation, and the
    draw is reproducible across engines, partitionings and reruns.

    ``value_col`` must be INTEGRAL (token counts, byte sizes, 0/1 flags):
    replica sums then stay exact BIGINTs and each replica mean is a
    single IEEE division rounded through DECIMAL(18,6), making the order
    statistics engine-independent. Output is one row: the full-corpus
    mean, the (lo_rank, hi_rank) order statistics of the replica means
    (defaults: 2nd and 63rd of B=64, a ~95% percentile interval), and
    the replica standard error.

    Scale shape: a B-way row-local fan-out into a B-group aggregation —
    no shuffle wider than B rows ever leaves the scan stage. At 100 TB
    this is THE way to put error bars on corpus metrics without a
    second pass.

    Reference anchor: extension of the eval-metrics family
    (``ml/metrics.py`` AUC/NDCG/ECE)."""

    def __init__(
        self,
        value_col: str,
        key_col: str = "doc_id",
        n_replicas: int = 64,
        lo_rank: int = 2,
        hi_rank: int = 63,
        seed: int = 17,
        w_cap: int = 7,
        **kwargs,
    ):
        if not 1 <= lo_rank < hi_rank <= n_replicas:
            raise ValueError("need 1 <= lo_rank < hi_rank <= n_replicas")
        super().__init__(**kwargs)
        self.value_col = value_col
        self.key_col = key_col
        self.n_replicas = n_replicas
        self.lo_rank = lo_rank
        self.hi_rank = hi_rank
        self.seed = seed
        self.w_cap = w_cap

    def _weight_expr(self, u):
        ts = _poisson1_thresholds(self.w_cap)
        w = F.lit(self.w_cap)
        for j in range(self.w_cap - 1, -1, -1):
            w = F.when(u < F.lit(ts[j]), F.lit(j)).otherwise(w)
        return w

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        B = self.n_replicas
        rows = df.select(
            F.col(self.key_col).cast("string").alias("__k"),
            F.col(self.value_col).cast("long").alias("__x"),
        )
        full = rows.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__x").alias("__sx"),
        ).select(
            "n_docs",
            (F.col("__sx") / F.col("n_docs").cast("double")).alias("mean"),
        )
        fan = rows.select(
            "__k", "__x", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b")
        )
        h48 = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("__k"),
                        F.lit(f":{self.seed}:"),
                        F.col("__b").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        u = (h48 + 1).cast("double") / F.lit(float(1 << 48))
        w = self._weight_expr(u)
        reps = (
            fan.select("__b", (w * F.col("__x")).alias("__wx"), w.alias("__w"))
            .groupBy("__b")
            .agg(F.sum("__wx").alias("__swx"), F.sum("__w").alias("__sw"))
            .select(
                "__b",
                (F.col("__swx") / F.col("__sw").cast("double"))
                .cast("decimal(18,6)")
                .alias("__m"),
            )
        )
        wnd = Window.orderBy(F.asc("__m"), F.asc("__b"))
        ranked = reps.withColumn("__r", F.row_number().over(wnd))
        lo = ranked.filter(F.col("__r") == self.lo_rank).select(
            F.col("__m").cast("double").alias("boot_lo")
        )
        hi = ranked.filter(F.col("__r") == self.hi_rank).select(
            F.col("__m").cast("double").alias("boot_hi")
        )
        # replica SE from EXACT centered integer moments (variance is
        # translation-invariant): micro-unit means minus their minimum stay
        # small enough that B*sum(c^2) fits a BIGINT, so the only IEEE ops
        # are one division, one sqrt, one /1e6 — a wide-DECIMAL -> double
        # cast here is NOT engine-stable (DuckDB converts via double
        # arithmetic; found live at B=128)
        m6 = reps.select(
            (F.col("__m") * 1000000).cast("long").alias("__m6")
        )
        mn = m6.agg(F.min("__m6").alias("__mn"))
        mstats = (
            m6.crossJoin(F.broadcast(mn))
            .select((F.col("__m6") - F.col("__mn")).alias("__c"))
            .agg(
                F.sum("__c").alias("__sc"),
                F.sum(F.col("__c") * F.col("__c")).alias("__sc2"),
            )
            .select(
                (
                    F.sqrt(
                        F.greatest(
                            (
                                F.lit(B) * F.col("__sc2")
                                - F.col("__sc") * F.col("__sc")
                            ).cast("double")
                            / F.lit(float(B * (B - 1))),
                            F.lit(0.0),
                        )
                    )
                    / F.lit(1000000.0)
                ).alias("boot_se")
            )
        )
        return (
            full.crossJoin(F.broadcast(lo))
            .crossJoin(F.broadcast(hi))
            .crossJoin(F.broadcast(mstats))
            .select(
                F.col("n_docs").cast("long").alias("n_docs"),
                F.lit(B).cast("int").alias("n_replicas"),
                "mean",
                "boot_lo",
                "boot_hi",
                "boot_se",
            )
        )


def bootstrap_ci_sql(
    table_sql: str,
    value_expr: str,
    key: str = "doc_id",
    n_replicas: int = 64,
    lo_rank: int = 2,
    hi_rank: int = 63,
    seed: int = 17,
    w_cap: int = 7,
) -> str:
    """DuckDB oracle for :class:`BootstrapCI` — identical md5 uniforms,
    identical Poisson(1) inverse-CDF literals, identical rounding and
    order statistics. ``table_sql`` must yield (``key``, a column the
    ``value_expr`` evaluates over)."""
    ts = _poisson1_thresholds(w_cap)
    B = n_replicas
    h48 = (
        f"('0x' || substring(md5(CAST({key} AS VARCHAR) || ':{seed}:' || "
        f"CAST(b AS VARCHAR)), 1, 12))::BIGINT"
    )
    u = f"(CAST({h48} + 1 AS DOUBLE) / {float(1 << 48)!r})"
    w_case = "CASE " + " ".join(
        f"WHEN {u} < {ts[j]!r} THEN {j}" for j in range(w_cap)
    ) + f" ELSE {w_cap} END"
    return f"""
WITH rows_ AS (
  SELECT {key} AS k, CAST({value_expr} AS BIGINT) AS x FROM ({table_sql}) t
),
full_ AS (
  SELECT COUNT(*) AS n_docs, SUM(x) / CAST(COUNT(*) AS DOUBLE) AS mean
  FROM rows_
),
fan AS (
  SELECT k AS {key}, x, b
  FROM rows_ CROSS JOIN (SELECT unnest(generate_series(0, {B - 1})) AS b) g
),
reps AS (
  SELECT b,
         CAST(SUM(({w_case}) * x) / CAST(SUM({w_case}) AS DOUBLE)
              AS DECIMAL(18,6)) AS m
  FROM fan GROUP BY b
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS r FROM reps
),
m6 AS (
  SELECT CAST(m * 1000000 AS BIGINT) AS m6 FROM reps
),
centered AS (
  SELECT m6 - (SELECT MIN(m6) FROM m6) AS c FROM m6
),
mstats AS (
  SELECT sqrt(GREATEST(
           CAST({B} * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
           / {float(B * (B - 1))!r}, 0.0)) / 1000000.0 AS boot_se
  FROM centered
)
SELECT CAST(f.n_docs AS BIGINT) AS n_docs,
       CAST({B} AS INT) AS n_replicas,
       f.mean,
       CAST((SELECT m FROM ranked WHERE r = {lo_rank}) AS DOUBLE) AS boot_lo,
       CAST((SELECT m FROM ranked WHERE r = {hi_rank}) AS DOUBLE) AS boot_hi,
       s.boot_se
FROM full_ f CROSS JOIN mstats s
"""


class ConfusionPanel(Pipe):
    """Multi-class confusion report: one row per class appearing in the
    truth or prediction column — support, predicted count, hits,
    precision, recall, F1 — the audit a heuristic classifier (langid,
    quality gate, dedup verdict) gets before its threshold ships.

    Exactness: counts are exact BIGINTs; precision = c/p and
    recall = c/t are single IEEE divisions rounded once, and F1 uses
    the harmonic-mean identity F1 = 2c/(t+p) — ONE division of exact
    integers instead of the 2PR/(P+R) float chain, so there is no
    compounding. Classes with t = 0 (never true) report NULL recall;
    p = 0 likewise NULL precision; F1 is 0 when c = 0.

    Scale shape: one scan to (true, pred) pairs, three class-sized
    aggregations, one class-keyed outer join — nothing corpus-sized
    past the first groupBy."""

    def __init__(self, true_col: str, pred_col: str, **kwargs):
        super().__init__(**kwargs)
        self.true_col = true_col
        self.pred_col = pred_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        pairs = df.select(
            F.col(self.true_col).alias("t"), F.col(self.pred_col).alias("p")
        )
        truth = pairs.groupBy(F.col("t").alias("cls")).agg(
            F.count(F.lit(1)).alias("n_true")
        )
        pred = pairs.groupBy(F.col("p").alias("cls")).agg(
            F.count(F.lit(1)).alias("n_pred")
        )
        hits = (
            pairs.filter(F.col("t") == F.col("p"))
            .groupBy(F.col("t").alias("cls"))
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        out = (
            truth.join(pred, "cls", "full_outer")
            .join(hits, "cls", "left")
            .na.fill({"n_true": 0, "n_pred": 0, "n_hit": 0})
        )
        prec = F.when(
            F.col("n_pred") > 0,
            (F.col("n_hit").cast("double") / F.col("n_pred").cast("double"))
            .cast(D)
            .cast("double"),
        )
        rec = F.when(
            F.col("n_true") > 0,
            (F.col("n_hit").cast("double") / F.col("n_true").cast("double"))
            .cast(D)
            .cast("double"),
        )
        f1 = F.when(
            F.col("n_true") + F.col("n_pred") > 0,
            (
                (2 * F.col("n_hit")).cast("double")
                / (F.col("n_true") + F.col("n_pred")).cast("double")
            )
            .cast(D)
            .cast("double"),
        )
        return out.select(
            "cls",
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("n_hit").cast("long").alias("n_hit"),
            prec.alias("precision"),
            rec.alias("recall"),
            f1.alias("f1"),
        ).orderBy("cls")


def confusion_panel_sql(table: str, true_col: str, pred_col: str) -> str:
    """DuckDB oracle for :class:`ConfusionPanel` — identical exact counts
    and single rounded divisions (F1 via the 2c/(t+p) identity)."""
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT {true_col} AS t, {pred_col} AS p FROM {table}
),
truth AS (SELECT t AS cls, COUNT(*) AS n_true FROM pairs GROUP BY 1),
pred AS (SELECT p AS cls, COUNT(*) AS n_pred FROM pairs GROUP BY 1),
hits AS (SELECT t AS cls, COUNT(*) AS n_hit FROM pairs WHERE t = p GROUP BY 1)
SELECT cls,
       CAST(COALESCE(n_true, 0) AS BIGINT) AS n_true,
       CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
       CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       CASE WHEN COALESCE(n_pred, 0) > 0
            THEN CAST(CAST(CAST(COALESCE(n_hit, 0) AS DOUBLE)
                           / CAST(n_pred AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) END AS precision,
       CASE WHEN COALESCE(n_true, 0) > 0
            THEN CAST(CAST(CAST(COALESCE(n_hit, 0) AS DOUBLE)
                           / CAST(n_true AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) END AS recall,
       CASE WHEN COALESCE(n_true, 0) + COALESCE(n_pred, 0) > 0
            THEN CAST(CAST(CAST(2 * COALESCE(n_hit, 0) AS DOUBLE)
                           / CAST(COALESCE(n_true, 0) + COALESCE(n_pred, 0)
                                  AS DOUBLE)
                 AS DECIMAL(18,6)) AS DOUBLE) END AS f1
FROM truth FULL OUTER JOIN pred USING (cls) LEFT JOIN hits USING (cls)
ORDER BY cls
"""


class WilsonRates(Pipe):
    """Per-group pass-rate with 95% Wilson score interval (Wilson 1927;
    Brown, Cai & DasGupta 2001 recommend it over the Wald interval at
    any n) — the error bars a curation dashboard should print next to
    every per-source keep-rate instead of the bare ratio: at n=30 a
    "90% keep rate" spans [74%, 97%], which changes decisions.

    Exactness: k and n are exact BIGINTs; the Wilson endpoints are a
    FIXED chain of IEEE ops (divisions, one correctly rounded sqrt) on
    doubles derived from those integers — both engines evaluate the
    textual formula in the same operand order, and each output rounds
    once through DECIMAL(18,6). z rides as z² = 1.96*1.96 evaluated in
    IEEE on both sides (never a pre-rounded 3.8416 literal).

    Scale: one scan, one group-sized aggregation. Nothing else."""

    def __init__(self, flag_col: str, group_col: str = "source", **kwargs):
        super().__init__(**kwargs)
        self.flag_col = flag_col
        self.group_col = group_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        agg = df.groupBy(F.col(self.group_col).alias("grp")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col(self.flag_col), 1).otherwise(0)
            ).alias("k"),
        )
        nd = F.col("n").cast("double")
        p = F.col("k").cast("double") / nd
        z2 = F.lit(1.96) * F.lit(1.96)
        denom = F.lit(1.0) + z2 / nd
        center = p + z2 / (F.lit(2.0) * nd)
        half = F.lit(1.96) * F.sqrt(
            p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * (nd * nd))
        )
        return agg.select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("n_pass"),
            p.cast(D).cast("double").alias("rate"),
            ((center - half) / denom).cast(D).cast("double").alias(
                "wilson_low"
            ),
            ((center + half) / denom).cast(D).cast("double").alias(
                "wilson_high"
            ),
        )


def wilson_rates_sql(table: str, flag: str, group: str = "source") -> str:
    """DuckDB oracle for :class:`WilsonRates` — the identical IEEE
    expression chain over identical exact integers."""
    return f"""
WITH agg AS MATERIALIZED (
  SELECT {group} AS grp, COUNT(*) AS n,
         SUM(CASE WHEN {flag} THEN 1 ELSE 0 END) AS k
  FROM {table} GROUP BY 1
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       CAST(k AS BIGINT) AS n_pass,
       CAST(CAST(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS rate,
       CAST(CAST(
         ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           + (1.96*1.96) / (2.0 * CAST(n AS DOUBLE)))
          - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + (1.96*1.96)
                          / (4.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))))
         / (1.0 + (1.96*1.96) / CAST(n AS DOUBLE))
       AS DECIMAL(18,6)) AS DOUBLE) AS wilson_low,
       CAST(CAST(
         ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
           + (1.96*1.96) / (2.0 * CAST(n AS DOUBLE)))
          + 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)
                        + (1.96*1.96)
                          / (4.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))))
         / (1.0 + (1.96*1.96) / CAST(n AS DOUBLE))
       AS DECIMAL(18,6)) AS DOUBLE) AS wilson_high
FROM agg
"""


class SpearmanPanel(Pipe):
    """Per-group Spearman rank-correlation panel over every pair of the
    given numeric feature columns (Spearman 1904; tie handling via
    midranks, i.e. Pearson on average ranks — Kendall 1948's standard
    correction). The feature-redundancy report a curation team reads
    before weighting quality signals into a composite: two features
    with rho ~ 1 are one signal counted twice, rho ~ 0 justifies
    keeping both (q218's composite averages three such proxies).

    Midranks WITHOUT a corpus-sized single-partition window: per
    feature, rows group to a (group, value, count) table (bounded by
    value cardinality), a window over DISTINCT VALUES cumulates the
    count of strictly-smaller values, and 2x-midrank joins back —
    mr2(v) = 2*cum_lt(v) + c(v) + 1, an exact BIGINT (twice the
    average of the tied rank positions). The ECDF-join pattern shared
    with CurriculumReport/BinaryAuc.

    Exactness: all five sums (S_x, S_y, S_xy, S_xx, S_yy) accumulate
    BIGINT mr2 products into DECIMAL(38,0) — exact at any scale that
    fits 38 digits (n up to ~1e9 rows per group). rho = (n*S_xy -
    S_x*S_y) / (sqrt(n*S_xx - S_x^2) * sqrt(n*S_yy - S_y^2)) evaluates
    the two sqrts SEPARATELY in IEEE double (mirrored verbatim in the
    oracle), one division, rounded once to DECIMAL(18,6). Constant
    features (zero variance) report NULL.

    Scale shape: one scan per feature for the value-count tables, the
    joins back are value-cardinality-sized (AQE picks broadcast when
    small), one final per-group rollup. No row-count-sized window or
    sort anywhere."""

    def __init__(
        self,
        cols: list,
        group_col: str = "source",
        **kwargs,
    ):
        super().__init__(**kwargs)
        if len(cols) < 2:
            raise ValueError("SpearmanPanel needs at least two columns")
        self.cols = list(cols)
        self.group_col = group_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        BIG = "decimal(38,0)"
        cond = F.lit(True)
        for c in self.cols:
            cond = cond & F.col(c).isNotNull()
        out = df.filter(cond).select(
            F.col(self.group_col).alias("grp"), *self.cols
        )
        base = out
        for c in self.cols:
            # value-count tables all derive from the BASE frame (joining
            # from the running `out` would nest every prior ecdf join into
            # each subsequent count's lineage — same rows, 3x the plan)
            cnts = base.groupBy("grp", c).agg(F.count(F.lit(1)).alias("__c"))
            w = (
                Window.partitionBy("grp")
                .orderBy(F.asc(c))
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            ecdf = cnts.select(
                "grp",
                c,
                (
                    F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                    + F.col("__c")
                    + F.lit(1)
                ).alias(f"__mr2_{c}"),
            )
            out = out.join(ecdf, ["grp", c])
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in self.cols:
            m = F.col(f"__mr2_{c}")
            aggs.append(F.sum(m.cast(BIG)).alias(f"s_{c}"))
            aggs.append(F.sum((m * m).cast(BIG)).alias(f"ss_{c}"))
        for i, a in enumerate(self.cols):
            for b in self.cols[i + 1 :]:
                aggs.append(
                    F.sum(
                        (F.col(f"__mr2_{a}") * F.col(f"__mr2_{b}")).cast(BIG)
                    ).alias(f"sp_{a}_{b}")
                )
        g = out.groupBy("grp").agg(*aggs)

        def var(c):
            return (
                F.col("n").cast(BIG) * F.col(f"ss_{c}")
                - F.col(f"s_{c}") * F.col(f"s_{c}")
            ).cast("double")

        # one row per pair via a row-local explode of per-pair structs —
        # NOT a union of per-pair selects, which would re-derive the whole
        # upstream pipeline once per pair (3 pairs = 3x the scans/joins)
        pair_structs = []
        for i, a in enumerate(self.cols):
            for b in self.cols[i + 1 :]:
                num = (
                    F.col("n").cast(BIG) * F.col(f"sp_{a}_{b}")
                    - F.col(f"s_{a}") * F.col(f"s_{b}")
                ).cast("double")
                den = F.sqrt(var(a)) * F.sqrt(var(b))
                rho = F.when(den > 0, (num / den).cast(D).cast("double"))
                pair_structs.append(
                    F.struct(
                        F.lit(a).alias("feat_x"),
                        F.lit(b).alias("feat_y"),
                        rho.alias("rho"),
                    )
                )
        return g.select(
            F.col("grp").alias(self.group_col),
            F.col("n").cast("long").alias("n"),
            F.explode(F.array(*pair_structs)).alias("__p"),
        ).select(
            self.group_col,
            F.col("__p.feat_x").alias("feat_x"),
            F.col("__p.feat_y").alias("feat_y"),
            "n",
            F.col("__p.rho").alias("rho_spearman"),
        )


def spearman_panel_sql(
    table: str, cols: list, group: str = "source"
) -> str:
    """DuckDB oracle for :class:`SpearmanPanel` — identical midrank
    algebra (exact DECIMAL(38,0) sums, two separate sqrts, one rounded
    division). ``table`` is a table name or parenthesized subquery
    exposing ``group`` and every column in ``cols``."""
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    ctes = [
        f"feats AS MATERIALIZED (SELECT {group} AS grp, "
        + ", ".join(cols)
        + f" FROM {table} WHERE {notnull})"
    ]
    joined = "feats"
    for c in cols:
        ctes.append(
            f"ecdf_{c} AS (SELECT grp, {c}, 2 * COALESCE(SUM(__c) OVER ("
            f"PARTITION BY grp ORDER BY {c} ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND 1 PRECEDING), 0) + __c + 1 AS __mr2_{c} "
            f"FROM (SELECT grp, {c}, COUNT(*) AS __c FROM feats "
            f"GROUP BY 1, 2))"
        )
        joined = f"{joined} JOIN ecdf_{c} USING (grp, {c})"
    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums.append(f"SUM(CAST(__mr2_{c} AS DECIMAL(38,0))) AS s_{c}")
        sums.append(
            f"SUM(CAST(__mr2_{c} * __mr2_{c} AS DECIMAL(38,0))) AS ss_{c}"
        )
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pairs.append((a, b))
            sums.append(
                f"SUM(CAST(__mr2_{a} * __mr2_{b} AS DECIMAL(38,0)))"
                f" AS sp_{a}_{b}"
            )
    ctes.append(
        "g AS (SELECT grp, "
        + ", ".join(sums)
        + f" FROM {joined} GROUP BY grp)"
    )

    def var(c):
        return (
            f"CAST(CAST(n AS DECIMAL(38,0)) * ss_{c} - s_{c} * s_{c}"
            " AS DOUBLE)"
        )

    selects = []
    for a, b in pairs:
        num = (
            f"CAST(CAST(n AS DECIMAL(38,0)) * sp_{a}_{b} - s_{a} * s_{b}"
            " AS DOUBLE)"
        )
        den = f"(sqrt({var(a)}) * sqrt({var(b)}))"
        selects.append(
            f"SELECT grp AS {group}, '{a}' AS feat_x, '{b}' AS feat_y, "
            f"CAST(n AS BIGINT) AS n, CASE WHEN {den} > 0 THEN "
            f"CAST(CAST({num} / {den} AS DECIMAL(18,6)) AS DOUBLE) END "
            f"AS rho_spearman FROM g"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def _rbo_weights(k: int, p: float) -> list:
    """Per-doc truncated-RBO weight table: a doc first common at depth
    m = max(rank_a, rank_b) contributes W(m) = (1-p) * sum_{d=m..k}
    p^(d-1)/d. Each weight is HALF-UP-rounded to 6 decimals in Python
    and shipped to BOTH engines as the same literal, so the per-query
    RBO is an exact DECIMAL(18,6) sum of shared constants — no
    cross-engine pow/libm exposure at all."""
    from decimal import ROUND_HALF_UP, Decimal

    out = []
    for m in range(1, k + 1):
        w = (1.0 - p) * sum(p ** (d - 1) / d for d in range(m, k + 1))
        out.append(
            float(
                Decimal(repr(w)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        )
    return out


class RboAgreement(Pipe):
    """Per-query Rank-Biased Overlap at depth ``k`` (Webber, Moffat &
    Zobel 2010) between this ranking (the input frame) and ``other`` —
    the top-weighted companion to q219's Kendall-tau panel: tau treats
    every common pair equally, RBO geometrically discounts depth with
    persistence ``p``, which is what an A/B between retrieval engines
    actually cares about (agreement at rank 1 matters more than at
    rank 10).

    Computation: truncated RBO decomposes per common doc — a doc whose
    later first-appearance is depth m adds W(m) = (1-p) sum_{d=m..k}
    p^(d-1)/d (it is inside both prefixes for every d >= m). W is a
    k-entry literal table precomputed in Python (see
    :func:`_rbo_weights`), so the per-query score is an exact decimal
    sum of shared constants — fully oracled with zero floating-point
    order exposure. Queries present in this ranking but sharing no
    top-k docs with ``other`` report rbo = 0.

    Scale shape: two k x |Q| rank tables equi-join on (query, doc);
    everything downstream is |common|-sized. Composes with the results
    cache (``search/cached.py``), so the panel's marginal cost over
    already-run engines is one join.

    Reference anchor: eval-metrics family extension
    (``ml/metrics.py`` AUC/NDCG/MRR)."""

    def __init__(
        self,
        other: DataFrame,
        k: int = 10,
        p: float = 0.9,
        query_col: str = "query_id",
        id_col: str = "idx",
        rank_col: str = "rank",
        **kwargs,
    ):
        if not 0.0 < p < 1.0:
            raise ValueError(f"p must be in (0, 1), got {p}")
        super().__init__(**kwargs)
        self.other = other
        self.k = k
        self.p = p
        self.query_col = query_col
        self.id_col = id_col
        self.rank_col = rank_col

    _no_fingerprint = ("other",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        q, i, r = self.query_col, self.id_col, self.rank_col
        a = df.filter(F.col(r) <= self.k).select(
            F.col(q).alias("query_id"),
            F.col(i).alias("idx"),
            F.col(r).alias("ra"),
        )
        b = self.other.filter(F.col(r) <= self.k).select(
            F.col(q).alias("query_id"),
            F.col(i).alias("idx"),
            F.col(r).alias("rb"),
        )
        weights = _rbo_weights(self.k, self.p)
        warr = F.array(*[F.lit(w) for w in weights])
        common = a.join(b, ["query_id", "idx"]).select(
            "query_id",
            F.greatest(F.col("ra"), F.col("rb")).cast("int").alias("m"),
        )
        agg = common.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.element_at(warr, F.col("m")).cast(D)).alias("rbo_dec"),
        )
        qs = a.select("query_id").distinct()
        return qs.join(agg, "query_id", "left").select(
            "query_id",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias(
                "n_common"
            ),
            F.coalesce(F.col("rbo_dec"), F.lit(0).cast(D))
            .cast("double")
            .alias("rbo"),
        )


def rbo_sql(
    a_sql: str,
    b_sql: str,
    k: int = 10,
    p: float = 0.9,
    query: str = "query_id",
    id_col: str = "idx",
    rank: str = "rank",
) -> str:
    """DuckDB oracle for :class:`RboAgreement` — the identical literal
    weight table indexed by the identical max-rank depth."""
    from warp_pipes_spark.ml.metrics import _rbo_weights

    weights = ", ".join(repr(w) for w in _rbo_weights(k, p))
    return f"""
WITH ar AS MATERIALIZED (
  SELECT {query} AS query_id, {id_col} AS idx, {rank} AS ra
  FROM ({a_sql}) t WHERE {rank} <= {k}
),
br AS MATERIALIZED (
  SELECT {query} AS query_id, {id_col} AS idx, {rank} AS rb
  FROM ({b_sql}) t WHERE {rank} <= {k}
),
common AS (
  SELECT a.query_id, CAST(GREATEST(a.ra, b.rb) AS INT) AS m
  FROM ar a JOIN br b USING (query_id, idx)
),
agg AS (
  SELECT query_id, COUNT(*) AS n_common,
         SUM(CAST(([{weights}])[m] AS DECIMAL(18,6))) AS rbo_dec
  FROM common GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM ar)
SELECT q.query_id,
       CAST(COALESCE(a.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(a.rbo_dec, CAST(0 AS DECIMAL(18,6))) AS DOUBLE)
         AS rbo
FROM qs q LEFT JOIN agg a USING (query_id)
"""

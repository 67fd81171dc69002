"""Data-quality validation operators (profile + constraint checks).

Extensions beyond the reference (north-star additions): a 100 TB ingest
pipeline needs machine-checkable data quality gates *inside* the engine —
per-column profiles (completeness, cardinality, extremes) and declarative
constraint checks (rule -> violation count) that run as ONE aggregation pass
over the data, not a per-rule scan.

Scale shape: ``DataProfile`` and ``CheckConstraints`` each compile to a
single global aggregate — every statistic is an agg expression evaluated in
the same whole-stage-codegen pass, so profiling N columns or checking N
rules costs one scan + a 1-row reduce regardless of N. Exact
``count_distinct`` over many columns expands rows on a cluster (Spark's
Expand operator multiplies input by the distinct-agg count); at data sizes
where that matters pass ``approx=True`` to switch to HyperLogLog
``approx_count_distinct`` (constant memory, no expand) — the exact mode is
the DuckDB-oracle path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class DataProfile(Pipe):
    """Long-form per-column profile: one output row per profiled column with
    ``(column, n, n_null, n_distinct, min_num, max_num, min_str, max_str)``.
    Numeric columns fill ``min_num``/``max_num`` (exact data values — no
    arithmetic, so cross-engine bit parity is free); string columns fill the
    lexicographic ``min_str``/``max_str``.
    """

    def __init__(
        self,
        numeric_cols: Sequence[str] = (),
        string_cols: Sequence[str] = (),
        approx: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.numeric_cols = list(numeric_cols)
        self.string_cols = list(string_cols)
        self.approx = approx

    def _distinct(self, c: str) -> Column:
        if self.approx:
            return F.approx_count_distinct(c).cast("long")
        return F.count_distinct(F.col(c)).cast("long")

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        aggs: List[Column] = [F.count(F.lit(1)).alias("__n")]
        for c in self.numeric_cols + self.string_cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__null_{c}")
            )
            aggs.append(self._distinct(c).alias(f"__dist_{c}"))
        for c in self.numeric_cols:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
        for c in self.string_cols:
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
        row = df.agg(*aggs)

        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        entries = []
        for c in self.numeric_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_num"),
                    F.col(f"__max_{c}").alias("max_num"),
                    null_s.alias("min_str"),
                    null_s.alias("max_str"),
                )
            )
        for c in self.string_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n"),
                    F.col(f"__null_{c}").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    null_d.alias("min_num"),
                    null_d.alias("max_num"),
                    F.col(f"__smin_{c}").alias("min_str"),
                    F.col(f"__smax_{c}").alias("max_str"),
                )
            )
        return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def data_profile_sql(
    table: str,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
) -> str:
    """DuckDB oracle: one UNION ALL branch per column computing the same
    statistics (the oracle needs correctness, not the one-pass shape)."""
    parts = []
    for c in numeric_cols:
        parts.append(
            f"SELECT '{c}' AS \"column\", COUNT(*) AS n,"
            f" SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" MIN(CAST({c} AS DOUBLE)) AS min_num,"
            f" MAX(CAST({c} AS DOUBLE)) AS max_num,"
            f" CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            f" FROM {table}"
        )
    for c in string_cols:
        parts.append(
            f"SELECT '{c}' AS \"column\", COUNT(*) AS n,"
            f" SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,"
            f" MIN({c}) AS min_str, MAX({c}) AS max_str"
            f" FROM {table}"
        )
    body = " UNION ALL ".join(parts)
    return (
        f"SELECT \"column\", CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,"
        f" CAST(n_distinct AS BIGINT) AS n_distinct, min_num, max_num, min_str, max_str"
        f" FROM ({body}) t ORDER BY \"column\""
    )


class CheckConstraints(Pipe):
    """Declarative data-quality rules -> one row per rule with its violation
    count and pass/fail flag. ``rules`` maps rule name to a boolean Column
    (or SQL expression string) that is TRUE when the row SATISFIES the rule;
    NULL counts as a violation (unknown is not proof of quality).

    All rules evaluate in one aggregation pass — adding a rule adds an agg
    expression, not a scan."""

    def __init__(self, rules: Dict[str, object], **kwargs):
        super().__init__(**kwargs)
        self.rules = dict(rules)

    _no_fingerprint = ()

    def to_json_struct(self) -> dict:
        base = super().to_json_struct()
        base["rules"] = {k: str(v) for k, v in sorted(self.rules.items())}
        return base

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__n")]
        names = sorted(self.rules)
        for name in names:
            cond = self.rules[name]
            col = F.expr(cond) if isinstance(cond, str) else cond
            aggs.append(
                F.sum(F.when(col, 0).otherwise(1)).cast("long").alias(f"__v_{name}")
            )
        row = df.agg(*aggs)
        entries = [
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n"),
                F.col(f"__v_{name}").alias("n_violations"),
                (F.col(f"__v_{name}") == 0).alias("passed"),
            )
            for name in names
        ]
        return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def check_constraints_sql(table: str, rules: Dict[str, str]) -> str:
    """DuckDB oracle: same NULL-is-violation semantics via COALESCE."""
    parts = [
        f"SELECT '{name}' AS rule, COUNT(*) AS n,"
        f" SUM(CASE WHEN COALESCE(({expr}), FALSE) THEN 0 ELSE 1 END) AS n_violations"
        f" FROM {table}"
        for name, expr in sorted(rules.items())
    ]
    body = " UNION ALL ".join(parts)
    return (
        f"SELECT rule, CAST(n AS BIGINT) AS n,"
        f" CAST(n_violations AS BIGINT) AS n_violations,"
        f" n_violations = 0 AS passed FROM ({body}) t ORDER BY rule"
    )


class DriftCheck(Pipe):
    """Distribution drift between a reference snapshot and the current
    batch: Population Stability Index per column — the standard gate for
    "did yesterday's crawl / features shift?" before a model retrain.

    PSI(col) = Σ_buckets (p_cur - p_ref) * ln(p_cur / p_ref); rule of
    thumb: < 0.1 stable, 0.1–0.25 moderate, > 0.25 action. Buckets:

    - numeric: ``n_bins`` equal-width bins over the REFERENCE min/max
      (fixed by the reference so the measure is comparable across
      batches), clamped at the edges, NULLs as their own bucket;
    - categorical: one bucket per value observed on EITHER side (NULL
      sentinel included).

    Proportions are additively smoothed ((cnt + 0.5) / (total + 0.5 * B))
    so empty buckets stay finite and the statistic is deterministic;
    bucket contributions are decimal-summed (order/partitioning-free).

    Scale shape: per column, ONE aggregation pass over each side (plus a
    1-row min/max reduce on the reference for numeric bins) — the wide
    work is bucket-cardinality, never row-cardinality. Input df = the
    CURRENT batch; ``ref`` = the reference snapshot."""

    def __init__(
        self,
        ref: DataFrame,
        numeric_bins: Optional[Dict[str, int]] = None,
        cat_cols: Optional[Sequence[str]] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.ref = ref
        self.numeric_bins = dict(numeric_bins or {})
        self.cat_cols = list(cat_cols or [])
        if not self.numeric_bins and not self.cat_cols:
            raise ValueError("DriftCheck needs at least one column")

    _no_fingerprint = ("ref",)

    def _numeric_psi(self, cur: DataFrame, col: str, n: int) -> DataFrame:
        spark = cur.sparkSession
        stats = self.ref.agg(
            F.min(F.col(col).cast("double")).alias("mn"),
            F.max(F.col(col).cast("double")).alias("mx"),
        )

        def bucket_of():
            v = F.col(col).cast("double")
            width = (F.col("mx") - F.col("mn")) / F.lit(float(n))
            return (
                F.when(v.isNull(), F.lit(-1))
                .when(F.col("mx") == F.col("mn"), F.lit(0))
                .otherwise(
                    F.least(
                        F.greatest(
                            F.floor((v - F.col("mn")) / width).cast("int"), F.lit(0)
                        ),
                        F.lit(n - 1),
                    )
                )
            )

        def side(df, name):
            return (
                df.crossJoin(F.broadcast(stats))
                .groupBy(bucket_of().alias("bucket"))
                .agg(F.count(F.lit(1)).alias(name))
            )

        spine = spark.range(-1, n).select(F.col("id").cast("int").alias("bucket"))
        counts = (
            spine.join(side(self.ref, "cnt_ref"), "bucket", "left")
            .join(side(cur, "cnt_cur"), "bucket", "left")
            .select(
                "bucket",
                F.coalesce("cnt_ref", F.lit(0)).alias("cnt_ref"),
                F.coalesce("cnt_cur", F.lit(0)).alias("cnt_cur"),
            )
        )
        return self._psi_from_counts(counts, n + 1, col)

    def _cat_psi(self, cur: DataFrame, col: str) -> DataFrame:
        sent = F.lit("\x00null")
        key = lambda df: df.select(F.coalesce(F.col(col).cast("string"), sent).alias("bucket"))  # noqa: E731
        spine = key(self.ref).union(key(cur)).distinct()
        n_buckets = spine.count()  # bounded: category cardinality

        def side(df, name):
            return key(df).groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

        counts = (
            spine.join(side(self.ref, "cnt_ref"), "bucket", "left")
            .join(side(cur, "cnt_cur"), "bucket", "left")
            .select(
                "bucket",
                F.coalesce("cnt_ref", F.lit(0)).alias("cnt_ref"),
                F.coalesce("cnt_cur", F.lit(0)).alias("cnt_cur"),
            )
        )
        return self._psi_from_counts(counts, n_buckets, col)

    @staticmethod
    def _psi_from_counts(counts: DataFrame, n_buckets: int, col: str) -> DataFrame:
        tot = counts.agg(
            F.sum("cnt_ref").alias("tot_ref"), F.sum("cnt_cur").alias("tot_cur")
        )
        pr = (F.col("cnt_ref").cast("double") + F.lit(0.5)) / (
            F.col("tot_ref").cast("double") + F.lit(0.5 * n_buckets)
        )
        pc = (F.col("cnt_cur").cast("double") + F.lit(0.5)) / (
            F.col("tot_cur").cast("double") + F.lit(0.5 * n_buckets)
        )
        contrib = ((pc - pr) * F.log(pc / pr)).cast("decimal(18,10)")
        return (
            counts.crossJoin(F.broadcast(tot))
            .agg(F.sum(contrib).cast("decimal(18,10)").cast("double").alias("psi"))
            .select(
                F.lit(col).alias("column"),
                "psi",
                F.lit(n_buckets).alias("n_buckets"),
            )
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        parts = [
            self._numeric_psi(df, c, n) for c, n in sorted(self.numeric_bins.items())
        ] + [self._cat_psi(df, c) for c in sorted(self.cat_cols)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


def drift_sql(
    ref_sql: str,
    cur_sql: str,
    numeric_bins: Optional[Dict[str, int]] = None,
    cat_cols: Optional[Sequence[str]] = None,
) -> str:
    """DuckDB oracle mirroring :class:`DriftCheck` expression-for-expression
    (same bucket rule, same additive smoothing, same (p_cur - p_ref) *
    ln(p_cur/p_cur_ref) association, same DECIMAL(18,10) summation point)."""

    def _psi_block(counts_cte: str, n_buckets: int, label: str) -> str:
        half_b = 0.5 * n_buckets
        pr = f"((CAST(cnt_ref AS DOUBLE) + 0.5) / (CAST(tot_ref AS DOUBLE) + {half_b}))"
        pc = f"((CAST(cnt_cur AS DOUBLE) + 0.5) / (CAST(tot_cur AS DOUBLE) + {half_b}))"
        return (
            f"SELECT '{label}' AS \"column\", "
            f"CAST(CAST(SUM(CAST(({pc} - {pr}) * ln({pc} / {pr}) AS DECIMAL(18,10))) "
            f"AS DECIMAL(18,10)) AS DOUBLE) AS psi, {n_buckets} AS n_buckets "
            f"FROM ({counts_cte}) counts CROSS JOIN "
            f"(SELECT SUM(cnt_ref) AS tot_ref, SUM(cnt_cur) AS tot_cur "
            f" FROM ({counts_cte}) t) tot"
        )

    blocks = []
    for col, n in sorted((numeric_bins or {}).items()):
        bucket = (
            f"CASE WHEN {col} IS NULL THEN -1 WHEN s.mx = s.mn THEN 0 "
            f"ELSE LEAST(GREATEST(CAST(FLOOR((CAST({col} AS DOUBLE) - s.mn) "
            f"/ ((s.mx - s.mn) / {float(n)})) AS INT), 0), {n - 1}) END"
        )
        counts = (
            f"WITH stats AS (SELECT MIN(CAST({col} AS DOUBLE)) AS mn, "
            f"MAX(CAST({col} AS DOUBLE)) AS mx FROM ({ref_sql}) r), "
            f"refc AS (SELECT {bucket} AS bucket, COUNT(*) AS cr "
            f"  FROM ({ref_sql}) r CROSS JOIN stats s GROUP BY 1), "
            f"curc AS (SELECT {bucket} AS bucket, COUNT(*) AS cc "
            f"  FROM ({cur_sql}) c CROSS JOIN stats s GROUP BY 1), "
            f"spine AS (SELECT unnest(generate_series(-1, {n - 1})) AS bucket) "
            f"SELECT sp.bucket, COALESCE(r.cr, 0) AS cnt_ref, "
            f"COALESCE(c.cc, 0) AS cnt_cur FROM spine sp "
            f"LEFT JOIN refc r USING (bucket) LEFT JOIN curc c USING (bucket)"
        )
        blocks.append((counts, n + 1, col))
    for col in sorted(cat_cols or []):
        key = f"COALESCE(CAST({col} AS VARCHAR), chr(1))"
        counts = (
            f"WITH spine AS (SELECT DISTINCT {key} AS bucket FROM "
            f"  (SELECT {col} FROM ({ref_sql}) a UNION ALL SELECT {col} FROM ({cur_sql}) b) u), "
            f"refc AS (SELECT {key} AS bucket, COUNT(*) AS cr FROM ({ref_sql}) r GROUP BY 1), "
            f"curc AS (SELECT {key} AS bucket, COUNT(*) AS cc FROM ({cur_sql}) c GROUP BY 1) "
            f"SELECT sp.bucket, COALESCE(r.cr, 0) AS cnt_ref, "
            f"COALESCE(c.cc, 0) AS cnt_cur FROM spine sp "
            f"LEFT JOIN refc r USING (bucket) LEFT JOIN curc c USING (bucket)"
        )
        blocks.append((counts, None, col))
    parts = []
    for counts, n_buckets, label in blocks:
        if n_buckets is None:
            # categorical bucket count is data-derived; inline it as a scalar
            nb = (
                f"(SELECT COUNT(*) FROM (SELECT DISTINCT "
                f"COALESCE(CAST({label} AS VARCHAR), chr(1)) FROM "
                f"(SELECT {label} FROM ({ref_sql}) a UNION ALL "
                f"SELECT {label} FROM ({cur_sql}) b) u) s)"
            )
            half_b = f"(0.5 * {nb})"
            pr = f"((CAST(cnt_ref AS DOUBLE) + 0.5) / (CAST(tot_ref AS DOUBLE) + {half_b}))"
            pc = f"((CAST(cnt_cur AS DOUBLE) + 0.5) / (CAST(tot_cur AS DOUBLE) + {half_b}))"
            parts.append(
                f"SELECT '{label}' AS \"column\", "
                f"CAST(CAST(SUM(CAST(({pc} - {pr}) * ln({pc} / {pr}) AS DECIMAL(18,10))) "
                f"AS DECIMAL(18,10)) AS DOUBLE) AS psi, CAST({nb} AS INT) AS n_buckets "
                f"FROM ({counts}) counts CROSS JOIN "
                f"(SELECT SUM(cnt_ref) AS tot_ref, SUM(cnt_cur) AS tot_cur "
                f" FROM ({counts}) t) tot"
            )
        else:
            parts.append(_psi_block(counts, n_buckets, label))
    return " UNION ALL ".join(parts) + " ORDER BY \"column\""


class KAnonymity(Pipe):
    """k-anonymity audit over quasi-identifier columns: a row is
    re-identifiable when its QI combination is shared by fewer than ``k``
    rows. Output: one row per violating QI group — the QI values, the
    group size, and the share of the dataset it represents — ordered
    worst (smallest group) first by the caller's ORDER BY.

    The governance gate for releasing training corpora containing user
    attributes (k-anonymity, Sweeney 2002): ``out.isEmpty()`` == the
    dataset is k-anonymous over those columns. One aggregation on the QI
    key; at 100 TB the violating-group output is small by definition
    (each group < k rows)."""

    def __init__(self, qi_cols, k: int = 5, **kwargs):
        if not qi_cols:
            raise ValueError("KAnonymity needs at least one quasi-identifier column")
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        super().__init__(**kwargs)
        self.qi_cols = list(qi_cols)
        self.k = k

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        # total row count as a broadcast 1-row aggregate, not a driver
        # action: the plan stays lazy and Catalyst schedules both scans
        total = df.agg(F.count(F.lit(1)).cast("double").alias("__total"))
        return (
            df.groupBy(*self.qi_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") < self.k)
            .crossJoin(F.broadcast(total))
            .select(
                *self.qi_cols,
                F.col("n").cast("long").alias("n"),
                (F.col("n") / F.col("__total"))
                .cast("decimal(18,8)")
                .cast("double")
                .alias("share"),
            )
        )


def k_anonymity_sql(table: str, qi_cols, k: int = 5) -> str:
    """DuckDB oracle for :class:`KAnonymity` — same grouping + threshold."""
    qi = ", ".join(qi_cols)
    return (
        f"SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(CAST(COUNT(*) / (SELECT COUNT(*) * 1.0 FROM {table}) "
        f"AS DECIMAL(18,8)) AS DOUBLE) AS share "
        f"FROM {table} GROUP BY {qi} HAVING COUNT(*) < {k} ORDER BY {qi}"
    )


class BenfordAudit(Pipe):
    """First-significant-digit audit against Benford's law (Newcomb 1881;
    Benford 1938; Nigrini 1996 — the forensic-accounting standard):
    naturally occurring multi-scale positive quantities have first-digit
    frequencies log10(1 + 1/d); synthetic, capped, defaulted or
    hand-entered columns do not. One row per digit 1-9 with observed
    count/share, the Benford expectation and the panel's total
    chi-square — the data-quality smell test for a numeric column
    whose provenance is suspect.

    Portability: the first digit comes from a CHAINED-CASE decade
    normalization (v / 10^e for the matching e in [lo_exp, hi_exp]) —
    NO log10 call on data (log10 near exact powers of ten is the
    classic libm edge), every branch is one division by the same
    power-of-ten literal in both engines. Expected shares are
    ln((d+1)/d)/ln(10) on exact-integer ratios; chi-square terms round
    through DECIMAL(18,6) and sum exactly. Rows with NULL, zero,
    negative or out-of-decade-range values are excluded (counted
    against n_analyzed only).

    Scale: one scan into a 9-bucket aggregation; the digit grid is a
    9-row literal frame. Nothing else."""

    def __init__(
        self,
        value_col: str,
        lo_exp: int = -6,
        hi_exp: int = 12,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.value_col = value_col
        self.lo_exp = lo_exp
        self.hi_exp = hi_exp

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        D = "decimal(18,6)"
        v = F.col(self.value_col).cast("double")
        # disjoint decade branches (10^e <= v < 10^(e+1)), so nesting
        # order is irrelevant; out-of-range and NULL values fall through
        m = F.lit(None).cast("double")
        for e in range(self.lo_exp, self.hi_exp + 1):
            p10 = F.lit(float(10.0 ** e))
            m = F.when(
                (v >= p10) & (v < F.lit(float(10.0 ** (e + 1)))), v / p10
            ).otherwise(m)
        digit = F.floor(m).cast("int")
        obs = (
            df.select(digit.alias("digit"))
            .where(F.col("digit").isNotNull())
            .groupBy("digit")
            .agg(F.count(F.lit(1)).alias("n_obs"))
        )
        tot = obs.agg(F.sum("n_obs").alias("n_all"))
        grid = tot.select(
            "n_all", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
        )
        full = grid.join(obs, "digit", "left").na.fill({"n_obs": 0})
        p = F.log(
            (F.col("digit") + 1).cast("double") / F.col("digit").cast("double")
        ) / F.log(F.lit(10.0))
        exp_n = F.col("n_all").cast("double") * p
        term = (
            (F.col("n_obs").cast("double") - exp_n)
            * (F.col("n_obs").cast("double") - exp_n)
            / exp_n
        ).cast(D)
        full = full.select(
            "digit",
            "n_obs",
            "n_all",
            p.cast(D).cast("double").alias("benford_p"),
            term.alias("__t"),
        )
        chi = full.agg(F.sum("__t").alias("__chi"))
        return (
            full.crossJoin(F.broadcast(chi))
            .select(
                F.col("digit").cast("int").alias("digit"),
                F.col("n_obs").cast("long").alias("n_obs"),
                (F.col("n_obs").cast("double") / F.col("n_all").cast("double"))
                .cast(D)
                .cast("double")
                .alias("obs_share"),
                F.col("benford_p"),
                F.col("__chi").cast("double").cast(D).cast("double").alias(
                    "chi2_total"
                ),
            )
            .orderBy("digit")
        )


def benford_sql(
    table: str, value: str, lo_exp: int = -6, hi_exp: int = 12
) -> str:
    """DuckDB oracle for :class:`BenfordAudit` — identical chained-case
    decade normalization and chi-square algebra."""
    v = f"CAST({value} AS DOUBLE)"
    branches = " ".join(
        f"WHEN {v} >= {float(10.0 ** e)!r} AND {v} < {float(10.0 ** (e + 1))!r} "
        f"THEN {v} / {float(10.0 ** e)!r}"
        for e in range(lo_exp, hi_exp + 1)
    )
    return f"""
WITH obs AS MATERIALIZED (
  SELECT digit, COUNT(*) AS n_obs FROM (
    SELECT CAST(FLOOR(CASE {branches} END) AS INTEGER) AS digit FROM {table}
  ) WHERE digit IS NOT NULL GROUP BY 1
),
tot AS (SELECT SUM(n_obs) AS n_all FROM obs),
grid AS (
  SELECT n_all, CAST(r.range AS INTEGER) AS digit
  FROM tot CROSS JOIN range(1, 10) r
),
full_ AS (
  SELECT g.digit, g.n_all, COALESCE(o.n_obs, 0) AS n_obs,
         ln(CAST(g.digit + 1 AS DOUBLE) / CAST(g.digit AS DOUBLE))
           / ln(10.0) AS p
  FROM grid g LEFT JOIN obs o USING (digit)
),
terms AS (
  SELECT *,
         CAST((CAST(n_obs AS DOUBLE) - CAST(n_all AS DOUBLE) * p)
              * (CAST(n_obs AS DOUBLE) - CAST(n_all AS DOUBLE) * p)
              / (CAST(n_all AS DOUBLE) * p) AS DECIMAL(18,6)) AS t
  FROM full_
),
chi AS (SELECT SUM(t) AS chi2 FROM terms)
SELECT CAST(digit AS INTEGER) AS digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(CAST(CAST(n_obs AS DOUBLE) / CAST(n_all AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS obs_share,
       CAST(CAST(p AS DECIMAL(18,6)) AS DOUBLE) AS benford_p,
       CAST(CAST(CAST(chi2 AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
         AS chi2_total
FROM terms CROSS JOIN chi
ORDER BY digit
"""


class RobustStats(Pipe):
    """Per-group robust location/scale/outlier panel for an INTEGRAL
    column: lower median, MAD (median absolute deviation, Hampel 1974;
    the 50% breakdown-point scale every mean±3σ outlier rule should be
    replaced by — one extreme value moves σ arbitrarily, it cannot move
    the MAD), and the count/rate of values beyond ``threshold`` x MAD
    of the median. The data-quality companion to the mean/stddev
    profile: a capped or heavy-tailed length column looks normal in
    moments and screams here.

    Exactness: the LOWER median of an integer column is an INTEGER
    (the smallest value v with 2 * cum_count(v) >= n), so median, MAD,
    absolute deviations and the outlier comparison are all exact BIGINT
    algebra; the only float op is the final outlier-rate division,
    rounded once through DECIMAL(18,6).

    Scale shape (the ECDF-join discipline — never a row-count-sized
    window): one scan to a (group, value, count) table bounded by value
    cardinality, a cumulative window over DISTINCT values per group for
    the median, then deviations re-derive FROM THE VALUE-COUNT TABLE
    (|v - med| with multiplicity c — no second corpus scan), a second
    distinct-value window for the MAD, and a group-sized rollup.

    Reference anchor: data-quality family extension
    (``pipes/validate.py`` profile/constraints/drift)."""

    def __init__(
        self,
        value_col: str,
        group_col: str = "source",
        threshold: int = 3,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.value_col = value_col
        self.group_col = group_col
        self.threshold = threshold

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        D = "decimal(18,6)"
        g = F.col(self.group_col).alias("grp")
        x = F.col(self.value_col).cast("long")
        # NULLs are split out of the value-count table BEFORE the
        # cumulative windows (and reported as n_null): Spark orders
        # NULLS FIRST ascending while DuckDB orders NULLS LAST, so a
        # nullable value column would shift the lower-median/MAD
        # selection differently per engine; n/median/mad/outliers are
        # statistics of the NON-NULL values in both.
        vc_all = df.select(g, x.alias("v")).groupBy("grp", "v").agg(
            F.count(F.lit(1)).alias("c")
        )
        nullc = vc_all.filter(F.col("v").isNull()).select(
            "grp", F.col("c").alias("n_null")
        )
        vc = vc_all.filter(F.col("v").isNotNull())

        def lower_median(vals: DataFrame) -> DataFrame:
            """(grp, v, c) -> (grp, n, med): smallest v with
            2 * inclusive-cumulative-count >= n."""
            w = (
                Window.partitionBy("grp")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            cum = vals.select(
                "grp",
                "v",
                F.sum("c").over(w).alias("cum"),
                F.sum("c").over(
                    Window.partitionBy("grp").rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ).alias("n"),
            )
            return (
                cum.filter(F.col("cum") * 2 >= F.col("n"))
                .groupBy("grp")
                .agg(F.min("v").alias("med"), F.max("n").alias("n"))
            )

        med = lower_median(vc)
        dev = (
            vc.join(med.select("grp", "med"), "grp")
            .select(
                "grp",
                F.abs(F.col("v") - F.col("med")).alias("v"),
                "c",
            )
            .groupBy("grp", "v")
            .agg(F.sum("c").alias("c"))
        )
        mad = lower_median(dev).select(
            "grp", F.col("med").alias("mad")
        )
        base = med.join(mad, "grp")
        out_cnt = (
            dev.join(base.select("grp", "mad"), "grp")
            .filter(F.col("v") > F.lit(self.threshold) * F.col("mad"))
            .groupBy("grp")
            .agg(F.sum("c").alias("n_out"))
        )
        return (
            base.join(out_cnt, "grp", "left")
            .join(nullc, "grp", "left")
            .select(
                F.col("grp").alias(self.group_col),
                F.col("n").cast("long").alias("n"),
                F.coalesce(F.col("n_null"), F.lit(0))
                .cast("long")
                .alias("n_null"),
                F.col("med").cast("long").alias("median"),
                F.col("mad").cast("long").alias("mad"),
                F.coalesce(F.col("n_out"), F.lit(0))
                .cast("long")
                .alias("n_outliers"),
                (
                    F.coalesce(F.col("n_out"), F.lit(0)).cast("double")
                    / F.col("n").cast("double")
                )
                .cast(D)
                .cast("double")
                .alias("outlier_rate"),
            )
        )


def robust_stats_sql(
    table: str,
    value: str,
    group: str = "source",
    threshold: int = 3,
) -> str:
    """DuckDB oracle for :class:`RobustStats` — identical integer
    lower-median / MAD chain and the single rounded division."""
    return f"""
WITH vc_all AS MATERIALIZED (
  SELECT {group} AS grp, CAST({value} AS BIGINT) AS v, COUNT(*) AS c
  FROM {table} GROUP BY 1, 2
),
nullc AS (SELECT grp, c AS n_null FROM vc_all WHERE v IS NULL),
vc AS (SELECT * FROM vc_all WHERE v IS NOT NULL),
cum AS (
  SELECT grp, v,
         SUM(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM vc
),
med AS (
  SELECT grp, MIN(v) AS med, MAX(n) AS n
  FROM cum WHERE cum * 2 >= n GROUP BY grp
),
dev AS (
  SELECT vc.grp, ABS(vc.v - med.med) AS v, SUM(vc.c) AS c
  FROM vc JOIN med USING (grp) GROUP BY 1, 2
),
dcum AS (
  SELECT grp, v,
         SUM(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY grp) AS n
  FROM dev
),
mad AS (
  SELECT grp, MIN(v) AS mad FROM dcum WHERE cum * 2 >= n GROUP BY grp
),
base AS (SELECT med.grp, med.n, med.med, mad.mad
         FROM med JOIN mad USING (grp)),
outc AS (
  SELECT dev.grp, SUM(dev.c) AS n_out
  FROM dev JOIN base USING (grp)
  WHERE dev.v > {threshold} * base.mad GROUP BY 1
)
SELECT b.grp AS {group},
       CAST(b.n AS BIGINT) AS n,
       CAST(COALESCE(nl.n_null, 0) AS BIGINT) AS n_null,
       CAST(b.med AS BIGINT) AS median,
       CAST(b.mad AS BIGINT) AS mad,
       CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_outliers,
       CAST(CAST(CAST(COALESCE(o.n_out, 0) AS DOUBLE)
                 / CAST(b.n AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS outlier_rate
FROM base b LEFT JOIN outc o USING (grp)
             LEFT JOIN nullc nl USING (grp)
"""


class RollingRobust(Pipe):
    """Hampel filter (Hampel 1974; Pearson et al. 2016): per-entity
    ROLLING robust outlier detection over an ordered event stream —
    the time-series sibling of :class:`RobustStats` (which is one
    global panel per group). For each row, the window of ±``w`` rows
    around it (ordered by ``order_cols`` within ``entity_col``) yields
    an exact lower median and MAD; the row is flagged when
    ``|value - med| > z * MAD`` (MAD = 0 degenerates to "any deviation
    flags", the classic Hampel behavior on constant windows). Output =
    the flagged rows only: (entity, id, value, med, mad).

    Scale shape: ONE shuffle (the entity-partitioned window); the
    median/MAD algebra is row-local array math over the 2w+1-element
    window (sort_array + lower-median pick — no second pass, no join,
    no UDF), so the operator is a single window stage at any corpus
    size, and entity skew is bounded by the per-entity event count.

    Reference anchor: data-quality extension family (SURVEY.md §2
    validate tier) — the streaming-shaped cousin of q227.
    """

    def __init__(
        self,
        value_col: str = "value",
        entity_col: str = "user_id",
        order_cols=("ts", "event_id"),
        id_col: str = "event_id",
        w: int = 3,
        z: float = 3.0,
        **kwargs,
    ):
        if w < 1:
            raise ValueError(f"need w >= 1, got {w}")
        super().__init__(**kwargs)
        self.value_col = value_col
        self.entity_col = entity_col
        self.order_cols = tuple(order_cols)
        self.id_col = id_col
        self.w = w
        self.z = z

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        win = (
            Window.partitionBy(self.entity_col)
            .orderBy(*[F.asc(c) for c in self.order_cols])
            .rowsBetween(-self.w, self.w)
        )
        arr = F.sort_array(
            F.collect_list(F.col(self.value_col)).over(win)
        )
        base = df.select(
            F.col(self.entity_col).alias("entity"),
            F.col(self.id_col).alias("id"),
            F.col(self.value_col).cast("double").alias("value"),
            arr.alias("__arr"),
        )
        # lower median: sorted[(n+1) div 2] (1-based) — exact selection,
        # no averaging, so doubles pass through untouched
        mid = ((F.size("__arr") + 1) / 2).cast("int")
        med = base.withColumn("med", F.get(F.col("__arr"), mid - 1))
        mad = med.withColumn(
            "mad",
            F.get(
                F.sort_array(
                    F.transform(
                        F.col("__arr"),
                        lambda x: F.abs(x - F.col("med")),
                    )
                ),
                mid - 1,
            ),
        )
        return mad.filter(
            F.abs(F.col("value") - F.col("med"))
            > F.lit(float(self.z)) * F.col("mad")
        ).select("entity", "id", "value", "med", "mad")


def rolling_robust_sql(
    table: str,
    value: str = "value",
    entity: str = "user_id",
    order_cols=("ts", "event_id"),
    id_col: str = "event_id",
    w: int = 3,
    z: float = 3.0,
) -> str:
    """DuckDB oracle for :class:`RollingRobust` — the same ±w rows
    window, sorted-list lower-median selection and IEEE comparison."""
    order_sql = ", ".join(order_cols)
    return f"""
WITH b AS (
  SELECT {entity} AS entity, {id_col} AS id,
         CAST({value} AS DOUBLE) AS value,
         list_sort(list(CAST({value} AS DOUBLE)) OVER (
           PARTITION BY {entity} ORDER BY {order_sql}
           ROWS BETWEEN {w} PRECEDING AND {w} FOLLOWING)) AS arr
  FROM {table}
),
m AS (SELECT *, arr[(len(arr) + 1) // 2] AS med FROM b),
d AS (SELECT *,
        list_sort(list_transform(arr, x -> abs(x - med)))
          [(len(arr) + 1) // 2] AS mad
      FROM m)
SELECT entity, id, value, med, mad
FROM d
WHERE abs(value - med) > {z!r} * mad
"""

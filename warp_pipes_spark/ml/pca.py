"""Distributed PCA: top principal component by power iteration.

The quantization family (``ml/quantize.py`` RandomProjection/JL,
``ml/similarity.py`` Matryoshka prefixes) reduces dimension with DATA-
INDEPENDENT projections; this operator is the data-DRIVEN one: the top
principal component of the embedding distribution and its explained-
variance ratio — the number that says whether a cheap 1-d projection
(curriculum ordering, shard clustering, drift probes) captures the corpus
or throws it away (Pearson 1901; power iteration: von Mises & Pollaczek-
Geiringer 1929; Halko et al. 2011 for the modern randomized framing).

Differential-testing discipline (the ``ml/kmeans.py`` pattern — the
UNROLLED TRAINING CHAIN IS THE ORACLE):

* ONE corpus scan aggregates exact BIGINT first/second moments — every
  per-row product is discretized to nano units with ``floor(x*1e9 + 0.5)``
  (each step an IEEE double op, so both engines sum identical BIGINTs);
* the covariance matrix derives from those integers by a FIXED chain of
  IEEE ops — it is one ROW of dim x dim columns, so every later step is
  row-local column arithmetic;
* each power-iteration step is a fixed-order left fold (u = C v, then
  v' = u / ||u||), with every component DECIMAL(18,6)-rounded after the
  divide — drift cannot accumulate across iterations because each
  iteration re-enters from the rounded fixed point;
* the returned eigenvector's sign is pinned by the first component whose
  rounded value is nonzero (made positive), so the answer is unique.

Scale shape: the scan is the only corpus-sized stage (dim² running sums
aggregate map-side); the iteration chain runs on a single broadcastable
row. At 100 TB this is exactly the classic two-phase tall-skinny PCA —
moments in one pass, eigen-solve on the driver-sized Gram matrix — with
the eigen-solve expressed as engine expressions so the oracle can replay
it.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

_DEC = "decimal(18,6)"


def _nano(col):
    return F.floor(col * F.lit(1e9) + F.lit(0.5)).cast("long")


class PowerIterationPCA(Pipe):
    """Input df = (``id_col``, ``vec_col``); output ONE row:
    ``(n_vecs, total_var, lambda1, explained, v1..v{dim})`` — the top
    eigenvalue/eigenvector of the covariance of the ``dim``-prefix and
    the fraction of total variance it explains."""

    def __init__(
        self,
        dim: int = 8,
        iters: int = 12,
        vec_col: str = "embedding",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.dim = dim
        self.iters = iters
        self.vec_col = vec_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        dim = self.dim
        x = [
            F.element_at(
                F.slice(F.col(self.vec_col), 1, dim).cast("array<double>"), i
            )
            for i in range(1, dim + 1)
        ]
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(dim):
            aggs.append(F.sum(_nano(x[i])).alias(f"s{i}"))
        for i in range(dim):
            for j in range(i, dim):
                aggs.append(F.sum(_nano(x[i] * x[j])).alias(f"m{i}_{j}"))
        row = df.agg(*aggs)

        nd = F.col("n").cast("double")
        means = [
            (F.col(f"s{i}").cast("double") / F.lit(1e9)) / nd
            for i in range(dim)
        ]
        cov = {}
        for i in range(dim):
            for j in range(dim):
                a, b = min(i, j), max(i, j)
                cov[(i, j)] = (
                    (F.col(f"m{a}_{b}").cast("double") / F.lit(1e9)) / nd
                    - means[i] * means[j]
                )
        ccols = [f"c{i}_{j}" for i in range(dim) for j in range(dim)]
        row = row.select(
            "n", *[cov[(i, j)].alias(f"c{i}_{j}") for i in range(dim) for j in range(dim)]
        )

        # v0 = e1; iterate u = C v, v' = round6(u / ||u||). Each step
        # MATERIALIZES its columns with a select (the SQL oracle's CTE
        # chain) — inlining the recurrence would grow the expression
        # tree ~dim-fold per iteration
        row = row.select(
            "*",
            *[
                F.lit(1.0 if i == 0 else 0.0).alias(f"v{i}")
                for i in range(dim)
            ],
        )
        for _ in range(self.iters):
            u = []
            for i in range(dim):
                e = F.col(f"c{i}_0") * F.col("v0")
                for j in range(1, dim):
                    e = e + F.col(f"c{i}_{j}") * F.col(f"v{j}")
                u.append(e.alias(f"u{i}"))
            row = row.select("n", *ccols, *u)
            nrm2 = F.col("u0") * F.col("u0")
            for i in range(1, dim):
                nrm2 = nrm2 + F.col(f"u{i}") * F.col(f"u{i}")
            nrm = F.sqrt(nrm2)
            row = row.select(
                "n",
                *ccols,
                *[
                    (F.col(f"u{i}") / nrm)
                    .cast(_DEC)
                    .cast("double")
                    .alias(f"v{i}")
                    for i in range(dim)
                ],
            )
        vc = [F.col(f"v{i}") for i in range(dim)]

        # sign pin: negate so the first nonzero rounded component is > 0
        flip = F.lit(1.0)
        for i in reversed(range(dim)):
            flip = (
                F.when(vc[i] > 0, F.lit(1.0))
                .when(vc[i] < 0, F.lit(-1.0))
                .otherwise(flip)
            )
        vs = [(vc[i] * flip).cast(_DEC).cast("double") for i in range(dim)]

        # Rayleigh quotient on the final (rounded, signed) vector — sign
        # cancels in v·Cv, but using vs keeps both engines on one path
        u = []
        for i in range(dim):
            e = F.col(f"c{i}_0") * vs[0]
            for j in range(1, dim):
                e = e + F.col(f"c{i}_{j}") * vs[j]
            u.append(e)
        lam = vs[0] * u[0]
        for i in range(1, dim):
            lam = lam + vs[i] * u[i]
        tot = F.col("c0_0")
        for i in range(1, dim):
            tot = tot + F.col(f"c{i}_{i}")
        lam6 = lam.cast(_DEC).cast("double")
        tot6 = tot.cast(_DEC).cast("double")
        return row.select(
            F.col("n").cast("long").alias("n_vecs"),
            tot6.alias("total_var"),
            lam6.alias("lambda1"),
            (lam6 / tot6).cast(_DEC).cast("double").alias("explained"),
            *[vs[i].alias(f"v{i + 1}") for i in range(dim)],
        )


def power_pca_sql(
    table: str = "embeddings",
    vec: str = "embedding",
    dim: int = 8,
    iters: int = 12,
) -> str:
    """DuckDB oracle for :class:`PowerIterationPCA` — the identical
    moment aggregation and unrolled iteration chain as CTEs."""
    xs = [
        f"CAST({vec}[{i + 1}] AS DOUBLE)" for i in range(dim)
    ]
    nano = lambda e: f"CAST(FLOOR(({e}) * 1e9 + 0.5) AS BIGINT)"
    mom = ", ".join(
        [f"SUM({nano(xs[i])}) AS s{i}" for i in range(dim)]
        + [
            f"SUM({nano(f'{xs[i]} * {xs[j]}')}) AS m{i}_{j}"
            for i in range(dim)
            for j in range(i, dim)
        ]
    )
    means = {
        i: f"((CAST(s{i} AS DOUBLE) / 1e9) / CAST(n AS DOUBLE))"
        for i in range(dim)
    }
    covs = ", ".join(
        f"((CAST(m{min(i, j)}_{max(i, j)} AS DOUBLE) / 1e9)"
        f" / CAST(n AS DOUBLE)) - {means[i]} * {means[j]} AS c{i}_{j}"
        for i in range(dim)
        for j in range(dim)
    )
    ctes = [
        f"mom AS (SELECT COUNT(*) AS n, {mom} FROM {table})",
        f"cov AS (SELECT n, {covs} FROM mom)",
        "it0 AS (SELECT *, "
        + ", ".join(
            f"CAST({1.0 if i == 0 else 0.0} AS DOUBLE) AS v{i}"
            for i in range(dim)
        )
        + " FROM cov)",
    ]
    for t in range(iters):
        us = {
            i: " + ".join(f"c{i}_{j} * v{j}" for j in range(dim))
            for i in range(dim)
        }
        nrm = "sqrt(" + " + ".join(f"u{i} * u{i}" for i in range(dim)) + ")"
        ctes.append(
            f"u{t} AS (SELECT *, "
            + ", ".join(f"{us[i]} AS u{i}" for i in range(dim))
            + f" FROM it{t})"
        )
        ctes.append(
            f"it{t + 1} AS (SELECT "
            + "n, "
            + ", ".join(
                f"c{i}_{j}" for i in range(dim) for j in range(dim)
            )
            + ", "
            + ", ".join(
                f"CAST(CAST(u{i} / {nrm} AS DECIMAL(18,6)) AS DOUBLE) AS v{i}"
                for i in range(dim)
            )
            + f" FROM u{t})"
        )
    flip = "1.0"
    for i in reversed(range(dim)):
        flip = (
            f"(CASE WHEN v{i} > 0 THEN 1.0 WHEN v{i} < 0 THEN -1.0"
            f" ELSE {flip} END)"
        )
    ctes.append(
        f"signed AS (SELECT n, "
        + ", ".join(f"c{i}_{j}" for i in range(dim) for j in range(dim))
        + ", "
        + ", ".join(
            f"CAST(CAST(v{i} * {flip} AS DECIMAL(18,6)) AS DOUBLE) AS w{i}"
            for i in range(dim)
        )
        + f" FROM it{iters})"
    )
    us = {
        i: " + ".join(f"c{i}_{j} * w{j}" for j in range(dim))
        for i in range(dim)
    }
    lam = " + ".join(f"w{i} * ({us[i]})" for i in range(dim))
    tot = " + ".join(f"c{i}_{i}" for i in range(dim))
    body = ",\n".join(ctes)
    vcols = ", ".join(f"w{i} AS v{i + 1}" for i in range(dim))
    return f"""
WITH {body}
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(CAST({tot} AS DECIMAL(18,6)) AS DOUBLE) AS total_var,
       CAST(CAST({lam} AS DECIMAL(18,6)) AS DOUBLE) AS lambda1,
       CAST(CAST(CAST(CAST({lam} AS DECIMAL(18,6)) AS DOUBLE)
                 / CAST(CAST({tot} AS DECIMAL(18,6)) AS DOUBLE)
            AS DECIMAL(18,6)) AS DOUBLE) AS explained,
       {vcols}
FROM signed
"""

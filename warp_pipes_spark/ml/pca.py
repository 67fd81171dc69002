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

Both engines run the SAME arithmetic in the same left-to-right order,
generated from one module: the DuckDB oracle as the scalar-column CTE
chain (``_chain_sql``), the Spark side as ONE ``spark.sql`` statement
whose state lives in ARRAY columns folded by higher-order functions
(``_hof_sql``). The single-statement + HOF shape is a measured fix for
two data-size-INDEPENDENT costs of the naive chained-``select`` form:
~13 s of repeated plan re-analysis, and a janino 64 KB codegen blowup
with a multi-second compile-then-interpret fallback (see ``_hof_sql``).

Scale shape: the scan is the only corpus-sized stage (dim² running sums
aggregate map-side); the iteration chain runs on a single broadcastable
row. At 100 TB this is exactly the classic two-phase tall-skinny PCA —
moments in one pass, eigen-solve on the driver-sized Gram matrix — with
the eigen-solve expressed as engine expressions so the oracle can replay
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from warp_pipes_spark.core.pipe import Pipe

def _chain_sql(
    table: str,
    xs: list,
    dim: int,
    iters: int,
) -> str:
    """The DuckDB-oracle moment-scan + power-iteration CTE chain.

    ``xs`` are the per-component element expressions. The Spark side
    runs the SAME arithmetic in the same left-to-right order but packs
    the state into array columns (see ``_hof_sql``) — scalar-column
    CTEs are what the oracle replays, array HOF folds are what the
    engine executes, and every float op sequence is identical.
    """
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


_DOT = (
    lambda a, b: f"aggregate(zip_with({a}, {b}, (p, q) -> p * q),"
    f" 0.0D, (acc, x) -> acc + x)"
)


def _iter_ctes(dim: int, k: int, first: str) -> list:
    """``k`` power-iteration steps as CTE text: u{t} = C v (row-wise
    zip_with/aggregate dot), it{t+1} = per-component DECIMAL(18,6)-
    rounded u/||u|| — the same left-to-right IEEE op order as the
    oracle's scalar chains."""
    nrm = f"sqrt({_DOT('u', 'u')})"
    ctes = []
    for t in range(k):
        frm = first if t == 0 else f"it{t}"
        ctes.append(
            f"u{t} AS (SELECT n, C,"
            f" transform(C, r -> {_DOT('r', 'v')}) AS u FROM {frm})"
        )
        ctes.append(
            f"it{t + 1} AS (SELECT n, C, transform(u, e -> CAST(CAST("
            f"e / {nrm} AS DECIMAL(18,6)) AS DOUBLE)) AS v FROM u{t})"
        )
    return ctes


def _hof_head_sql(table: str, vec: str, dim: int, k: int) -> str:
    """Moment scan + covariance-array packing + the first ``k``
    iterations, ending in the ``(n, C, v)`` state row.

    Why the engine side is generated SQL over ARRAY columns while the
    oracle replays scalar-column CTEs (same arithmetic, same
    left-to-right order — measured at sf0.1, dim=8, iters=12):

    * chained one-row ``select``s re-analyze the growing plan once per
      step — ~13 s of pure plan-build at ANY data size; a handful of
      generated statements cost ~0.5 s;
    * dim^2 scalar columns through 24 fused projections blow janino's
      64 KB method limit and pay a multi-second compile-then-interpret
      fallback; HOFs are codegen-fallback by design, the trees are
      ~70x smaller, and at one row interpretation is free.

    The fold seeds (``0.0D + first-term``) are bit-identical to the
    oracle's bare ``a + b + ...`` chains for every IEEE double except
    a leading ``-0.0`` — unreachable here because covariance diagonals
    and the dominant eigenpair are nonzero on any non-degenerate
    corpus (and differentially verified regardless).
    """
    nano = lambda e: f"CAST(FLOOR(({e}) * 1e9 + 0.5D) AS BIGINT)"
    xs = [
        f"CAST(element_at(`{vec}`, {i + 1}) AS DOUBLE)" for i in range(dim)
    ]
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
    rows = ", ".join(
        "array(" + ", ".join(f"c{i}_{j}" for j in range(dim)) + ")"
        for i in range(dim)
    )
    v0 = ", ".join(f"{1.0 if i == 0 else 0.0}D" for i in range(dim))
    ctes = [
        f"mom AS (SELECT COUNT(*) AS n, {mom} FROM {table})",
        f"cov AS (SELECT n, {covs} FROM mom)",
        f"it0 AS (SELECT n, array({rows}) AS C, array({v0}) AS v FROM cov)",
    ] + _iter_ctes(dim, k, "it0")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT n, C, v FROM it{k}"
    )


def _hof_step_sql(table: str, dim: int, k: int) -> str:
    """``k`` further iterations over an ``(n, C, v)`` state row."""
    ctes = _iter_ctes(dim, k, table)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT n, C, v FROM it{k}"


def _hof_tail_sql(table: str, dim: int) -> str:
    """Sign pin + Rayleigh quotient + final projection over the
    ``(n, C, v)`` state row."""
    flip = "1.0D"
    for i in reversed(range(dim)):
        e = f"element_at(v, {i + 1})"
        flip = (
            f"(CASE WHEN {e} > 0 THEN 1.0D WHEN {e} < 0 THEN -1.0D"
            f" ELSE {flip} END)"
        )
    signed = (
        f"signed AS (SELECT n, C, transform(v, e -> CAST(CAST("
        f"e * {flip} AS DECIMAL(18,6)) AS DOUBLE)) AS w FROM {table})"
    )
    uprime = f"transform(C, r -> {_DOT('r', 'w')})"
    lam = _DOT("w", uprime)
    tot = " + ".join(
        f"element_at(element_at(C, {i + 1}), {i + 1})" for i in range(dim)
    )
    lam6 = f"CAST(CAST({lam} AS DECIMAL(18,6)) AS DOUBLE)"
    tot6 = f"CAST(CAST({tot} AS DECIMAL(18,6)) AS DOUBLE)"
    vcols = ", ".join(
        f"element_at(w, {i + 1}) AS v{i + 1}" for i in range(dim)
    )
    return f"""
WITH {signed}
SELECT CAST(n AS BIGINT) AS n_vecs,
       {tot6} AS total_var,
       {lam6} AS lambda1,
       CAST(CAST({lam6} / {tot6} AS DECIMAL(18,6)) AS DOUBLE) AS explained,
       {vcols}
FROM signed
"""


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

    # iterations per generated SQL statement: the analyzer resolves
    # roughly one CTE/lambda layer per Resolution pass, so one giant
    # statement hits spark.sql.analyzer.maxIterations (default 100)
    # near iters~20 and pays quadratic re-analysis below it; ~4
    # iterations (9 CTEs) per statement keeps every statement a few
    # passes regardless of ``iters``.
    _CHUNK = 4

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        spark = df.sparkSession
        k = min(self._CHUNK, self.iters)
        cur = df.sparkSession.sql(
            _hof_head_sql("{src}", self.vec_col, self.dim, k), src=df
        )
        done = k
        while done < self.iters:
            step = min(self._CHUNK, self.iters - done)
            cur = spark.sql(
                _hof_step_sql("{src}", self.dim, step), src=cur
            )
            done += step
        return spark.sql(_hof_tail_sql("{src}", self.dim), src=cur)


def power_pca_sql(
    table: str = "embeddings",
    vec: str = "embedding",
    dim: int = 8,
    iters: int = 12,
) -> str:
    """DuckDB oracle for :class:`PowerIterationPCA` — the identical
    moment aggregation and unrolled iteration chain as CTEs."""
    xs = [f"CAST({vec}[{i + 1}] AS DOUBLE)" for i in range(dim)]
    return _chain_sql(table, xs, dim, iters)

"""Differential harness: every catalog query vs its DuckDB oracle.

Mirrors the driver's check (row count + column names + order-insensitive
values) so correctness regressions surface locally before the round gate."""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from warp_pipes_spark.queries import QUERIES

ORACLED = [name for name, spec in QUERIES.items() if spec.oracle]
ROWS_ONLY = [name for name, spec in QUERIES.items() if not spec.oracle]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    # Decimals are tagged, NOT collapsed to float: the driver's value hash
    # distinguishes Decimal from float, so the local harness must too —
    # catalog queries emit DOUBLE for every fractional output column.
    if isinstance(v, decimal.Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sres = spec.fn(spark, sf_dir)
    scols_raw = sres.columns
    srows_raw = [tuple(r) for r in sres.collect()]
    ocols_raw, orows_raw = _duck(sf_dir, spec.oracle)
    assert len(srows_raw) == len(orows_raw), (
        f"{name}: row count {len(srows_raw)} vs oracle {len(orows_raw)}"
    )
    scols, srows = _normalize(scols_raw, srows_raw)
    ocols, orows = _normalize(ocols_raw, orows_raw)
    assert scols == ocols, f"{name}: columns {scols} vs oracle {ocols}"
    mismatches = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"spark={srows[mismatches[0]]} oracle={orows[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", list(QUERIES))
def test_no_decimal_output_columns(spark, sf_dir, name):
    """The driver's value hash canonicalizes Decimal and float differently
    across engines; every fractional output column must be DOUBLE (decimal
    rounding is allowed internally, never in the final schema)."""
    from pyspark.sql import types as T

    schema = QUERIES[name].fn(spark, sf_dir).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, T.DecimalType)]
    assert not bad, f"{name}: DECIMAL output columns {bad} (cast to double)"


def test_tokenization_parity_on_non_ascii(spark, tmp_path):
    """The tokenization contract (ASCII-only translate lowering) is
    bit-identical across Spark, DuckDB and the Python kernels even on
    non-ASCII input — the class of text where full Unicode lower()
    diverges between engines ('İ' expands in Python, simple-folds in
    utf8proc, and is locale-fraught on the JVM)."""
    import duckdb

    from pyspark.sql import functions as F

    from warp_pipes_spark.text.analysis import (
        ascii_lower_py,
        tokens_expr,
        tokens_sql,
    )

    texts = [
        (0, "İstanbul VISIT"),
        (1, "naïve CAFÉ café"),
        (2, "ΣΙΓΜΑ mixedCASE müller"),
        (3, "KELVINK sign"),      # U+212A lowers to ascii 'k' in full lower()
        (4, "plain ASCII Words"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    path = str(tmp_path / "nonascii.parquet")
    df.write.parquet(path)

    spark_toks = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tokens_expr(F.col("text")).alias("t")).collect()
    }
    con = duckdb.connect()
    duck_toks = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {tokens_sql('text')} FROM '{path}/*.parquet'"
        ).fetchall()
    }
    import re

    py_toks = {
        i: [x for x in re.split("[^a-z]+", ascii_lower_py(t)) if x]
        for i, t in texts
    }
    assert spark_toks == duck_toks == py_toks
    # and the contract is explicit: non-ASCII letters are separators, so
    # the Kelvin sign does NOT smuggle a 'k' into the token stream
    assert spark_toks[3] == ["kelvin", "sign"]
    assert spark_toks[0] == ["stanbul", "visit"]

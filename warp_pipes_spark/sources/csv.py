"""CSV/TSV ingestion with corrupt-record quarantine, plus ORC round-trip.

Tabular sidecar data (metadata tables, label exports, crawl manifests)
ships as CSV/TSV at least as often as JSONL; the same three-way split
applies (see ``sources/jsonl.py``): typed **good** rows, **quarantine**
rows kept verbatim for audit, and **drift** rows that parse but miss
required fields.

The read path is ``spark.read.text`` + ``from_csv`` (both JVM-side) — the
same recipe as ``read_jsonl``: the native CSV source forbids filtering on
only its corrupt-record column without a cache barrier, while ``from_csv``
with its own ``columnNameOfCorruptRecord`` marks bad lines inside a struct
we own, so the three-way split stays a plain, lazy, total partition of the
input lines. Header lines are dropped by literal match (per-file headers
are identical by construction).

ORC is Spark's other first-class columnar format; ``to_orc``/``read_orc``
round-trip a DataFrame through it so warp-pipes corpora interop with
Hive/Trino-side tooling without extra dependencies.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _header_line(schema: str, sep: str) -> str:
    fields = T.StructType.fromDDL(schema).fieldNames()
    return sep.join(fields)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    required: Optional[Sequence[str]] = None,
    header: bool = True,
    sep: str = ",",
) -> Tuple[DataFrame, DataFrame]:
    """Read CSV at ``path`` against ``schema`` (DDL string), returning
    ``(good, quarantine)`` with the same contract as ``read_jsonl``:
    quarantine rows carry the raw line in ``raw`` and a ``reason`` of
    ``unparseable`` (type mismatch / wrong arity) or ``missing_required``.
    With ``header=True`` lines equal to the schema's header row are
    skipped (CSV headers are per-file identical)."""
    text = spark.read.text(path).filter(F.trim("value") != "")
    if header:
        text = text.filter(F.col("value") != F.lit(_header_line(schema, sep)))
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed_struct = F.from_csv(
        F.col("value"),
        full_schema,
        {
            "sep": sep,
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": CORRUPT_COL,
        },
    )
    df = text.select(F.col("value").alias("__raw"), parsed_struct.alias("__p"))
    ok = F.col(f"__p.{CORRUPT_COL}").isNull()
    parsed = df.filter(ok).select("__p.*").drop(CORRUPT_COL)
    corrupt = (
        df.filter(~ok)
        .select(F.col("__raw").alias("raw"))
        .withColumn("reason", F.lit("unparseable"))
    )
    data_cols = parsed.columns
    if required:
        missing_pred = None
        for c in required:
            p = F.col(c).isNull()
            missing_pred = p if missing_pred is None else (missing_pred | p)
        drift = (
            parsed.filter(missing_pred)
            .withColumn("raw", F.lit(None).cast("string"))
            .withColumn("reason", F.lit("missing_required"))
            .select("raw", "reason", *data_cols)
        )
        good = parsed.filter(~missing_pred)
        quarantine = corrupt.select(
            "raw",
            "reason",
            *[
                F.lit(None).cast(dict(parsed.dtypes)[c]).alias(c)
                for c in data_cols
            ],
        ).unionByName(drift)
        return good, quarantine
    return parsed, corrupt


def csv_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: str,
    required: Optional[Sequence[str]] = None,
    header: bool = True,
    sep: str = ",",
) -> Tuple[int, int]:
    """Ingest-once: parse CSV, write ``good``/``quarantine`` parquet splits,
    return their counts (ingestion must account for every line)."""
    good, quarantine = read_csv(spark, src, schema, required, header, sep)
    good.write.mode("overwrite").parquet(f"{dest}/data")
    quarantine.write.mode("overwrite").parquet(f"{dest}/quarantine")
    n_good = spark.read.parquet(f"{dest}/data").count()
    n_quar = spark.read.parquet(f"{dest}/quarantine").count()
    return n_good, n_quar


def to_orc(df: DataFrame, path: str) -> None:
    """Write a DataFrame as ORC (native source, zstd)."""
    df.write.mode("overwrite").option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (native source: column pruning + predicate
    pushdown reach the stripe reader exactly as with parquet)."""
    return spark.read.orc(path)

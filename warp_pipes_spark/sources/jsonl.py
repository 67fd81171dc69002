"""JSONL corpus ingestion with corrupt-record quarantine.

LLM-pipeline corpora overwhelmingly ship as (gzipped) JSON-Lines; at crawl
scale some fraction of lines is always malformed (truncated uploads,
encoding damage, schema drift). Silently dropping them biases the corpus
and silently keeping them poisons downstream parsing — the operational
recipe is a three-way split:

- **good** rows, typed against the expected schema;
- **quarantine** rows (unparseable lines, carried verbatim for repair /
  audit — Spark's PERMISSIVE ``columnNameOfCorruptRecord`` machinery);
- **drift** rows that parse but violate declared expectations (missing
  required fields), routed by a plain filter.

Built entirely on ``spark.read.json``: schema enforcement, predicate
pushdown-compatible projection, and codegen'd parsing all come from the
native JSON source — no Python in the read path. The helpers return
DataFrames (lazy plans), so the split composes with any downstream write
(e.g. per-split parquet via ``partitionBy``).

Scale note: JSON parsing is CPU-heavy; the standard pattern is
read-JSONL-once -> write parquet (columnar, typed) -> every later pass
reads parquet. ``jsonl_to_parquet`` encodes exactly that.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    required: Optional[Sequence[str]] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` against ``schema`` (DDL string), returning
    ``(good, quarantine)``:

    - ``good``: rows that parsed AND carry every ``required`` field
      non-NULL, in the declared schema;
    - ``quarantine``: unparseable lines (verbatim in ``raw``) plus parsed
      rows missing required fields (``raw`` NULL, typed columns kept),
      each tagged with a ``reason``.

    The read path is ``spark.read.text`` + ``from_json`` (both JVM-side):
    the native JSON source forbids filtering on only its corrupt-record
    column without a cache barrier, while ``from_json`` with its own
    ``columnNameOfCorruptRecord`` marks bad lines inside the struct — a
    plain, lazy, total split."""
    text = spark.read.text(path).filter(F.trim("value") != "")
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed_struct = F.from_json(
        F.col("value"), full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
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
            .select(*data_cols)
            .withColumn("raw", F.lit(None).cast("string"))
            .withColumn("reason", F.lit("missing_required"))
            .select("raw", "reason", *data_cols)
        )
        good = parsed.filter(~missing_pred)
        quarantine = corrupt.select(
            "raw", "reason", *[F.lit(None).cast(dict(parsed.dtypes)[c]).alias(c) for c in data_cols]
        ).unionByName(drift)
        return good, quarantine
    return parsed, corrupt


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: str,
    required: Optional[Sequence[str]] = None,
) -> Tuple[int, int]:
    """The ingest-once pattern: parse JSONL, write ``good`` to
    ``dest/data`` and ``quarantine`` to ``dest/quarantine`` as parquet.
    Returns ``(n_good, n_quarantined)`` row counts (the one place counting
    is the point — ingestion must account for every line)."""
    good, quarantine = read_jsonl(spark, src, schema, required)
    good.write.mode("overwrite").parquet(f"{dest}/data")
    quarantine.write.mode("overwrite").parquet(f"{dest}/quarantine")
    n_good = spark.read.parquet(f"{dest}/data").count()
    n_quar = spark.read.parquet(f"{dest}/quarantine").count()
    return n_good, n_quar

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``warp_pipes_spark`` package; this module is a
thin adapter over its query catalog (``warp_pipes_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue per region through
    the orders->customer->nation->region join chain (broadcast dims +
    decimal-stable aggregation)."""
    from warp_pipes_spark.queries import q07_multijoin

    return q07_multijoin(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from warp_pipes_spark.queries import query_fns

    return query_fns()


def oracle_sql() -> dict[str, str]:
    from warp_pipes_spark.queries import oracle_sqls

    return oracle_sqls()

"""Interactive profiling helpers for the optimization round.

Run inside `python -i tools/prof_shell.py`: builds a warm Spark session
and exposes `t(name)` (cold-ish timed noop run of a catalog query),
`tn(name, n)` (repeat), `ex(name)` (formatted plan), `clear()` (wipe all
artifact caches). Dev-only; not part of the driver contract.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from warp_pipes_spark.queries import QUERIES  # noqa: E402
from warp_pipes_spark.session import get_spark  # noqa: E402
from warp_pipes_spark.pipes.cache import clear_all_artifact_caches  # noqa: E402

spark = get_spark(app_name="wps-prof")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()


def clear():
    clear_all_artifact_caches()


def t(name, sf=SF):
    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    print(f"{name}: {dt:.3f}s")
    return dt


def tn(name, n=3, sf=SF):
    return [t(name, sf) for _ in range(n)]


def ex(name, sf=SF):
    df = QUERIES[name].fn(spark, sf)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


def tf(df):
    """Time an arbitrary dataframe through the noop sink."""
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{dt:.3f}s")
    return dt


print("profiling shell ready: t(), tn(), ex(), tf(), clear()")

"""cProfile the driver-side DataFrame construction of catalog queries
(no execution). Dev-only.

Usage: python tools/prof_construct.py q32_bm25 [q04_group_agg ...]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from warp_pipes_spark.queries import QUERIES  # noqa: E402
from warp_pipes_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="prof-construct")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()

for name in sys.argv[1:]:
    # warm pass: builds artifact caches so the profile shows the warm path
    t0 = time.perf_counter()
    df = QUERIES[name].fn(spark, SF)
    c1 = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    e1 = time.perf_counter() - t0 - c1
    spark.catalog.clearCache()

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    df = QUERIES[name].fn(spark, SF)
    pr.disable()
    c2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    e2 = time.perf_counter() - t0
    spark.catalog.clearCache()

    print(f"\n===== {name}: construct cold={c1:.2f}s warm={c2:.2f}s | exec cold={e1:.2f}s warm={e2:.2f}s")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(22)
    print("\n".join(s.getvalue().splitlines()[:46]), flush=True)

"""Count Spark jobs + wall time per catalog query (cold artifact caches),
to expose fixed per-job overhead. Dev-only.

Usage: python tools/job_count.py q32_bm25 q01_select ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from warp_pipes_spark.queries import QUERIES  # noqa: E402
from warp_pipes_spark.session import get_spark  # noqa: E402
from warp_pipes_spark.pipes.cache import clear_all_artifact_caches  # noqa: E402

spark = get_spark(app_name="job-count")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
sc.range(1).count()

tracker = sc.statusTracker()

for name in sys.argv[1:]:
    clear_all_artifact_caches()
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    jobs = len(tracker.getJobIdsForGroup(name))
    spark.catalog.clearCache()
    # warm second run (artifacts now built)
    sc.setJobGroup(name + ":warm", name)
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    dtw = time.perf_counter() - t0
    jobsw = len(tracker.getJobIdsForGroup(name + ":warm"))
    spark.catalog.clearCache()
    print(f"{name}: cold {dt:6.2f}s {jobs:3d} jobs | warm {dtw:6.2f}s {jobsw:3d} jobs", flush=True)

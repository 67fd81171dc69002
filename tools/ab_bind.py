"""One-shot A/B driver for the bind_expr change: cold-times the affected
queries (3 reps, artifact caches cleared per rep) in a fresh JVM with one
warmup query first. Dev-only."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "run"

from warp_pipes_spark.queries import QUERIES  # noqa: E402
from warp_pipes_spark.session import get_spark  # noqa: E402
from warp_pipes_spark.pipes.cache import clear_all_artifact_caches  # noqa: E402

spark = get_spark(app_name=f"ab-{TAG}")
spark.sparkContext.setLogLevel("ERROR")

# warm JVM + python workers with an unrelated query
QUERIES["q83_profile"].fn(spark, SF).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()

out = {}
for name in ["q62_repetition", "q28_minhash_dedup", "q228_trigram_search",
             "q229_trigram_similarity", "q235_trigram_append"]:
    reps = []
    for _ in range(3):
        clear_all_artifact_caches()
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    out[name] = reps
    print(name, reps, flush=True)

print(json.dumps({"tag": TAG, "times": out}))

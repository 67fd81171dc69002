"""One-off eval-tier cold/warm measurement at a scaled dir (the soak's
eval block, standalone): warms the shared index artifacts via q32/q30
shapes first, then for each eval query measures results-cache-cold and
results-cache-warm runs. Prints JSON to stdout; touches no repo
artifact. Dev-only.

Usage: python tools/eval_cw.py [scaled_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_TIER = [
    "q129_mrr_eval", "q138_hybrid_rrf", "q139_ndcg_eval",
    "q141_rerank_cascade", "q174_prf_expansion", "q219_ranker_agreement",
    "q226_rbo_agreement",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else EVAL_TIER
    from warp_pipes_spark.queries import QUERIES
    from warp_pipes_spark.session import get_spark
    from warp_pipes_spark.pipes.cache import clear_all_artifact_caches
    from warp_pipes_spark.search.cached import clear_results_cache

    spark = get_spark(app_name="eval-cw")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    clear_all_artifact_caches()

    def _force(name):
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # warm the shared index/codebook artifacts exactly like a full soak
    # would have by the time the eval tier runs
    for warmup in ("q32_bm25", "q217_dirichlet_ql", "q136_hard_negatives"):
        _force(warmup)
        spark.catalog.clearCache()

    out = {}
    for name in names:
        clear_results_cache()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _force(name)
        cold = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _force(name)
        warm = round(time.perf_counter() - t0, 2)
        out[name] = {"cold_s": cold, "warm_s": warm}
        print(f"EVAL {name} cold={cold}s warm={warm}s", flush=True)
        spark.sparkContext._jvm.System.gc()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

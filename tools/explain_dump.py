"""Dump .explain("formatted") for named catalog queries to plans/<round>/.

Usage: python tools/explain_dump.py <suffix> q32_bm25 [q88_bm25f ...]
  suffix: "before" | "after" (file becomes plans/<round>/<name>_<suffix>.txt)
Optional env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_PLANS_DIR (default plans/r08).

Plans are captured WITHOUT executing the query (explain only), so cached
artifacts are not built: for index-backed engines the plan shows the
cold path (the build subtree) when the artifact cache is empty and the
warm path (a plain scan of the materialized artifact) when it is warm —
state whichever was captured in OPTIMIZATION_r08.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"
    )
    os.makedirs(out_dir, exist_ok=True)

    from warp_pipes_spark.queries import QUERIES
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="wps-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()

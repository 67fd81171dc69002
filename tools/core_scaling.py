"""Per-query core-count scaling evidence (VERDICT r08 item 7).

Runs the top data-heavy sf1 queries through bench.py twice — once at 32
cores, once at 8 — in fresh JVMs with ALL artifact caches wiped at the
start of each run (bench.py's own cold discipline), and records the
per-query wall ratio t(8)/t(32). A ratio near 4 means the query's wall
is data-parallel work; near 1 means it is bound by the scale-independent
per-query floor (planning, driver jobs, synchronous iteration barriers)
— the distinction the driver's empty scaling block could not show.

Methodology notes:
- Queries run in catalog order inside ONE bench process per core count,
  so intra-run artifact sharing (e.g. q32 building the BM25 index that
  q54/q114/q129... reuse) matches the real bench exactly; each query's
  number is its cost in that shared-cold context.
- sf1 comes from tools/gen_scale.py (10 shifted replicas of sf0.1).

Usage: python tools/core_scaling.py [sf_dir] [q1,q2,...]
Writes CORE_SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# top-20 data-heavy queries by BENCH_sf1.json cold wall (r08 round end)
DEFAULT_QUERIES = [
    "q238_boolean_search",
    "q229_trigram_similarity",
    "q138_hybrid_rrf",
    "q32_bm25",
    "q233_wildcard_search",
    "q27_ngram_jaccard",
    "q88_bm25f",
    "q174_prf_expansion",
    "q54_bm25_scaled_aux",
    "q235_trigram_append",
    "q182_ann_recall_sweep",
    "q114_bm25_incremental",
    "q217_dirichlet_ql",
    "q37_index_rerank",
    "q231_phrase_search",
    "q219_ranker_agreement",
    "q136_hard_negatives",
    "q97_pagerank",
    "q129_mrr_eval",
    "q128_knn_classifier",
]

CPU_POINTS = (32, 8)


def run_bench(sf_dir: str, cpus: int, names: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(names)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"bench rc={proc.returncode} at cpus={cpus}")
    detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    snap = os.path.join("/tmp", f"core_scaling_detail_c{cpus}.json")
    shutil.copy(detail_path, snap)
    print(f"cpus={cpus}: total {detail['value']}s over {detail['n_queries']} "
          f"queries (process wall {wall:.0f}s) -> {snap}", flush=True)
    return detail["queries"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    runs = {c: run_bench(sf_dir, c, names) for c in CPU_POINTS}
    hi, lo = CPU_POINTS
    per_query = {}
    for n in names:
        t_hi, t_lo = runs[hi].get(n), runs[lo].get(n)
        if t_hi is None or t_lo is None:
            continue
        ratio = round(t_lo / t_hi, 2) if t_hi > 0.05 else None
        per_query[n] = {
            f"cold_s_c{hi}": t_hi,
            f"cold_s_c{lo}": t_lo,
            "ratio_low_over_high": ratio,
            # 4x cores ideal ratio is 4.0; <=1.3 ~= overhead-bound
            "bound": (
                "data-parallel" if ratio and ratio >= 2.0
                else "mixed" if ratio and ratio > 1.3
                else "overhead/iteration-bound"
            ),
        }
    out = {
        "metric": "core_scaling",
        "sf_dir": sf_dir,
        "cpus": list(CPU_POINTS),
        "method": "bench.py cold per core count (all artifact caches wiped, "
                  "noop-forced, catalog order), fresh JVM each",
        "queries": per_query,
        "totals": {str(c): round(sum(runs[c].values()), 2) for c in CPU_POINTS},
    }
    with open(os.path.join(ROOT, "CORE_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print(json.dumps(out["totals"]))


if __name__ == "__main__":
    main()

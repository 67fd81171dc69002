"""Heavy-query parity sweep at sf0.1 — 100x more data exposure than the
in-repo harness (sf0.001) and 10x the driver gate (sf0.01), so decimal /
rounding / overflow edge cases that need row volume to trigger actually
get exercised once per round (round-4 judge task #5).

Runs the most expensive ORACLED catalog queries, compares Spark vs the
DuckDB oracle exactly the way the driver does (sorted stringified rows),
and writes PARITY_sf0.1.json.

Usage: python tools/parity_sweep.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the sweep scale must be set BEFORE the first queries import: q47's oracle
# embeds IVF centroid literals retrained from this dir at import time
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)

# the round-4/5 cost leaders among ORACLED queries (BENCH_DETAIL /
# sf1-soak tiers), spanning every numeric family: BM25 + PRF, graph
# iteration, dedup (MinHash/SimHash/maximal-span/semantic), DSIR,
# WordPiece + packing, sketches, eval metrics, ANN
DEFAULT_QUERIES = [
    "q28_minhash_dedup", "q29_simhash_dedup", "q32_bm25", "q47_ivf_topk",
    "q85_semdedup", "q88_bm25f", "q97_pagerank", "q114_bm25_incremental",
    "q133_connected_components", "q136_hard_negatives", "q138_hybrid_rrf",
    "q146_wordpiece", "q151_maximal_spans", "q153_dsir_select",
    "q165_packed_batches", "q171_stupid_backoff", "q174_prf_expansion",
    "q175_curation_funnel", "q176_gopher_repetition", "q177_kcore",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES

    from __spark_entry__ import oracle_sql, queries
    from warp_pipes_spark.session import get_spark

    qs, oracles = queries(), oracle_sql()
    spark = get_spark(app_name="parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    results, n_pass = {}, 0
    for name in names:
        if name not in oracles:
            results[name] = {"status": "skipped", "reason": "rows-only"}
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(str(r[c]) for c in cols) for r in sdf.collect()
            )
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                tuple(str(row[i]) for i in idx) for row in cur.fetchall()
            )
            ok = srows == orows and sorted(ocols) == cols
            results[name] = {
                "status": "pass" if ok else "FAIL",
                "rows": len(srows),
                "sec": round(time.perf_counter() - t0, 2),
            }
            n_pass += ok
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "status": "ERROR",
                "error": f"{type(e).__name__}: {e}"[:300],
            }
        print(f"PARITY {name} {results[name]['status']}", flush=True)
        spark.catalog.clearCache()
    out = {
        "sf_dir": SF_DIR,
        "n_pass": n_pass,
        "n_total": len([n for n in names if n in oracles]),
        "queries": results,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PARITY_sf0.1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"DONE {n_pass}/{out['n_total']}")


if __name__ == "__main__":
    main()

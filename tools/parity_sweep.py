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

# the 50 most expensive ORACLED queries by the round-6 warm sf0.1
# BENCH_DETAIL ranking (round-5 judge task #4 widened the round-4 top-30
# to 50), plus the round-4/5 heavy additions not in that top-50 —
# spanning every numeric family: BM25 + PRF, graph iteration, dedup
# (MinHash/SimHash/maximal-span/semantic), DSIR, WordPiece + packing,
# sketches, eval metrics, ANN
DEFAULT_QUERIES = [
    "q201_kcore_dense", "q177_kcore", "q175_curation_funnel",
    "q174_prf_expansion", "q158_incremental_minhash", "q122_maxsim",
    "q138_hybrid_rrf", "q141_rerank_cascade", "q115_triangles", "q32_bm25",
    "q196_cluster_size_profile", "q133_connected_components",
    "q136_hard_negatives", "q39_lsh_topk", "q189_calibration",
    "q28_minhash_dedup", "q131_item_recs", "q43_bm25_filtered",
    "q108_matryoshka_topk", "q54_bm25_scaled_aux", "q27_ngram_jaccard",
    "q55_dedup_clusters", "q153_dsir_select", "q114_bm25_incremental",
    "q199_dedup_threshold_sweep", "q67_quantized_topk", "q154_unimax",
    "q182_ann_recall_sweep", "q97_pagerank", "q88_bm25f", "q98_copurchase",
    "q167_dup_attribution", "q171_stupid_backoff", "q73_cluster_reps",
    "q160_split_leakage", "q112_passage_doc_embeddings", "q150_sft_ids",
    "q165_packed_batches", "q127_bigram_lm", "q37_index_rerank",
    "q137_minhash_estimate", "q57_weighted_mixture",
    "q161_tokenizer_fertility", "q121_mmr_rerank", "q79_incremental_dedup",
    "q188_lsh_s_curve", "q146_wordpiece", "q194_hll_rollup",
    "q186_embedding_drift", "q191_dedup_agreement",
    # prior-round heavies kept for coverage continuity
    "q29_simhash_dedup", "q47_ivf_topk", "q85_semdedup",
    "q151_maximal_spans", "q176_gopher_repetition",
    "q190_capacity_sweep", "q193_source_divergence",
    "q200_boilerplate_lines",
    # round-6 additions (every new numeric family at 100x harness scale)
    "q202_containment_pairs", "q203_chunk_dedup", "q204_term_burstiness",
    "q205_bootstrap_ci", "q206_hilbert_layout", "q207_kneser_ney",
    "q208_kmeans", "q209_ivf_balance", "q210_ks_drift",
    "q211_label_propagation",
    # round-6 session-2 additions
    "q212_contingency_panel", "q213_key_skew", "q214_langid_confusion",
    "q215_neyman_allocation", "q216_power_pca", "q217_dirichlet_ql",
    "q218_curriculum_report", "q219_ranker_agreement",
    "q220_wilson_keep_rates", "q221_benford_audit",
    # round-6 session-3 additions
    "q222_diversity_report", "q223_vocabulary_profile",
    "q224_spearman_panel", "q225_mixture_concentration",
    "q99_fuzzy_match",
    # round-7 additions (q228 was missing from the round-7 sweep — the
    # round-7 judge's stale-artifact finding; keep every new engine here)
    "q226_rbo_agreement", "q227_robust_outliers", "q228_trigram_search",
    # round-8 additions
    "q229_trigram_similarity", "q230_fuzzy_join", "q231_phrase_search",
    "q232_textrank_keywords", "q233_wildcard_search",
    "q234_entity_resolution", "q235_trigram_append",
    "q236_rolling_outliers", "q237_spell_correct",
    "q238_boolean_search", "q239_leakage_safe_split",
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

    def fresh_con():
        # one connection PER QUERY: materialized CTEs and recursive packs
        # at sf0.1 accumulate across statements and OOM a shared session
        c = duckdb.connect()
        # the co-resident Spark JVM holds most of the container's RAM;
        # cap DuckDB and give it a spill directory so the big oracles
        # (90M-row gram unions, recursive packs) go out-of-core instead
        # of OOM-ing
        c.execute(
            f"SET memory_limit='{os.environ.get('PARITY_DUCK_MEM', '60GB')}'"
        )
        # fewer threads = fewer per-thread operator buffers; the big
        # gram-union oracles fit at 8 threads where 32 OOM
        c.execute("SET threads=8")
        c.execute("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            # testdata tables are single files; gen_scale dirs are
            # Spark-written parquet DIRECTORIES — DuckDB needs the glob
            p = f"{SF_DIR}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # artifact name follows the sweep scale (PARITY_sf0.1.json /
    # PARITY_sf1.json ...); override with PARITY_OUT for ad-hoc runs
    path = os.path.join(
        repo, os.environ.get("PARITY_OUT", "PARITY_sf0.1.json")
    )

    def _write_artifact(results):
        # MERGE into the existing artifact (subset re-runs must not
        # erase the other queries' rows); only COMPLETED comparisons
        # (status set) are persisted
        done = {k: v for k, v in results.items() if "status" in v}
        merged = dict(done)
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f).get("queries", {})
            prev.update(done)
            merged = prev
        out = {
            "sf_dir": SF_DIR,
            "n_pass": sum(
                1 for v in merged.values() if v.get("status") == "pass"
            ),
            "n_total": len(
                [n for n in merged if merged[n].get("status") != "skipped"]
            ),
            "queries": merged,
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    # PHASE 1: all Spark results, then STOP the JVM — it holds most of
    # the container's RAM, and the big oracles (90M-row gram unions,
    # recursive packs) need it; running the engines sequentially gives
    # each one the whole machine
    spark_rows, spark_cols, results, n_pass = {}, {}, {}, 0
    for name in names:
        if name not in oracles:
            results[name] = {"status": "skipped", "reason": "rows-only"}
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            cols = sorted(sdf.columns)
            spark_cols[name] = cols
            spark_rows[name] = sorted(
                tuple(str(r[c]) for c in cols) for r in sdf.collect()
            )
            results[name] = {
                "rows": len(spark_rows[name]),
                "spark_sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "status": "ERROR",
                "error": f"spark {type(e).__name__}: {e}"[:300],
            }
        print(f"SPARK {name} done", flush=True)
        spark.catalog.clearCache()
    spark.stop()

    # PHASE 2: oracles with the full machine
    for name in names:
        if name not in oracles or "error" in results.get(name, {}):
            continue
        t0 = time.perf_counter()
        try:
            con = fresh_con()
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                tuple(str(row[i]) for i in idx) for row in cur.fetchall()
            )
            con.close()
            ok = (
                spark_rows[name] == orows
                and sorted(ocols) == spark_cols[name]
            )
            results[name]["status"] = "pass" if ok else "FAIL"
            results[name]["oracle_sec"] = round(time.perf_counter() - t0, 2)
            n_pass += ok
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "status": "ERROR",
                "error": f"oracle {type(e).__name__}: {e}"[:300],
            }
        print(f"PARITY {name} {results[name].get('status')}", flush=True)
        # write-through after EVERY oracle: a killed/timed-out sweep
        # keeps its finished rows (two 80-minute sf1 runs were lost to
        # the old end-of-run-only write)
        out = _write_artifact(results)
    out = _write_artifact(results)
    print(
        f"DONE run {n_pass}/{len(results)}; "
        f"artifact {out['n_pass']}/{out['n_total']}"
    )


if __name__ == "__main__":
    main()

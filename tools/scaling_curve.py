"""Scaling-curve harness: measure representative catalog queries at
sf0.1 / sf1 / sf3 (1x / 10x / 30x the bench dir) and fit the empirical
scaling exponent, so the "would this survive 100x?" design claims carry
MEASURED slopes instead of plan-shape arguments alone.

For each query and scale the harness records a COLD run (includes
fingerprint-cached artifact builds — the real first-epoch cost) and a
WARM run (artifacts + FS cache hot — the steady-state cost). The
exponent is fit on warm runs between sf1 and sf3:

    exp = log(t_sf3 / t_sf1) / log(3)

exp ~ 1 is linear scaling (the design target for scan/agg/search
pipelines); exp ~ 2 means a pair explosion is outgrowing its banding
and would NOT survive 100x. Sub-second sf1 rows are skipped for the fit
(timer noise dominates).

Scaled dirs come from tools/gen_scale.py (deterministic shifted
replicas; distributions survive, exact self-similarity doesn't).

Usage: python tools/scaling_curve.py [q1,q2,...]
Writes SCALING.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# spans the cost families: BM25 + QL + PRF fusion, banded Levenshtein,
# two-stage ANN + brute-force cosine, MinHash/banded dedup + funnel,
# graph iteration, gram dedup, packing, plain agg + windows as controls
DEFAULT_QUERIES = [
    "q04_group_agg",
    "q10_window_topk",
    "q28_minhash_dedup",
    "q30_cosine_topk",
    "q32_bm25",
    "q88_bm25f",
    "q97_pagerank",
    "q99_fuzzy_match",
    "q108_matryoshka_topk",
    "q133_connected_components",
    "q137_minhash_estimate",
    "q151_maximal_spans",
    "q175_curation_funnel",
    "q188_lsh_s_curve",
    "q191_dedup_agreement",
    "q196_cluster_size_profile",
    "q217_dirichlet_ql",
    "q223_vocabulary_profile",
    # round-8: sub-quadratic fuzzy self-join + the cached eval tier
    # (whose warm_s rows measure the results-cache claim directly)
    "q230_fuzzy_join",
    "q129_mrr_eval",
    "q174_prf_expansion",
]

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf1", "/tmp/spark_graft_sf1", 10),
    ("sf3", "/tmp/spark_graft_sf3", 30),
]


def _fixed_makers():
    """Fixed-query-batch search variants: the catalog's search queries
    draw their query batch FROM the corpus (doc_id % 25), so their cost
    is intrinsically quadratic in scale — batch x corpus both grow. The
    100 TB question is different: a production query batch is FIXED
    while the corpus grows, so cost should be LINEAR in corpus. These
    makers pin the batch to the base-copy id range (present unchanged at
    every gen_scale scale) and measure that claim directly."""
    from pyspark.sql import functions as F

    from warp_pipes_spark.queries import T, _bm25_queries

    def bm25_fixed(spark, sf):
        from warp_pipes_spark.search.bm25 import Bm25Search

        qs = _bm25_queries(spark, sf).filter(F.col("query_id") < 5000)
        return Bm25Search(corpus=T(spark, sf, "documents"), k=10)(qs)

    def ql_fixed(spark, sf):
        from warp_pipes_spark.search.ql import DirichletQLSearch

        qs = _bm25_queries(spark, sf).filter(F.col("query_id") < 5000)
        return DirichletQLSearch(
            corpus=T(spark, sf, "documents"), k=10, mu=2000
        )(qs)

    def cosine_fixed(spark, sf):
        from warp_pipes_spark.ml.similarity import BruteForceCosineTopK

        emb = T(spark, sf, "embeddings")
        qs = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000))
        return BruteForceCosineTopK(
            corpus=emb, k=5, exclude_self=True, dim=64
        )(qs)

    def matryoshka_fixed(spark, sf):
        from warp_pipes_spark.ml.similarity import MatryoshkaTopK

        emb = T(spark, sf, "embeddings")
        qs = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000))
        return MatryoshkaTopK(
            corpus=emb, k=5, prefix_dim=16, prefilter_k=50, exclude_self=True
        )(qs)

    def ivf_fixed(spark, sf):
        from warp_pipes_spark.ml.similarity import IvfCosineTopK

        emb = T(spark, sf, "embeddings")
        qs = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000))
        return IvfCosineTopK(
            corpus=emb, k=5, n_centroids=16, n_probe=4, exclude_self=True
        )(qs)

    def sq8_fixed(spark, sf):
        from warp_pipes_spark.ml.quantize import quantized_corpus
        from warp_pipes_spark.ml.similarity import BruteForceCosineTopK

        emb = T(spark, sf, "embeddings")
        codes, sq = quantized_corpus(emb.select("vec_id", "embedding"), dim=64)
        recon = sq.decode(codes).drop("codes")
        qs = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2000))
        return BruteForceCosineTopK(
            corpus=recon, k=5, exclude_self=True, dim=64
        )(qs)

    def trigram_fixed(spark, sf):
        from warp_pipes_spark.search.trigram import TrigramSubstringSearch

        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length("text") >= 90)
            & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 50, 40).alias("pattern"),
        )
        return TrigramSubstringSearch(corpus=docs)(qs)

    def trgm_sim_fixed(spark, sf):
        from warp_pipes_spark.search.trigram import TrigramSimilaritySearch

        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length("text") >= 90)
            & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 50, 40).alias("pattern"),
        )
        return TrigramSimilaritySearch(corpus=docs, tau=0.25)(qs)

    def phrase_fixed(spark, sf):
        from warp_pipes_spark.search.phrase import PhraseSearch
        from warp_pipes_spark.text.analysis import tokens_expr

        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(tokens_expr(F.col("text")), 1, 3), " "
            ).alias("phrase"),
        )
        return PhraseSearch(corpus=docs)(qs)

    def bool_fixed(spark, sf):
        from warp_pipes_spark.search.boolean import BooleanSearch
        from warp_pipes_spark.text.analysis import tokens_expr

        docs = T(spark, sf, "documents")
        toks = tokens_expr(F.col("text"))
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.slice(toks, 1, 2).alias("must"),
            F.slice(toks, 8, 1).alias("must_not"),
        )
        return BooleanSearch(corpus=docs)(qs)

    def wildcard_fixed(spark, sf):
        from warp_pipes_spark.search.trigram import WildcardLikeSearch

        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length("text") >= 90)
            & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.concat(
                F.substring("text", 45, 10),
                F.lit("%"),
                F.substring("text", 65, 10),
            ).alias("pattern"),
        )
        return WildcardLikeSearch(corpus=docs)(qs)

    return {
        "bm25_fixed_batch": bm25_fixed,
        "ql_fixed_batch": ql_fixed,
        "cosine_fixed_batch": cosine_fixed,
        "matryoshka_fixed_batch": matryoshka_fixed,
        "ivf_fixed_batch": ivf_fixed,
        "sq8_fixed_batch": sq8_fixed,
        "trigram_fixed_batch": trigram_fixed,
        "trgm_sim_fixed_batch": trgm_sim_fixed,
        "phrase_fixed_batch": phrase_fixed,
        "bool_fixed_batch": bool_fixed,
        "wildcard_fixed_batch": wildcard_fixed,
    }


def _ensure_dirs() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    for _, path, copies in SCALES:
        if copies == 1 or os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        print(f"GEN {path} ({copies} copies)", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(here, "gen_scale.py"), path,
             str(copies)],
            check=True,
        )


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT_QUERIES
    _ensure_dirs()

    from warp_pipes_spark.queries import QUERIES
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    # cold-run honesty (round-8 VERDICT item 8): wipe EVERY on-disk
    # artifact cache, not just retrieval results — otherwise a prior
    # invocation's index postings make the "cold" rows silently warm
    from warp_pipes_spark.pipes.cache import clear_all_artifact_caches

    clear_all_artifact_caches()


    fixed = _fixed_makers()
    makers = {}
    for name in names:
        if name in fixed:
            makers[name] = fixed[name]
        elif name == "FIXED":  # all fixed-batch makers
            makers.update(fixed)
        else:
            makers[name] = QUERIES[name].fn
    if len(sys.argv) <= 1:
        makers.update(fixed)

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    def _force(df):
        """noop-sink forcing with same-pass row observation — a bare
        count() lets Catalyst prune the expensive branches entirely
        (q151: 2 s counted vs 104 s real at sf1)."""
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
            "noop"
        ).mode("overwrite").save()
        return obs.get["n"]

    results: dict = {}
    for name, make in makers.items():
        row: dict = {}
        for label, path, _ in SCALES:
            t0 = time.perf_counter()
            n = _force(make(spark, path))
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            _force(make(spark, path))
            warm = time.perf_counter() - t0
            row[label] = {
                "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "rows": n,
            }
            spark.catalog.clearCache()
        t1, t3 = row["sf1"]["warm_s"], row["sf3"]["warm_s"]
        if t1 >= 1.0:
            row["exp_sf1_to_sf3"] = round(math.log(t3 / t1) / math.log(3), 2)
        else:
            row["exp_sf1_to_sf3"] = None  # timer noise floor
        results[name] = row
        print(
            f"SCALE {name} sf0.1={row['sf0.1']['warm_s']}s "
            f"sf1={t1}s sf3={t3}s exp={row['exp_sf1_to_sf3']}",
            flush=True,
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALING.json")
    # MERGE into the existing artifact (subset re-runs must not erase
    # the other rows — same convention as tools/parity_sweep.py)
    merged = results
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        prev.update(results)
        merged = prev
    out = {
        "metric": "scaling_curve",
        "scales": {l: c for l, _, c in SCALES},
        "fit": "exp = log(t_sf3/t_sf1)/log(3) on warm runs; None below 1s",
        "queries": merged,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()

"""Cluster-layout invariance: catalog queries must return bit-identical
results regardless of how the data is partitioned.

This is the core 100 TB correctness risk — an operator that is only
correct under one layout (e.g. a float sum whose value depends on
reduction order, an iterative algorithm whose fixpoint depends on task
scheduling, a top-k whose ties break nondeterministically) passes a
single-run oracle check and silently diverges on a real cluster. Every
query here is re-run under a different ``spark.sql.shuffle.partitions``
(changing shuffle fan-out, task boundaries and reduction order) and must
produce the exact same rows.

The sample spans the layout-sensitive families: iterative graph
fixpoints, sketch builds, LSH banding, window top-k with ties,
decimal-stable aggregation, deterministic epoch shuffling, and BM25
scoring (decimal per-term sums).
"""

from __future__ import annotations

import pytest

from warp_pipes_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"

INVARIANT_QUERIES = [
    "q04_group_agg",            # decimal-stable float aggregation
    "q10_window_topk",          # rank ties
    "q28_minhash_dedup",        # LSH banding + bucket join
    "q55_dedup_clusters",       # union-find over candidate pairs
    "q59_epoch_shuffle",        # deterministic hash shuffle
    "q97_pagerank",             # iterative float fixpoint (decimal-stable)
    "q133_connected_components",  # iterative hash-min fixpoint
    "q135_cms_heavy_hitters",   # sketch build via hash-aggregate
    "q137_minhash_estimate",    # portable signatures + pair join
    "q138_hybrid_rrf",          # decimal-rounded rank-fusion sums
    "q142_temperature_mix",     # in-plan derived weights + keyed fan-out
    # round-3 additions
    "q38_merge_scores",         # offset-by-min merge (window min + full outer)
    "q47_ivf_topk",             # md5-sampled k-means train + cell join
    "q95_pq_topk",              # PQ codebook train + decimal-quantized ADC
    "q92_bpe_tokens",           # trained merges + greedy encode
    "q146_wordpiece",           # Arrow-batched greedy matcher w/ word cache
    "q147_fix_encoding",        # literal/regex repair chain
    "q148_portable_hll",        # md5 registers + exact-integer harmonics
    "q149_sft_masks",           # segment-wise mask construction
    # round-4 additions
    "q150_sft_ids",             # WordPiece ids across Arrow batch layouts
    "q151_maximal_spans",       # gram counts + island merge from sorted arrays
    "q153_dsir_select",         # decimal log-ratio sums + global top-k ties
    "q154_unimax",              # driver waterfall + md5 gate
    # round-4 session-2 additions
    "q163_kmv_overlap",         # bottom-k window over distinct hashes + pair algebra
    "q165_packed_batches",      # BFD applyInPandas groups + sorted-struct reassembly
    "q168_priority_sample",     # TakeOrdered global top-k with rounded-priority ties
    "q170_rouge_eval",          # tagged explode + clip aggregate + pivot
    "q171_stupid_backoff",      # order-tagged counts + left-join score chain
    "q176_gopher_repetition",   # max(struct) most-frequent tie-break + pivot
    "q177_kcore",               # fixed-round iterative peel (semi-join loop)
    "q179_token_budget",        # signed leftover waterfall + remainder ranking
    "q180_multiturn_sft",       # per-turn tokenize + sorted-struct reassembly
    "q182_ann_recall_sweep",    # persisted exact side + LSH sweep joins
    # round-5 additions
    "q186_embedding_drift",     # integer-numerator PSI decimal sums
    "q187_vocab_growth",        # per-term min-gate + conditional sums
    "q188_lsh_s_curve",         # pair set + row-local band bits + bucket agg
    "q189_calibration",         # scaled-long binning + exact gap algebra
    "q191_dedup_agreement",     # two signature verdicts + 2x2 kappa
    "q193_source_divergence",   # integer-numerator JS decimal sums
    "q194_hll_rollup",          # register merge across group frames
    "q195_tfidf_keywords",      # integer tf x rounded idf + ranked ties
    "q196_cluster_size_profile",  # pointer-jumping clusters + histogram
    "q198_pmi_collocations",    # exact-ratio lns + ranked ties
    "q200_boilerplate_lines",   # carried-label explode + max-struct pick
]


def _rows(spark, name):
    df = QUERIES[name].fn(spark, SF)
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_layout_invariant(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spark, name)
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
    assert a == b, f"{name}: results differ across shuffle layouts"

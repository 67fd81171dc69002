"""Smoke tests: every user-guide example runs and returns sane output.

The examples mirror the reference's ``user_guide/src/examples/`` (see
``examples/README.md`` for the mapping); these tests keep them executable
as the operator APIs evolve.
"""

from __future__ import annotations

import importlib
import os
import sys


EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
sys.path.insert(0, EXAMPLES_DIR)


def _mod(name):
    return importlib.import_module(name)


def test_tokenize_in_parallel(spark):
    out = _mod("tokenize_in_parallel").run(spark)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["document.tokens"][:2] == ["fipple", "flutes"]
    assert r["title.tokens"] == ["title", "pipe"]
    assert len(r["document.input_ids"]) == len(r["document.offset_mapping"])


def test_generate_passages_example(spark):
    out = _mod("generate_passages").run(spark).collect()
    assert len(out) > 2
    for r in out:
        assert len(r["input_ids"]) == 30  # padded to size
        assert r["input_ids"][0] == 101  # [CLS]
        assert len(r["input_ids"]) == len(r["attention_mask"])
    # doc 0's windows all carry the 2-token title after [CLS]
    doc0 = [r for r in out if r["idx"] == 0]
    assert all(r["input_ids"][1:3] == [7001, 7002] for r in doc0)


def test_collate_documents_example(spark):
    out = _mod("collate_documents").run(spark).collect()
    assert len(out) == 3
    for r in out:
        assert len(r["document.input_ids"]) == 6
        assert len(r["document.attention_mask"]) == 6


def test_passages_and_collate_example(spark):
    out = _mod("passages_and_collate").run(spark).collect()
    assert len(out) >= 4
    for r in out:
        assert len(r["document.input_ids"]) == 16
        assert r["document.input_ids"][0] == -1  # [CLS]


def test_custom_search_engine_example(spark):
    mod = _mod("custom_search_engine")
    from warp_pipes_spark.search.auto import ENGINES

    assert ENGINES["dot"] is mod.DotProductSearch  # registry hookup
    out = mod.run(spark).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 3
        # self-match ranks first on raw dot product of unit-ish vectors
        top = min(rows, key=lambda r: r["rank"])
        assert top["idx"] == q


def test_ivf_search_engine_example(spark):
    mod = _mod("ivf_search_engine")
    out = mod.run(spark).collect()
    assert len(out) > 0
    assert mod.recall_vs_exact(spark) >= 0.5  # n_probe=3 of 8 cells


def test_index_pipeline_example(spark):
    out = _mod("index_pipeline").run(spark).collect()
    qids = {r["query_id"] for r in out}
    assert 9000 in qids and 9001 in qids  # ad-hoc batch matched
    assert any(q < 9000 for q in qids)  # dataset split matched
    for r in out:
        assert 1 <= r["rank"] <= 5


def test_hybrid_retrieval_example(spark):
    out = _mod("hybrid_retrieval").run(spark).collect()
    assert len(out) > 0
    by_q = {}
    for r in out:
        assert 1 <= r["rank"] <= 3
        by_q.setdefault(r["query_id"], []).append(r)
    # every query's own doc is a fused candidate; overlap rerank puts the
    # (identical-prefix) source doc at a valid rank with a positive score
    for qid, rows in by_q.items():
        assert any(r["score"] > 0 for r in rows)


def test_predict_with_model_example(spark, tmp_path):
    out = _mod("predict_with_model").run(spark, cache_dir=str(tmp_path / "pc"))
    rows = out.collect()
    assert len(rows) > 0
    assert all(len(r["mlp_vector"]) == 8 for r in rows)
    # deterministic weights -> deterministic outputs
    first = sorted(rows, key=lambda r: r["row_id"])[0]
    import numpy as np

    from predict_with_model import build_model

    mlp, _, _ = build_model(spark)
    expect = mlp(np.array([first["embedding"]], dtype=object))[0]
    assert np.allclose(np.array(first["mlp_vector"]), expect)


def test_curation_pipeline_example(spark):
    mod = _mod("curation_pipeline")
    out = mod.run(spark)
    rows = out.collect()
    assert len(rows) > 0
    # packing invariants: offsets within capacity, monotone pack ids
    for r in rows:
        assert 0 <= r["pack_offset"] < mod.SEQ_CAPACITY
        assert r["end_pack"] >= r["start_pack"]
    stats = mod.report(spark)
    assert stats["packed_docs"] <= stats["after_quality"] <= stats["input_docs"]
    assert stats["n_packs"] >= 1


def test_incremental_crawl_example(spark):
    mod = _mod("incremental_crawl")
    stats = mod.run(spark)
    # re-crawled duplicates must not survive the incremental dedup
    assert stats["genuinely_new"] < stats["after_gate"]
    # snapshot grows by exactly the genuinely-new rows (inserts only)
    assert stats["next_snapshot_docs"] == stats["corpus_docs"] + stats["genuinely_new"]
    # appended index answers queries over the merged corpus
    assert stats["search_results"] > 0
    # the appended engine's scores are bit-identical to a fresh engine over
    # the same concatenated corpus
    from pyspark.sql import functions as F

    from warp_pipes_spark.search.bm25 import Bm25Search

    queries = stats["snapshot_df"].filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    fresh = Bm25Search(corpus=stats["snapshot_df"], k=5)(queries)
    a = sorted(tuple(r) for r in stats["results_df"].collect())
    b = sorted(tuple(r) for r in fresh.collect())
    assert a == b


def test_selection_and_sft_example(spark):
    out = _mod("selection_and_sft").run(spark)
    rows = out.collect()
    assert 0 < len(rows) <= 300  # DSIR k bounds the survivors
    for r in rows[:20]:
        assert len(r["input_ids"]) == len(r["loss_mask"])
        assert r["loss_mask"][: r["n_prompt_tokens"]] == [0] * r["n_prompt_tokens"]
        assert sum(r["loss_mask"]) == r["n_response_tokens"]
    # decontamination + UniMax leave multiple sources, none of them src0
    sources = {r["source"] for r in rows}
    assert "src0" not in sources and len(sources) > 1


def test_release_report_example(spark):
    out = _mod("release_report").run(spark)
    rows = out.collect()
    assert rows, "release report is empty"
    # budgets apportion the full target exactly
    assert sum(r["token_budget"] for r in rows) == 50_000
    for r in rows:
        assert 0 < r["n_docs"] <= r["n_ingested"]
        assert 0.0 < r["survival_rate"] <= 1.0
        assert 0.0 <= r["mean_self_bleu"] <= 1.0
        assert r["mean_entropy"] > 0

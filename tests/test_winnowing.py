"""Winnowing (text/dedup.py): density + shared-substring guarantee."""

import random

from warp_pipes_spark.text.dedup import Winnowing


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_density_and_counts(spark):
    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(120))) for i in range(20)
    ]
    out = {r["doc_id"]: r for r in Winnowing(k=3, w=4)(_mk_docs(spark, rows)).collect()}
    for i in range(20):
        r = out[i]
        assert r["n_grams"] == 118
        # winnowing selects between 1/w and 2/(w+1)-ish of grams; loose
        # sanity bounds: at least G/w (one per disjoint window), at most G
        assert r["n_grams"] // 4 <= r["n_fp"] <= r["n_grams"]
        assert 0 <= r["n_shared"] <= r["n_fp"]


def test_shared_substring_guarantees_shared_fingerprint(spark):
    """The winnowing theorem: two docs sharing a run of >= w + k - 1 = 6
    tokens MUST each count at least one shared fingerprint, wherever the
    run sits. Surround the shared run with doc-unique padding tokens."""
    shared = "one two three four five six seven eight"  # 8 >= 6 tokens
    rows = [
        (1, "p1a p1b p1c p1d " + shared + " s1x s1y"),
        (2, "q2a q2b " + shared + " t2x t2y t2z t2w"),
        (3, "r3a r3b r3c r3d r3e r3f r3g r3h r3i"),  # no overlap
    ]
    out = {r["doc_id"]: r for r in Winnowing(k=3, w=4)(_mk_docs(spark, rows)).collect()}
    assert out[1]["n_shared"] >= 1
    assert out[2]["n_shared"] >= 1
    assert out[3]["n_shared"] == 0


def test_short_docs_have_no_fingerprints(spark):
    rows = [(1, "just four tokens here"), (2, "ab"), (3, "")]
    out = {r["doc_id"]: r for r in Winnowing(k=3, w=4)(_mk_docs(spark, rows)).collect()}
    # doc 1: 4 tokens -> 2 grams < w -> no full window
    assert out[1]["n_grams"] == 2 and out[1]["n_fp"] == 0
    assert out[2]["n_grams"] == 0 and out[2]["n_fp"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["n_fp"] == 0

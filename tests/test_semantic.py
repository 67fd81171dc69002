"""SemanticDedup: exact-path semantics and the IVF scale path's guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.ml.semantic import SemanticDedup


def _toy(spark):
    # two tight clusters + one isolate (unit-ish 2-d vectors)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.032]),   # ~cos 0.9995 with 0
        (2, [0.97, 0.23]),     # ~cos 0.97 with 0/1
        (10, [0.0, 1.0]),
        (11, [0.04, 0.999]),   # pairs with 10
        (20, [-1.0, 0.0]),     # isolate (negative cosine to all)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_exact_clusters_and_survivors(spark):
    out = SemanticDedup(threshold=0.9, strategy="exact")(_toy(spark))
    got = {r["id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert got == {
        0: (0, True),
        1: (0, False),
        2: (0, False),
        10: (10, True),
        11: (10, False),
        20: (20, True),
    }


def test_every_input_labeled_once(spark):
    out = SemanticDedup(threshold=0.9, strategy="exact")(_toy(spark))
    assert out.count() == 6
    assert out.select("id").distinct().count() == 6
    # keep <=> own-cluster representative; representative is component min
    bad = out.filter(
        (F.col("keep") != (F.col("id") == F.col("cluster_id")))
        | (F.col("cluster_id") > F.col("id"))
    )
    assert bad.count() == 0


def test_ivf_refines_exact_never_overdrops(spark, sf_dir):
    """IVF candidate pairs are a subset of exact pairs (cell-boundary pairs
    may be missed), so IVF components refine exact components: anything IVF
    drops, exact also drops — the approximation can only under-merge."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 300)
    )
    exact = SemanticDedup(threshold=0.4, strategy="exact")(emb)
    ivf = SemanticDedup(
        threshold=0.4, strategy="ivf", n_centroids=4, seed=7
    )(emb)
    dropped_exact = {r["id"] for r in exact.filter(~F.col("keep")).collect()}
    dropped_ivf = {r["id"] for r in ivf.filter(~F.col("keep")).collect()}
    assert dropped_ivf <= dropped_exact
    if dropped_exact:
        # the cells must still catch a usable share of true near-dups
        assert len(dropped_ivf) >= len(dropped_exact) * 0.3


def test_rejects_unknown_strategy(spark):
    with pytest.raises(ValueError):
        SemanticDedup(strategy="bogus")

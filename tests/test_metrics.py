"""BinaryAuc: exact tie-corrected AUC (ml/metrics.py)."""

import random

from warp_pipes_spark.ml.metrics import BinaryAuc


def _auc_reference(pairs):
    """O(n^2) pairwise definition: P(score_pos > score_neg) + 0.5 ties."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_known_values(spark):
    # perfect separation -> 1.0; inverted -> 0.0; all-tied -> 0.5
    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    inverted = [(s, 1 - y) for s, y in perfect]
    tied = [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)]
    for pairs, expect in [(perfect, 1.0), (inverted, 0.0), (tied, 0.5)]:
        df = spark.createDataFrame(pairs, "score double, label int")
        row = BinaryAuc()(df).collect()[0]
        assert row["auc"] == expect
        assert row["n_pos"] + row["n_neg"] == len(pairs)


def test_auc_matches_pairwise_definition(spark):
    rng = random.Random(7)
    # duplicated scores on purpose: exercises the tie half-credit
    pairs = [
        (round(rng.random() * 10) / 10.0, rng.randint(0, 1)) for _ in range(200)
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    got = BinaryAuc()(df).collect()[0]["auc"]
    assert abs(got - _auc_reference(pairs)) < 1e-12


def test_rouge_known_values(spark):
    """Hand-computed ROUGE-1/2 on the classic example pair, plus the
    clipping rule (repeated grams credit at most ref multiplicity)."""
    from warp_pipes_spark.ml.metrics import RougeScore

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat lay on the mat"),
            (2, "the the the the", "the world"),  # clip: 'the' counts once
        ],
        ["doc_id", "cand_text", "ref_text"],
    )
    rows = {r["doc_id"]: r for r in RougeScore()(df).collect()}
    r1 = rows[1]
    assert abs(r1["rouge1_p"] - 5 / 6) < 1e-6
    assert abs(r1["rouge1_r"] - 5 / 6) < 1e-6
    assert abs(r1["rouge1_f1"] - 5 / 6) < 1e-6
    assert abs(r1["rouge2_p"] - 3 / 5) < 1e-6
    assert abs(r1["rouge2_f1"] - 3 / 5) < 1e-6
    r2 = rows[2]
    assert abs(r2["rouge1_p"] - 1 / 4) < 1e-6  # clipped at ref count 1
    assert abs(r2["rouge1_r"] - 1 / 2) < 1e-6
    assert r2["rouge2_f1"] == 0.0


def test_kcore_peels_and_converges(spark):
    """Hand-built graph: a 4-clique (3-core) with pendant chains that
    must peel away — including a node whose degree only drops below k
    after its neighbor peels (the iterative case); rounds beyond
    convergence change nothing."""
    from warp_pipes_spark.ml.graph import KCore

    # clique 1-2-3-4 + chain 4-5, 5-6 (5 and 6 peel in sequence)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = {r["node"]: r["core_degree"] for r in KCore(k=3, rounds=6)(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    out2 = {r["node"]: r["core_degree"] for r in KCore(k=3, rounds=9)(df).collect()}
    assert out2 == out
    # k=2 exercises the ITERATIVE case the k=3 run doesn't: node 6 peels
    # in round 0 (degree 1), which only then drops node 5 below k
    out3 = {r["node"]: r["core_degree"] for r in KCore(k=2, rounds=6)(df).collect()}
    assert out3 == {1: 3, 2: 3, 3: 3, 4: 3}
    assert 5 not in out3 and 6 not in out3


def test_bleu_known_values(spark):
    """Identity pair scores 1.0; a shortened candidate takes the brevity
    penalty; any missing 4-gram order zeroes the unsmoothed score."""
    import math

    from warp_pipes_spark.ml.metrics import BleuScore

    ident = "the quick brown fox jumps over the lazy dog"
    short = "the quick brown fox"  # perfect precisions, c=4 < r=9
    df = spark.createDataFrame(
        [
            (1, ident, ident),
            (2, short, ident),
            (3, "dog lazy the over jumps", ident),  # unigrams only
        ],
        ["doc_id", "cand_text", "ref_text"],
    )
    rows = {r["doc_id"]: r for r in BleuScore()(df).collect()}
    assert rows[1]["bleu"] == 1.0 and rows[1]["bp"] == 1.0
    r2 = rows[2]
    assert r2["p1"] == 1.0 and r2["p4"] == 1.0
    assert abs(r2["bp"] - math.exp(1 - 9 / 4)) < 1e-5
    assert abs(r2["bleu"] - r2["bp"]) < 1e-5
    assert rows[3]["p1"] == 1.0
    assert rows[3]["bleu"] == 0.0  # no matching bigram -> unsmoothed 0

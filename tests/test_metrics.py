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


def _kcore_reference(edges, k, rounds):
    """Independent Python replica of the FIXED-ROUNDS peel semantics:
    rounds x (drop nodes whose degree within survivors < k), then report
    degrees within the final survivor set. Used to validate the engine's
    delta-peeling against an implementation with no shared code."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    for _ in range(rounds):
        drop = {v for v in alive if len(adj[v] & alive) < k}
        # fixed-round semantics: round 0 is the deg0 filter, later
        # rounds recount within survivors
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def test_kcore_delta_peel_matches_reference_on_random_graphs(spark):
    """Seeded random graphs x (k, rounds) grid: the engine's
    frontier-delta peel must equal an independent full-recount Python
    reference exactly — survivor sets AND within-core degrees. Covers
    deep cascades (sparse graph, k at the degree median), instant
    convergence (k=1), and everything-peels (k above max degree)."""
    import random

    from warp_pipes_spark.ml.graph import KCore

    for seed, n, p, k in [(1, 40, 0.10, 3), (2, 60, 0.05, 2),
                          (3, 30, 0.30, 1), (4, 30, 0.30, 25)]:
        rng = random.Random(seed)
        edges = sorted(
            {(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < p}
        )
        if not edges:
            continue
        rounds = 8
        want = _kcore_reference(edges, k, rounds)
        df = spark.createDataFrame(edges, ["u", "v"])
        got = {
            r["node"]: r["core_degree"]
            for r in KCore(k=k, rounds=rounds)(df).collect()
        }
        assert got == want, (seed, n, p, k)


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


def test_calibration_report_hand_oracle(spark):
    """Perfectly calibrated bins have gap 0 and ECE 0; a planted
    miscalibrated frame reports the exact hand-computed gaps."""
    from warp_pipes_spark.ml.metrics import CalibrationReport

    # two scores 0.25 / 0.75; labels exactly match the scores' rates
    rows = []
    for i in range(8):
        rows.append((0.25, 1 if i % 4 == 0 else 0))   # frac_pos = 0.25
        rows.append((0.75, 0 if i % 4 == 0 else 1))   # frac_pos = 0.75
    df = spark.createDataFrame(rows, "score double, label int")
    out = CalibrationReport(n_bins=2)(df).collect()
    assert len(out) == 2
    for r in out:
        assert r["gap"] == 0.0 and r["ece"] == 0.0

    # flip all labels: gaps become |0.75 - 0.25| = 0.5 on both bins
    flipped = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, label int"
    )
    out2 = CalibrationReport(n_bins=2)(flipped).collect()
    for r in out2:
        assert r["gap"] == 0.5 and r["ece"] == 0.5


def test_calibration_report_drops_null_rows(spark):
    """NULL scores/labels are excluded entirely: least(NULL, B-1) would
    otherwise bin a NULL score into the top bin (counted in n, excluded
    from ssum), corrupting mean_score/gap/ece."""
    from warp_pipes_spark.ml.metrics import CalibrationReport

    rows = []
    for i in range(8):
        rows.append((0.25, 1 if i % 4 == 0 else 0))
        rows.append((0.75, 0 if i % 4 == 0 else 1))
    clean = spark.createDataFrame(rows, "score double, label int")
    dirty = spark.createDataFrame(
        rows + [(None, 1), (0.9, None), (None, None)],
        "score double, label int",
    )
    want = sorted(CalibrationReport(n_bins=2)(clean).collect())
    got = sorted(CalibrationReport(n_bins=2)(dirty).collect())
    assert got == want
    for r in got:
        assert r["gap"] == 0.0 and r["ece"] == 0.0 and r["n"] == 8


def test_dedup_agreement_kappa_hand_oracle(spark):
    """Identical docs agree 'dup' on both methods; unrelated docs agree
    'not dup'; kappa is computed from the exact 2x2 table."""
    from warp_pipes_spark.text.dedup import DedupAgreement

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(1, dup), (2, dup),
            (3, "one two three xa ya za wa va ua ta"),
            (4, "one two three xb yb zb wb vb ub tb")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = DedupAgreement(n=3, floor=0.05)(df).collect()[0]
    assert r["n_pairs"] == r["both_dup"] + r["minhash_only"] + \
        r["simhash_only"] + r["neither"]
    assert r["both_dup"] >= 1          # the identical pair
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0


def test_zipf_fit_exact_power_law(spark):
    """A corpus whose term counts follow count = C / rank exactly must
    fit slope ~ -1."""
    from warp_pipes_spark.text.analysis import ZipfFit

    words = []
    for rank in range(1, 21):
        words.extend([f"w{chr(96 + rank)}"] * (1200 // rank))
    docs = [(i, " ".join(words[i::10])) for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    r = ZipfFit(top_r=20)(df).collect()[0]
    assert r["r_used"] == 20
    assert abs(r["slope"] + 1.0) < 0.05, r["slope"]


def test_source_divergence_extremes(spark):
    """Identical distributions -> JS = 0; disjoint vocabularies ->
    JS = ln 2 (both exactly, by the integer algebra)."""
    import math

    from warp_pipes_spark.text.analysis import SourceDivergence

    rows = [
        (1, "apple banana cherry", "s1"),
        (2, "apple banana cherry", "s2"),       # identical to s1
        (3, "xylo yankee zulu", "s3"),           # disjoint from both
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r["source_a"], r["source_b"]): r["js_divergence"]
           for r in SourceDivergence()(df).collect()}
    assert out[("s1", "s2")] == 0.0
    assert abs(out[("s1", "s3")] - math.log(2)) < 1e-5
    assert abs(out[("s2", "s3")] - math.log(2)) < 1e-5


def _lpa_reference(edges, rounds):
    """Independent Python replica of SYNCHRONOUS min-tie label
    propagation: all nodes update simultaneously from the previous
    round's labels; most frequent neighbor label, ties to the smallest."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt = Counter(labels[n] for n in adj[v])
            best = min(((-c, l) for l, c in cnt.items()))
            new[v] = best[1]
        labels = new
    return labels


def test_label_propagation_matches_reference_on_random_graphs(spark):
    """Seeded random graphs x rounds: the engine's synchronous LPA must
    equal an independent Python reference exactly — including the
    2-cycle-prone structures (bipartite-ish sparse graphs) the fixed
    unroll exists for."""
    import random

    from warp_pipes_spark.ml.graph import LabelPropagation

    for seed, n, p, rounds in [(1, 40, 0.10, 3), (2, 60, 0.05, 4),
                               (5, 24, 0.5, 2)]:
        rng = random.Random(seed)
        edges = sorted(
            {(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < p}
        )
        if not edges:
            continue
        want = _lpa_reference(edges, rounds)
        df = spark.createDataFrame(edges, ["u", "v"])
        got = {
            r["node"]: r["label"]
            for r in LabelPropagation(rounds=rounds)(df).collect()
        }
        assert got == want, (seed, n, p, rounds)

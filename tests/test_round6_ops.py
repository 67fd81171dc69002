"""Behavioral tests for the round-6 session-2 operators (q212-q221).

Oracle parity (tests/test_oracle_parity.py) already proves engine
equivalence on the shipped configs; these tests pin the MATH — known
closed-form answers on tiny hand-built frames, invariants (partition
independence, sign conventions, known distributions) — so a future
refactor that changes both engines in the same wrong way still fails.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from warp_pipes_spark.ml.metrics import ConfusionPanel, WilsonRates
from warp_pipes_spark.ml.pca import PowerIterationPCA
from warp_pipes_spark.pipes.sampling import NeymanAllocation
from warp_pipes_spark.pipes.validate import BenfordAudit
from warp_pipes_spark.plans.skew import KeySkewProfile
from warp_pipes_spark.text.analysis import ContingencyPanel


def test_contingency_independent_table_has_zero_mi(spark):
    # perfectly independent 2x2 with margins 50/50: MI = 0, chi2 = 0
    rows = (
        [("a", "x")] * 25
        + [("a", "y")] * 25
        + [("b", "x")] * 25
        + [("b", "y")] * 25
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = ContingencyPanel(row_col="r", col_col="c")(df).collect()[0]
    assert out["mi_nats"] == 0.0
    assert out["chi2"] == 0.0
    assert out["nmi"] == 0.0
    # uniform binary margins: H = ln 2
    assert abs(out["h_row"] - math.log(2)) < 1e-6
    assert out["dof"] == 1


def test_contingency_identical_columns_have_nmi_one(spark):
    rows = [("a", "a")] * 30 + [("b", "b")] * 20 + [("c", "c")] * 10
    df = spark.createDataFrame(rows, ["r", "c"])
    out = ContingencyPanel(row_col="r", col_col="c")(df).collect()[0]
    # r == c deterministically: MI = H_row = H_col, NMI = 1
    assert abs(out["mi_nats"] - out["h_row"]) < 2e-6
    assert abs(out["nmi"] - 1.0) < 2e-6


def test_key_skew_uniform_gini_zero(spark):
    # 10 keys x 7 rows each: Gini 0, top share 1/10, p99/mean 1, cv 0
    df = spark.range(70).select((F.col("id") % 10).alias("k"))
    out = KeySkewProfile(key_col="k")(df).collect()[0]
    assert out["gini"] == 0.0
    assert out["cv"] == 0.0
    assert out["top_share"] == 0.1
    assert out["p99_over_mean"] == 1.0
    assert out["n_keys"] == 10 and out["n_rows"] == 70


def test_key_skew_hot_key_detected(spark):
    # one key holds 91 of 100 rows
    df = spark.range(100).select(
        F.when(F.col("id") < 91, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    out = KeySkewProfile(key_col="k")(df).collect()[0]
    assert out["top_key"] == "0"
    assert out["top_share"] == 0.91
    assert out["gini"] > 0.8


def test_confusion_panel_counts(spark):
    rows = [("en", "en")] * 8 + [("en", "de")] * 2 + [("de", "de")] * 5 + [
        ("de", "fr")
    ] * 5
    df = spark.createDataFrame(rows, ["t", "p"])
    out = {r["cls"]: r for r in ConfusionPanel("t", "p")(df).collect()}
    en = out["en"]
    assert (en["n_true"], en["n_pred"], en["n_hit"]) == (10, 8, 8)
    assert en["precision"] == 1.0 and en["recall"] == 0.8
    # F1 = 2*8/(10+8)
    assert abs(en["f1"] - 16 / 18) < 1e-6
    fr = out["fr"]
    assert fr["n_true"] == 0 and fr["recall"] is None and fr["f1"] == 0.0


def test_neyman_allocation_favors_dispersed_stratum(spark):
    # stratum A constant (sd 0) vs B dispersed: all budget goes to B
    rows = [("A", 100)] * 50 + [("B", v) for v in range(50)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["stratum"]: r for r in NeymanAllocation("v", "g", budget=100)(df).collect()}
    assert out["A"]["neyman_share"] == 0.0
    assert out["B"]["neyman_share"] == 1.0
    assert out["A"]["sd_value"] == 0.0
    assert out["A"]["prop_share"] == 0.5


def test_power_pca_recovers_dominant_axis(spark):
    # variance concentrated on dim 2: eigenvector ~ e2, explained ~ 1
    rows = [(i, [0.001 * (i % 3), float(i % 11) - 5.0, 0.0, 0.0]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = PowerIterationPCA(dim=4, iters=12)(df).collect()[0]
    assert out["explained"] > 0.999
    assert abs(out["v2"]) > 0.999
    # sign pin: first nonzero component positive
    nz = next(v for v in (out["v1"], out["v2"], out["v3"], out["v4"]) if v != 0.0)
    assert nz > 0


def test_power_pca_partition_invariant(spark):
    rows = [(i, [float((i * 7) % 13), float((i * 3) % 5), 1.0]) for i in range(120)]
    a = PowerIterationPCA(dim=3, iters=8)(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)
    ).collect()
    b = PowerIterationPCA(dim=3, iters=8)(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(17)
    ).collect()
    assert a == b


def test_wilson_interval_known_value(spark):
    # k=8, n=10, z=1.96 by hand: denom=1.38416, center=0.99208,
    # half=1.96*sqrt(.016+.009604)=0.313624 -> [0.490157, 0.943319]
    df = spark.createDataFrame(
        [("s", i < 8) for i in range(10)], ["g", "keep"]
    )
    out = WilsonRates("keep", "g")(df).collect()[0]
    assert out["rate"] == 0.8
    assert abs(out["wilson_low"] - 0.490157) < 1e-5
    assert abs(out["wilson_high"] - 0.943319) < 1e-5
    assert out["wilson_low"] < out["rate"] < out["wilson_high"]


def test_benford_digit_extraction(spark):
    # first digits across decades, incl. values < 1
    vals = [1.0, 19.5, 250.0, 0.072, 3000.0, 0.9, 42.0, 777.7, 5e-3]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    out = {r["digit"]: r["n_obs"] for r in BenfordAudit("value")(df).collect()}
    assert out[1] == 2  # 1.0, 19.5
    assert out[2] == 1  # 250.0
    assert out[7] == 2  # 0.072, 777.7
    assert out[9] == 1  # 0.9
    assert out[3] == 1 and out[4] == 1 and out[5] == 1
    assert sum(out.values()) == 9


def test_benford_shares_sum_to_one():
    # the Benford expectation itself: sum_d log10(1+1/d) == 1
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_dirichlet_ql_prune_lossless_k_sweep(spark):
    # norm-adjusted seed-threshold prune must be bit-identical to the
    # exhaustive path at every k (the BM25 maxscore argument + exact
    # per-doc norm) — including k larger than many queries' match sets
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.queries import _bm25_queries
    from warp_pipes_spark.search.ql import DirichletQLSearch

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    qs = _bm25_queries(spark, "/root/testdata/sf0.001")
    for k in (1, 3, 10, 40):
        a = sorted(
            map(str, DirichletQLSearch(corpus=docs, k=k, prune=True)(qs).collect())
        )
        b = sorted(
            map(str, DirichletQLSearch(corpus=docs, k=k, prune=False)(qs).collect())
        )
        assert a == b, f"prune diverged at k={k}"


# ---------------------------------------------------------------------------
# session-3 additions: VocabularyProfile / SpearmanPanel / MixtureConcentration
# ---------------------------------------------------------------------------


def test_vocabulary_profile_closed_form(spark):
    from warp_pipes_spark.text.analysis import VocabularyProfile

    # tokens: a a b c -> N=4, V=3, N1=2 (b,c), N2=1 (a)
    df = spark.createDataFrame([("g", "a a b c")], ["source", "text"])
    out = VocabularyProfile()(df).collect()[0]
    assert out["n_tokens"] == 4 and out["vocab"] == 3
    assert out["n_singletons"] == 2 and out["n_doubletons"] == 1
    assert out["p_unseen"] == 0.5          # N1/N = 2/4
    assert out["gt_discount"] == 1.0       # 2*N2/N1 = 2/2
    assert out["simpson"] == 0.166667      # 2/(4*3), rounded to 6dp
    assert out["top_share"] == 0.5         # max f / N = 2/4


def test_vocabulary_profile_no_singletons_gives_null_discount(spark):
    from warp_pipes_spark.text.analysis import VocabularyProfile

    df = spark.createDataFrame([("g", "a a b b")], ["source", "text"])
    out = VocabularyProfile()(df).collect()[0]
    assert out["n_singletons"] == 0
    assert out["gt_discount"] is None
    assert out["p_unseen"] == 0.0
    # all-repeat corpus: simpson = (2+2)/(4*3) = 1/3
    assert out["simpson"] == 0.333333


def test_vocabulary_profile_all_distinct_simpson_zero(spark):
    from warp_pipes_spark.text.analysis import VocabularyProfile

    df = spark.createDataFrame([("g", "a b c d")], ["source", "text"])
    out = VocabularyProfile()(df).collect()[0]
    assert out["simpson"] == 0.0 and out["p_unseen"] == 1.0


def test_spearman_monotone_is_one(spark):
    from warp_pipes_spark.ml.metrics import SpearmanPanel

    rows = [("g", x, x * x) for x in range(1, 21)]
    df = spark.createDataFrame(rows, ["source", "x", "y"])
    out = SpearmanPanel(["x", "y"])(df).collect()[0]
    assert out["rho_spearman"] == 1.0 and out["n"] == 20


def test_spearman_inverse_is_minus_one(spark):
    from warp_pipes_spark.ml.metrics import SpearmanPanel

    rows = [("g", x, -3 * x) for x in range(1, 21)]
    df = spark.createDataFrame(rows, ["source", "x", "y"])
    out = SpearmanPanel(["x", "y"])(df).collect()[0]
    assert out["rho_spearman"] == -1.0


def test_spearman_midrank_ties_closed_form(spark):
    from warp_pipes_spark.ml.metrics import SpearmanPanel

    # x = [1,2,2,3] -> midranks [1, 2.5, 2.5, 4]; y strictly increasing
    # Pearson(midranks, [1,2,3,4]) = 4.5 / sqrt(4.5 * 5) = 0.948683...
    rows = [("g", 1, 10), ("g", 2, 20), ("g", 2, 30), ("g", 3, 40)]
    df = spark.createDataFrame(rows, ["source", "x", "y"])
    out = SpearmanPanel(["x", "y"])(df).collect()[0]
    assert out["rho_spearman"] == 0.948683


def test_spearman_constant_column_is_null(spark):
    from warp_pipes_spark.ml.metrics import SpearmanPanel

    rows = [("g", x, 7) for x in range(1, 11)]
    df = spark.createDataFrame(rows, ["source", "x", "y"])
    out = SpearmanPanel(["x", "y"])(df).collect()[0]
    assert out["rho_spearman"] is None


def test_spearman_partition_invariant(spark):
    from warp_pipes_spark.ml.metrics import SpearmanPanel

    rows = [("g", i % 17, (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, ["source", "x", "y"])
    a = SpearmanPanel(["x", "y"])(df).collect()[0]["rho_spearman"]
    b = SpearmanPanel(["x", "y"])(df.repartition(13)).collect()[0][
        "rho_spearman"
    ]
    assert a == b


def test_mixture_concentration_single_source(spark):
    from warp_pipes_spark.pipes.sampling import MixtureConcentration

    df = spark.createDataFrame([("en", "s1")] * 9, ["lang", "source"])
    out = MixtureConcentration()(df).collect()[0]
    assert out["hhi"] == 1.0 and out["eff_sources"] == 1.0
    assert out["n_docs"] == 9 and out["n_sources"] == 1


def test_mixture_concentration_equal_sources(spark):
    from warp_pipes_spark.pipes.sampling import MixtureConcentration

    rows = [("en", f"s{i}") for i in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, ["lang", "source"])
    out = MixtureConcentration()(df).collect()[0]
    assert out["hhi"] == 0.25 and out["eff_sources"] == 4.0


def test_vocabulary_profile_partition_invariant(spark):
    from warp_pipes_spark.text.analysis import VocabularyProfile

    rows = [(f"s{i % 3}", f"w{i % 7} w{i % 5} w{i % 11} common")
            for i in range(300)]
    df = spark.createDataFrame(rows, ["source", "text"])
    a = sorted(map(tuple, VocabularyProfile()(df).collect()))
    b = sorted(map(tuple, VocabularyProfile()(df.repartition(17)).collect()))
    assert a == b


def test_mixture_concentration_partition_invariant(spark):
    from warp_pipes_spark.pipes.sampling import MixtureConcentration

    rows = [(f"l{i % 4}", f"s{(i * 3) % 5}") for i in range(400)]
    df = spark.createDataFrame(rows, ["lang", "source"])
    a = sorted(map(tuple, MixtureConcentration()(df).collect()))
    b = sorted(
        map(tuple, MixtureConcentration()(df.repartition(23)).collect())
    )
    assert a == b


def test_q99_salting_matches_unsalted_band_join(spark, sf_dir):
    """The q99 salt (pmod(xxhash64) sub-bucket + 8x right replication)
    must be a pure parallelism transform: candidate set and distances
    identical to the plain banded self-join it replaced."""
    import pyspark.sql.functions as F

    from warp_pipes_spark.queries import T, q99_fuzzy_match

    got = sorted(map(tuple, q99_fuzzy_match(spark, sf_dir).collect()))

    p = T(spark, sf_dir, "part").select("p_partkey", "p_name").filter(
        F.col("p_partkey") % 5 == 0
    )
    band = lambda c: F.struct(  # noqa: E731
        F.floor(F.length(c) / 4).alias("lb"),
        F.substring_index(c, " ", 1).alias("t1"),
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        band(F.col("p_name")).alias("band"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        band(F.col("p_name")).alias("band"),
    )
    ref = sorted(
        map(
            tuple,
            a.join(b, "band")
            .where(F.col("key_a") < F.col("key_b"))
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= 4)
            .select("key_a", "key_b", "dist")
            .collect(),
        )
    )
    assert got == ref

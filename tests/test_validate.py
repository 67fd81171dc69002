"""Data-quality validation operators: profile + constraint checks."""


def test_data_profile_numeric_and_string(spark):
    from warp_pipes_spark.pipes.validate import DataProfile

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, None), (4, 30.0, "b")],
        "id long, x double, s string",
    )
    prof = {r["column"]: r for r in DataProfile(
        numeric_cols=["id", "x"], string_cols=["s"]
    )(df).collect()}
    assert prof["id"]["n"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 4.0
    assert prof["x"]["n_null"] == 1 and prof["x"]["n_distinct"] == 2
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None and prof["id"]["min_str"] is None


def test_data_profile_approx_mode(spark):
    from warp_pipes_spark.pipes.validate import DataProfile

    df = spark.range(1000).selectExpr("id", "CAST(id % 10 AS STRING) AS s")
    prof = {r["column"]: r for r in DataProfile(
        numeric_cols=["id"], string_cols=["s"], approx=True
    )(df).collect()}
    # HLL estimates: within a few percent at this cardinality
    assert abs(prof["id"]["n_distinct"] - 1000) < 100
    assert abs(prof["s"]["n_distinct"] - 10) <= 1


def test_check_constraints_null_is_violation(spark):
    from warp_pipes_spark.pipes.validate import CheckConstraints

    df = spark.createDataFrame(
        [(1, "F"), (2, None), (-3, "O"), (4, "X")],
        "k long, status string",
    )
    out = {r["rule"]: r for r in CheckConstraints(rules={
        "k_positive": "k > 0",
        "status_known": "status IN ('F', 'O')",
    })(df).collect()}
    assert out["k_positive"]["n_violations"] == 1
    assert not out["k_positive"]["passed"]
    # NULL status counts as a violation alongside the unknown 'X'
    assert out["status_known"]["n_violations"] == 2
    assert out["status_known"]["n"] == 4


def test_drift_identical_distributions_near_zero(spark):
    from warp_pipes_spark.pipes.validate import DriftCheck

    rows = [(i, float(i % 10), "abc"[i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double, c string")
    out = {
        r["column"]: r["psi"]
        for r in DriftCheck(ref=df, numeric_bins={"v": 5}, cat_cols=["c"])(df).collect()
    }
    assert abs(out["v"]) < 1e-6 and abs(out["c"]) < 1e-6


def test_drift_detects_shift_and_new_category(spark):
    from warp_pipes_spark.pipes.validate import DriftCheck

    ref = spark.createDataFrame(
        [(i, float(i % 10), "abc"[i % 3]) for i in range(300)],
        "id long, v double, c string",
    )
    cur = spark.createDataFrame(
        [(i, float(i % 10) + 5.0, "d") for i in range(300)],  # shifted + novel cat
        "id long, v double, c string",
    )
    out = {
        r["column"]: r
        for r in DriftCheck(ref=ref, numeric_bins={"v": 5}, cat_cols=["c"])(cur).collect()
    }
    assert out["v"]["psi"] > 0.25  # strong numeric shift
    assert out["c"]["psi"] > 0.25  # entirely new category
    assert out["c"]["n_buckets"] == 4  # a, b, c + d


def test_drift_null_bucket_counts(spark):
    from warp_pipes_spark.pipes.validate import DriftCheck

    ref = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    cur = spark.createDataFrame(
        [(i, None if i % 2 == 0 else float(i)) for i in range(100)],
        "id long, v double",
    )
    out = DriftCheck(ref=ref, numeric_bins={"v": 4})(cur).collect()[0]
    assert out["psi"] > 0.25  # half the batch went NULL: that IS drift
    assert out["n_buckets"] == 5  # 4 bins + NULL bucket


def test_drift_requires_columns(spark):
    import pytest as _pytest

    from warp_pipes_spark.pipes.validate import DriftCheck

    with _pytest.raises(ValueError):
        DriftCheck(ref=None)


def test_k_anonymity_flags_small_groups(spark):
    from warp_pipes_spark.pipes.validate import KAnonymity

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "seg string, nat int")
    out = {(r["seg"], r["nat"]): r for r in KAnonymity(["seg", "nat"], k=3)(df).collect()}
    assert set(out) == {("a", 2), ("b", 1)}
    assert out[("a", 2)]["n"] == 2
    assert abs(out[("a", 2)]["share"] - 2 / 8) < 1e-9
    # with k=2 only the singleton group remains a violation
    assert KAnonymity(["seg", "nat"], k=2)(df).count() == 1
    # seg-only grouping: "a" has 7 rows (passes), "b" has 1 (violates)
    seg_out = KAnonymity(["seg"], k=2)(df).collect()
    assert [(r["seg"], r["n"]) for r in seg_out] == [("b", 1)]


def test_k_anonymity_rejects_bad_params():
    import pytest as _pytest

    from warp_pipes_spark.pipes.validate import KAnonymity

    with _pytest.raises(ValueError):
        KAnonymity([], k=3)
    with _pytest.raises(ValueError):
        KAnonymity(["x"], k=1)

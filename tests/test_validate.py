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

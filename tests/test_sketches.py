"""Sketch aggregates: approximate results within declared tolerance of
exact single-pass answers."""

from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_tolerance(spark):
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("n"))
        .collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 5), (
            k, exact[k], approx[k],
        )


def test_approx_percentile_within_tolerance(spark):
    li = load_table(spark, SF, "lineitem")
    got = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50")
    ).first()["p50"]
    exact = li.agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50")).first()[
        "p50"
    ]
    assert abs(got - exact) / exact < 0.01

"""Skew-plan utilities: salted variants must produce identical results to
their unsalted equivalents."""

from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table
from warp_pipes_spark.plans import salted_collect_list, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_inner(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, SF, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(s, on=["l_suppkey"]).select("l_orderkey", "l_suppkey", "s_name")
    salted = salted_join(li, s, on=["l_suppkey"], n_salts=8).select(
        "l_orderkey", "l_suppkey", "s_name"
    )
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_join_left(spark):
    c = load_table(spark, SF, "customer").select("c_custkey")
    o = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    plain = c.join(o, on=["c_custkey"], how="left")
    salted = salted_join(c, o, on=["c_custkey"], n_salts=4, how="left")
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_collect_list_deterministic_order(spark):
    li = load_table(spark, SF, "lineitem")
    out = salted_collect_list(
        li, ["l_orderkey"], value_col="l_linenumber", order_col="l_linenumber", n_salts=4
    )
    direct = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("l_linenumbers"))
    )
    assert out.exceptAll(direct).isEmpty()
    assert direct.exceptAll(out).isEmpty()


def test_hash_min_components_two_islands(spark):
    """Hash-min label propagation: two disjoint chains resolve to their
    min node id within diameter rounds; labels are exact integers."""
    from warp_pipes_spark.ml.graph import hash_min_components

    undirected = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
    rows = [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in hash_min_components(edges, iters=4).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

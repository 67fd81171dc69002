"""Dataset utilities: deterministic subsets and axis-0/1 concatenation."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table, with_row_id
from warp_pipes_spark.pipes.datasets import TakeSubset, concat_columns, concat_rows

SF = "/root/testdata/sf0.001"


def test_take_subset_deterministic(spark):
    df = with_row_id(load_table(spark, SF, "customer"), key="c_custkey")
    a = {r["c_custkey"] for r in TakeSubset(n=25, seed=7)(df).collect()}
    b = {r["c_custkey"] for r in TakeSubset(n=25, seed=7)(df.repartition(13)).collect()}
    assert len(a) == 25
    assert a == b  # stable under repartitioning
    c = {r["c_custkey"] for r in TakeSubset(n=25, seed=8)(df).collect()}
    assert a != c  # seed changes the subset


def test_take_subset_fraction(spark):
    df = with_row_id(load_table(spark, SF, "orders"), key="o_orderkey")
    n = df.count()
    s = TakeSubset(fraction=0.2, seed=1)(df).count()
    assert 0.05 * n < s < 0.4 * n


def test_concat_rows_and_columns(spark):
    c = with_row_id(load_table(spark, SF, "customer"), key="c_custkey")
    left = c.select("row_id", "c_name")
    right = c.select("row_id", "c_acctbal")
    both = concat_columns(left, right)
    assert set(both.columns) == {"row_id", "c_name", "c_acctbal"}
    assert both.count() == c.count()
    with pytest.raises(ValueError, match="overlapping"):
        concat_columns(left, c.select("row_id", "c_name"))

    u = concat_rows(left.limit(10), left.limit(5))
    assert u.count() == 15

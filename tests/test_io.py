"""Source/sink round-trips and the row-id contract."""

from pyspark.sql import functions as F

from warp_pipes_spark.io import (
    load_table,
    read_csv,
    read_json,
    with_row_id,
    write_csv,
    write_json,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def test_parquet_round_trip(spark, tmp_path):
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_pq")
    write_parquet(src, path)
    back = spark.read.parquet(path)
    assert back.exceptAll(src).isEmpty() and src.exceptAll(back).isEmpty()


def test_csv_round_trip(spark, tmp_path):
    src = load_table(spark, SF, "region")
    path = str(tmp_path / "region_csv")
    write_csv(src, path)
    back = read_csv(spark, path, schema="r_regionkey int, r_name string")
    assert back.exceptAll(src).isEmpty() and src.exceptAll(back).isEmpty()


def test_json_round_trip(spark, tmp_path):
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_json")
    write_json(src, path)
    back = read_json(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    ).select(*src.columns)
    assert back.exceptAll(src).isEmpty() and src.exceptAll(back).isEmpty()


def test_row_id_natural_key(spark):
    df = load_table(spark, SF, "customer", row_id=True)
    assert "row_id" in df.columns
    assert df.filter(F.col("row_id") != F.col("c_custkey")).count() == 0


def test_row_id_assigned_unique(spark):
    df = with_row_id(spark.range(1000).select(F.col("id").alias("x")))
    assert df.select("row_id").distinct().count() == 1000


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    join without an Exchange (shuffle) on either side."""
    import io as _io
    from contextlib import redirect_stdout

    from warp_pipes_spark.io import write_bucketed

    orders = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_acctbal")
    write_bucketed(orders, "wps_orders_b", "o_custkey", n_buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "wps_cust_b",
        "o_custkey", n_buckets=8,
    )
    o = spark.table("wps_orders_b")
    c = spark.table("wps_cust_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, on="o_custkey")
        buf = _io.StringIO()
        with redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it actually computes the right thing
        expected = orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS wps_orders_b")
        spark.sql("DROP TABLE IF EXISTS wps_cust_b")

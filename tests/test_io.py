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

"""MergeUpsert / Scd2Apply semantics (pipes/cdc.py)."""

from pyspark.sql import functions as F

from warp_pipes_spark.pipes.cdc import MergeUpsert, Scd2Apply


def test_merge_upsert_semantics(spark):
    snapshot = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    batch = spark.createDataFrame(
        [
            (2, "b2", 21, 1, "U"),   # update
            (3, "c", 30, 1, "D"),    # delete
            (4, "d", 40, 1, "I"),    # insert
            (5, "e", 50, 1, "I"),    # insert then update in the same batch
            (5, "e2", 51, 2, "U"),
            (1, "a2", 11, 1, "U"),   # update then delete: delete wins
            (1, "a2", 11, 2, "D"),
        ],
        "k int, name string, v int, seq int, op string",
    )
    out = MergeUpsert(snapshot=snapshot, keys=["k"])(batch)
    rows = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {2: ("b2", 21), 4: ("d", 40), 5: ("e2", 51)}
    assert out.columns == ["k", "name", "v"]


def test_merge_upsert_noop_batch_preserves_snapshot(spark):
    snapshot = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    batch = spark.createDataFrame([], "k int, name string, seq int, op string")
    out = MergeUpsert(snapshot=snapshot, keys=["k"])(batch)
    assert sorted(tuple(r) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_scd2_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", "x"),
            (1, 101, "2024-01-02 00:00:00", "y"),
            (1, 102, "2024-01-03 00:00:00", "z"),
            (2, 200, "2024-01-05 00:00:00", "q"),
        ],
        "user_id int, event_id int, ts_s string, attr string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "attr")
    out = Scd2Apply(keys=["user_id"], ts_col="ts", tie_cols=["event_id"])(log)
    rows = sorted(
        out.select(
            "user_id", "version", "valid_from", "valid_to", "is_current"
        ).collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    # versions are contiguous from 1; valid_to chains to the next valid_from
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["version"] for r in u1] == [1, 2, 3]
    for cur, nxt in zip(u1, u1[1:]):
        assert cur["valid_to"] == nxt["valid_from"]
        assert cur["is_current"] == 0
    assert u1[-1]["valid_to"] is None and u1[-1]["is_current"] == 1
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_scd2_exactly_one_current_per_key(spark, sf_dir):
    from warp_pipes_spark.queries import q118_scd2

    out = q118_scd2(spark, sf_dir)
    per_key = (
        out.groupBy("user_id")
        .agg(
            F.sum("is_current").alias("n_cur"),
            F.count(F.lit(1)).alias("n"),
            F.max("version").alias("max_v"),
        )
    )
    bad = per_key.filter(
        (F.col("n_cur") != 1) | (F.col("max_v") != F.col("n"))
    ).count()
    assert bad == 0

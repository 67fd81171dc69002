"""Temporal join operators: edge semantics (equal-ts ties, no-match nulls,
band boundaries). Catalog parity vs DuckDB ASOF/interval joins is covered
by test_oracle_parity (q48/q49)."""

from pyspark.sql import functions as F

from warp_pipes_spark.pipes.temporal import AsOfJoin, RangeJoin


def _ts_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn("ts", F.to_timestamp("ts"))


def test_asof_ties_and_missing(spark):
    left = _ts_df(
        spark,
        [(1, 1, "2024-01-01T10:00:00"), (2, 1, "2024-01-01T09:00:00"), (3, 2, "2024-01-01T10:00:00")],
        "eid long, user_id long, ts string",
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01T10:00:00", 7.0), (1, "2024-01-01T08:00:00", 5.0)],
        "user_id long, ts string, v double",
    )
    out = {r["eid"]: r["v"] for r in AsOfJoin(right=right, on=["user_id"], right_cols=["v"])(left).collect()}
    assert out[1] == 7.0  # equal ts matches (ts <= semantics)
    assert out[2] == 5.0  # earlier left row sees only the earlier right row
    assert out[3] is None  # user 2 has no right rows -> null


def test_range_join_band_boundaries(spark):
    left = _ts_df(spark, [(1, 1, "2024-01-01T10:00:00")], "lid long, user_id long, ts string")
    right = _ts_df(
        spark,
        [
            (10, 1, "2024-01-01T10:00:00"),  # at lo boundary -> in
            (11, 1, "2024-01-01T11:00:00"),  # at hi boundary -> in
            (12, 1, "2024-01-01T11:00:01"),  # past hi -> out
            (13, 1, "2024-01-01T09:59:59"),  # before lo -> out
            (14, 2, "2024-01-01T10:30:00"),  # other key -> out
        ],
        "rid long, user_id long, ts string",
    )
    out = RangeJoin(right=right, on=["user_id"], lo_seconds=0, hi_seconds=3600)(left)
    assert sorted(r["rid"] for r in out.collect()) == [10, 11]


def test_resample_locf_semantics(spark):
    """Grid covers [floor(min), floor(max)] inclusive per key; grid points
    before any observation are NULL; later points carry the most recent
    value forward across gaps."""
    from warp_pipes_spark.pipes.temporal import Resample

    rows = [
        (1, "2024-01-01T00:30:00", 10.0),
        (1, "2024-01-01T03:10:00", 20.0),   # next obs after a 1h gap
        (2, "2024-01-01T05:59:00", 7.0),
    ]
    df = (
        spark.createDataFrame(rows, "user_id long, ts string, value double")
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    )
    got = {
        (r["user_id"], str(r["grid_ts"])): r["value"]
        for r in Resample(step_seconds=3600)(df).collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): None,   # grid point precedes first obs
        (1, "2024-01-01 01:00:00"): 10.0,
        (1, "2024-01-01 02:00:00"): 10.0,   # gap carried forward
        (1, "2024-01-01 03:00:00"): 10.0,   # obs at 03:10 is after this point
        (2, "2024-01-01 05:00:00"): None,
    }


def test_asof_forward_direction(spark):
    left = _ts_df(
        spark,
        [(1, 1, "2024-01-01T10:00:00"), (2, 1, "2024-01-01T11:30:00")],
        "eid long, user_id long, ts string",
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01T10:00:00", 7.0), (1, "2024-01-01T11:00:00", 9.0)],
        "user_id long, ts string, v double",
    )
    out = {
        r["eid"]: r["v"]
        for r in AsOfJoin(
            right=right, on=["user_id"], right_cols=["v"], direction="forward"
        )(left).collect()
    }
    assert out[1] == 7.0  # equal ts matches forward too (ts >= semantics)
    assert out[2] is None  # nothing at or after 11:30


def test_asof_tolerance_drops_far_matches(spark):
    left = _ts_df(
        spark,
        [(1, 1, "2024-01-01T10:00:00"), (2, 1, "2024-01-01T23:00:00")],
        "eid long, user_id long, ts string",
    )
    right = _ts_df(
        spark,
        [(1, "2024-01-01T09:30:00", 5.0)],
        "user_id long, ts string, v double",
    )
    out = {
        r["eid"]: (r["v"], r["rts"])
        for r in AsOfJoin(
            right=right,
            on=["user_id"],
            right_cols=["v"],
            tolerance_seconds=3600,
            emit_right_ts="rts",
        )(left).collect()
    }
    assert out[1][0] == 5.0 and out[1][1] is not None  # 30 min back: in tolerance
    assert out[2] == (None, None)  # 13.5 h back: dropped, row kept


def test_asof_rejects_unknown_direction(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AsOfJoin(right=None, on=["k"], direction="sideways")


def test_rolling_zscore_hand_computed(spark):
    """3 events inside one 2h window: the last event's z-score matches the
    hand-computed population z over the trailing frame; a lone first event
    has zero spread -> z = 0, not NULL/NaN."""
    from warp_pipes_spark.pipes.temporal import RollingZScore

    rows = [
        (1, 1, "2024-01-01 10:00:00", 10.0),
        (1, 2, "2024-01-01 10:30:00", 20.0),
        (1, 3, "2024-01-01 11:00:00", 60.0),
        (2, 4, "2024-01-01 10:00:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["event_id"]: r for r in RollingZScore()(df).collect()}
    # event 3: window = {10, 20, 60}, mean 30, var = (100+400+900)/3... =
    # E[x^2]-mean^2 = (100+400+3600)/3 - 900 = 1366.67 - 900 = 466.67
    import math

    mean, ex2 = 30.0, (100.0 + 400.0 + 3600.0) / 3.0
    want_z = (60.0 - mean) / math.sqrt(ex2 - mean * mean)
    assert out[3]["n_window"] == 3
    assert abs(out[3]["z"] - want_z) < 1e-9
    assert out[4]["n_window"] == 1 and out[4]["z"] == 0.0
    assert out[3]["is_anomaly"] is False


def test_snapshot_as_of_picks_covering_version(spark):
    """Time travel over an SCD2 history: the cutoff lands inside version 1's
    interval for user 1 (version 2 exists later) and after user 2's only
    version; each key returns exactly its covering version."""
    from warp_pipes_spark.pipes.cdc import Scd2Apply, snapshot_as_of

    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (1, 2, "2024-01-20 00:00:00", "b"),
        (2, 3, "2024-01-05 00:00:00", "c"),
    ]
    log = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, state string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    hist = Scd2Apply(keys=["user_id"], ts_col="ts", tie_cols=["event_id"])(log)
    snap = {r["user_id"]: r for r in
            snapshot_as_of(hist, "2024-01-10 00:00:00").collect()}
    assert snap[1]["state"] == "a" and snap[1]["version"] == 1
    assert snap[2]["state"] == "c" and snap[2]["version"] == 1
    assert len(snap) == 2

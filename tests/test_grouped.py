"""GroupedApply (applyInPandas) vs the equivalent window-expression plan."""

from pyspark.sql import functions as F
from pyspark.sql import Window

from warp_pipes_spark.io import load_table
from warp_pipes_spark.pipes.grouped import GroupedApply

SF = "/root/testdata/sf0.001"


def test_grouped_zscore_matches_window_expr(spark):
    ev = load_table(spark, SF, "events").select("user_id", "event_id", "value")

    def zscore(pdf):
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=0) or 1.0
        pdf = pdf.copy()
        pdf["z"] = (pdf["value"] - mu) / sd
        return pdf[["user_id", "event_id", "z"]]

    out = GroupedApply(["user_id"], zscore, "user_id long, event_id long, z double")(ev)

    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    expected = ev.select(
        "user_id",
        "event_id",
        ((F.col("value") - mu) / F.when(sd == 0, 1.0).otherwise(sd)).alias("z"),
    )
    got = {(r["user_id"], r["event_id"]): r["z"] for r in out.collect()}
    exp = {(r["user_id"], r["event_id"]): r["z"] for r in expected.collect()}
    assert got.keys() == exp.keys()
    assert all(abs(got[k] - exp[k]) < 1e-9 for k in exp)

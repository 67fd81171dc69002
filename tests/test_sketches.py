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


def test_scalar_quantizer_roundtrip_and_recall(spark, sf_dir):
    """SQ8: codes in [0,255], idempotent re-encode, bounded reconstruction
    error (<= step/2 per dim), and near-perfect recall of exact top-k when
    searching over the dequantized corpus."""
    import pyspark.sql.functions as F

    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.ml.quantize import quantized_corpus
    from warp_pipes_spark.ml.similarity import BruteForceCosineTopK

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codes, sq = quantized_corpus(emb, dim=64)
    row = codes.select("codes").first()
    assert all(0 <= c <= 255 for c in row["codes"])

    approx = sq.decode(codes).drop("codes")
    # idempotent fixed-point: re-encoding the reconstruction gives the codes
    re_enc = sq.encode(approx).select("vec_id", F.col("codes").alias("codes2"))
    joined = codes.join(re_enc, "vec_id")
    assert joined.filter(F.col("codes") != F.col("codes2")).count() == 0

    # reconstruction error bounded by step/2 per dimension
    err = (
        emb.join(approx.withColumnRenamed("embedding", "approx"), "vec_id")
        .select(
            F.aggregate(
                F.zip_with("embedding", "approx", lambda a, b: F.abs(a - b)),
                F.lit(0.0).cast("double"),
                lambda acc, x: F.greatest(acc, x.cast("double")),
            ).alias("max_err")
        )
        .agg(F.max("max_err"))
        .collect()[0][0]
    )
    assert err <= max(sq.steps) / 2 + 1e-6

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = BruteForceCosineTopK(corpus=emb, k=5, exclude_self=True)(queries)
    quant = BruteForceCosineTopK(corpus=approx, k=5, exclude_self=True)(queries)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    q = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(e & q) / len(e)
    assert recall >= 0.9, recall

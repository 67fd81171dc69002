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


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _term_stream(spark):
    from warp_pipes_spark.text.analysis import tokens_expr

    docs = load_table(spark, SF, "documents").filter(F.col("lang") == "en")
    return docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))


def test_cms_overestimates_never_under(spark):
    """The CMS one-sided guarantee: exact <= estimate for every key."""
    from warp_pipes_spark.ml.sketches import CountMinSketch

    stream = _term_stream(spark).persist()
    cms = CountMinSketch(key_col="term", depth=4, width=256, seed=11)
    exact = stream.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms.estimate(exact, cms.sketch(stream))
    bad = est.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    stream.unpersist()
    assert bad == 0


def test_cms_merge_equals_union(spark):
    """sketch(A union B) is cell-for-cell identical to merging the shard
    sketches — the property that makes CMS distributable."""
    from warp_pipes_spark.ml.sketches import CountMinSketch, merge_sketches

    stream = _term_stream(spark).persist()
    a = stream.filter(F.length("term") <= 4)
    b = stream.filter(F.length("term") > 4)
    cms = CountMinSketch(key_col="term", depth=4, width=128, seed=3)
    merged = merge_sketches(cms.sketch(a), cms.sketch(b))
    full = cms.sketch(stream)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    stream.unpersist()


def test_cms_unseen_key_estimates_from_cells(spark):
    """A key absent from the stream still gets an estimate (its cells'
    collision mass) — and an empty-cell key estimates 0 via the left join."""
    from warp_pipes_spark.ml.sketches import CountMinSketch

    cms = CountMinSketch(key_col="term", depth=4, width=64, seed=5)
    stream = spark.createDataFrame([("aa",), ("aa",), ("bb",)], ["term"])
    sk = cms.sketch(stream)
    probe = spark.createDataFrame([("aa",), ("zz",)], ["term"])
    rows = {r["term"]: r["cms_est"] for r in cms.estimate(probe, sk).collect()}
    assert rows["aa"] >= 2
    assert rows["zz"] >= 0


def test_portable_hll_merge_equals_whole(spark, sf_dir):
    """Register merge = set union: estimating the max-merged shard
    registers equals estimating the whole frame, bit-for-bit."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.ml.sketches import PortableHll, merge_hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    hll = PortableHll("l_partkey", group_cols=("l_returnflag",))
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = merge_hll_registers(hll.registers(half_a), hll.registers(half_b))
    got = sorted(tuple(r) for r in hll.estimate(merged).collect())
    want = sorted(tuple(r) for r in hll(li).collect())
    assert got == want


def test_portable_hll_estimate_accuracy(spark):
    from warp_pipes_spark.ml.sketches import PortableHll

    n = 5000
    df = spark.range(n).selectExpr("id AS v")
    est = PortableHll("v")(df).collect()[0]["hll_estimate"]
    assert abs(est - n) / n < 0.15, est


def test_portable_hll_ungrouped_sql_branch(spark, tmp_path):
    """The group-less oracle branch (no GROUP BY / ORDER BY clauses) must
    produce the same estimate as the Spark operator."""
    import duckdb

    from warp_pipes_spark.ml.sketches import PortableHll, portable_hll_sql

    df = spark.range(3000).selectExpr("id AS v")
    path = str(tmp_path / "vals.parquet")
    df.write.mode("overwrite").parquet(path)
    got = PortableHll("v")(spark.read.parquet(path)).collect()[0]["hll_estimate"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    want = con.execute(portable_hll_sql("v", "t")).fetchall()[0][0]
    assert got == want


def test_histogram_quantiles_accuracy_and_merge(spark, sf_dir):
    """Sketch estimates land within one bin width of the exact type-1
    quantile, and histograms built over disjoint shards merge (count
    addition) to the whole-corpus histogram — the register contract."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.ml.sketches import (
        HistogramQuantiles,
        merge_histogram_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hq = HistogramQuantiles(value_col="l_extendedprice", group_cols=("l_returnflag",))
    est = {r["l_returnflag"]: r for r in hq(li).collect()}

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    exact = {
        r[0]: r
        for r in con.execute(
            "SELECT l_returnflag, MIN(l_extendedprice), MAX(l_extendedprice), "
            "quantile_disc(l_extendedprice, 0.5), quantile_disc(l_extendedprice, 0.95) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, r in est.items():
        _, vmin, vmax, p50x, p95x = exact[flag]
        bin_w = (float(vmax) - float(vmin)) / 1024 + 0.01
        assert abs(r["p50"] - float(p50x)) <= bin_w, (flag, r["p50"], p50x)
        assert abs(r["p95"] - float(p95x)) <= bin_w, (flag, r["p95"], p95x)

    # mergeability: shard by orderkey parity, build BOTH shard histograms
    # over the whole-corpus frame (the real shard-merge contract), and
    # verify the merged counts equal the whole-corpus histogram
    from pyspark.sql import functions as F

    frame = hq.frame_of(li)
    h_all = hq.histogram(li, frame=frame)
    h0 = hq.histogram(li.filter(F.col("l_orderkey") % 2 == 0), frame=frame)
    h1 = hq.histogram(li.filter(F.col("l_orderkey") % 2 == 1), frame=frame)
    merged = merge_histogram_counts(h0, h1)
    a = {tuple(r) for r in h_all.collect()}
    m = {tuple(r) for r in merged.collect()}
    assert a == m

    # mismatched frames must be a LOUD error, not a silent corrupt merge
    import pytest

    h_own = hq.histogram(li.filter(F.col("l_orderkey") % 7 == 3))  # own frame
    with pytest.raises(ValueError, match="frames disagree"):
        merge_histogram_counts(h0, h_own)


def test_bloom_gate_no_false_negatives(spark, sf_dir):
    """Every exact duplicate MUST be flagged (bloom guarantee); the
    truth-audit columns agree with an exact semi-join."""
    from warp_pipes_spark.ml.sketches import BloomFilterGate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0").select("text")
    cand = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    out = BloomFilterGate(
        corpus=corpus, m_bits=4096, k=3, truth_audit=True
    )(cand).collect()
    assert out, "gate produced no rows"
    for r in out:
        if r["true_dup"]:
            assert r["bloom_hit"], f"false negative at doc {r['doc_id']}"
        assert r["false_positive"] == (r["bloom_hit"] and not r["true_dup"])


def test_bloom_bits_merge_equals_whole(spark, sf_dir):
    """Filter state from disjoint history shards ORs (position-set union)
    into the state built from the whole history."""
    from warp_pipes_spark.ml.sketches import BloomFilterGate, merge_bloom_bits

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    gate = BloomFilterGate(corpus=docs, m_bits=2048, k=4)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = merge_bloom_bits(gate.filter_bits(half_a), gate.filter_bits(half_b))
    got = sorted(r["pos"] for r in merged.collect())
    want = sorted(r["pos"] for r in gate.filter_bits(docs).collect())
    assert got == want


def test_kmv_estimate_accuracy(spark):
    """KMV distinct estimate within the k=64 theoretical error band, and
    exact below k."""
    from warp_pipes_spark.ml.sketches import KmvSketch

    n = 4000
    df = spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS source",
        "'tok' || translate(CAST(id AS STRING), '0123456789', 'abcdefghij') || ' filler' AS text",
    )
    out = KmvSketch(group_col="source", k=64)(df).collect()
    assert len(out) == 1
    r = out[0]
    # each source holds n/2 distinct 'tokNNN' tokens + 'filler'
    for est in (r["distinct_a"], r["distinct_b"]):
        assert abs(est - (n / 2 + 1)) / (n / 2) < 0.4, est
    # sources share only 'filler' -> jaccard near zero
    assert r["jaccard_est"] < 0.1, r["jaccard_est"]


def test_kmv_merge_equals_whole(spark, sf_dir):
    """Sketches from disjoint shards merge (union -> bottom-k) into the
    whole-frame sketch; merged estimates use the h_k path, never a stale
    exact-count floor."""
    from warp_pipes_spark.ml.sketches import KmvSketch, merge_kmv_sketches

    docs = load_table(spark, sf_dir, "documents")
    kmv = KmvSketch(group_col="source", k=32)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = merge_kmv_sketches(
        32, kmv.sketches(half_a), kmv.sketches(half_b)
    )
    whole = kmv.sketches(docs)
    got = {r["source"]: r["sketch"] for r in merged.collect()}
    want = {r["source"]: r["sketch"] for r in whole.collect()}
    assert got == want


def test_random_projection_duplicate_passthrough_tuples(spark):
    """Rows that collide on every NON-id column must still project
    independently: the round-4 advisor found the round trip was keyed on
    the full passthrough tuple, silently combining such rows' decimal
    sums into one wrong projection."""
    from warp_pipes_spark.ml.quantize import RandomProjection

    df = spark.createDataFrame(
        [(1, "same", [1.0] * 8), (2, "same", [2.0] * 8)],
        "vec_id long, label string, embedding array<double>",
    )
    out = {r["vec_id"]: r["proj"] for r in
           RandomProjection(in_dim=8, out_dim=4)(df).collect()}
    assert len(out) == 2
    import numpy as np
    assert np.allclose(np.array(out[2]), 2 * np.array(out[1]))


def test_random_projection_requires_id_col(spark):
    import pytest as _pytest

    from warp_pipes_spark.ml.quantize import RandomProjection

    df = spark.createDataFrame([([1.0] * 8,)], "embedding array<double>")
    with _pytest.raises(ValueError, match="unique row id"):
        RandomProjection(in_dim=8, out_dim=4)(df)


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: projected pairwise distances track the originals
    within the expected 1/sqrt(out_dim) distortion band (checked loosely
    over sampled pairs), and norms are preserved in aggregate."""
    import math

    import numpy as np

    from warp_pipes_spark.ml.quantize import RandomProjection

    emb = load_table(spark, sf_dir, "embeddings").limit(60)
    out = RandomProjection(in_dim=64, out_dim=16)(emb).collect()
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in out}
    proj = {r["vec_id"]: np.array(r["proj"], dtype=float) for r in out}
    ids = sorted(orig)[:30]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        do = np.linalg.norm(orig[a] - orig[b])
        dp = np.linalg.norm(proj[a] - proj[b])
        if do > 1e-9:
            ratios.append(dp / do)
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.5 < med < 1.5, med
    assert sum(1 for r in ratios if 0.3 < r < 1.9) >= 0.9 * len(ratios)


def test_embedding_drift_detects_planted_shift(spark):
    """A constant +0.5 shift on one dimension must dominate the PSI panel
    and report the exact mean shift; undrifted dims stay near zero."""
    import numpy as np

    from warp_pipes_spark.ml.drift import EmbeddingDrift

    rng = np.random.RandomState(7)
    ref_rows = [(i, [float(x) for x in rng.rand(4)]) for i in range(400)]
    cur_rows = []
    for i, v in [(i, list(rng.rand(4))) for i in range(400)]:
        v[2] += 0.5  # planted drift on dim 2
        cur_rows.append((i, [float(x) for x in v]))
    schema = "vec_id long, embedding array<double>"
    ref = spark.createDataFrame(ref_rows, schema)
    cur = spark.createDataFrame(cur_rows, schema)
    out = {r["dim"]: r for r in EmbeddingDrift(reference=ref)(cur).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[2]["psi"] > 0.25, out[2]          # action threshold tripped
    assert abs(out[2]["mean_shift"] - 0.5) < 0.05
    for d in (0, 1, 3):
        assert out[d]["psi"] < 0.1, out[d]       # stable dims stay stable
    # identical snapshots -> PSI exactly 0 on every dim
    same = {r["dim"]: r["psi"] for r in EmbeddingDrift(reference=ref)(ref).collect()}
    assert all(v == 0.0 for v in same.values())


def test_embedding_drift_drops_null_components(spark):
    """NULL vector components are excluded on both snapshots: least(NULL,
    B-1) would otherwise land them in the top bin while skipping the
    frame min/max and mean sums, silently skewing PSI and the means."""
    from warp_pipes_spark.ml.drift import EmbeddingDrift

    schema = "vec_id long, embedding array<double>"
    base = [(i, [0.1 * (i % 10), 0.5]) for i in range(100)]
    ref = spark.createDataFrame(base, schema)
    # same values, but a handful of NULL components injected on each dim
    noisy = list(base) + [(100, [None, 0.5]), (101, [0.3, None]),
                          (102, [None, None])]
    cur = spark.createDataFrame(noisy, schema)
    out = {r["dim"]: r for r in EmbeddingDrift(reference=ref)(cur).collect()}
    # dim 0 gains one real value (0.3) and dim 1 one real value (0.5):
    # counts reflect only non-NULL components
    assert out[0]["n_ref"] == 100 and out[0]["n_cur"] == 101
    assert out[1]["n_ref"] == 100 and out[1]["n_cur"] == 101
    # psi is not exactly 0: n_cur=101 vs n_ref=100 shifts the Laplace
    # fractions by ~1e-4 even though every value is identical
    assert out[1]["mean_cur"] == 0.5 and out[1]["psi"] < 1e-4
    assert out[0]["psi"] < 0.01


def test_vocab_growth_monotone_and_exact_at_full(spark):
    """Nested md5 samples: every column is monotone over pct, and the
    100% row equals the exact corpus-wide counts."""
    from pyspark.sql import functions as F

    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.text.analysis import VocabGrowth, tokens_expr

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = sorted(
        VocabGrowth(steps=10, seed=17)(docs).collect(), key=lambda r: r["pct"]
    )
    assert [r["pct"] for r in rows] == list(range(10, 101, 10))
    for col in ("n_docs", "n_tokens", "vocab_size"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals), f"{col} not monotone: {vals}"
    full = rows[-1]
    exact = docs.select(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.size(tokens_expr(F.col("text")))).alias("t"),
    ).collect()[0]
    vocab = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
        .distinct()
        .count()
    )
    assert full["n_docs"] == exact["d"]
    assert full["n_tokens"] == exact["t"]
    assert full["vocab_size"] == vocab


def test_lsh_s_curve_planted_extremes(spark):
    """Near-identical docs (j ~ 1) must be candidates at rate ~1; disjoint
    low-jaccard pairs must land in a low bucket with theory near 0."""
    from warp_pipes_spark.text.dedup import LshSCurveAudit

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(1, dup), (2, dup)]  # j = 1.0 pair
    # pair sharing exactly one trigram out of many (tokenization strips
    # digits, so fillers must differ in LETTERS)
    rows.append((3, "one two three xa ya za wa va ua ta"))
    rows.append((4, "one two three xb yb zb wb vb ub tb"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["j_lo"]: r for r in
           LshSCurveAudit(n=3, floor=0.05)(df).collect()}
    hi = max(out)
    assert out[hi]["measured_rate"] == 1.0
    assert out[hi]["theoretical_rate"] > 0.99
    lo = min(out)
    assert lo <= 0.2
    assert out[lo]["theoretical_rate"] < 0.05


def test_lsh_s_curve_nondefault_buckets(spark):
    """buckets != 10 must scale the bucket edges and j_lo consistently
    (the width was once hard-coded to deciles): a j=1.0 pair lands in the
    TOP bucket (j_lo = (buckets-1)/buckets) and every j_lo is a multiple
    of 1/buckets below 1."""
    from warp_pipes_spark.text.dedup import LshSCurveAudit

    dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(1, dup), (2, dup),
            (3, "one two three xa ya za wa va ua ta"),
            (4, "one two three xb yb zb wb vb ub tb")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for buckets in (5, 20):
        out = {r["j_lo"]: r for r in
               LshSCurveAudit(n=3, floor=0.05, buckets=buckets)(df).collect()}
        assert len(out) == 2  # no rows silently dropped by the theory join
        hi = max(out)
        assert abs(hi - (buckets - 1) / buckets) < 1e-9, (buckets, hi)
        assert out[hi]["measured_rate"] == 1.0
        assert out[hi]["theoretical_rate"] > 0.99
        for j_lo in out:
            assert abs(j_lo * buckets - round(j_lo * buckets)) < 1e-9


def test_hll_rollup_merge_equals_rescan(spark):
    """The '__ALL__' row (register MERGE across sources) must equal the
    estimate from a direct one-group build over the same rows — the
    mergeability contract, asserted in-engine (the oracle asserts it
    cross-engine)."""
    from pyspark.sql import functions as F

    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.ml.sketches import PortableHll
    from warp_pipes_spark.queries import QUERIES
    from warp_pipes_spark.text.analysis import tokens_expr

    out = {r["source"]: r["hll_estimate"] for r in
           QUERIES["q194_hll_rollup"].fn(spark, "/root/testdata/sf0.001").collect()}
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    tok = docs.select(F.explode(tokens_expr(F.col("text"))).alias("term"))
    direct = PortableHll("term")(tok).collect()[0]["hll_estimate"]
    assert out["__ALL__"] == direct
    assert len(out) >= 3


def test_flesch_readability_hand_oracle(spark):
    """Known sentence structure gives the hand-computed score; empty doc
    keeps its row with NULL flesch."""
    from warp_pipes_spark.text.analysis import FleschReadability

    # 6 words, 2 sentences, syllable groups: simple heuristic count
    rows = [(1, "the cat sat. the dog ran. "), (2, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in FleschReadability()(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6
    assert r1["n_sentences"] == 3  # split on '. ' -> 3 segments (trailing)
    assert r1["n_syllables"] == 6  # one vowel group per word
    wps, spw = 6 / 3, 6 / 6
    expect = round(206.835 - 1.015 * round(wps, 6) - 84.6 * round(spw, 6), 6)
    assert abs(r1["flesch"] - expect) < 1e-9
    assert out[2]["flesch"] is None and out[2]["n_words"] == 0

"""Z-order layout: key correctness and the actual pruning payoff on disk."""

from __future__ import annotations

from pyspark.sql import functions as F

from warp_pipes_spark.plans.layout import ZOrderLayout, zorder_key


def _interleave_py(vals, bits):
    z = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_key_matches_reference_bitmath(spark):
    rows = [(x, y) for x in [0, 1, 5, 63, 64, 4095] for y in [0, 2, 7, 4095]]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=12).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _interleave_py([r["x"], r["y"]], 12), (r["x"], r["y"])


def test_zorder_single_column_is_identity(spark):
    df = spark.createDataFrame([(i,) for i in range(16)], "x long")
    out = df.select("x", zorder_key([F.col("x")], bits=8).alias("z")).collect()
    assert all(r["z"] == r["x"] for r in out)


def test_zorder_layout_improves_file_locality(spark, sf_dir, tmp_path):
    """The point of the layout: a rectangle predicate on BOTH clustered
    dimensions touches few files under Z-order, many under a layout sorted
    by only one of the dimensions. (x<16, y<16 with 6-bit fields is exactly
    the z < 256 curve prefix — at 8 range partitions that is one file.)"""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            (F.col("doc_id") % 64).alias("x"),
            (F.col("n_chars") % 64).alias("y"),
        )
    )
    z_path, lin_path = str(tmp_path / "zorder"), str(tmp_path / "linear")
    ZOrderLayout(["x", "y"], bits=6, n_partitions=8)(docs).write.parquet(z_path)
    docs.repartitionByRange(8, "doc_id").sortWithinPartitions("doc_id").write.parquet(
        lin_path
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter((F.col("x") < 16) & (F.col("y") < 16))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, lin_files = files_touched(z_path), files_touched(lin_path)
    assert z_files <= 2, z_files
    assert z_files < lin_files, (z_files, lin_files)


def test_zorder_layout_drops_key_by_default(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    assert "__z" not in ZOrderLayout(["x", "y"]).__call__(df).columns
    assert "__z" in ZOrderLayout(["x", "y"], keep_key=True)(df).columns


def test_hilbert_consecutive_steps_are_unit_manhattan(spark):
    """THE Hilbert property (what Z-order lacks): consecutive curve
    positions are Manhattan distance EXACTLY 1 apart, so a contiguous
    h-range always covers one connected tight region. Verified
    exhaustively on the full 32x32 grid, plus bijectivity."""
    from warp_pipes_spark.plans.layout import hilbert_frame

    n = 32
    pts = spark.createDataFrame(
        [(i % n, i // n) for i in range(n * n)], "x int, y int"
    )
    rows = (
        hilbert_frame(pts, F.col("x"), F.col("y"), bits=5, out_col="h")
        .orderBy("h")
        .collect()
    )
    assert [r.h for r in rows] == list(range(n * n))  # bijective onto 0..1023
    steps = [
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(rows, rows[1:])
    ]
    assert all(s == 1 for s in steps)


def test_zorder_jumps_exceed_hilbert(spark):
    """Moon et al. 2001: the Morton curve takes long quadrant jumps the
    Hilbert curve never does — total travel distance along curve order is
    strictly larger. (The reason q206 exists next to q86.)"""
    from warp_pipes_spark.plans.layout import hilbert_frame, zorder_key

    n = 32
    pts = spark.createDataFrame(
        [(i % n, i // n) for i in range(n * n)], "x int, y int"
    )
    zrows = (
        pts.withColumn("z", zorder_key([F.col("x"), F.col("y")], bits=5))
        .orderBy("z")
        .collect()
    )
    ztravel = sum(
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(zrows, zrows[1:])
    )
    assert ztravel > n * n - 1  # Hilbert's travel is exactly n*n - 1

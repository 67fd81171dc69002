"""Nesting algebra tests (mirrors reference tests/pipes/test_nesting.py:
flatten/nest round trip, within-group sort/filter, Expand shapes)."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.nesting import (
    ApplyAsFlatten,
    Expand,
    Flatten,
    Nest,
    Nested,
    NestedLevel1,
    infer_missing_dims,
    nesting_level,
)


@pytest.fixture(scope="module")
def nested1(spark):
    return spark.createDataFrame(
        [(0, 100, ["a", "b", "c"]), (1, 101, ["d", "e", "f"])],
        "row_id long, question long, document_text array<string>",
    )


@pytest.fixture(scope="module")
def nested_num(spark):
    return spark.createDataFrame(
        [(0, [1, 2, 3]), (1, [4, 5, 6])], "row_id long, a array<long>"
    )


def test_nesting_level(nested1):
    assert nesting_level(nested1.schema["document_text"].dataType) == 1
    assert nesting_level(nested1.schema["question"].dataType) == 0


def test_infer_missing_dims():
    assert infer_missing_dims(12, [-1, 3]) == [4, 3]
    assert infer_missing_dims(12, [2, -1, 3]) == [2, 2, 3]


def test_flatten_multiplies_rows(nested1):
    out = Flatten("document_text")(nested1)
    assert out.count() == 6
    assert sorted(r["document_text"] for r in out.collect()) == list("abcdef")


def test_flatten_nest_round_trip(nested1):
    flat = Flatten("document_text", keep_positions=True)(nested1)
    back = Nest(
        "document_text", group_cols=["row_id", "question"], order_col="document_text__pos_0"
    )(flat)
    got = {r["row_id"]: r["document_text"] for r in back.collect()}
    assert got == {0: ["a", "b", "c"], 1: ["d", "e", "f"]}


def test_apply_as_flatten_identity(nested1):
    out = ApplyAsFlatten("document_text", lambda c: c)(nested1)
    got = {r["row_id"]: r["document_text"] for r in out.collect()}
    assert got == {0: ["a", "b", "c"], 1: ["d", "e", "f"]}


def test_apply_as_flatten_elementwise(nested1):
    out = ApplyAsFlatten("document_text", F.upper)(nested1)
    got = {r["row_id"]: r["document_text"] for r in out.collect()}
    assert got == {0: ["A", "B", "C"], 1: ["D", "E", "F"]}


def test_apply_as_flatten_level_check(nested1):
    with pytest.raises(ValueError, match="nesting level"):
        ApplyAsFlatten("question", lambda c: c, level=1)._columns(nested1)


def test_nested_level1_sort_desc(nested_num):
    # reference test: a=[1,2,3] -> [3,2,1] (sort within group)
    out = NestedLevel1("a", lambda c: F.reverse(F.array_sort(c)))(nested_num)
    got = {r["row_id"]: r["a"] for r in out.collect()}
    assert got == {0: [3, 2, 1], 1: [6, 5, 4]}


def test_nested_level1_filter(nested_num):
    # reference test: drop values >= 3 within each group
    out = NestedLevel1("a", lambda c: F.filter(c, lambda x: x < 3))(nested_num)
    got = {r["row_id"]: r["a"] for r in out.collect()}
    assert got == {0: [1, 2], 1: []}


def test_nested_level2(spark):
    df = spark.createDataFrame(
        [(0, [[3, 1], [2, 4]])], "row_id long, a array<array<long>>"
    )
    out = Nested("a", F.array_sort, level=2)(df)
    assert out.collect()[0]["a"] == [[1, 3], [2, 4]]


def test_expand_in_place(nested_num):
    out = Expand("a", 2)(nested_num)
    got = out.filter(F.col("row_id") == 0).collect()[0]["a"]
    assert got == [[1, 2, 3], [1, 2, 3]]


def test_expand_as_rows(nested_num):
    out = Expand("a", 3, as_rows=True)(nested_num)
    assert out.count() == 6


def test_apply_as_flatten_pipe_level1(spark):
    """General mode: an arbitrary row-level Pipe (not element-wise) over the
    flattened rows — reference nesting.py:253-331's dataset path."""
    from warp_pipes_spark.pipes.basics import Apply

    df = spark.createDataFrame(
        [(0, "keep", ["ab", "cde", ""]), (1, "also", []), (2, "x", ["z"])],
        "row_id long, tag string, words array<string>",
    )
    inner = Apply({"words": F.upper(F.col("words")), "wlen": F.length("words")}, update=True)
    out = ApplyAsFlatten("words", pipe=inner, id_col="row_id")(df)
    got = {r["row_id"]: r for r in out.collect()}
    assert got[0]["words"] == ["AB", "CDE", ""]
    assert got[0]["wlen"] == [2, 3, 0]
    assert got[0]["tag"] == "keep"
    assert got[1]["words"] == [] and got[1]["wlen"] == []
    assert got[2]["words"] == ["Z"]


def test_apply_as_flatten_pipe_level2(spark):
    from warp_pipes_spark.pipes.basics import Apply

    df = spark.createDataFrame(
        [(0, [["a", "bb"], [], ["ccc"]])], "row_id long, w array<array<string>>"
    )
    inner = Apply({"w": F.concat(F.col("w"), F.lit("!"))}, update=True)
    out = ApplyAsFlatten("w", pipe=inner, level=2, id_col="row_id")(df)
    assert out.collect()[0]["w"] == [["a!", "bb!"], [], ["ccc!"]]


def test_apply_as_flatten_pipe_extra_cols_lockstep(spark):
    """Co-flattened token-aligned columns explode in lockstep and re-nest
    aligned (e.g. tokens + per-token scores)."""
    from warp_pipes_spark.pipes.basics import Apply

    df = spark.createDataFrame(
        [(0, ["a", "b"], [1, 2])],
        "row_id long, toks array<string>, scores array<long>",
    )
    inner = Apply({"scores": F.col("scores") * 10}, update=True)
    out = ApplyAsFlatten(
        "toks", pipe=inner, extra_cols=["scores"], id_col="row_id"
    )(df)
    row = out.collect()[0]
    assert row["toks"] == ["a", "b"]
    assert row["scores"] == [10, 20]


def test_apply_as_flatten_pipe_shape_assert(spark):
    """The reference's shape assertion: an inner pipe that drops rows makes
    the re-nest fail loudly, not silently mis-nest."""
    from warp_pipes_spark.core.pipe import AsPipe

    df = spark.createDataFrame(
        [(0, ["a", "b", "c"])], "row_id long, words array<string>"
    )
    dropper = AsPipe(lambda d: d.filter(F.col("words") != "b"))
    bad = ApplyAsFlatten("words", pipe=dropper, id_col="row_id", update=False)
    with pytest.raises(Exception, match="changed the flattened shape"):
        bad(df).collect()


def test_apply_as_flatten_requires_exactly_one_mode():
    with pytest.raises(ValueError, match="exactly one"):
        ApplyAsFlatten("x")
    with pytest.raises(ValueError, match="exactly one"):
        ApplyAsFlatten("x", fn=lambda c: c, pipe=ApplyAsFlatten("y", fn=lambda c: c))

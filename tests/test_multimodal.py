"""Multimodal plumbing tests: binary payload columns, deterministic fake
decode, frame sampling explode, byte-budget repartitioning."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.ml.multimodal import (
    DecodeMedia,
    SampleFrames,
    attach_media_metadata,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i), "image/png") for i in range(10)]
    return spark.createDataFrame(rows, "media_id long, payload binary, mime string")


def test_metadata(media):
    out = attach_media_metadata(media).collect()
    for r in out:
        assert r["media_meta"]["n_bytes"] == len(r["payload"])
        assert len(r["media_meta"]["sha256"]) == 64


def test_decode_deterministic(media):
    out1 = {r["media_id"]: r["features"] for r in DecodeMedia(dim=8)(media).collect()}
    out2 = {r["media_id"]: r["features"] for r in DecodeMedia(dim=8)(media).collect()}
    assert out1 == out2
    assert all(len(v) == 8 for v in out1.values())
    # distinct payloads -> distinct features
    assert out1[0] != out1[1]


def test_decode_real_path_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="decod"):
        DecodeMedia(fake_decode=False)(media)


def test_sample_frames(media):
    out = SampleFrames(n_frames=4)(media)
    assert out.count() == 40
    row0 = sorted(
        out.filter(F.col("media_id") == 0).collect(), key=lambda r: r["frame_idx"]
    )
    offsets = [r["byte_offset"] for r in row0]
    assert offsets == sorted(offsets)
    assert offsets[0] == 0


def test_repartition_by_bytes(media):
    out = repartition_by_bytes(media, "payload", target_partition_bytes=300)
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == 10


def test_resize_media_stub_contract(spark):
    from warp_pipes_spark.ml.multimodal import ResizeMedia

    rows = [
        (0, b"x" * 10),             # under budget: passthrough
        (1, bytes(range(256)) * 40),  # over budget: downsampled
        (2, b""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in ResizeMedia(target_w=16, target_h=4)(df).collect()}
    budget = 16 * 4
    assert out[0]["resized"] == b"x" * 10
    assert len(out[1]["resized"]) <= budget
    # deterministic: every k-th byte of the source
    src = bytes(range(256)) * 40
    step = -(-len(src) // budget)
    assert bytes(out[1]["resized"]) == src[::step]
    assert out[2]["resized"] == b"" and out[3]["resized"] == b""
    for r in out.values():
        meta = r["resized_meta"]
        assert meta["target_w"] == 16 and meta["target_h"] == 4
        assert meta["n_bytes"] == len(r["resized"] or b"")

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="real resizing"):
        ResizeMedia(fake_resize=False)(df).collect()
    with _pytest.raises(ValueError, match="positive"):
        ResizeMedia(target_w=0)

"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (this container ships no image/audio libraries): set
``fake_decode=True`` for a deterministic fake (hash-seeded feature vector)
— the Spark-side plumbing (schema, batch shape, partitioning, UDF
signatures) is real and tested; swapping the kernel for PIL/torchaudio is a
one-function change.

Scale notes: binary payloads dominate partition size — the loaders
repartition by byte budget, not row count (``target_partition_bytes``), so
Arrow batches stay within executor memory at 100 TB."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int, "
    "duration_ms int, source string"
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct next to the opaque payload."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(payload_col)).alias("n_bytes"),
            F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha256"),
        ),
    )


def repartition_by_bytes(
    df: DataFrame, payload_col: str, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Size partitions by payload bytes, not rows — binary columns make row
    counts a useless proxy for memory."""
    total = df.select(F.sum(F.length(payload_col))).first()[0] or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n_parts)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake decoder: per-component md5 fixed-point values,
    component i = int(md5(payload || ':' || i)[:12 hex]) / 16^12. Stands in
    for a real image/audio model so the full pipeline is testable without
    the media libraries — and, unlike an RNG-seeded stub, is reproducible
    in SQL (md5 + hex arithmetic), so the Arrow-batched UDF seam itself is
    differentially testable end to end. 16^12 = 2^48 makes every component
    a dyadic rational (granularity 2^-48, magnitude < 1), so sums are EXACT
    doubles in any fold order while the running total stays within a 53-bit
    mantissa — guaranteed for dim <= 32 (the oracled q42 uses dim=8); above
    that, exactness would depend on the low bits actually summed."""
    if dim > 32:
        raise ValueError(
            "fake_decode guarantees order-free exact sums only for dim <= 32"
        )
    p = payload or b""
    return np.array(
        [
            int(hashlib.md5(p + b":" + str(i).encode()).hexdigest()[:12], 16)
            / 281474976710656.0
            for i in range(dim)
        ],
        dtype=np.float64,
    )


class DecodeMedia(Pipe):
    """payload binary -> feature vector (array<double>). ``fake_decode``
    uses the deterministic stub; otherwise raises until a real decoder is
    plugged in (no media libs in this environment)."""

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "media_id",
        out_col: str = "features",
        dim: int = 16,
        fake_decode: bool = True,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.payload_col = payload_col
        self.id_col = id_col
        self.out_col = out_col
        self.dim = dim
        self.fake_decode = fake_decode

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if not self.fake_decode:
            raise NotImplementedError(
                "real media decoding requires PIL/torchaudio/ffmpeg — not "
                "available in this environment; use fake_decode=True for the "
                "deterministic stub"
            )
        dim = self.dim

        # iterator-form scalar UDF: decoder init once per partition, output
        # via withColumn — no join-back, payload column scanned once
        def decode(batches):
            for payloads in batches:
                yield pd.Series([list(_fake_feature(p, dim)) for p in payloads])

        decode.__annotations__ = {
            "batches": Iterator[pd.Series],
            "return": Iterator[pd.Series],
        }
        udf = pandas_udf(decode, "array<double>")
        return df.withColumn(self.out_col, udf(F.col(self.payload_col)))


class SampleFrames(Pipe):
    """Frame sampling plumbing for video payloads: emit ``n_frames`` rows
    per media row (frame_idx + stub frame payload slice) — 1->N explode
    semantics with deterministic frame positions."""

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "media_id",
        n_frames: int = 4,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_frames = n_frames

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        n = F.greatest(F.length(self.payload_col), F.lit(1))
        positions = F.transform(
            F.sequence(F.lit(0), F.lit(self.n_frames - 1)),
            lambda i: (i * n / F.lit(self.n_frames)).cast("int"),
        )
        return df.select(
            self.id_col,
            F.posexplode(positions).alias("frame_idx", "byte_offset"),
        )


class ResizeMedia(Pipe):
    """payload binary -> resized payload binary + output-shape metadata:
    the image/video RESIZE slot in the decode -> transform -> re-encode
    chain. The Spark-side plumbing is real — Arrow-batched iterator UDF
    (codec init once per partition), binary in/binary out, emitted size
    metadata — while the codec itself is env-gated exactly like
    :class:`DecodeMedia`: with ``fake_resize=True`` the "resize" is a
    deterministic byte-plane downsample (take every k-th byte so the
    output length is ``ceil(len * scale)``), standing in for
    PIL/libvips/ffmpeg which this container lacks. The fake is
    deterministic and length-exact, so partition-layout invariance and the
    metadata contract (``out_w * out_h`` accounting at a real decoder's
    seam) are testable end to end."""

    def __init__(
        self,
        target_w: int = 224,
        target_h: int = 224,
        payload_col: str = "payload",
        out_col: str = "resized",
        fake_resize: bool = True,
        **kwargs,
    ):
        if target_w <= 0 or target_h <= 0:
            raise ValueError("target dimensions must be positive")
        super().__init__(**kwargs)
        self.target_w = target_w
        self.target_h = target_h
        self.payload_col = payload_col
        self.out_col = out_col
        self.fake_resize = fake_resize

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if not self.fake_resize:
            raise NotImplementedError(
                "real resizing requires PIL/libvips/ffmpeg — not available "
                "in this environment; use fake_resize=True for the "
                "deterministic stub"
            )
        w, h = self.target_w, self.target_h

        def resize(batches):
            for payloads in batches:
                out = []
                for p in payloads:
                    p = p or b""
                    budget = w * h
                    if len(p) <= budget:
                        out.append(p)
                    else:
                        # deterministic byte-plane downsample to <= budget
                        step = -(-len(p) // budget)  # ceil division
                        out.append(p[::step])
                yield pd.Series(out)

        resize.__annotations__ = {
            "batches": Iterator[pd.Series],
            "return": Iterator[pd.Series],
        }
        udf = pandas_udf(resize, "binary")
        out = df.withColumn(self.out_col, udf(F.col(self.payload_col)))
        return out.withColumn(
            f"{self.out_col}_meta",
            F.struct(
                F.lit(w).alias("target_w"),
                F.lit(h).alias("target_h"),
                F.length(F.col(self.out_col)).cast("long").alias("n_bytes"),
            ),
        )

from warp_pipes_spark.ml.multimodal import DecodeMedia, ResizeMedia, SampleFrames
from warp_pipes_spark.ml.quantize import PqCosineTopK, ProductQuantizer, ScalarQuantizer
from warp_pipes_spark.ml.semantic import SemanticDedup
from warp_pipes_spark.ml.pooling import PoolEmbeddings, StandardizeEmbeddings
from warp_pipes_spark.ml.similarity import (
    BruteForceCosineTopK,
    CosinePairs,
    IvfCosineTopK,
    LshCosineTopK,
    MatryoshkaTopK,
)

__all__ = [
    "BruteForceCosineTopK",
    "CosinePairs",
    "LshCosineTopK",
    "IvfCosineTopK",
    "SemanticDedup",
    "ScalarQuantizer",
    "ProductQuantizer",
    "PqCosineTopK",
    "MatryoshkaTopK",
    "PoolEmbeddings",
    "StandardizeEmbeddings",
    "DecodeMedia",
    "ResizeMedia",
    "SampleFrames",
]

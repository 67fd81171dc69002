from warp_pipes_spark.text.analysis import (
    DocFingerprint,
    LangId,
    QualityScore,
    TokenCount,
)
from warp_pipes_spark.text.dedup import (
    ExactDedup,
    MinHashDedup,
    NgramJaccardDedup,
    SimHashDedup,
)

__all__ = [
    "TokenCount",
    "QualityScore",
    "LangId",
    "DocFingerprint",
    "ExactDedup",
    "MinHashDedup",
    "NgramJaccardDedup",
    "SimHashDedup",
]

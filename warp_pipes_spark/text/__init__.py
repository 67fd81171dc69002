from warp_pipes_spark.text.analysis import (
    DocFingerprint,
    LangId,
    QualityScore,
    RepetitionScore,
    TermStats,
    TokenCount,
)
from warp_pipes_spark.text.dedup import (
    CrossCorpusOverlap,
    DedupClusters,
    ExactDedup,
    MinHashDedup,
    NgramJaccardDedup,
    SimHashDedup,
)
from warp_pipes_spark.text.packing import PackSequences

__all__ = [
    "TokenCount",
    "QualityScore",
    "LangId",
    "DocFingerprint",
    "RepetitionScore",
    "TermStats",
    "ExactDedup",
    "MinHashDedup",
    "NgramJaccardDedup",
    "SimHashDedup",
    "DedupClusters",
    "CrossCorpusOverlap",
    "PackSequences",
]

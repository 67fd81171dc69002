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
from warp_pipes_spark.text.bpe import BpeTokenizer, train_bpe
from warp_pipes_spark.text.classifier import HashedLinearClassifier
from warp_pipes_spark.text.packing import PackSequences

__all__ = [
    "BpeTokenizer",
    "train_bpe",
    "HashedLinearClassifier",
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

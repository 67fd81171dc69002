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
    DupNgramFraction,
    DedupClusters,
    ExactDedup,
    MinHashDedup,
    NgramJaccardDedup,
    SimHashDedup,
)
from warp_pipes_spark.text.bpe import BpeTokenizer, train_bpe
from warp_pipes_spark.text.classifier import HashedLinearClassifier
from warp_pipes_spark.text.packing import LengthBucketBatches, PackSequences
from warp_pipes_spark.text.web import HtmlStrip, UrlParse

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
    "DupNgramFraction",
    "DedupClusters",
    "CrossCorpusOverlap",
    "PackSequences",
    "LengthBucketBatches",
    "UrlParse",
    "HtmlStrip",
]

"""warp_pipes_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the capability surface of the
``warp-pipes`` reference library (fingerprintable, composable batch-dataflow
preprocessing: column ops, pipeline combinators, nesting algebra, text /
passage operators, cached model inference, retrieval engines), re-expressed
as lazy ``DataFrame -> DataFrame`` transforms planned by Catalyst, plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, streaming) designed for 100 TB scale.

Everything here derives from public knowledge only: the Apache Spark API and
the MIT-licensed reference at /root/reference (studied for *behavior*, not
copied — the reference runs eager Python over Arrow batches; we build lazy
Catalyst plans instead).
"""

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.core.condition import (
    AllRowsMatch,
    AnyRowMatches,
    BatchCondition,
    Condition,
    Contains,
    HasPrefix,
    In,
    NonEmpty,
    Not,
    Reduce,
    Static,
)
from warp_pipes_spark.pipes.basics import (
    AddPrefix,
    Apply,
    ApplyToAll,
    CopyBatch,
    DropKeys,
    FilterKeys,
    GetKey,
    Identity,
    Lambda,
    Partial,
    RenameKeys,
    ReplaceInKeys,
)
from warp_pipes_spark.pipes.pipelines import (
    BlockSequential,
    Gate,
    Parallel,
    ParallelbyField,
    PipeProcessError,
    Sequential,
)
from warp_pipes_spark.core.condition import (
    AllValuesOfType,
    HasKeys,
    HasKeyWithPrefix,
)
from warp_pipes_spark.core.fingerprint import get_fingerprint
from warp_pipes_spark.pipes.cache import CachedPipe, CacheManager
from warp_pipes_spark.pipes.collate import (
    CollateField,
    FirstEg,
    Padding,
    decollate,
)
from warp_pipes_spark.pipes.nesting import (
    ApplyAsFlatten,
    Expand,
    Flatten,
    Nest,
    Nested,
    NestedLevel1,
)
from warp_pipes_spark.pipes.passages import GeneratePassages
from warp_pipes_spark.pipes.pprint import PrintBatch, PrintContent
from warp_pipes_spark.pipes.predict import Predict, PredictWithoutCache
from warp_pipes_spark.pipes.tokenizer import HFTokenizer, RegexTokenizer
from warp_pipes_spark.search.auto import auto_engine, auto_index
from warp_pipes_spark.search.index import Index

# Reference-name aliases so `from warp_pipes import X` one-liners port as
# `from warp_pipes_spark import X`:
# - the reference's default TokenizerPipe wraps an HF tokenizer; the
#   equivalent default path here is the JVM-side RegexTokenizer (HFTokenizer
#   is the transformers-backed variant, gated on the library being present)
TokenizerPipe = RegexTokenizer
# - PredictWithCache is the fingerprint-keyed cached path (`Predict` here)
PredictWithCache = Predict
# - Pipe IS the fingerprintable base in this design (reference's mixin)
Fingerprintable = Pipe

__version__ = "0.1.0"

__all__ = [
    "Pipe",
    "Condition",
    "Contains",
    "HasPrefix",
    "In",
    "Not",
    "Reduce",
    "Static",
    "Identity",
    "Lambda",
    "GetKey",
    "FilterKeys",
    "DropKeys",
    "AddPrefix",
    "ReplaceInKeys",
    "RenameKeys",
    "Apply",
    "ApplyToAll",
    "CopyBatch",
    "Partial",
    "Sequential",
    "Parallel",
    "Gate",
    "BlockSequential",
    "ParallelbyField",
    "PipeProcessError",
    # conditions (full family)
    "BatchCondition",
    "NonEmpty",
    "AnyRowMatches",
    "AllRowsMatch",
    "HasKeys",
    "HasKeyWithPrefix",
    "AllValuesOfType",
    # nesting / passages / collate
    "Flatten",
    "Nest",
    "ApplyAsFlatten",
    "Nested",
    "NestedLevel1",
    "Expand",
    "GeneratePassages",
    "CollateField",
    "Padding",
    "FirstEg",
    "decollate",
    # tokenize / predict / cache / pprint
    "RegexTokenizer",
    "HFTokenizer",
    "TokenizerPipe",
    "Predict",
    "PredictWithCache",
    "PredictWithoutCache",
    "CachedPipe",
    "CacheManager",
    "PrintBatch",
    "PrintContent",
    # search
    "Index",
    "auto_engine",
    "auto_index",
    # fingerprinting
    "get_fingerprint",
    "Fingerprintable",
]

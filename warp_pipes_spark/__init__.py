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
]

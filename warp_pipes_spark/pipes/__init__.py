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
from warp_pipes_spark.pipes.datasets import TakeSubset, concat_columns, concat_rows
from warp_pipes_spark.pipes.grouped import GroupedApply
from warp_pipes_spark.pipes.pprint import PrintBatch, PrintContent
from warp_pipes_spark.pipes.sampling import (
    DeterministicSample,
    EpochShuffle,
    StratifiedSample,
    WeightedMixture,
)
from warp_pipes_spark.pipes.temporal import AsOfJoin, RangeJoin, Resample
from warp_pipes_spark.pipes.sampling import GroupCap, SplitAssign
from warp_pipes_spark.pipes.validate import CheckConstraints, DataProfile, DriftCheck, KAnonymity

__all__ = [
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
    "PrintBatch",
    "PrintContent",
    "GroupedApply",
    "AsOfJoin",
    "RangeJoin",
    "Resample",
    "TakeSubset",
    "concat_rows",
    "concat_columns",
    "DeterministicSample",
    "StratifiedSample",
    "WeightedMixture",
    "EpochShuffle",
    "GroupCap",
    "SplitAssign",
    "DataProfile",
    "CheckConstraints",
    "DriftCheck",
    "KAnonymity",
]

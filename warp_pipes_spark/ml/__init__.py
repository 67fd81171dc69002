from warp_pipes_spark.ml.similarity import (
    BruteForceCosineTopK,
    CosinePairs,
    LshCosineTopK,
)

__all__ = ["BruteForceCosineTopK", "CosinePairs", "LshCosineTopK"]

"""Model inference with broadcast weights + fingerprint-cached vectors.

Spark-first rewrite of the reference's Predict/caching loop
(``warp_pipes/pipes/predict.py:258-293``, ``support/caching.py:112-201``):
the Lightning trainer + zarr TensorStore become a numpy MLP whose weights
ship to executors as ONE Spark broadcast variable (not per-task closure
capture — the weights serialize once per executor, the pattern a real
torch/transformers model uses), an Arrow-batched inference UDF, and an
atomic Parquet vector cache keyed by ``hash(model_fp, input_fp,
output_col)``. The second call never touches the model: the vectors table
joins back by ``row_id`` (the reference's ``store[idx]`` lookups).
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipes_spark.pipes.cache import CacheManager
from warp_pipes_spark.pipes.predict import Predict

SF_DIR = "/root/testdata/sf0.001"


def build_model(spark: SparkSession, dim: int = 64, hidden: int = 32, out: int = 8):
    """A 2-layer MLP with deterministic weights. Returns (model_fn,
    model_fingerprint, calls_accumulator). The weights ride a BROADCAST
    variable: the closure captures only the handle, so tasks ship bytes
    once per executor no matter how many partitions run."""
    rng = np.random.RandomState(0)
    W1 = rng.randn(dim, hidden) / np.sqrt(dim)
    W2 = rng.randn(hidden, out) / np.sqrt(hidden)
    weights = spark.sparkContext.broadcast((W1, W2))
    calls = spark.sparkContext.accumulator(0)

    def mlp(batch: np.ndarray) -> np.ndarray:
        calls.add(len(batch))
        w1, w2 = weights.value
        X = np.stack([np.asarray(v, dtype=np.float64) for v in batch])
        return np.maximum(X @ w1, 0.0) @ w2

    # model identity = content hash of the weights, the stable equivalent
    # of the reference's module fingerprint
    fp = hashlib.md5(W1.tobytes() + W2.tobytes()).hexdigest()
    return mlp, fp, calls


def run(spark: SparkSession, cache_dir: str | None = None) -> DataFrame:
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(F.col("vec_id").alias("row_id"), "embedding")
    )
    mlp, model_fp, calls = build_model(spark)
    manager = CacheManager(
        cache_dir or os.path.join(tempfile.mkdtemp(), "predict_cache")
    )
    predict = Predict(
        mlp,
        manager,
        model_fingerprint=model_fp,
        input_col="embedding",
        output_col="mlp_vector",
        id_col="row_id",
    )

    first = predict(emb)
    n = first.count()  # miss: runs inference, publishes the vectors table
    ran_first = calls.value
    assert ran_first >= n, "model must have scored every row on the miss"

    second = predict(emb)
    m = second.count()  # hit: pure Parquet join, model never invoked
    assert m == n
    assert calls.value == ran_first, (
        f"cache hit re-ran the model ({calls.value} != {ran_first})"
    )
    return second


if __name__ == "__main__":
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="predict-with-model", shuffle_partitions=8)
    out = run(spark)
    out.select("row_id", F.col("mlp_vector")[0].alias("v0")).show(5)

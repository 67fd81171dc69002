"""Cache-manager + Predict tests (mirrors reference cache correctness:
cached vectors == direct outputs; idempotent re-runs hit the cache)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.core.fingerprint import (
    combine_fingerprints,
    fingerprint_path,
    fingerprint_struct,
)
from warp_pipes_spark.pipes.basics import Apply
from warp_pipes_spark.pipes.cache import CachedPipe, CacheManager
from warp_pipes_spark.pipes.predict import Predict, PredictWithoutCache


def fake_model(texts):
    """Deterministic fake embedding model (hash -> 4-dim vector)."""
    out = []
    for t in texts:
        h = abs(hash(str(t))) % 1000
        out.append([float(h), float(h % 7), float(h % 13), 1.0])
    return np.array(out)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(20)], "row_id long, text string"
    )


def test_fingerprint_deterministic():
    a = fingerprint_struct({"x": 1, "y": [1, 2, {"z": "s"}]})
    b = fingerprint_struct({"y": [1, 2, {"z": "s"}], "x": 1})
    assert a == b
    assert a != fingerprint_struct({"x": 2})
    assert combine_fingerprints(a, b) == combine_fingerprints(a, b)


def test_fingerprint_path_changes_with_content(tmp_path):
    p = tmp_path / "data.txt"
    p.write_text("hello")
    fp1 = fingerprint_path(str(p))
    import os, time

    time.sleep(0.01)
    p.write_text("hello world")
    os.utime(p, (1e9, 2e9))
    assert fingerprint_path(str(p)) != fp1


def test_fingerprint_dataframe_lambda_counter_invariant(spark, tmp_path):
    """PySpark numbers higher-order-function lambda variables with a
    session-GLOBAL counter (``lambda x_1`` in a fresh session, ``x_417``
    after other queries ran). The plan canonicalization must scrub it, or
    every fingerprint over a transform/filter/aggregate-lambda plan misses
    its own cross-session cache and silently rebuilds (regression:
    BM25F/SimHash index caches rewrote per bench run)."""
    from warp_pipes_spark.core.fingerprint import fingerprint_dataframe

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, ["a", "bb"])], "id long, xs array<string>").write.parquet(p)

    def mk():
        df = spark.read.parquet(p)
        return df.select("id", F.transform("xs", lambda x: F.length(x)).alias("ls"))

    fp1 = fingerprint_dataframe(mk())
    # burn a few lambda-counter slots in unrelated plans
    for _ in range(3):
        spark.range(1).select(F.transform(F.array(F.lit("z")), lambda x: x)).collect()
    fp2 = fingerprint_dataframe(mk())
    assert fp1 == fp2
    # different lambda BODY must still change the fingerprint
    df = spark.read.parquet(p)
    other = df.select("id", F.transform("xs", lambda x: F.upper(x)).alias("ls"))
    assert fingerprint_dataframe(other) != fp1


def test_cached_pipe_idempotent(spark, docs, tmp_path):
    mgr = CacheManager(str(tmp_path / "cache"))
    pipe = Apply({"n": F.length("text")})
    cached = CachedPipe(pipe, mgr, input_fingerprint="docs-v1")
    out1 = sorted(tuple(r) for r in cached(docs).collect())
    fp = combine_fingerprints("docs-v1", pipe.fingerprint)
    assert mgr.exists(fp)
    # second run must serve from cache (drop a marker to prove no recompute)
    out2 = sorted(tuple(r) for r in cached(docs).collect())
    assert out1 == out2


def test_predict_cache_equals_direct(spark, docs, tmp_path):
    mgr = CacheManager(str(tmp_path / "cache"))
    direct = PredictWithoutCache(fake_model)(docs)
    cached = Predict(fake_model, mgr, model_fingerprint="fake-v1", input_fingerprint="docs-v1")
    out1 = cached(docs)
    d = {r["row_id"]: r["vector"] for r in direct.collect()}
    c = {r["row_id"]: r["vector"] for r in out1.collect()}
    assert d == c
    # cache hit on re-run returns identical vectors
    out2 = cached(docs)
    c2 = {r["row_id"]: r["vector"] for r in out2.collect()}
    assert c2 == c
    fp = cached.cache_fingerprint(docs)
    assert mgr.exists(fp)


def test_cache_vacuum_removes_only_old_entries(spark, docs, tmp_path):
    import json as _json
    import os as _os
    import time as _time

    mgr = CacheManager(str(tmp_path / "c"))
    mgr.store(docs, "fresh")
    mgr.store(docs, "stale")
    # age the 'stale' entry's metadata
    meta = _os.path.join(mgr.path_for("stale"), "_wps_meta.json")
    with open(meta) as f:
        m = _json.load(f)
    m["written_at"] = _time.time() - 3600
    with open(meta, "w") as f:
        _json.dump(m, f)
    # orphaned staging dir from a crashed writer
    _os.makedirs(_os.path.join(str(tmp_path / "c"), "x.staging-dead"))
    _os.utime(
        _os.path.join(str(tmp_path / "c"), "x.staging-dead"),
        (_time.time() - 3600, _time.time() - 3600),
    )

    deleted = mgr.vacuum(max_age_seconds=600)
    assert sorted(deleted) == ["stale", "x.staging-dead"]
    assert mgr.exists("fresh") and not mgr.exists("stale")
    assert len(mgr.load(spark, "fresh").collect()) == docs.count()

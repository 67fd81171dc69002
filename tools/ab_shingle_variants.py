"""Micro-A/B of the shingle-explode shapes feeding portable_minhash_sig.
Dev-only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from warp_pipes_spark.session import get_spark  # noqa: E402
from warp_pipes_spark.text.analysis import tokens_expr  # noqa: E402

spark = get_spark(app_name="ab-shingle")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
docs.write.format("noop").mode("overwrite").save()  # warm

N = 3


def sh_of(toks):
    n_sh = F.greatest(F.size(toks) - F.lit(N - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n_sh)
    return F.when(n_sh > 0, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, N), " "))
    )).otherwise(F.array().cast("array<string>"))


def v_inline(df):
    return df.select("doc_id", F.explode(sh_of(tokens_expr(F.col("text")))).alias("s"))


def v_bind(df):
    from warp_pipes_spark.core.exprs import bind_expr
    return df.select(
        "doc_id", F.explode(bind_expr(tokens_expr(F.col("text")), sh_of)).alias("s")
    )


def v_proj(df):
    return df.select(
        "doc_id", tokens_expr(F.col("text")).alias("__t")
    ).select("doc_id", F.explode(sh_of(F.col("__t"))).alias("s"))


for name, fn in [("inline", v_inline), ("bind", v_bind), ("proj", v_proj)] * 2:
    t0 = time.perf_counter()
    fn(docs).write.format("noop").mode("overwrite").save()
    print(f"{name}: {time.perf_counter() - t0:.3f}s", flush=True)

# value check: proj vs inline must match exactly
a = v_inline(docs)
b = v_proj(docs)
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print("proj-vs-inline diff rows:", diff)

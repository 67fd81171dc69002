"""Deterministic N-x scale-up of a testdata sf dir (default: sf0.1 -> "sf1").

The driver ships sf0.001/0.01/0.1 only; the 100-TB-design claims deserve at
least one order-of-magnitude soak, so this tool fabricates sf1 from sf0.1:
``copies`` shifted replicas with per-copy deterministic transformations that
preserve schemas, referential integrity and value distributions while
breaking the exact self-similarity a naive UNION would create:

- dims (region, nation) copy as-is; every fact copy shifts its OWN keys by
  ``copy * KEYSPACE`` so intra-copy joins (orders->customer,
  lineitem->part/supplier/orders, events sessions) stay valid;
- documents rotate their word sequence by ``copy`` positions (token
  frequencies, lengths and shingle statistics survive; exact-dup rate stays
  at the base corpus' natural level instead of inflating 10x);
- embeddings rotate vector components by ``copy`` positions (norms and
  pairwise-similarity DISTRIBUTIONS survive, vectors differ);
- timestamps shift by ``copy`` seconds so event-time windows keep their
  density without colliding.

Usage: python tools/gen_scale.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
KEYSPACE = 10_000_000  # far above any base key


def scaled(spark, name: str, copies: int):
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        return df
    parts = []
    for c in range(copies):
        off = c * KEYSPACE
        cur = df
        shift_cols = {
            "customer": ["c_custkey"],
            "supplier": ["s_suppkey"],
            "part": ["p_partkey"],
            "orders": ["o_orderkey", "o_custkey"],
            "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
            "events": ["event_id", "user_id"],
            "documents": ["doc_id"],
            "embeddings": ["vec_id"],
        }[name]
        for col in shift_cols:
            cur = cur.withColumn(col, F.col(col) + F.lit(off))
        if name == "documents" and c > 0:
            # rotate words by c: same tokens, different sequence/shingles
            words = F.split(F.col("text"), " ")
            n = F.size(words)
            k = F.lit(c) % F.greatest(n, F.lit(1))
            rotated = F.concat(
                F.slice(words, k + 1, n), F.slice(words, 1, k)
            )
            cur = cur.withColumn("text", F.array_join(rotated, " "))
        if name == "embeddings" and c > 0:
            v = F.col("embedding")
            n = F.size(v)
            k = F.lit(c) % F.greatest(n, F.lit(1))
            cur = cur.withColumn(
                "embedding", F.concat(F.slice(v, k + 1, n), F.slice(v, 1, k))
            )
        if name in ("orders", "lineitem", "events") and c > 0:
            ts_col = {"orders": "o_orderdate", "lineitem": "l_shipdate", "events": "ts"}[name]
            cur = cur.withColumn(
                ts_col, F.col(ts_col) + F.expr(f"INTERVAL {c} SECOND")
            )
        parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="gen-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        scaled(spark, name, copies).coalesce(max(1, copies // 2)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"wrote {name}")
    print(out_dir)


if __name__ == "__main__":
    main()

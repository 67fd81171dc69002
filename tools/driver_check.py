"""Local replica of the round driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 next to its
``oracle_sql()`` DuckDB oracle and reports rows/schema/value-hash matches,
approximating CORRECTNESS_r{N}.json before the real driver runs.

The value-hash proxy: sort columns by name, stringify every cell with
``repr`` (Decimal keeps trailing zeros, floats use shortest-repr — the
exact canonicalization split that made round 1's DECIMAL outputs fail),
sort rows, sha256. A query passes only if both engines hash identically.

Usage: python tools/driver_check.py [q32_bm25 ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    h = hashlib.sha256()
    for r in out:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import importlib

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    from warp_pipes_spark.session import get_spark

    spark = get_spark(shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    only = set(sys.argv[1:])
    results, n_green = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {e}"}
            print(f"{name:28s} SPARK-ERR {e}")
            continue
        if name not in oracles:
            results[name] = {"err": "no_oracle", "spark_rows": len(srows)}
            print(f"{name:28s} no_oracle rows={len(srows)}")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            print(f"{name:28s} ORACLE-ERR {e}")
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = (
            rows_match
            and schema_match
            and canon_rows(scols, [tuple(r) for r in srows]) == canon_rows(ocols, orows)
        )
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
        }
        n_green += hash_match
        flag = "ok " if hash_match else "FAIL"
        print(f"{name:28s} {flag} rows={len(srows)}/{len(orows)} "
              f"schema={schema_match} {time.time()-t0:.1f}s")
    print(f"\ngreen: {n_green} / {sum(1 for n in results if n in oracles)} oracled "
          f"({len(results)} total)")
    with open("/tmp/driver_check.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

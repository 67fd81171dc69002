"""sf1 parity for the operators whose NAIVE oracle is quadratic in the
full input — q229/q231 (cross-join oracles over 20k queries x 500k docs
= 10G pairs) and q230 (all-pairs levenshtein over 150k names = 11G
pairs). DuckDB cannot replay those within a session, so these cells fix
the QUERY BATCH (and for q230 the id range) to a subset that keeps the
oracle tractable while the Spark side still runs against sf1-scale
inputs where the semantics allow (the q229/q231 CORPUS stays the full
500k docs — only the query batch shrinks, which is exactly the
production fixed-batch shape). Results merge into PARITY_sf1.json with
an explicit ``note`` so the artifact never passes subsets off as full
sweeps.

Usage: python tools/parity_subset_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cells():
    from pyspark.sql import functions as F

    from warp_pipes_spark.queries import T
    from warp_pipes_spark.search.fuzzy import (
        EditDistanceJoin,
        edit_distance_join_sql,
    )
    from warp_pipes_spark.search.phrase import PhraseSearch, phrase_search_sql
    from warp_pipes_spark.search.fuzzy import (
        EntityResolution,
        entity_resolution_sql,
    )
    from warp_pipes_spark.search.trigram import (
        TrigramSimilaritySearch,
        TrigramSubstringSearch,
        WildcardLikeSearch,
        trigram_search_sql,
        trigram_similarity_sql,
        wildcard_search_sql,
    )
    from warp_pipes_spark.text.analysis import tokens_expr, tokens_sql

    def _trgm_queries(spark, sf):
        docs = T(spark, sf, "documents")
        return docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length("text") >= 90)
            & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 50, 40).alias("pattern"),
        )

    TRGM_CTE = (
        "SELECT doc_id AS query_id, substring(text, 50, 40) AS pattern "
        "FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 90 "
        "AND doc_id < 5000"
    )

    def sim_make(spark, sf):
        return TrigramSimilaritySearch(
            corpus=T(spark, sf, "documents"), tau=0.25
        )(_trgm_queries(spark, sf))

    def fuzzy_make(spark, sf):
        base = (
            T(spark, sf, "part")
            .filter(F.col("p_partkey") < 20000)
            .select(
                F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
            )
        )
        typos = base.filter(F.col("id") % 3 == 0).select(
            (F.col("id") + F.lit(10000000)).alias("id"),
            F.concat(
                F.substring("s", 1, 4),
                F.lit("x"),
                F.expr("substring(s, 6)"),
            ).alias("s"),
        )
        return EditDistanceJoin(d=1)(base.unionAll(typos))

    def phrase_make(spark, sf):
        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(tokens_expr(F.col("text")), 1, 3), " "
            ).alias("phrase"),
        )
        return PhraseSearch(corpus=docs)(qs)

    def substr_make(spark, sf):
        return TrigramSubstringSearch(corpus=T(spark, sf, "documents"))(
            _trgm_queries(spark, sf)
        )

    def wild_make(spark, sf):
        docs = T(spark, sf, "documents")
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length("text") >= 90)
            & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.concat(
                F.substring("text", 45, 10),
                F.lit("%"),
                F.substring("text", 65, 10),
            ).alias("pattern"),
        )
        return WildcardLikeSearch(corpus=docs)(qs)

    WILD_CTE = (
        "SELECT doc_id AS query_id, substring(text, 45, 10) || '%' ||"
        " substring(text, 65, 10) AS pattern "
        "FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 90 "
        "AND doc_id < 5000"
    )

    def er_make(spark, sf):
        base = (
            T(spark, sf, "part")
            .filter(F.col("p_partkey") < 20000)
            .select(
                F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
            )
        )
        typos = base.filter(F.col("id") % 3 == 0).select(
            (F.col("id") + F.lit(10000000)).alias("id"),
            F.concat(
                F.substring("s", 1, 4),
                F.lit("x"),
                F.expr("substring(s, 6)"),
            ).alias("s"),
        )
        return EntityResolution(d=1, iters=4)(base.unionAll(typos))

    def bool_make(spark, sf):
        from warp_pipes_spark.search.boolean import BooleanSearch

        docs = T(spark, sf, "documents")
        toks = tokens_expr(F.col("text"))
        qs = docs.filter(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 5000)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.slice(toks, 1, 2).alias("must"),
            F.slice(toks, 8, 1).alias("must_not"),
        )
        return BooleanSearch(corpus=docs)(qs)

    def append_make(spark, sf):
        docs = T(spark, sf, "documents")
        base = docs.filter(F.col("doc_id") % 10 != 0)
        delta = docs.filter(F.col("doc_id") % 10 == 0)
        return TrigramSubstringSearch(corpus=base).append(delta)(
            _trgm_queries(spark, sf)
        )

    from warp_pipes_spark.search.boolean import boolean_search_sql

    return [
        (
            "q238_boolean_search",
            "fixed query batch (doc_id < 5000, 200 queries) vs FULL sf1"
            " corpus — naive list_has_all scan oracle is quadratic",
            bool_make,
            boolean_search_sql(
                "documents",
                (
                    f"SELECT doc_id AS query_id,"
                    f" list_slice({tokens_sql('text')}, 1, 2) AS must,"
                    f" list_slice({tokens_sql('text')}, 8, 8) AS must_not"
                    " FROM documents WHERE doc_id % 25 = 0"
                    " AND doc_id < 5000"
                ),
            ),
        ),
        (
            "q235_trigram_append",
            "fixed query batch (doc_id < 5000) vs FULL sf1 corpus, 90/10"
            " base/delta split — naive contains() oracle is quadratic",
            append_make,
            trigram_search_sql("documents", TRGM_CTE),
        ),
        (
            "q228_trigram_search",
            "fixed query batch (doc_id < 5000, 200 patterns) vs FULL sf1"
            " corpus — naive contains() oracle is quadratic (10G pairs)",
            substr_make,
            trigram_search_sql("documents", TRGM_CTE),
        ),
        (
            "q233_wildcard_search",
            "fixed query batch (doc_id < 5000, 200 patterns) vs FULL sf1"
            " corpus — naive LIKE oracle is quadratic (10G pairs)",
            wild_make,
            wildcard_search_sql("documents", WILD_CTE),
        ),
        (
            "q234_entity_resolution",
            "p_partkey < 20000 subset (sf0.1-sized, 26.7k strings) —"
            " naive all-pairs levenshtein oracle is quadratic"
            " (35G pairs at full sf1)",
            er_make,
            entity_resolution_sql(
                "SELECT p_partkey AS id, p_name AS s FROM part"
                " WHERE p_partkey < 20000 "
                "UNION ALL "
                "SELECT p_partkey + 10000000,"
                " substring(p_name, 1, 4) || 'x' || substring(p_name, 6) "
                "FROM part WHERE p_partkey % 3 = 0"
                " AND p_partkey < 20000",
                d=1,
                iters=4,
            ),
        ),
        (
            "q229_trigram_similarity",
            "fixed query batch (doc_id < 5000, 200 queries) vs FULL sf1"
            " corpus — naive cross-join oracle is quadratic",
            sim_make,
            trigram_similarity_sql("documents", TRGM_CTE, tau=0.25),
        ),
        (
            "q230_fuzzy_join",
            "p_partkey < 20000 subset (sf0.1-sized, 26.7k strings) —"
            " naive all-pairs levenshtein oracle is quadratic"
            " (35G pairs at full sf1)",
            fuzzy_make,
            edit_distance_join_sql(
                "SELECT p_partkey AS id, p_name AS s FROM part"
                " WHERE p_partkey < 20000 "
                "UNION ALL "
                "SELECT p_partkey + 10000000,"
                " substring(p_name, 1, 4) || 'x' || substring(p_name, 6) "
                "FROM part WHERE p_partkey % 3 = 0"
                " AND p_partkey < 20000",
                d=1,
            ),
        ),
        (
            "q231_phrase_search",
            "fixed query batch (doc_id < 5000, 200 phrases) vs FULL sf1"
            " corpus — naive padded-contains oracle is quadratic",
            phrase_make,
            phrase_search_sql(
                "documents",
                "SELECT doc_id AS query_id, array_to_string("
                f"list_slice({tokens_sql('text')}, 1, 3), ' ') AS phrase "
                "FROM documents WHERE doc_id % 25 = 0 AND doc_id < 5000",
            ),
        ),
    ]


def main() -> None:
    import duckdb

    from warp_pipes_spark.session import get_spark

    spark = get_spark(app_name="parity-subset-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PARITY_sf1.json")

    cells = _cells()
    if len(sys.argv) > 2:  # comma-separated cell subset
        only = set(sys.argv[2].split(","))
        cells = [c for c in cells if c[0] in only]
    # phase 1: spark
    srows, results = {}, {}
    for name, note, make, _sql in cells:
        t0 = time.perf_counter()
        sdf = make(spark, SF_DIR)
        cols = sorted(sdf.columns)
        srows[name] = (
            cols,
            sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect()),
        )
        results[name] = {
            "rows": len(srows[name][1]),
            "spark_sec": round(time.perf_counter() - t0, 2),
            "note": note,
        }
        print(f"SPARK {name} done", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    # phase 2: duckdb
    for name, _note, _make, sql in cells:
        t0 = time.perf_counter()
        con = duckdb.connect()
        con.execute("SET memory_limit='60GB'")
        con.execute("SET threads=16")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            p = f"{SF_DIR}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        cur = con.execute(sql)
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        orows = sorted(
            tuple(str(row[i]) for i in idx) for row in cur.fetchall()
        )
        con.close()
        cols, sr = srows[name]
        ok = sr == orows and sorted(ocols) == cols
        results[name]["status"] = "pass" if ok else "FAIL"
        results[name]["oracle_sec"] = round(time.perf_counter() - t0, 2)
        print(f"PARITY {name} {results[name]['status']}", flush=True)
        # write-through per cell
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f).get("queries", {})
        merged.update(
            {k: v for k, v in results.items() if "status" in v}
        )
        out = {
            "sf_dir": SF_DIR,
            "n_pass": sum(
                1 for v in merged.values() if v.get("status") == "pass"
            ),
            "n_total": len(
                [n for n in merged if merged[n].get("status") != "skipped"]
            ),
            "queries": merged,
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    main()

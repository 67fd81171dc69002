"""Bounded-edit-distance self-join via deletion neighborhoods (FastSS).

The naive "find all string pairs within Levenshtein distance d" is an
all-pairs O(n^2) cross join — at 100 TB string-identity scale (customer
names, product codes, URLs) that's the canonical never-do. The
sub-quadratic fix used here is the deletion-neighborhood join (Bocek et
al. 2007 FastSS; the same family as SymSpell, which
:class:`EditDistanceLookup` already uses for the dictionary case):

* NECESSITY: if ed(a, b) <= d, an optimal alignment matches all but
  <= d characters of a (its deletions + substitutions) and all but
  <= d characters of b (its insertions + substitutions); deleting the
  unmatched characters from each side yields the SAME string. Hence
  Del<=d(a) ∩ Del<=d(b) is non-empty, where Del<=d(s) = every string
  obtainable by deleting at most d characters from s.
* CANDIDATE JOIN: explode each row into its deletion variants, key
  them by ``xxhash64(variant)`` (8-byte shuffle keys instead of
  strings; hash collisions only ADD candidates and the verify is
  exact), self-join on the key, and run ONE exact ``levenshtein``
  verify over the bounded pair set — identical to the naive join.

Why not q-gram prefix filtering (ED-Join, round-8 first cut): its
fan-out is df-bounded, and on palette-style corpora (TPC-H part names:
five words from a ~90-word vocabulary) the whole corpus shares ~126
distinct trigrams, so even the rarest-gram prefixes produced 42M
candidate pairs out of a 356M all-pairs space at sf0.1 — an 8x prune
where the deletion join needs no df statistics and its per-key fan-out
is the number of GENUINE near-matches of that variant (measured sf0.1:
~121k candidate pairs, 346x fewer, for a ~34x key expansion per row at
d = 1). The deletion-key cardinality is (n choose <= d) per string of
length n — linear in corpus size for fixed d, the index-size-for-
join-speed trade every deletion-based engine makes.

NOTE the plain 2-arg ``levenshtein`` is used deliberately: Spark's
3-arg bounded variant measured SLOWER than the full computation on
this workload shape.

The DuckDB oracle is the NAIVE self join (``levenshtein(a, b) <= d``),
so the differential proves the pruned path is pair-identical.

Reference anchor: search/dedup-family extension — the edit-distance
sibling of the MinHash band join (``text/dedup.py``) and the trigram
substring index (``search/trigram.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.search.trigram import grams_expr


def deletion_neighborhood_expr(col, d: int):
    """Array of DISTINCT strings obtainable by deleting AT MOST ``d``
    characters from ``col`` (the string itself included). Pure codegen
    array expressions; guarded so the empty string yields just itself
    (``sequence(1, 0)`` steps DOWNWARD — the trigram.py trap)."""

    def _one_deletion_round(arr):
        # every variant of the incoming set, minus one character each —
        # plus the incoming set itself ("at most" semantics)
        return F.array_distinct(
            F.flatten(
                F.transform(
                    arr,
                    lambda s: F.concat(
                        F.when(
                            F.length(s) > 0,
                            F.transform(
                                F.sequence(F.lit(1), F.length(s)),
                                lambda i: F.concat(
                                    s.substr(F.lit(1), i - F.lit(1)),
                                    s.substr(i + F.lit(1), F.length(s)),
                                ),
                            ),
                        ).otherwise(F.array().cast("array<string>")),
                        F.array(s),
                    ),
                )
            )
        )

    arr = F.array(col)
    for _ in range(d):
        arr = _one_deletion_round(arr)
    return arr


class EditDistanceJoin(Pipe):
    """Self-join: input df = (``id_col``, ``string_col``); output =
    (id_a, id_b, dist) for every UNORDERED pair (id_a < id_b) of rows
    whose strings are within Levenshtein distance ``d``, identical to
    the naive cross join (deletion-neighborhood candidates + exact
    verify — see the module docstring)."""

    def __init__(
        self,
        d: int = 1,
        id_col: str = "id",
        string_col: str = "s",
        **kwargs,
    ):
        if d < 1:
            raise ValueError(f"need d >= 1, got {d}")
        super().__init__(**kwargs)
        self.d = d
        self.id_col = id_col
        self.string_col = string_col

    def value_pairs(
        self, vals: DataFrame, vid_col: str = "vid", string_col: str = "s"
    ) -> DataFrame:
        """(vid, string) over DISTINCT strings -> (id_a, id_b) value-id
        pairs whose strings are within distance ``d`` — the dedupe-first
        core of ``_transform`` WITHOUT the row-expansion machinery.
        Value-granularity callers (:class:`EntityResolution`) consume
        pair ids only, so the row persist/repartition, the two broadcast
        expansion joins and the distance-0 ``within`` branch (provably
        empty over distinct strings) would be pure plan noise — skipping
        them halved q234's job count. Pair orientation follows the
        string order (``s < s_b``), not the numeric id order ``_transform``
        emits; closure callers union both directions so the edge set is
        identical."""
        keys = (
            vals.select(
                F.col(vid_col).alias("__vid"),
                F.col(string_col).alias("__s"),
            )
            .select(
                "__vid",
                "__s",
                F.explode(
                    deletion_neighborhood_expr(F.col("__s"), self.d)
                ).alias("__v"),
            )
            .select("__vid", "__s", F.xxhash64("__v").alias("__k"))
        )
        cand = (
            keys.join(
                keys.select(
                    F.col("__vid").alias("__vid_b"),
                    F.col("__s").alias("__s_b"),
                    "__k",
                ),
                "__k",
            )
            .filter(F.col("__s") < F.col("__s_b"))
            .select("__vid", "__s", "__vid_b", "__s_b")
            .distinct()
        )
        return (
            cand.withColumn(
                "__dist", F.levenshtein(F.col("__s"), F.col("__s_b"))
            )
            .filter(F.col("__dist") <= F.lit(self.d))
            .select(
                F.col("__vid").alias("id_a"), F.col("__vid_b").alias("id_b")
            )
        )

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark import StorageLevel

        # DEDUPE-FIRST: edit distance depends only on the string VALUES,
        # so the expensive near-match search runs over DISTINCT strings
        # and the row-level answer is a multiplicity expansion. Identity
        # columns are heavily duplicated in practice (sf0.1 part names:
        # 26,667 rows but 128 distinct strings, hot value x347) — on the
        # raw rows every exact-duplicate group of size c hits the same
        # deletion keys c times, which ground the first cuts (42M q-gram
        # candidates / a 38M-row key join, 63-125 s); on distinct
        # strings the same join is value-pair-bounded and the output
        # pairs (6.3M here — the true answer) materialize through two
        # broadcast expansion joins, never a corpus-squared shuffle.
        n_part = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        rows_ = (
            df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.string_col).alias("s"),
            )
            # spread the expansion joins' stream side over the executors
            # (a bare 2-file scan otherwise caps the output stage at the
            # scan's parallelism); feeds value-dedupe + 3 member scans
            .repartition(n_part)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        ds = rows_.select("s").distinct()
        # each distinct string explodes into its <= d-deletion variants
        # hashed to 8-byte keys (FastSS; hash collisions only add
        # candidates — the verify is exact), and the variant-key
        # self-join finds every distinct VALUE pair within distance d
        keys = ds.select(
            "s",
            F.explode(
                deletion_neighborhood_expr(F.col("s"), self.d)
            ).alias("__v"),
        ).select("s", F.xxhash64("__v").alias("__k"))
        pairs = (
            keys.join(
                keys.select(F.col("s").alias("s_b"), "__k"), "__k"
            )
            .filter(F.col("s") < F.col("s_b"))
            .select("s", "s_b")
            .distinct()
            .withColumn("dist", F.levenshtein(F.col("s"), F.col("s_b")))
            .filter(F.col("dist") <= F.lit(self.d))
        )
        # expansion: every member of value u x every member of value v
        # (dist is value-determined); both joins broadcast value-pair /
        # member tables, so the output rows stream map-side
        cross = (
            rows_.join(F.broadcast(pairs), "s")
            .join(
                rows_.select(
                    F.col("s").alias("s_b"), F.col("id").alias("id_r")
                ),
                "s_b",
            )
            .select(
                F.least("id", "id_r").alias("id_a"),
                F.greatest("id", "id_r").alias("id_b"),
                F.col("dist").cast("int").alias("dist"),
            )
        )
        # exact-duplicate rows are distance-0 pairs the naive join also
        # emits: all within-group combinations under the id_a < id_b
        # convention
        within = (
            rows_.join(
                rows_.select(
                    F.col("s").alias("s"), F.col("id").alias("id_r")
                ),
                "s",
            )
            .filter(F.col("id") < F.col("id_r"))
            .select(
                F.col("id").alias("id_a"),
                F.col("id_r").alias("id_b"),
                F.lit(0).cast("int").alias("dist"),
            )
        )
        return cross.unionByName(within)


def edit_distance_join_sql(
    rows_sql: str,
    d: int = 1,
    id_col: str = "id",
    string_col: str = "s",
) -> str:
    """DuckDB oracle for :class:`EditDistanceJoin` — the NAIVE all-pairs
    self join the pruned path must exactly reproduce."""
    return f"""
WITH r AS ({rows_sql})
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(levenshtein(a.{string_col}, b.{string_col}) AS INTEGER) AS dist
FROM r a JOIN r b ON a.{id_col} < b.{id_col}
WHERE levenshtein(a.{string_col}, b.{string_col}) <= {d}
"""


class EntityResolution(Pipe):
    """End-to-end entity resolution: input df = (``id_col``,
    ``string_col``) records; output = (id, entity, n_members) where
    ``entity`` is the canonical (min) id of the record's duplicate
    cluster under "within Levenshtein distance ``d``" matching and
    ``n_members`` the cluster size — the classic dedup-identities
    pipeline (typo'd names, re-keyed products) as ONE composed
    operator: :class:`EditDistanceJoin` supplies the sub-quadratic
    match-pair generation (dedupe-first deletion neighborhoods — never
    the naive all-pairs levenshtein), ``ml/graph.py``
    ``hash_min_components`` supplies the transitive closure (min-id
    label within ``iters`` hops; real duplicate clusters have tiny
    diameters, and the oracle unrolls the SAME iteration count so the
    contract is exact either way), and unmatched records stay
    singleton entities of themselves.

    Scale shape: pair generation and the closure both run at
    DISTINCT-VALUE granularity (the closure's node ids are per-value
    min row ids — hop-for-hop identical to the row-level closure, see
    ``_transform``), and the final labeling is one value join + one
    entity-partitioned window count — nothing corpus-quadratic
    anywhere.

    Reference anchor: dedup-family extension (SURVEY.md §2 dedup tier;
    the reference's duplicate-cluster surface is
    ``warp_pipes``' index+dedup composition)."""

    def __init__(
        self,
        d: int = 1,
        iters: int = 4,
        id_col: str = "id",
        string_col: str = "s",
        **kwargs,
    ):
        if iters < 1:
            raise ValueError(f"need iters >= 1, got {iters}")
        super().__init__(**kwargs)
        self.d = d
        self.iters = iters
        self.id_col = id_col
        self.string_col = string_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        from warp_pipes_spark.ml.graph import hash_min_components

        # VALUE-GRAPH closure (round-8 optimization): edit distance is a
        # function of string VALUES, and every within-distance value
        # pair induces a COMPLETE bipartite row subgraph (each member of
        # u is a direct match of each member of v), while exact-
        # duplicate rows form a clique of distance-0 edges. So the row
        # graph's k-hop minimum equals, for every row of value u, the
        # k-hop minimum over the VALUE graph of seed(v) = min row id of
        # v — round for round, because any row of a value within k
        # value-hops is within k row-hops and vice versa. The closure
        # therefore runs on the distinct-value graph whose node ids ARE
        # the per-value min row ids (sf0.1 part names: 128 nodes instead
        # of 12.7M row edges), and stays bit-identical to the oracle's
        # row-level unrolled closure at every iteration count.
        vals = df.groupBy(F.col(self.string_col).alias("s")).agg(
            F.min(F.col(self.id_col)).alias("vid")
        )
        vpairs = EditDistanceJoin(d=self.d).value_pairs(
            vals, vid_col="vid", string_col="s"
        )
        edges = vpairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionAll(
            vpairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        comp = hash_min_components(edges, iters=self.iters)
        # entity(row) = component label of its value's representative;
        # values without any within-distance partner keep their own
        # representative (exact-duplicate groups collapse to min member
        # id — the same answer the row-level clique closure gives)
        ent = (
            df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.string_col).alias("s"),
            )
            .join(vals, "s")
            .join(comp, F.col("vid") == F.col("node"), "left")
            .select(
                "id",
                F.coalesce(F.col("component"), F.col("vid")).alias(
                    "entity"
                ),
            )
        )
        w = Window.partitionBy("entity")
        return ent.select(
            "id",
            "entity",
            F.count(F.lit(1)).over(w).alias("n_members"),
        )


def entity_resolution_sql(
    rows_sql: str,
    d: int = 1,
    iters: int = 4,
    id_col: str = "id",
    string_col: str = "s",
) -> str:
    """DuckDB oracle for :class:`EntityResolution` — NAIVE all-pairs
    levenshtein edges + the same unrolled hash-min closure."""
    from warp_pipes_spark.ml.graph import hash_min_parts_sql

    edges_cte = (
        f"r AS ({rows_sql}), "
        f"p AS (SELECT a.{id_col} AS id_a, b.{id_col} AS id_b "
        f"FROM r a JOIN r b ON a.{id_col} < b.{id_col} "
        f"WHERE levenshtein(a.{string_col}, b.{string_col}) <= {d}), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM p "
        "UNION ALL SELECT id_b, id_a FROM p)"
    )
    parts, prev = hash_min_parts_sql(edges_cte, iters)
    return (
        "WITH "
        + ", ".join(parts)
        + f", ent AS (SELECT r.{id_col} AS id,"
        f" COALESCE({prev}.label, r.{id_col}) AS entity"
        f" FROM r LEFT JOIN {prev} ON r.{id_col} = {prev}.node)"
        " SELECT id, entity,"
        " COUNT(*) OVER (PARTITION BY entity) AS n_members"
        " FROM ent ORDER BY id"
    )


class EditDistanceLookup(Pipe):
    """Bipartite bounded-edit-distance lookup against a vocabulary —
    the SymSpell / "did you mean" primitive (Norvig-style spell
    correction at index speed). Input df = (``query_id``, ``term_col``)
    possibly-misspelled terms; output = (query_id, term, suggestion,
    dist, freq), the single best vocabulary term within Levenshtein
    distance ``d`` per query (rank: dist asc, freq desc, suggestion
    asc); queries with no match within ``d`` drop out.

    Plan shape (the :class:`EditDistanceJoin` prefix filter, made
    bipartite): the VOCABULARY explodes once into a (gram, term, len,
    freq) posting; each query keeps only its q*d+1 RAREST grams under
    the vocabulary's (df, gram) order — a term within distance d
    destroys at most q*d of the query's distinct grams, so ANY q*d+1
    of them contain at least one shared gram and the rare-gram
    equi-join is exhaustive (grams absent from the vocabulary carry
    df = 0 harmlessly: the guaranteed shared gram is by definition a
    vocabulary gram). Queries with <= q*d distinct grams broadcast
    into one |len diff| <= d vocabulary scan instead. One exact
    levenshtein verify over the bounded candidate set, then a
    per-query top-1 window. The vocabulary (term, freq) table is the
    natural corpus-fingerprint artifact to cache at 100 TB — this
    operator takes it as an input DataFrame so any cached token count
    (BM25 postings stats, q195's TF table) can serve.

    Reference anchor: search-family extension (the reference's ES
    `suggest` surface next to match/match_phrase; `support/
    elasticsearch.py` es_search bodies)."""

    Q = 3

    def __init__(
        self,
        vocab: DataFrame,
        d: int = 1,
        term_col: str = "term",
        query_id: str = "query_id",
        vocab_term: str = "term",
        vocab_freq: str = "freq",
        **kwargs,
    ):
        if d < 1:
            raise ValueError(f"need d >= 1, got {d}")
        super().__init__(**kwargs)
        self.vocab = vocab
        self.d = d
        self.term_col = term_col
        self.query_id = query_id
        self.vocab_term = vocab_term
        self.vocab_freq = vocab_freq

    _no_fingerprint = ("vocab",)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark.sql import Window

        qd = self.Q * self.d
        v = self.vocab.select(
            F.col(self.vocab_term).alias("suggestion"),
            F.col(self.vocab_freq).cast("long").alias("freq"),
            F.length(self.vocab_term).alias("vlen"),
            grams_expr(F.col(self.vocab_term)).alias("__vg"),
        )
        posting = v.select(
            "suggestion", "freq", "vlen", F.explode("__vg").alias("gram")
        )
        # vocabulary-side gram document frequencies drive the rarest-
        # first prefix order (one map-side-combined, vocab-sized pass)
        df_tbl = posting.groupBy("gram").agg(
            F.count(F.lit(1)).alias("__df")
        )
        q = df.select(
            F.col(self.query_id).alias("query_id"),
            F.col(self.term_col).alias("term"),
            F.length(self.term_col).alias("qlen"),
            grams_expr(F.col(self.term_col)).alias("__qg"),
        ).withColumn("ng", F.size("__qg"))
        qlong = q.filter(F.col("ng") > qd)
        qshort = q.filter(F.col("ng") <= qd)
        qg = qlong.select(
            "query_id", "term", "qlen", F.explode("__qg").alias("gram")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("__df"), F.asc("gram")
        )
        pfx = (
            qg.join(df_tbl, "gram", "left")
            .na.fill({"__df": 0})
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= qd + 1)
            .select("query_id", "term", "qlen", "gram")
            # the length filter folds into the join key (the
            # EditDistanceJoin banding): each prefix row replicates
            # across its 2d+1 admissible vocabulary lengths
            .withColumn(
                "vlen",
                F.explode(
                    F.sequence(
                        F.col("qlen") - F.lit(self.d),
                        F.col("qlen") + F.lit(self.d),
                    )
                ),
            )
        )
        cand = (
            posting.join(F.broadcast(pfx), ["gram", "vlen"])
            .select("query_id", "term", "suggestion", "freq")
            .distinct()
        )
        short_cand = F.broadcast(
            qshort.select("query_id", "term", "qlen")
        ).join(
            v.select("suggestion", "freq", "vlen"),
            F.abs(F.col("qlen") - F.col("vlen")) <= F.lit(self.d),
        ).select("query_id", "term", "suggestion", "freq")
        verified = (
            cand.unionByName(short_cand)
            .withColumn(
                "dist",
                F.levenshtein(F.col("term"), F.col("suggestion")).cast(
                    "int"
                ),
            )
            .filter(F.col("dist") <= F.lit(self.d))
        )
        rk = Window.partitionBy("query_id").orderBy(
            F.asc("dist"), F.desc("freq"), F.asc("suggestion")
        )
        return (
            verified.withColumn("__rk", F.row_number().over(rk))
            .filter(F.col("__rk") == 1)
            .select("query_id", "term", "suggestion", "dist", "freq")
        )


def edit_distance_lookup_sql(
    vocab_sql: str,
    queries_sql: str,
    d: int = 1,
) -> str:
    """DuckDB oracle for :class:`EditDistanceLookup` — the NAIVE
    query x vocabulary cross join with the same top-1 ranking.
    ``vocab_sql`` must yield (term, freq); ``queries_sql``
    (query_id, term)."""
    return f"""
WITH v AS ({vocab_sql}),
q AS ({queries_sql}),
pairs AS (
  SELECT q.query_id, q.term, v.term AS suggestion,
         CAST(levenshtein(q.term, v.term) AS INTEGER) AS dist,
         CAST(v.freq AS BIGINT) AS freq
  FROM q CROSS JOIN v
  WHERE levenshtein(q.term, v.term) <= {d}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id
    ORDER BY dist ASC, freq DESC, suggestion ASC) AS rk
  FROM pairs
)
SELECT query_id, term, suggestion, dist, freq FROM ranked WHERE rk = 1
"""

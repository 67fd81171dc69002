"""Bounded-edit-distance self-join via q-gram prefix filtering (ED-Join).

The naive "find all string pairs within Levenshtein distance d" is an
all-pairs O(n^2) cross join — at 100 TB string-identity scale (customer
names, product codes, URLs) that's the canonical never-do. The classic
sub-quadratic fix (Gravano et al. 2001 approximate string joins;
Xiao, Wang & Lin 2008 ED-Join; the same prefix-filtering family as
PPJoin) exploits two facts about character q-grams (q = 3 here):

* COUNT BOUND: one edit changes at most q gram positions, so at most q
  DISTINCT gram values can disappear from a string's gram set —
  ed(a, b) <= d implies |G(a) ∩ G(b)| >= max(|G(a)|, |G(b)|) - q*d.
* PREFIX FILTER: order all grams by one global total order (document
  frequency ascending, gram ascending — rarest first); if two SETS
  overlap by at least alpha, their (|G| - alpha + 1)-prefixes under
  that order must intersect. With alpha = |G| - q*d the prefix length
  is q*d + 1, so a pair within distance d MUST share a gram among each
  side's q*d + 1 RAREST grams.

Candidate generation therefore joins only the rare-gram prefixes
(df-bounded fan-out — the hot grams every row shares never enter the
join), applies the free length filter |len(a) - len(b)| <= d, and one
exact ``levenshtein`` verify over the bounded pair set gives results
identical to the naive join. Strings with <= q*d distinct grams carry
no prefix signal (ALL their grams can be destroyed by d edits — e.g.
"aaaa" -> "aaba" shares zero grams at d = 1); they form a SHORT bucket
that broadcast-cross-joins against everything — correct for the
short/repetitive tail, and bounded because such strings are rare in
identity-like columns.

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


class EditDistanceJoin(Pipe):
    """Self-join: input df = (``id_col``, ``string_col``); output =
    (id_a, id_b, dist) for every UNORDERED pair (id_a < id_b) of rows
    whose strings are within Levenshtein distance ``d``, identical to
    the naive cross join. ``q`` is fixed at 3 (shared trigram
    machinery)."""

    Q = 3

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

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from pyspark import StorageLevel

        prefix_len = self.Q * self.d + 1
        base = (
            df.select(
                F.col(self.id_col).alias("id"),
                F.col(self.string_col).alias("s"),
                F.length(self.string_col).alias("len"),
                grams_expr(F.col(self.string_col)).alias("__g"),
            )
            .withColumn("ng", F.size("__g"))
            # base feeds the short bucket, the prefix join AND the
            # gram-df pass — persist so the source scans + gram arrays
            # materialize once (bench/soak clear storage between queries)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # short/repetitive strings (<= q*d distinct grams) carry no
        # prefix signal — bucket them for a broadcast verify vs all
        short = base.filter(F.col("ng") <= self.Q * self.d).select(
            F.col("id").alias("id_a"),
            F.col("s").alias("s_a"),
            F.col("len").alias("len_a"),
        )
        long_ = base.filter(F.col("ng") > self.Q * self.d)
        g = long_.select("id", F.explode("__g").alias("gram"))
        # global gram order: document frequency asc, gram asc (rarest
        # first) — one map-side-combined pass over the exploded grams
        df_tbl = g.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(F.asc("__df"), F.asc("gram"))
        pfx = (
            g.join(df_tbl, "gram")
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= prefix_len)
            .select("id", "gram")
        )
        # candidate generation carries ONLY (id, len, gram) — the hot
        # prefix grams fan out to millions of rows, and dragging the
        # strings through that shuffle + the pair distinct doubled the
        # operator's cost (measured sf0.1: 30.5 s -> ~12 s); strings
        # re-enter via two id-equi-joins only for the bounded verify set
        sides = pfx.join(long_.select("id", "len"), "id")
        # the |len_a - len_b| <= d filter FOLDS INTO THE JOIN KEY: the
        # a-side replicates each prefix row across its 2d+1 admissible
        # partner lengths, so the equi-join key is (gram, len) and the
        # per-key fan-out is df(gram, len) x df(gram, len') instead of
        # df(gram)^2 — on length-spread corpora that divides the
        # candidate join by ~spread/(2d+1) for a (2d+1)x row replication
        # (measured sf1 part names: the post-join len filter shape
        # ground a single 1.4G-row candidate stage)
        a = sides.select(
            F.col("id").alias("id_a"), F.col("len").alias("len_a"), "gram"
        ).withColumn(
            "len_b",
            F.explode(
                F.sequence(
                    F.col("len_a") - F.lit(self.d),
                    F.col("len_a") + F.lit(self.d),
                )
            ),
        )
        b = sides.select(
            F.col("id").alias("id_b"), F.col("len").alias("len_b"), "gram"
        )
        strings = base.select("id", "s")
        cand = (
            a.join(b, ["gram", "len_b"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .join(
                strings.select(
                    F.col("id").alias("id_a"), F.col("s").alias("s_a")
                ),
                "id_a",
            )
            .join(
                strings.select(
                    F.col("id").alias("id_b"), F.col("s").alias("s_b")
                ),
                "id_b",
            )
            .select("id_a", "s_a", "id_b", "s_b")
        )
        # short bucket: verify against EVERYTHING (both orientations of
        # short-long pairs collapse under the id_a < id_b convention)
        allrows = base.select(
            F.col("id").alias("id_b"),
            F.col("s").alias("s_b"),
            F.col("len").alias("len_b"),
        )
        short_cand = (
            F.broadcast(short)
            .join(
                allrows,
                (F.col("id_a") != F.col("id_b"))
                & (
                    F.abs(F.col("len_a") - F.col("len_b"))
                    <= F.lit(self.d)
                ),
            )
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.when(F.col("id_a") < F.col("id_b"), F.col("s_a"))
                .otherwise(F.col("s_b"))
                .alias("s_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
                F.when(F.col("id_a") < F.col("id_b"), F.col("s_b"))
                .otherwise(F.col("s_a"))
                .alias("s_b"),
            )
            .distinct()
        )
        # disjoint by construction: cand is long-long only, short_cand
        # has a short side in every pair — union needs no second distinct
        verify = cand.unionByName(short_cand)
        return (
            verify.withColumn(
                "dist", F.levenshtein(F.col("s_a"), F.col("s_b"))
            )
            .filter(F.col("dist") <= F.lit(self.d))
            .select(
                "id_a",
                "id_b",
                F.col("dist").cast("int").alias("dist"),
            )
        )


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
    match-pair generation (q-gram prefix filtering — never the naive
    all-pairs levenshtein), ``ml/graph.py`` ``hash_min_components``
    supplies the transitive closure (min-id label within ``iters``
    hops; real duplicate clusters have tiny diameters, and the oracle
    unrolls the SAME iteration count so the contract is exact either
    way), and unmatched records stay singleton entities of themselves.

    Scale shape: pair generation is the bounded rare-gram join, the
    closure iterates over the PAIR-sized edge list (2 semi-joins per
    round), and the final labeling is one left join + one
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

        pairs = EditDistanceJoin(
            d=self.d, id_col=self.id_col, string_col=self.string_col
        )(df).select("id_a", "id_b")
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionAll(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        comp = hash_min_components(edges, iters=self.iters)
        ent = (
            df.select(F.col(self.id_col).alias("id"))
            .join(comp, F.col("id") == F.col("node"), "left")
            .select(
                "id",
                F.coalesce(F.col("component"), F.col("id")).alias(
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

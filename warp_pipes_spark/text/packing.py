"""Sequence packing: map documents to fixed-capacity training examples.

The standard pretraining data layout ("concat-and-chunk") concatenates all
documents of a shard in a deterministic order and cuts the token stream
every ``capacity`` tokens. This operator computes that layout as pure
relational algebra — for each document, the pack it starts in, its offset
inside that pack, and the pack it ends in (documents may straddle pack
boundaries; the writer slices accordingly):

    start       = sum of preceding documents' token counts   (running sum)
    start_pack  = floor(start / capacity)
    pack_offset = start mod capacity
    end_pack    = floor((start + n_tokens - 1) / capacity)

The running sum is a window ``PARTITION BY shard ORDER BY order_col`` —
fully parallel across shards; shard granularity bounds both parallelism
and skew (at 100 TB, shard = file/source/hash-bucket so each partition's
token stream fits one task; a global single-shard packing would serialize
and is deliberately not the default). Everything is codegen'd JVM
expressions — no Python, no explode, one shuffle (the window exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warp_pipes_spark.core.pipe import Pipe


class PackSequences(Pipe):
    """Assign each document its (start_pack, pack_offset, end_pack) under
    concat-and-chunk packing at ``capacity`` tokens per pack, shard-local.

    Requires a token-count column (``token_col``) — compose with
    ``TokenCount`` when starting from raw text. Documents with zero
    tokens occupy no positions: they get the current stream position with
    ``end_pack = start_pack`` and zero width."""

    def __init__(
        self,
        capacity: int,
        token_col: str = "n_tokens",
        shard_col: str = "source",
        order_col: str = "doc_id",
        **kwargs,
    ):
        if capacity <= 0:
            raise ValueError(f"capacity must be positive, got {capacity}")
        super().__init__(**kwargs)
        self.capacity = capacity
        self.token_col = token_col
        self.shard_col = shard_col
        self.order_col = order_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        cap = F.lit(self.capacity)
        n = F.col(self.token_col).cast("long")
        w = (
            Window.partitionBy(self.shard_col)
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        start = F.coalesce(F.sum(n).over(w), F.lit(0).cast("long"))
        return df.select(
            self.shard_col,
            self.order_col,
            n.alias("n_tokens"),
            (start / cap).cast("long").alias("start_pack"),
            (start % cap).cast("long").alias("pack_offset"),
            (
                F.when(n > 0, ((start + n - 1) / cap).cast("long"))
                .otherwise((start / cap).cast("long"))
            ).alias("end_pack"),
        )


def pack_sequences_sql(
    table_sql: str,
    capacity: int,
    token_expr: str = "n_tokens",
    shard: str = "source",
    order: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`PackSequences` — identical window algebra.
    ``table_sql`` must yield (shard, order, token) columns."""
    return f"""
WITH sized AS (
  SELECT {shard}, {order}, CAST({token_expr} AS BIGINT) AS n_tokens
  FROM ({table_sql}) t
), placed AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
      PARTITION BY {shard} ORDER BY {order}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM sized
)
SELECT {shard}, {order}, n_tokens,
       CAST(floor(start / {capacity}) AS BIGINT) AS start_pack,
       CAST(start % {capacity} AS BIGINT) AS pack_offset,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((start + n_tokens - 1) / {capacity}) AS BIGINT)
            ELSE CAST(floor(start / {capacity}) AS BIGINT) END AS end_pack
FROM placed
"""


class BestFitPack(Pipe):
    """NO-SPLIT sequence packing by best-fit-decreasing — the SFT/finetune
    counterpart of :class:`PackSequences`' concat-and-chunk: every example
    lands WHOLE in exactly one pack (an attention mask can then separate
    examples without cross-boundary leakage), and BFD keeps padding waste
    near the bin-packing optimum (≤ 11/9 OPT + 1 packs, Johnson's bound).

    Deterministic by construction: within a shard, documents place in
    (n_tokens DESC, id ASC) order; each takes the FULLEST bin that still
    fits (tie -> lowest bin index), else opens a new bin. A document
    longer than ``capacity`` gets a dedicated overflow pack (callers gate
    or truncate upstream if that's unwanted). The exact same loop replays
    in the SQL oracle as a recursive CTE carrying the bin-fill list as
    row state — the packing itself is differentially tested, not just its
    fill statistics.

    Scale shape: packing is SHARD-LOCAL (``shard_col``), the standard
    distributed bin-packing relaxation — each shard's docs sort and pack
    inside one ``applyInPandas`` group, so parallelism = shards and no
    global sequential pass exists. When shards are few or huge (20
    sources over 100 TB would mean 20 groups holding 5 TB each),
    ``sub_shards=K`` salts each shard into K deterministic md5 sub-shards
    — parallelism becomes shards x K, per-group memory drops by K, and
    the padding-waste bound degrades only by the per-group boundary
    effect (BFD's guarantee holds within every group). Output: ``(shard,
    id, n_tokens, pack_id, pack_offset)`` with pack ids local to the
    (sub-)shard; sub-shard s owns the pack-id range [s * 2^32, ...) so
    ids stay unique per ``shard_col`` value."""

    def __init__(
        self,
        capacity: int,
        token_col: str = "n_tokens",
        shard_col: str = "source",
        id_col: str = "doc_id",
        sub_shards: int = 1,
        **kwargs,
    ):
        if capacity <= 0:
            raise ValueError(f"capacity must be positive, got {capacity}")
        if sub_shards < 1:
            raise ValueError(f"sub_shards must be >= 1, got {sub_shards}")
        super().__init__(**kwargs)
        self.capacity = capacity
        self.token_col = token_col
        self.shard_col = shard_col
        self.id_col = id_col
        self.sub_shards = sub_shards

    @staticmethod
    def bfd(sizes, capacity: int):
        """The BFD loop over (size, id)-sorted items. Returns a list of
        (pack_id, offset) aligned with the input order. Shared verbatim
        between the Spark kernel and tests."""
        fills = []
        placed = []
        for n in sizes:
            best, best_fill = -1, -1
            for i, f in enumerate(fills):
                if f + n <= capacity and f > best_fill:
                    best, best_fill = i, f
            if best < 0:
                placed.append((len(fills), 0))
                fills.append(n)
            else:
                placed.append((best, fills[best]))
                fills[best] += n
        return placed

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        import pandas as pd

        cap = self.capacity
        K = self.sub_shards
        sub = (
            F.conv(F.substring(F.md5(F.col(self.id_col).cast("string")), 1, 8), 16, 10)
            .cast("long") % K
            if K > 1
            else F.lit(0)
        )
        sized = df.select(
            F.col(self.shard_col).alias("shard"),
            sub.cast("int").alias("sub"),
            F.col(self.id_col).alias("id"),
            F.col(self.token_col).cast("long").alias("n_tokens"),
        )
        bfd = BestFitPack.bfd

        def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(
                ["n_tokens", "id"], ascending=[False, True]
            ).reset_index(drop=True)
            placed = bfd(pdf["n_tokens"].tolist(), cap)
            base = int(pdf["sub"].iloc[0]) << 32 if len(pdf) else 0
            pdf["pack_id"] = [base + p for p, _ in placed]
            pdf["pack_offset"] = [o for _, o in placed]
            return pdf

        # output schema mirrors the INPUT types for the configurable
        # shard/id columns (string ids and integer shards are both legal);
        # only the columns this operator invents are fixed
        shard_t = df.schema[self.shard_col].dataType.simpleString()
        id_t = df.schema[self.id_col].dataType.simpleString()
        return (
            sized.groupBy("shard", "sub")
            .applyInPandas(
                pack_group,
                schema=(
                    f"shard {shard_t}, sub int, id {id_t}, n_tokens long, "
                    "pack_id long, pack_offset long"
                ),
            )
            .drop("sub")
        )


def best_fit_pack_sql(
    table_sql: str,
    capacity: int,
    token_expr: str = "n_tokens",
    shard: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`BestFitPack`: the identical BFD loop as a
    recursive CTE whose per-shard state is the bin-fill list. The chosen
    bin is the first list position holding the max eligible fill — which
    is exactly BFD's fullest-bin-lowest-index rule, because every bin at
    the max eligible fill is eligible by construction."""
    cap = capacity
    return f"""
WITH RECURSIVE sized AS (
  SELECT {shard} AS shard, {id_col} AS id, CAST({token_expr} AS BIGINT) AS n
  FROM ({table_sql}) t
),
ordered AS (
  SELECT shard, id, n,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY n DESC, id ASC) AS rn
  FROM sized
),
shards AS (SELECT DISTINCT shard FROM ordered),
pack(shard, rn, fills, id, n, pack_id, pack_offset) AS (
  SELECT shard, 0, []::BIGINT[], NULL::BIGINT, NULL::BIGINT,
         NULL::BIGINT, NULL::BIGINT
  FROM shards
  UNION ALL
  SELECT o.shard, o.rn,
         CASE WHEN best.f IS NULL THEN list_append(p.fills, o.n)
              ELSE list_transform(p.fills, (x, i) ->
                     CASE WHEN i = list_position(p.fills, best.f)
                          THEN x + o.n ELSE x END)
         END,
         o.id, o.n,
         CASE WHEN best.f IS NULL THEN CAST(len(p.fills) AS BIGINT)
              ELSE CAST(list_position(p.fills, best.f) - 1 AS BIGINT)
         END,
         COALESCE(best.f, 0)
  FROM pack p
  JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
  LEFT JOIN LATERAL (
    SELECT list_max(list_filter(p.fills, x -> x + o.n <= {cap})) AS f
  ) best ON TRUE
)
SELECT shard, id, n AS n_tokens, pack_id, pack_offset
FROM pack WHERE rn >= 1
"""


class LengthBucketBatches(Pipe):
    """Deterministic length-bucketed inference micro-batching.

    Batched model inference (the ``Predict`` stack) pads every sequence in
    a batch to the batch max; random batch composition wastes most of the
    compute on pad tokens. The standard fix sorts sequences by length so
    each fixed-size batch holds near-equal lengths. This operator computes
    that assignment as one window pass, shard-local (same parallelism/skew
    contract as :class:`PackSequences`):

        rank     = row_number() over (shard, ORDER BY n_tokens DESC, id)
        batch_id = floor((rank - 1) / batch_size)
        pad_cost = batch max length - own length   (0 for the longest row)

    Summing ``pad_cost`` per batch (or corpus-wide) yields the exact pad
    waste; against random batching the saving is typically 30-60% of
    inference FLOPs on natural length distributions. Everything is
    codegen'd JVM expressions — the only exchange is the window shuffle
    on the shard key."""

    def __init__(
        self,
        batch_size: int,
        token_col: str = "n_tokens",
        shard_col: str = "source",
        order_col: str = "doc_id",
        **kwargs,
    ):
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        super().__init__(**kwargs)
        self.batch_size = batch_size
        self.token_col = token_col
        self.shard_col = shard_col
        self.order_col = order_col

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        n = F.col(self.token_col).cast("long")
        w = Window.partitionBy(self.shard_col).orderBy(
            F.desc(self.token_col), F.asc(self.order_col)
        )
        ranked = df.select(
            self.shard_col,
            self.order_col,
            n.alias("n_tokens"),
            F.row_number().over(w).alias("__rk"),
        ).withColumn(
            "batch_id", ((F.col("__rk") - 1) / F.lit(self.batch_size)).cast("long")
        )
        wb = Window.partitionBy(self.shard_col, "batch_id")
        return ranked.select(
            self.shard_col,
            self.order_col,
            "n_tokens",
            "batch_id",
            (F.max("n_tokens").over(wb) - F.col("n_tokens"))
            .cast("long")
            .alias("pad_cost"),
        )


def length_bucket_sql(
    table_sql: str,
    batch_size: int,
    token_expr: str = "n_tokens",
    shard: str = "source",
    order: str = "doc_id",
) -> str:
    """DuckDB oracle for :class:`LengthBucketBatches` — identical window
    algebra (row_number is deterministic under the (len DESC, id) key)."""
    return f"""
WITH sized AS (
  SELECT {shard}, {order}, CAST({token_expr} AS BIGINT) AS n_tokens
  FROM ({table_sql}) t
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {shard} ORDER BY n_tokens DESC, {order}) AS rk
  FROM sized
), batched AS (
  SELECT {shard}, {order}, n_tokens,
         CAST(floor((rk - 1) / {batch_size}) AS BIGINT) AS batch_id
  FROM ranked
)
SELECT {shard}, {order}, n_tokens, batch_id,
       CAST(MAX(n_tokens) OVER (PARTITION BY {shard}, batch_id) - n_tokens
            AS BIGINT) AS pad_cost
FROM batched
"""


class SpanCorruption(Pipe):
    """T5-style span corruption (Raffel et al. 2020 §3.1.4), deterministic:
    hash-gated span starts (rate ``start_rate`` per token position) open
    masked spans of hash-derived length 1..``max_span``; overlapping spans
    merge; the i-th masked run becomes ``<extra_id_i>`` in the input and
    prefixes its tokens in the target — the denoising-objective example
    generator, as pure relational algebra.

    Every random choice is a pure function of (doc_id, position, seed)
    through md5, so examples are reproducible across engines, reruns and
    partitionings (and the whole generator is SQL-oracle-able). Plan
    shape: one explode to (doc, pos), one bounded explode of span starts
    to covered positions, gaps-and-islands numbering via windows, one
    per-doc re-assembly — shuffles keyed on doc_id only.

    Output per doc: ``input_text`` (uncovered tokens + sentinels),
    ``target_text`` (sentinel-prefixed masked spans), ``n_spans``,
    ``n_masked`` (count of masked token positions)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        start_rate: float = 0.08,
        max_span: int = 4,
        seed: int = 0,
        **kwargs,
    ):
        if not 0 < start_rate < 1:
            raise ValueError(f"start_rate must be in (0,1), got {start_rate}")
        if max_span < 1:
            raise ValueError(f"max_span must be >= 1, got {max_span}")
        super().__init__(**kwargs)
        self.text_col = text_col
        self.id_col = id_col
        self.start_rate = start_rate
        self.max_span = max_span
        self.seed = seed

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.pipes.sampling import _threshold_hex
        from warp_pipes_spark.text.analysis import tokens_expr

        toks = df.select(
            F.col(self.id_col).alias("doc_id"),
            tokens_expr(F.col(self.text_col)).alias("toks"),
        ).filter(F.size("toks") > 0)
        pos = toks.select(
            "doc_id",
            F.size("toks").alias("n"),
            F.posexplode("toks").alias("p", "tok"),
        )
        gate = F.substring(
            F.md5(F.concat_ws(":", "doc_id", "p", F.lit(f"s{self.seed}"))), 1, 12
        )
        span_len = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", "doc_id", "p", F.lit(f"l{self.seed}"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % self.max_span
            + 1
        )
        starts = pos.filter(gate < F.lit(_threshold_hex(self.start_rate))).select(
            "doc_id", "n", "p", span_len.alias("len")
        )
        covered = starts.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("p"), F.least(F.col("p") + F.col("len") - 1, F.col("n") - 1)
                )
            ).alias("p"),
        ).distinct()
        # gaps-and-islands: consecutive covered positions share (p - rn)
        wd = Window.partitionBy("doc_id").orderBy("p")
        islands = covered.withColumn(
            "island_key", F.col("p") - F.row_number().over(wd)
        )
        island_ids = (
            islands.groupBy("doc_id", "island_key")
            .agg(F.min("p").alias("start_p"))
            .withColumn("span_id", F.dense_rank().over(
                Window.partitionBy("doc_id").orderBy("start_p")
            ) - 1)
        )
        marked = (
            pos.join(islands.select("doc_id", "p", "island_key"), ["doc_id", "p"], "left")
            .join(island_ids.select("doc_id", "island_key", "start_p", "span_id"),
                  ["doc_id", "island_key"], "left")
        )
        sentinel = F.concat(F.lit("<extra_id_"), F.col("span_id").cast("string"), F.lit(">"))
        # input: uncovered tokens verbatim; each island contributes ONE
        # sentinel at its start position
        input_piece = F.when(F.col("island_key").isNull(), F.col("tok")).when(
            F.col("p") == F.col("start_p"), sentinel
        )
        # target: covered tokens, each island prefixed by its sentinel
        target_piece = F.when(
            F.col("island_key").isNotNull() & (F.col("p") == F.col("start_p")),
            F.concat(sentinel, F.lit(" "), F.col("tok")),
        ).when(F.col("island_key").isNotNull(), F.col("tok"))
        pieces = marked.select(
            "doc_id", "p",
            input_piece.alias("inp"),
            target_piece.alias("tgt"),
            F.col("island_key").isNotNull().cast("int").alias("is_masked"),
        )
        return (
            pieces.groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("inp").isNotNull(), F.struct("p", F.col("inp").alias("v")))
                            )
                        ),
                        lambda s: s["v"],
                    ),
                    " ",
                ).alias("input_text"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("tgt").isNotNull(), F.struct("p", F.col("tgt").alias("v")))
                            )
                        ),
                        lambda s: s["v"],
                    ),
                    " ",
                ).alias("target_text"),
                F.countDistinct(F.when(F.col("is_masked") == 1, F.col("p"))).alias("__nm"),
                F.countDistinct(
                    F.when(F.col("inp").rlike("^<extra_id_"), F.col("p"))
                ).cast("long").alias("n_spans"),
            )
            .withColumn("n_masked", F.col("__nm").cast("long"))
            .drop("__nm")
        )


def span_corruption_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    start_rate: float = 0.08,
    max_span: int = 4,
    seed: int = 0,
) -> str:
    """DuckDB oracle for :class:`SpanCorruption` — identical md5 gates,
    span lengths, island merging and sentinel assembly."""
    from warp_pipes_spark.pipes.sampling import _threshold_hex
    from warp_pipes_spark.text.analysis import tokens_sql

    toks = tokens_sql(text)
    thr = _threshold_hex(start_rate)
    return f"""
WITH docs AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}
),
pos AS (
  SELECT doc_id, len(toks) AS n, u.i - 1 AS p, toks[u.i] AS tok
  FROM docs, UNNEST(range(1, len(toks) + 1)) AS u(i)
  WHERE len(toks) > 0
),
starts AS (
  SELECT doc_id, n, p,
         CAST(('0x' || substring(md5(doc_id || ':' || p || ':l{seed}'), 1, 4))::BIGINT
              AS INTEGER) % {max_span} + 1 AS span_len
  FROM pos
  WHERE substring(md5(doc_id || ':' || p || ':s{seed}'), 1, 12) < '{thr}'
),
covered AS (
  SELECT DISTINCT doc_id, u.cp AS p
  FROM starts, UNNEST(range(p, least(p + span_len - 1, n - 1) + 1)) AS u(cp)
),
islands AS (
  SELECT doc_id, p,
         p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS island_key
  FROM covered
),
island_ids AS (
  SELECT doc_id, island_key, MIN(p) AS start_p,
         DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY MIN(p)) - 1 AS span_id
  FROM islands GROUP BY doc_id, island_key
),
marked AS (
  SELECT pos.doc_id, pos.p, pos.tok, i.island_key, ii.start_p, ii.span_id
  FROM pos
  LEFT JOIN islands i ON i.doc_id = pos.doc_id AND i.p = pos.p
  LEFT JOIN island_ids ii ON ii.doc_id = pos.doc_id AND ii.island_key = i.island_key
),
pieces AS (
  SELECT doc_id, p,
         CASE WHEN island_key IS NULL THEN tok
              WHEN p = start_p THEN '<extra_id_' || span_id || '>'
         END AS inp,
         CASE WHEN island_key IS NOT NULL AND p = start_p
                THEN '<extra_id_' || span_id || '> ' || tok
              WHEN island_key IS NOT NULL THEN tok
         END AS tgt,
         CASE WHEN island_key IS NOT NULL THEN 1 ELSE 0 END AS is_masked
  FROM marked
)
SELECT doc_id,
       COALESCE(array_to_string(list(inp ORDER BY p) FILTER (inp IS NOT NULL), ' '), '') AS input_text,
       COALESCE(array_to_string(list(tgt ORDER BY p) FILTER (tgt IS NOT NULL), ' '), '') AS target_text,
       CAST(COUNT(DISTINCT CASE WHEN inp LIKE '<extra_id_%' THEN p END) AS BIGINT) AS n_spans,
       CAST(SUM(is_masked) AS BIGINT) AS n_masked
FROM pieces
GROUP BY doc_id
ORDER BY doc_id
"""


class ChatTemplate(Pipe):
    """SFT example construction: render a (prompt, response) pair through a
    chat template and emit the token ids WITH the loss mask — 0 over every
    prompt/control token, 1 over the response tokens (+ EOS) — the exact
    array a supervised-fine-tuning collator feeds the trainer.

    The mask is constructed by SEGMENT, not by re-aligning a joint
    tokenization: the masked segment (user marker + prompt + assistant
    marker) and the learned segment (response + EOS) tokenize
    independently (the engine's regex tokenizer — JVM expressions,
    scan-speed) and concatenate with their known mask values, so the
    boundary is exact by construction. Ids are xxhash64 of the token text;
    the role markers are ordinary template tokens, masked 0 like the rest
    of the prompt.

    Emits: ``sft_text`` (rendered), ``input_ids`` (array<long>),
    ``loss_mask`` (array<int>), ``n_prompt_tokens``, ``n_response_tokens``.
    Everything is a pure column expression — no UDF, no shuffle."""

    def __init__(
        self,
        prompt_col: str = "prompt",
        response_col: str = "response",
        user_marker: str = "<|user|>",
        assistant_marker: str = "<|assistant|>",
        eos: str = "<|eos|>",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.prompt_col = prompt_col
        self.response_col = response_col
        self.user_marker = user_marker
        self.assistant_marker = assistant_marker
        self.eos = eos

    def _columns(self, df: DataFrame, **kwargs):
        from warp_pipes_spark.text.analysis import tokens_expr

        p, r = F.col(self.prompt_col), F.col(self.response_col)
        rendered = F.concat(
            F.lit(self.user_marker), F.lit(" "), p,
            F.lit(" "), F.lit(self.assistant_marker), F.lit(" "), r,
            F.lit(" "), F.lit(self.eos),
        )
        # masked segment = marker + prompt + marker; learned segment =
        # response + eos. Tokenized independently -> exact mask boundary.
        masked_txt = F.concat(
            F.lit(self.user_marker), F.lit(" "), p, F.lit(" "),
            F.lit(self.assistant_marker),
        )
        learned_txt = F.concat(r, F.lit(" "), F.lit(self.eos))
        masked_toks = tokens_expr(masked_txt)
        learned_toks = tokens_expr(learned_txt)
        ids = F.concat(
            F.transform(masked_toks, lambda t: F.xxhash64(t)),
            F.transform(learned_toks, lambda t: F.xxhash64(t)),
        )
        mask = F.concat(
            F.transform(masked_toks, lambda t: F.lit(0)),
            F.transform(learned_toks, lambda t: F.lit(1)),
        )
        return {
            "sft_text": rendered,
            "input_ids": ids,
            "loss_mask": mask,
            "n_prompt_tokens": F.size(masked_toks).cast("int"),
            "n_response_tokens": F.size(learned_toks).cast("int"),
        }


def chat_template_sql(
    prompt: str,
    response: str,
    user_marker: str = "<|user|>",
    assistant_marker: str = "<|assistant|>",
    eos: str = "<|eos|>",
) -> dict:
    """DuckDB expressions for the ChatTemplate outputs that are
    SQL-portable (token COUNTS and the mask structure; the xxhash64 ids
    are engine-internal — compare counts/mask, as q149 does)."""
    from warp_pipes_spark.text.analysis import tokens_sql

    masked = f"('{user_marker}' || ' ' || {prompt} || ' ' || '{assistant_marker}')"
    learned = f"({response} || ' ' || '{eos}')"
    n_masked = f"CAST(len({tokens_sql(masked)}) AS INTEGER)"
    n_learned = f"CAST(len({tokens_sql(learned)}) AS INTEGER)"
    return {
        "n_prompt_tokens": n_masked,
        "n_response_tokens": n_learned,
        "loss_mask": (
            f"list_concat(list_transform({tokens_sql(masked)}, x -> 0), "
            f"list_transform({tokens_sql(learned)}, x -> 1))"
        ),
    }


class WordPieceChatTemplate(Pipe):
    """SFT example construction with REAL vocabulary ids: the composition
    of :class:`ChatTemplate`'s segment-wise loss masking with the
    self-contained WordPiece encoder, so ``input_ids`` are indices into a
    trained (or fixed) WordPiece vocabulary — the array a trainer's
    embedding table actually consumes — instead of hash placeholders.
    (Reference analogue: the tokenizer → collate chain,
    ``warp_pipes/pipes/collate.py:137-178`` feeding HF-tokenized ids.)

    Construction, per row:

    - the prompt and the response tokenize INDEPENDENTLY through
      :class:`~warp_pipes_spark.pipes.tokenizer.WordPieceTokenizer`
      (greedy longest-prefix, ``##`` continuations, ``[UNK]`` fallback);
    - control tokens (``user_token`` / ``assistant_token`` /
      ``eos_token``) are reserved vocabulary entries injected by id —
      never re-derived from text, so the template can't be forged by
      document content;
    - ``input_ids = [user] + wp(prompt) + [assistant] + wp(response) +
      [eos]`` and ``loss_mask`` is 0 over the first three segments, 1
      over ``wp(response) + [eos]`` — exact by construction, no joint
      re-alignment.

    Control tokens are appended to the vocabulary (deterministic ids) if
    absent. Execution: two Arrow-batched ``mapInPandas`` passes (one per
    segment column) + pure column expressions — no shuffle, no driver
    participation, linear in corpus size."""

    def __init__(
        self,
        vocab,
        prompt_col: str = "prompt",
        response_col: str = "response",
        user_token: str = "<|user|>",
        assistant_token: str = "<|assistant|>",
        eos_token: str = "<|eos|>",
        **kwargs,
    ):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        # first-occurrence dedupe: a repeated piece would make piece->id
        # ambiguous (dict building is last-wins) and ids are the contract
        self.vocab = list(dict.fromkeys(vocab))
        for t in (user_token, assistant_token, eos_token):
            if t not in self.vocab:
                self.vocab.append(t)
        self.prompt_col = prompt_col
        self.response_col = response_col
        self.user_token = user_token
        self.assistant_token = assistant_token
        self.eos_token = eos_token

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.pipes.tokenizer import WordPieceTokenizer

        uid = self.vocab.index(self.user_token)
        aid = self.vocab.index(self.assistant_token)
        eid = self.vocab.index(self.eos_token)
        df = WordPieceTokenizer(
            self.vocab,
            text_col=self.prompt_col,
            prefix="_sft_p_",
            add_special_tokens=False,
        )(df)
        df = WordPieceTokenizer(
            self.vocab,
            text_col=self.response_col,
            prefix="_sft_r_",
            add_special_tokens=False,
        )(df)
        p_ids, r_ids = F.col("_sft_p_input_ids"), F.col("_sft_r_input_ids")
        masked_ids = F.concat(
            F.array(F.lit(uid).cast("long")), p_ids, F.array(F.lit(aid).cast("long"))
        )
        learned_ids = F.concat(r_ids, F.array(F.lit(eid).cast("long")))
        out = df.select(
            *[c for c in df.columns if not c.startswith("_sft_")],
            F.concat(masked_ids, learned_ids).alias("input_ids"),
            F.concat(
                F.array_repeat(F.lit(0), F.size(masked_ids)),
                F.array_repeat(F.lit(1), F.size(learned_ids)),
            ).alias("loss_mask"),
            F.size(masked_ids).cast("int").alias("n_prompt_tokens"),
            F.size(learned_ids).cast("int").alias("n_response_tokens"),
        )
        return out


class MultiTurnChatTemplate(Pipe):
    """Multi-turn SFT construction with real vocabulary ids — the
    generalization of :class:`WordPieceChatTemplate` from one
    (prompt, response) pair to a whole conversation: input is an
    ``array<struct<role, content>>`` column; each turn contributes its
    role's control token plus the WordPiece ids of its content, every
    ASSISTANT turn additionally closes with ``eos``, and ``loss_mask``
    is 1 exactly over assistant content + eos (role headers and
    user/system turns masked) — the multi-turn training convention,
    exact by construction because turns tokenize independently.

    Execution: one ``posexplode`` of the turns array, ONE Arrow-batched
    tokenize pass over all turns of all conversations, then a per-doc
    reassembly from sorted (turn_idx, ids, mask) structs — the q165
    sorted-struct idiom; no shuffle beyond the reassembly aggregation.
    Control tokens are reserved vocabulary entries injected by id.

    (Reference analogue: the tokenizer -> collate chain,
    ``warp_pipes/pipes/collate.py:137-178``; multi-turn assembly is an
    extension.)"""

    ROLE_TOKENS = {
        "system": "<|system|>",
        "user": "<|user|>",
        "assistant": "<|assistant|>",
    }

    def __init__(
        self,
        vocab,
        turns_col: str = "turns",
        id_col: str = "doc_id",
        eos_token: str = "<|eos|>",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.vocab = list(dict.fromkeys(vocab))
        for t in list(self.ROLE_TOKENS.values()) + [eos_token]:
            if t not in self.vocab:
                self.vocab.append(t)
        self.turns_col = turns_col
        self.id_col = id_col
        self.eos_token = eos_token

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.pipes.tokenizer import WordPieceTokenizer

        rid = {
            role: self.vocab.index(tok)
            for role, tok in self.ROLE_TOKENS.items()
        }
        eid = self.vocab.index(self.eos_token)
        key = self.id_col
        ex = df.select(
            key,
            F.posexplode(self.turns_col).alias("__ti", "__turn"),
        ).select(
            key,
            "__ti",
            F.col("__turn.role").alias("__role"),
            F.col("__turn.content").alias("__content"),
        )
        tok = WordPieceTokenizer(
            self.vocab,
            text_col="__content",
            prefix="_mt_",
            add_special_tokens=False,
        )(ex)
        role_id = None
        for role, i in sorted(rid.items()):
            cond = F.when(F.col("__role") == role, F.lit(i).cast("long"))
            role_id = cond if role_id is None else role_id.when(
                F.col("__role") == role, F.lit(i).cast("long")
            )
        role_id = role_id.otherwise(F.lit(rid["user"]).cast("long"))
        is_asst = F.col("__role") == "assistant"
        cids = F.col("_mt_input_ids")
        turn_ids = F.concat(
            F.array(role_id),
            cids,
            F.when(is_asst, F.array(F.lit(eid).cast("long"))).otherwise(
                F.array().cast("array<bigint>")
            ),
        )
        content_mask = F.when(
            is_asst, F.array_repeat(F.lit(1), F.size(cids))
        ).otherwise(F.array_repeat(F.lit(0), F.size(cids)))
        turn_mask = F.concat(
            F.array(F.lit(0)),
            content_mask,
            F.when(is_asst, F.array(F.lit(1))).otherwise(
                F.array().cast("array<int>")
            ),
        )
        per_turn = tok.select(
            key,
            F.struct(
                F.col("__ti").alias("ti"),
                turn_ids.alias("ids"),
                turn_mask.alias("mask"),
            ).alias("__t"),
        )
        g = per_turn.groupBy(key).agg(
            F.array_sort(F.collect_list("__t")).alias("__s")
        )
        out = g.select(
            key,
            F.flatten(F.transform(F.col("__s"), lambda x: x["ids"])).alias(
                "input_ids"
            ),
            F.flatten(F.transform(F.col("__s"), lambda x: x["mask"])).alias(
                "loss_mask"
            ),
            F.size(F.col("__s")).alias("n_turns"),
        )
        # LEFT join: a row with an empty/null turns array produces no
        # exploded rows, but the operator is a per-row transform — it
        # must come back as an empty conversation, not disappear
        return (
            df.drop(self.turns_col)
            .join(out, key, "left")
            .withColumn(
                "input_ids",
                F.coalesce("input_ids", F.array().cast("array<bigint>")),
            )
            .withColumn(
                "loss_mask",
                F.coalesce("loss_mask", F.array().cast("array<int>")),
            )
            .withColumn("n_turns", F.coalesce("n_turns", F.lit(0)))
        )

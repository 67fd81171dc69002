"""Change-data-capture application: MERGE upsert + SCD type-2 history.

The two lakehouse write-side primitives a 100 TB table-maintenance pipeline
needs and the batch catalog lacked:

- ``MergeUpsert`` — apply a change batch (insert / update / delete rows
  tagged with an op and a monotonically increasing change sequence) to a
  snapshot, producing the next snapshot. Spark-first shape: the snapshot
  and the batch UNION (snapshot rows carry sequence -1, i.e. "before every
  change"), then ONE groupBy on the key keeps the row with the highest
  sequence via a max-struct — no full-outer join, no window. Multiple
  changes to the same key in one batch collapse to the latest
  automatically, and a final filter drops keys whose latest op is a
  delete. One key-partitioned shuffle total, independent of history depth;
  write the snapshot bucketed on the key (``io.write_bucketed``) and the
  snapshot side of that shuffle disappears too.

- ``Scd2Apply`` — build a slowly-changing-dimension type-2 history from a
  change log: each (key, ts) change becomes a versioned validity interval
  ``[valid_from, valid_to)`` with ``is_current`` on the open-ended latest
  row. One window shuffle on the key; valid_to = lead(ts) needs no join.

Both are deterministic and fully SQL-expressible, so they ride the DuckDB
oracle gate (q117 / q118).

Reference: warp-pipes is batch-only and has no table-maintenance story;
this extends the engine the same way the streaming module does
(SURVEY.md §2.10 "Streaming — absent in the reference").
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warp_pipes_spark.core.pipe import Pipe


class MergeUpsert(Pipe):
    """Apply a CDC batch to a snapshot (the MERGE INTO shape).

    Input df = the change batch with columns: the key column(s), an
    ``op_col`` in {'I','U','D'} (insert/update treated identically:
    "latest image wins"), a ``seq_col`` ordering changes within the batch,
    and the full row payload. ``snapshot`` = the current table state with
    the same payload columns (no op/seq).

    Output = the next snapshot (payload columns only, plus the keys).
    """

    def __init__(
        self,
        snapshot: DataFrame,
        keys: List[str],
        op_col: str = "op",
        seq_col: str = "seq",
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.snapshot = snapshot
        self.keys = list(keys)
        self.op_col = op_col
        self.seq_col = seq_col

    _no_fingerprint = ("snapshot",)

    def _transform(self, batch: DataFrame, **kwargs) -> DataFrame:
        payload = [c for c in self.snapshot.columns if c not in self.keys]
        # snapshot rows sort before every change: seq -1, op 'U' (an
        # existing image is just "the latest known row so far")
        snap = self.snapshot.select(
            *self.keys,
            F.lit(-1).cast("long").alias(self.seq_col),
            F.lit("U").alias(self.op_col),
            *[F.col(c) for c in payload],
        )
        chg = batch.select(
            *self.keys,
            F.col(self.seq_col).cast("long").alias(self.seq_col),
            F.col(self.op_col),
            *[F.col(c) for c in payload],
        )
        # ONE shuffle: per key keep the max-seq image (max over a struct
        # ordered by seq first — associative, partial-aggregated map-side)
        latest = (
            snap.unionByName(chg)
            .groupBy(*self.keys)
            .agg(
                F.max(
                    F.struct(
                        F.col(self.seq_col).alias("__seq"),
                        F.col(self.op_col).alias("__op"),
                        *[F.col(c) for c in payload],
                    )
                ).alias("__latest")
            )
        )
        return latest.filter(F.col("__latest.__op") != "D").select(
            *self.keys,
            *[F.col(f"__latest.{c}").alias(c) for c in payload],
        )


def merge_upsert_sql(
    snapshot_sql: str,
    batch_sql: str,
    keys: List[str],
    payload: List[str],
    op: str = "op",
    seq: str = "seq",
) -> str:
    """DuckDB oracle for MergeUpsert: same union + arg-max formulation
    spelled portably (row_number over seq desc)."""
    key_list = ", ".join(keys)
    pay_list = ", ".join(payload)
    return f"""
        WITH unioned AS (
            SELECT {key_list}, -1 AS {seq}, 'U' AS {op}, {pay_list}
            FROM ({snapshot_sql})
            UNION ALL
            SELECT {key_list}, CAST({seq} AS BIGINT) AS {seq}, {op}, {pay_list}
            FROM ({batch_sql})
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {key_list} ORDER BY {seq} DESC
            ) AS __rk
            FROM unioned
        )
        SELECT {key_list}, {pay_list}
        FROM ranked WHERE __rk = 1 AND {op} <> 'D'
    """


class Scd2Apply(Pipe):
    """Change log -> SCD type-2 history (versioned validity intervals).

    Input df = the change log: key column(s), ``ts_col`` (effective
    timestamp), tracked attribute columns. Optional ``tie_cols`` break
    equal-timestamp ties deterministically (e.g. an event id).

    Output = one row per change with ``version`` (1-based per key in
    effective order), ``valid_from`` = the change ts, ``valid_to`` =
    the next change's ts (NULL while current), ``is_current``.
    """

    def __init__(
        self,
        keys: List[str],
        ts_col: str = "ts",
        tie_cols: Optional[List[str]] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tie_cols = list(tie_cols or [])

    def _transform(self, log: DataFrame, **kwargs) -> DataFrame:
        w = Window.partitionBy(*self.keys).orderBy(self.ts_col, *self.tie_cols)
        return (
            log.withColumn("version", F.row_number().over(w))
            .withColumn("valid_from", F.col(self.ts_col))
            .withColumn("valid_to", F.lead(self.ts_col).over(w))
            .withColumn(
                "is_current",
                F.when(F.col("valid_to").isNull(), F.lit(1)).otherwise(F.lit(0)),
            )
        )


def scd2_sql(
    log_sql: str,
    keys: List[str],
    ts: str = "ts",
    ties: Optional[List[str]] = None,
) -> str:
    """DuckDB oracle for Scd2Apply (identical window formulation)."""
    key_list = ", ".join(keys)
    order = ", ".join([ts] + list(ties or []))
    return f"""
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY {key_list} ORDER BY {order})
                   AS version,
               {ts} AS valid_from,
               LEAD({ts}) OVER (PARTITION BY {key_list} ORDER BY {order})
                   AS valid_to,
               CASE WHEN LEAD({ts}) OVER (
                   PARTITION BY {key_list} ORDER BY {order}
               ) IS NULL THEN 1 ELSE 0 END AS is_current
        FROM ({log_sql})
    """


def snapshot_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time (time-travel) read over an SCD2 history: the version
    of each key whose validity interval [valid_from, valid_to) covers
    ``ts`` — the lakehouse AS-OF-timestamp query, answered from the same
    versioned table that serves current-state reads (filter-only, no extra
    shuffle; with the history partitioned on is_current/valid_from the
    scan prunes to the covering slices).

    ``ts``: an ISO timestamp string, compared in the session timezone
    (pinned UTC)."""
    t = F.lit(ts).cast("timestamp_ntz")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )

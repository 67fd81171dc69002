"""Column-name predicates for routing and pruning.

Capability parity with the reference's ``Condition`` family
(``warp_pipes/core/condition.py:16-185``): predicates over *column names*
used by ``FilterKeys`` / ``Gate`` / ``ParallelbyField`` to select which
columns a pipe sees. In Spark these resolve driver-side against
``df.columns`` / ``df.schema`` at plan-build time — they never touch rows,
so they cost nothing at scale. Row-level predicates are ordinary
``pyspark.sql.Column`` expressions and are NOT modeled here.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence


class Condition:
    """Base predicate over a column name. Supports ``&``, ``|``, ``~``."""

    def __call__(self, key: str) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def __and__(self, other: "Condition") -> "Condition":
        return Reduce(self, other, reduce_op=all)

    def __or__(self, other: "Condition") -> "Condition":
        return Reduce(self, other, reduce_op=any)

    def __invert__(self) -> "Condition":
        return Not(self)

    def to_json_struct(self) -> dict:
        return {"__condition__": type(self).__name__, **self._params()}

    def _params(self) -> dict:
        return {}

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self._params().items())
        return f"{type(self).__name__}({params})"


def as_condition(cond) -> Condition:
    """Accept a Condition, a plain callable, or a list of allowed names."""
    if isinstance(cond, Condition):
        return cond
    if isinstance(cond, str):
        return In([cond])
    if callable(cond):
        return _CallableCondition(cond)
    if isinstance(cond, (list, tuple, set, frozenset)):
        return In(cond)
    raise TypeError(f"cannot interpret {cond!r} as a Condition")


class _CallableCondition(Condition):
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, key: str) -> bool:
        return bool(self.fn(key))

    def _params(self) -> dict:
        return {"fn": getattr(self.fn, "__qualname__", repr(self.fn))}


class Static(Condition):
    """Always returns a fixed boolean."""

    def __init__(self, value: bool):
        self.value = bool(value)

    def __call__(self, key: str) -> bool:
        return self.value

    def _params(self) -> dict:
        return {"value": self.value}


class Contains(Condition):
    """True if ``pattern`` is a substring of the column name."""

    def __init__(self, pattern: str):
        self.pattern = pattern

    def __call__(self, key: str) -> bool:
        return self.pattern in key

    def _params(self) -> dict:
        return {"pattern": self.pattern}


class In(Condition):
    """True if the column name is in an allowed list."""

    def __init__(self, allowed: Iterable[str]):
        self.allowed = list(allowed)
        self._set = frozenset(self.allowed)

    def __call__(self, key: str) -> bool:
        return key in self._set

    def _params(self) -> dict:
        return {"allowed": self.allowed}


class HasPrefix(Condition):
    """True if the column name starts with ``prefix`` (dotted-field router)."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def __call__(self, key: str) -> bool:
        return key.startswith(self.prefix)

    def _params(self) -> dict:
        return {"prefix": self.prefix}


class Not(Condition):
    def __init__(self, cond: Condition):
        self.cond = as_condition(cond)

    def __call__(self, key: str) -> bool:
        return not self.cond(key)

    def _params(self) -> dict:
        return {"cond": self.cond.to_json_struct()}


class Reduce(Condition):
    """Combine sub-conditions with ``all`` (and) / ``any`` (or)."""

    def __init__(self, *conditions, reduce_op=all):
        self.conditions = [as_condition(c) for c in conditions]
        self.reduce_op = reduce_op

    def __call__(self, key: str) -> bool:
        return self.reduce_op(c(key) for c in self.conditions)

    def _params(self) -> dict:
        return {
            "conditions": [c.to_json_struct() for c in self.conditions],
            "op": self.reduce_op.__name__,
        }


class HasKeys(Condition):
    """Schema-level predicate: the DataFrame has all the given columns.

    Unlike name predicates this is evaluated against a *list of columns*
    (pass ``df.columns`` as the key)."""

    def __init__(self, keys: Sequence[str]):
        self.keys = list(keys)

    def __call__(self, columns) -> bool:
        cols = set(columns) if not isinstance(columns, str) else {columns}
        return all(k in cols for k in self.keys)

    def _params(self) -> dict:
        return {"keys": self.keys}


class HasKeyWithPrefix(Condition):
    """Schema-level predicate: some column starts with ``prefix``."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def __call__(self, columns) -> bool:
        cols = [columns] if isinstance(columns, str) else list(columns)
        return any(c.startswith(self.prefix) for c in cols)

    def _params(self) -> dict:
        return {"prefix": self.prefix}


class AllValuesOfType(Condition):
    """Schema-level predicate (reference ``condition.py:173``): every listed
    column (or every column, if none listed) has the given Spark SQL type.
    Evaluate against a ``StructType`` (pass ``df.schema``) — the reference
    inspected batch values at runtime; here the static schema answers the
    same question at plan time."""

    def __init__(self, type_name: str, keys: Optional[Sequence[str]] = None):
        self.type_name = type_name
        self.keys = list(keys) if keys is not None else None

    def __call__(self, schema) -> bool:
        fields = {f.name: f.dataType.simpleString() for f in schema.fields}
        names = self.keys if self.keys is not None else list(fields)
        return all(fields.get(n) == self.type_name for n in names)

    def _params(self) -> dict:
        return {"type_name": self.type_name, "keys": self.keys}


class BatchCondition(Condition):
    """Row-VALUE predicate (reference ``condition.py:119-143``): unlike name
    predicates, evaluated against the DataFrame itself via a BOUNDED action
    (``limit(1)`` probe or a 1-row aggregate) when the plan is built. This is
    plan-time data inspection: the probe runs once, driver-side, and costs
    one short job — use for routing decisions, not per-row logic (which is an
    ordinary ``Column`` expression)."""

    def evaluate(self, df) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, df) -> bool:
        return self.evaluate(df)


class NonEmpty(BatchCondition):
    """True if the DataFrame has at least one row (bounded ``limit(1)``)."""

    def evaluate(self, df) -> bool:
        return df.limit(1).count() > 0


class AnyRowMatches(BatchCondition):
    """True if any row satisfies ``predicate`` (a SQL string or Column).
    Bounded: filter + ``limit(1)`` — Spark stops scanning at the first hit."""

    def __init__(self, predicate):
        self.predicate = predicate

    def evaluate(self, df) -> bool:
        return df.filter(self.predicate).limit(1).count() > 0

    def _params(self) -> dict:
        return {"predicate": str(self.predicate)}


class AllRowsMatch(BatchCondition):
    """True if every row satisfies ``predicate`` (vacuously true on empty
    input, matching the reference's ``all()`` semantics). Bounded: probe for
    one counterexample."""

    def __init__(self, predicate):
        self.predicate = predicate

    def evaluate(self, df) -> bool:
        from pyspark.sql import functions as F

        pred = self.predicate
        if isinstance(pred, str):
            pred = F.expr(pred)
        return df.filter(~pred).limit(1).count() == 0

    def _params(self) -> dict:
        return {"predicate": str(self.predicate)}


def select_columns(columns: Sequence[str], cond: Optional[Condition]) -> list:
    """Apply a name condition to a column list (None = keep all)."""
    if cond is None:
        return list(columns)
    cond = as_condition(cond)
    return [c for c in columns if cond(c)]

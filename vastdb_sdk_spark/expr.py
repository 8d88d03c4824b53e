"""Predicate expression DSL + translation to Spark ``Column``.

The reference accepts **ibis** boolean expressions (including the deferred
form ``ibis._.col > 2``) and compiles them to an Arrow Compute IR flatbuffer
(vastdb/_internal.py:200-325, 2849-2916). We keep the same user-facing
operator surface — ``t['b'] < 2``, ``&``/``|``/``~``, ``between``, ``isin``,
``isnull``, ``contains``, ``startswith``, struct sub-field chains
``t['s']['q']['q1']`` (vastdb/tests/test_nested.py:103-160) — but compile to
a Spark ``Column`` and let Catalyst do the pushdown.

Deliberate superset (SURVEY.md §2.2 / Phase 1): the reference restricts
predicates to AND-of-single-column-OR-groups (vastdb/_internal.py:280-283)
and only supports NOT over isnull; Catalyst has no such restriction, so any
boolean combination is accepted here.

If the real ``ibis`` package is importable, ibis expressions are also
accepted and translated by compiling them to SQL; the container does not ship
ibis, so the DSL below is the primary path.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable

import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import InvalidArgument, NotSupportedCommand

# ---------------------------------------------------------------------------
# expression tree


class Expr:
    """Base boolean/valued expression node."""

    # -- boolean algebra ---------------------------------------------------
    def __and__(self, other: "Expr") -> "Expr":
        return BinOp("and", self, _wrap(other))

    def __rand__(self, other: Any) -> "Expr":
        return BinOp("and", _wrap(other), self)

    def __or__(self, other: "Expr") -> "Expr":
        return BinOp("or", self, _wrap(other))

    def __ror__(self, other: Any) -> "Expr":
        return BinOp("or", _wrap(other), self)

    def __invert__(self) -> "Expr":
        return Not(self)

    # -- comparisons -------------------------------------------------------
    def __eq__(self, other: Any) -> "Expr":  # type: ignore[override]
        return BinOp("==", self, _wrap(other))

    def __ne__(self, other: Any) -> "Expr":  # type: ignore[override]
        return BinOp("!=", self, _wrap(other))

    def __lt__(self, other: Any) -> "Expr":
        return BinOp("<", self, _wrap(other))

    def __le__(self, other: Any) -> "Expr":
        return BinOp("<=", self, _wrap(other))

    def __gt__(self, other: Any) -> "Expr":
        return BinOp(">", self, _wrap(other))

    def __ge__(self, other: Any) -> "Expr":
        return BinOp(">=", self, _wrap(other))

    # -- arithmetic (superset; used by vector_search predicates etc.) ------
    # The manifest pruner (plans/pruning.py) only understands bare
    # column-vs-literal comparisons; arithmetic anywhere in a predicate
    # makes extract_intervals return None (no pruning) — correct, never
    # wrong-results. Covered by test_dsl_contracts.
    def __add__(self, other: Any) -> "Expr":
        return BinOp("+", self, _wrap(other))

    def __radd__(self, other: Any) -> "Expr":
        return BinOp("+", _wrap(other), self)

    def __sub__(self, other: Any) -> "Expr":
        return BinOp("-", self, _wrap(other))

    def __rsub__(self, other: Any) -> "Expr":
        return BinOp("-", _wrap(other), self)

    def __mul__(self, other: Any) -> "Expr":
        return BinOp("*", self, _wrap(other))

    def __rmul__(self, other: Any) -> "Expr":
        return BinOp("*", _wrap(other), self)

    def __truediv__(self, other: Any) -> "Expr":
        return BinOp("/", self, _wrap(other))

    def __rtruediv__(self, other: Any) -> "Expr":
        return BinOp("/", _wrap(other), self)

    def __mod__(self, other: Any) -> "Expr":
        return BinOp("%", self, _wrap(other))

    def __rmod__(self, other: Any) -> "Expr":
        return BinOp("%", _wrap(other), self)

    def __neg__(self) -> "Expr":
        return BinOp("-", Literal(0), self)

    # -- reference predicate dialect --------------------------------------
    def between(self, lo: Any, hi: Any) -> "Expr":
        # reference rewrites to (>= lo) AND (<= hi): vastdb/_internal.py:594-599
        return (self >= lo) & (self <= hi)

    def isin(self, values: Iterable[Any]) -> "Expr":
        values = list(values)
        if not values:
            # reference raises NotImplementedError on empty isin
            # (vastdb/tests/test_tables.py:628-629)
            raise NotSupportedCommand("isin() with an empty list is not supported")
        return Isin(self, values)

    def isnull(self) -> "Expr":
        return IsNull(self)

    def notnull(self) -> "Expr":
        return Not(IsNull(self))

    def contains(self, substr: str) -> "Expr":
        # reference: match_substring call, vastdb/_internal.py:591-592
        return StrOp("contains", self, substr)

    def startswith(self, prefix: str) -> "Expr":
        # reference rewrites to a utf8 byte-range scan (vastdb/util.py:162-169);
        # Spark pushes StringStartsWith down natively.
        return StrOp("startswith", self, prefix)

    def endswith(self, suffix: str) -> "Expr":
        return StrOp("endswith", self, suffix)

    # -- struct sub-field access ------------------------------------------
    def __getitem__(self, name: str) -> "Expr":
        raise InvalidArgument(f"cannot take sub-field of {type(self).__name__}")

    def __bool__(self) -> bool:
        raise TypeError(
            "Predicate expressions cannot be coerced to bool; "
            "use &, | and ~ instead of and/or/not"
        )

    def __hash__(self):
        return id(self)

    # -- compilation -------------------------------------------------------
    def to_spark(self) -> Column:
        raise NotImplementedError

    def root_columns(self) -> set:
        out: set = set()
        self._collect_roots(out)
        return out

    def _collect_roots(self, out: set) -> None:
        pass


class ColumnRef(Expr):
    """A (possibly nested) column reference: path = ('s', 'q', 'q1')."""

    def __init__(self, *path: str):
        self.path = tuple(path)

    def __getitem__(self, name: str) -> "ColumnRef":
        return ColumnRef(*self.path, name)

    def __getattr__(self, name: str) -> "ColumnRef":
        if name.startswith("_") or name in Expr.__dict__:
            raise AttributeError(name)
        return ColumnRef(*self.path, name)

    def to_spark(self) -> Column:
        col = F.col(self.path[0])
        for part in self.path[1:]:
            col = col.getField(part)
        return col

    def _collect_roots(self, out: set) -> None:
        out.add(self.path[0])

    def __repr__(self) -> str:
        return f"ColumnRef({'.'.join(self.path)})"

    __hash__ = Expr.__hash__


class Literal(Expr):
    def __init__(self, value: Any):
        self.value = value

    def to_spark(self) -> Column:
        return F.lit(_to_spark_literal(self.value))

    def __repr__(self) -> str:
        return f"Literal({self.value!r})"

    __hash__ = Expr.__hash__


_SPARK_BINOPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
}


class BinOp(Expr):
    def __init__(self, op: str, left: Expr, right: Expr):
        self.op = op
        self.left = left
        self.right = right

    def to_spark(self) -> Column:
        return _SPARK_BINOPS[self.op](self.left.to_spark(), self.right.to_spark())

    def _collect_roots(self, out: set) -> None:
        self.left._collect_roots(out)
        self.right._collect_roots(out)

    def __repr__(self) -> str:
        return f"({self.left!r} {self.op} {self.right!r})"

    __hash__ = Expr.__hash__


class Not(Expr):
    def __init__(self, inner: Expr):
        self.inner = inner

    def to_spark(self) -> Column:
        return ~self.inner.to_spark()

    def _collect_roots(self, out: set) -> None:
        self.inner._collect_roots(out)

    __hash__ = Expr.__hash__


class IsNull(Expr):
    def __init__(self, inner: Expr):
        self.inner = inner

    def to_spark(self) -> Column:
        return self.inner.to_spark().isNull()

    def _collect_roots(self, out: set) -> None:
        self.inner._collect_roots(out)

    __hash__ = Expr.__hash__


class Isin(Expr):
    def __init__(self, inner: Expr, values: list):
        self.inner = inner
        self.values = [_to_spark_literal(v) for v in values]

    def to_spark(self) -> Column:
        return self.inner.to_spark().isin(self.values)

    def _collect_roots(self, out: set) -> None:
        self.inner._collect_roots(out)

    __hash__ = Expr.__hash__


class StrOp(Expr):
    def __init__(self, op: str, inner: Expr, arg: str):
        self.op = op
        self.inner = inner
        self.arg = arg

    def to_spark(self) -> Column:
        col = self.inner.to_spark()
        if self.op == "contains":
            return col.contains(self.arg)
        if self.op == "startswith":
            return col.startswith(self.arg)
        if self.op == "endswith":
            return col.endswith(self.arg)
        raise NotSupportedCommand(self.op)

    def _collect_roots(self, out: set) -> None:
        self.inner._collect_roots(out)

    __hash__ = Expr.__hash__


# ---------------------------------------------------------------------------
# deferred column references: ``from vastdb_sdk_spark.expr import _``
# mirrors ``ibis._`` (resolved at select() time against the table schema,
# vastdb/table.py:491-493)


class _DeferredNamespace:
    def __getattr__(self, name: str) -> ColumnRef:
        if name.startswith("__"):
            raise AttributeError(name)
        return ColumnRef(name)

    def __getitem__(self, name: str) -> ColumnRef:
        return ColumnRef(name)


_ = _DeferredNamespace()


# ---------------------------------------------------------------------------
# helpers


def _wrap(value: Any) -> Expr:
    return value if isinstance(value, Expr) else Literal(value)


def _to_spark_literal(value: Any) -> Any:
    """Normalize Python/Arrow scalars to what F.lit accepts."""
    if isinstance(value, pa.Scalar):
        value = value.as_py()
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value
    return value


def _validate_path(schema: pa.Schema, path: tuple) -> None:
    if path[0] not in schema.names:
        raise InvalidArgument(f"unknown column {path[0]!r}; table has {schema.names}")
    dt = schema.field(path[0]).type
    for part in path[1:]:
        if not pa.types.is_struct(dt):
            raise InvalidArgument(
                f"cannot access sub-field {part!r}: {dt} is not a struct"
            )
        idx = dt.get_field_index(part)
        if idx < 0:
            raise InvalidArgument(f"struct has no field {part!r}")
        dt = dt.field(idx).type


def validate_predicate(pred: Expr, schema: pa.Schema) -> None:
    """The 'analyzer' step: resolve every column path against the table's
    Arrow schema (reference resolves Deferred/ibis expressions at select
    time — vastdb/table.py:491-493)."""
    stack = [pred]
    while stack:
        node = stack.pop()
        if isinstance(node, ColumnRef):
            _validate_path(schema, node.path)
        elif isinstance(node, BinOp):
            stack += [node.left, node.right]
        elif isinstance(node, (Not, IsNull, Isin, StrOp)):
            stack.append(node.inner)


def to_spark_predicate(pred: Any, schema: pa.Schema | None = None) -> Column | None:
    """Compile a predicate (our DSL, bool shortcut, or Spark Column) to a
    Spark Column. ``True`` -> no filter (None), ``False`` -> lit(False)
    (reference shortcut: vastdb/table.py:485-489)."""
    if pred is None or pred is True:
        return None
    if pred is False:
        return F.lit(False)
    if isinstance(pred, Column):
        return pred
    if isinstance(pred, Expr):
        if schema is not None:
            validate_predicate(pred, schema)
        return pred.to_spark()
    raise InvalidArgument(f"unsupported predicate type: {type(pred)!r}")

"""Vector distance/similarity expressions — JVM-side, no Python UDFs.

Used by ``Table.vector_search`` (reference: vastdb/table.py:889-906 maps an
index metric name to a SQL distance fn, ``l2sq -> array_distance``,
vastdb/_internal.py:809-826) and by the ANN operators in
``operators/similarity.py``.

All expressions are built from ``F.zip_with``/``F.aggregate`` so they run in
whole-stage codegen — at 100 TB the distance evaluation stays in the JVM and
vectorized; nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, computed in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))

def l2sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (reference metric 'l2sq')."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_similarity_to_lit(col: Column, vec: list[float]) -> Column:
    """``cosine_similarity(col, lit(vec))`` with the LITERAL's norm
    computed at plan time: ``norm`` over an array literal is a HOF
    aggregate Catalyst does not constant-fold, so the generic form
    re-evaluates an O(d) fold per ROW for a value known when the plan is
    built. Python's left-fold sum over doubles performs the identical
    IEEE operation sequence as the aggregate, so values are
    bit-identical with the generic expression."""
    q = [float(v) for v in vec]
    # explicit left fold, NOT builtin sum(): CPython >= 3.12 gives float
    # sum() Neumaier compensation, which would break the bit-identical
    # claim against Spark's plain left-fold aggregate in the last ulp
    qn = 0.0
    for v in q:
        qn += v * v
    qn **= 0.5
    return dot(col, _vec_lit(q)) / (norm(col) * F.lit(qn))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def inner_product_distance(a: Column, b: Column) -> Column:
    """Negative inner product (larger dot => closer)."""
    return -dot(a, b)


_METRICS = {
    "l2sq": l2sq,
    "l2": l2sq,
    "cosine": cosine_distance,
    "ip": inner_product_distance,
}


def distance_column(col: Column, vec: list[float], metric: str = "l2sq") -> Column:
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; have {sorted(_METRICS)}")
    if metric == "cosine":
        # plan-time literal norm (see cosine_similarity_to_lit)
        return F.lit(1.0) - cosine_similarity_to_lit(col, vec)
    return _METRICS[metric](col, _vec_lit(vec))

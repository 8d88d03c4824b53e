"""As-of (nearest-preceding) and range joins — operators Spark lacks
natively, composed from built-ins (SURVEY.md: custom-operator guidance (a)).

As-of join strategy (the union-sort trick): tag left rows (queries) and
right rows (quotes), union on the shared key/time axis, and use a
``last_value(..., ignorenulls)`` window to carry the most recent right row
forward onto each left row. Cost: ONE shuffle (the window's
partitionBy(key)), no range-duplicating join explosion, no skew beyond the
key distribution itself — this is the scalable plan for billions of rows,
unlike a theta-join ``l.ts >= r.ts`` which Spark executes as
broadcast-nested-loop.

Range join: bucketize the time axis so the theta condition becomes an
equi-join on bucket + residual filter — turns BNLJ into a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (pandas
    ``merge_asof`` semantics, distributed).

    ``tolerance``: max allowed left.on - right.on (same units as ``on``).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [c for c in right.columns if c not in by + [on]]

    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        *by,
        F.col(on),
        *[F.col(c) for c in right_cols],
    ).withColumn("__side", F.lit(0))

    # align schemas for the union
    carried = [f"__r_{c}" for c in right_cols]
    lhs_aligned = lhs.select(
        *by,
        F.col(on),
        F.lit(None).cast("long").alias("__r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
        "__side",
        F.struct(*left.columns).alias("__l"),
    )
    rhs_aligned = rhs.select(
        *by,
        F.col(on),
        F.col(on).cast("long").alias("__r_on"),
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
        "__side",
        F.lit(None).cast(lhs_aligned.schema["__l"].dataType).alias("__l"),
    )
    unioned = lhs_aligned.unionByName(rhs_aligned)

    # right rows sort before left rows at the same timestamp => inclusive <=
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
        *[
            F.last(rc, ignorenulls=True).over(w).alias(f"__m_{rc}")
            for rc in carried
        ],
    ).filter(F.col("__side") == 1)

    within = (
        F.lit(True)
        if tolerance is None
        else (F.col(on).cast("long") - F.col("__m_on")) <= F.lit(tolerance)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.when(F.col("__m_on").isNotNull() & within, F.col(f"__m___r_{c}"))
        .alias(c + suffix if c in left.columns else c)
        for c in right_cols
    ]
    return filled.select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    extra_on=None,
) -> DataFrame:
    """Join left points into right [start, end] intervals without a
    broadcast-nested-loop: explode each interval into the buckets it covers,
    equi-join on bucket, then apply the exact range filter. Shuffle volume is
    O(rows * avg_interval/bucket_width) — tune bucket_width to the typical
    interval."""
    lb = left.withColumn("__bucket", (F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket_width).cast("long"),
                (F.col(right_end) / bucket_width).cast("long"),
            )
        ),
    )
    cond = (lb["__bucket"] == rb["__bucket"]) \
        & (lb[left_point] >= rb[right_start]) \
        & (lb[left_point] <= rb[right_end])
    if extra_on is not None:
        cond = cond & extra_on(lb, rb)
    return lb.join(rb, cond).drop("__bucket")

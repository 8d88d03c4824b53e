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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row within the same
    ``by`` group (pandas ``merge_asof`` semantics, distributed):

    - ``direction="backward"`` (default): latest right with
      ``right.on <= left.on``;
    - ``direction="forward"``: earliest right with ``right.on >= left.on``;
    - ``direction="nearest"``: whichever of the two is closer in ``on``
      (ties -> backward, matching pandas).

    ``tolerance``: max allowed |left.on - right.on| (same units as ``on``).

    Cost: backward/forward are ONE shuffle (the window's partitionBy);
    nearest adds a second sort over the SAME partitioning (no second
    shuffle — the exchange is reused, only the within-partition order
    flips).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    # distance/tolerance arithmetic type: integral `on` stays long (full
    # int64 precision for epoch-micros); fractional `on` (float/double/
    # decimal, pandas merge_asof allows both) must NOT truncate — a left at
    # 5.4 with rights at 5.0/5.6 would tie at long precision and mis-pick.
    # BOTH sides decide: an integral left with a fractional right (or vice
    # versa) must still use double, or the fractional side truncates.
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    _frac = (FloatType, DoubleType, DecimalType)
    arith_t = (
        "double"
        if isinstance(left.schema[on].dataType, _frac)
        or isinstance(right.schema[on].dataType, _frac)
        else "long"
    )
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
        F.lit(None).cast(arith_t).alias("__r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
        "__side",
        F.struct(*left.columns).alias("__l"),
    )
    rhs_aligned = rhs.select(
        *by,
        F.col(on),
        F.col(on).cast(arith_t).alias("__r_on"),
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
        "__side",
        F.lit(None).cast(lhs_aligned.schema["__l"].dataType).alias("__l"),
    )
    unioned = lhs_aligned.unionByName(rhs_aligned)

    cols = ["*"]
    if direction in ("backward", "nearest"):
        # right rows sort before left at the same ts => inclusive <=
        wb = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cols.append(F.last("__r_on", ignorenulls=True).over(wb).alias("__b_on"))
        cols += [
            F.last(rc, ignorenulls=True).over(wb).alias(f"__b_{rc}")
            for rc in carried
        ]
    if direction in ("forward", "nearest"):
        # left rows sort before right at the same ts => inclusive >=
        wf = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        cols.append(F.first("__r_on", ignorenulls=True).over(wf).alias("__f_on"))
        cols += [
            F.first(rc, ignorenulls=True).over(wf).alias(f"__f_{rc}")
            for rc in carried
        ]
    filled = unioned.select(*cols).filter(F.col("__side") == 1)

    lon = F.col(on).cast(arith_t)
    if direction == "nearest":
        b_ok = F.col("__b_on").isNotNull()
        f_ok = F.col("__f_on").isNotNull()
        # ties -> backward (pandas); a missing side loses automatically
        use_b = b_ok & (
            ~f_ok | ((lon - F.col("__b_on")) <= (F.col("__f_on") - lon))
        )
        m_on = F.when(use_b, F.col("__b_on")).otherwise(F.col("__f_on"))
        picked = {
            rc: F.when(use_b, F.col(f"__b_{rc}")).otherwise(F.col(f"__f_{rc}"))
            for rc in carried
        }
    elif direction == "forward":
        m_on = F.col("__f_on")
        picked = {rc: F.col(f"__f_{rc}") for rc in carried}
    else:
        m_on = F.col("__b_on")
        picked = {rc: F.col(f"__b_{rc}") for rc in carried}

    within = (
        F.lit(True)
        if tolerance is None
        else F.abs(lon - m_on) <= F.lit(tolerance)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.when(m_on.isNotNull() & within, picked[f"__r_{c}"])
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

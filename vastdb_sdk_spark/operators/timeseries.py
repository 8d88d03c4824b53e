"""Time-series regularization: resample irregular event streams onto a
fixed-step grid with gap filling (LOCF / linear interpolation).

Beyond-parity (BASELINE.json north star): the reference's query surface
reads event tables but leaves regularization to the client; a training
pipeline over sensor/behavioral streams needs dense, regular series
(feature windows, seq models) computed where the data lives.

Scale design: everything is the bucket lattice — observations collapse to
one row per (group, bucket) via an order-free aggregate (map-side
combined groupBy), the dense grid is a per-group ``sequence`` explode
bounded by that group's own observed span (no global span blow-up: a
group alive for a day never materializes the corpus's year), and filling
is two window passes per group ordered by bucket index. The fill windows
partition by group — fine when groups are many (users, devices, series
ids), the usual time-series shape; a single global series becomes one
partition, which is exactly the size of its grid, not of the raw events.
No UDFs, no driver collects; interpolation arithmetic is
``prev + (next - prev) * k / n`` with exact integer k, n — the same
expression a SQL oracle evaluates bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..errors import InvalidArgument

BUCKET_AGGS = ("avg", "sum", "min", "max", "count")


def resample(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    step_us: int,
    value_col: str,
    how: str = "ffill",
    bucket_agg: str = "avg",
    max_buckets_per_group: int = 2_000_000,
) -> DataFrame:
    """Resample to a regular ``step_us``-microsecond grid per group.

    Buckets are ``floor(epoch_us(ts) / step_us)``; each non-empty bucket
    carries ``bucket_agg`` of ``value_col`` over its observations (an
    ORDER-FREE aggregate — 'last' semantics are deliberately absent so
    results never depend on intra-bucket row order). The grid spans each
    group's own [min_bucket, max_bucket]; empty buckets are filled per
    ``how``:

    - ``'none'``  — emit NULL for empty buckets (plus observed values).
    - ``'ffill'`` — last observation carried forward; leading gaps stay
      NULL (no back-fill, no extrapolation).
    - ``'interp'`` — linear interpolation between the nearest non-empty
      buckets on either side; gaps before the first / after the last
      observation stay NULL.

    Returns (group_cols..., ``bucket_ts`` epoch-micros of the bucket
    start, ``observed`` the bucket aggregate or NULL, ``filled``).
    ``max_buckets_per_group`` is a runtime guard (``assert_true``)
    against a mis-sized step materializing an absurd grid."""
    if how not in ("none", "ffill", "interp"):
        raise InvalidArgument(f"unknown fill mode {how!r}")
    if bucket_agg not in BUCKET_AGGS:
        raise InvalidArgument(
            f"unsupported bucket_agg {bucket_agg!r} (supported: {BUCKET_AGGS};"
            " 'last' is intentionally unsupported — intra-bucket order is"
            " not deterministic)"
        )
    if step_us <= 0:
        raise InvalidArgument("step_us must be positive")
    if not group_cols:
        raise InvalidArgument(
            "group_cols must be non-empty (for a single global series, add"
            " a constant column — the grid then lives in one partition"
            " sized by its own length)"
        )

    gcols = [F.col(c) for c in group_cols]
    ts_type = dict(df.dtypes).get(ts_col, "")
    us = (
        F.unix_micros(F.col(ts_col))
        if ts_type.startswith("timestamp")
        else F.col(ts_col).cast("long")  # already epoch-micros integers
    )
    bucket = F.floor(us / F.lit(int(step_us))).alias("__b")
    agg_fn = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c),
    }[bucket_agg]
    obs = (
        df.select(*gcols, bucket, F.col(value_col).alias("__v"))
        .groupBy(*group_cols, "__b")
        .agg(agg_fn(F.col("__v")).alias("observed"))
    )

    span = obs.groupBy(*group_cols).agg(
        F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
    )
    # Pin the span exchange at an explicit partition count: AQE sizes the
    # post-shuffle coalesce from the PRE-explode stats (one tiny row per
    # group), so left alone it collapses this exchange to ~1 partition and
    # the sequence-explode below — which multiplies rows by the grid
    # density — plus the join and the fill windows would all run in that
    # single task (observed: every post-span stage at (0+1)/1 tasks).
    # The count must DIFFER from spark.sql.shuffle.partitions: a user
    # repartition whose hash partitioning exactly equals the child
    # aggregate's (same keys, same N) is elided by
    # EnsureRequirements.optimizeOutRepartition, which re-exposes the
    # coalescible ENSURE_REQUIREMENTS exchange. 2N keeps the shuffle
    # origin REPARTITION_BY_NUM (exempt from AQE coalescing), still
    # hash-partitions on the group keys (so the fill windows below add
    # no further exchange — {group} satisfies their clustering), and the
    # extra shuffle moves only the tiny pre-explode span frame.
    try:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    span = span.repartition(2 * n_parts, *group_cols)
    guard = F.assert_true(
        F.col("__b1") - F.col("__b0") < F.lit(int(max_buckets_per_group)),
        F.lit("resample grid exceeds max_buckets_per_group"),
    )
    grid = span.select(
        *group_cols,
        F.explode(
            F.when(guard.isNull(), F.sequence(F.col("__b0"), F.col("__b1")))
        ).alias("__b"),
    )
    dense = grid.join(obs, group_cols + ["__b"], "left")

    w = Window.partitionBy(*group_cols).orderBy("__b")
    if how == "none":
        filled = F.col("observed")
    elif how == "ffill":
        filled = F.last("observed", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:  # interp
        prev = F.last(
            F.when(
                F.col("observed").isNotNull(),
                F.struct(F.col("__b").alias("b"), F.col("observed").alias("v")),
            ),
            ignorenulls=True,
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        nxt = F.first(
            F.when(
                F.col("observed").isNotNull(),
                F.struct(F.col("__b").alias("b"), F.col("observed").alias("v")),
            ),
            ignorenulls=True,
        ).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        filled = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
            F.when(
                prev.isNotNull() & nxt.isNotNull(),
                prev["v"]
                + (nxt["v"] - prev["v"])
                * (F.col("__b") - prev["b"]).cast("double")
                / (nxt["b"] - prev["b"]).cast("double"),
            )
        )
    return dense.select(
        *group_cols,
        (F.col("__b") * F.lit(int(step_us))).alias("bucket_ts"),
        F.col("observed"),
        filled.alias("filled"),
    )


def rolling_anomaly_flags(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    step_us: int,
    value_col: str,
    window: int = 24,
    min_periods: int = 8,
    z_threshold: float = 3.0,
    bucket_agg: str = "avg",
) -> DataFrame:
    """Rolling z-score anomaly detection on the regular grid: each
    bucket's value is compared against the TRAILING ``window`` buckets
    (current excluded — the score tests new data against history, so an
    anomaly cannot suppress itself), with mean/std derived from frame
    sums (std = sqrt(max(E[x^2] - E[x]^2, 0))). Buckets with fewer than
    ``min_periods`` observed history points, zero variance, or no
    observation get a NULL score. ``is_anomaly`` is derived from the
    ROUNDED (4 dp) score so an engine pair computing z within float
    noise of each other cannot disagree on the flag.

    Scale shape: :func:`resample` (bucket groupBy + per-group grid) plus
    ONE additional window pass per group — no extra shuffle beyond the
    fill window's partitioning. Returns (group_cols..., bucket_ts,
    observed, zscore, is_anomaly)."""
    if window < 1 or min_periods < 1:
        raise InvalidArgument("window and min_periods must be >= 1")
    grid = resample(
        df, ts_col, group_cols, step_us, value_col,
        how="none", bucket_agg=bucket_agg,
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bucket_ts")
        .rowsBetween(-window, -1)
    )
    obs = F.col("observed")
    n = F.count(obs).over(w)
    mean = F.sum(obs).over(w) / n
    msq = F.sum(obs * obs).over(w) / n
    std = F.sqrt(F.greatest(msq - mean * mean, F.lit(0.0)))
    z = F.round(
        F.when(
            obs.isNotNull() & (n >= F.lit(int(min_periods))) & (std > 0),
            (obs - mean) / std,
        ),
        4,
    )
    return grid.select(
        *group_cols,
        "bucket_ts",
        "observed",
        z.alias("zscore"),
        (F.abs(z) >= F.lit(float(z_threshold))).alias("is_anomaly"),
    )

"""Stream-stream interval joins (extension tier; the reference has no
streaming — SURVEY.md §2.9).

Spark requires watermarks on BOTH inputs plus a time-range join condition
so the state store can evict rows: per key, retained state is bounded by
``within`` + the watermark horizon, independent of stream length. That is
the 100 TB/day-safe shape — an unbounded-condition stream join would grow
state forever.

The same functions run on batch DataFrames (watermarks are skipped when the
input is not streaming), which gives each streaming query a batch twin to
verify against — the module's test strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .events import with_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    *,
    within: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    prefix: str = "r_",
    join_type: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with equal ``keys`` whose event time
    falls in [left.event_time, left.event_time + within]. Right columns come
    back ``prefix``-renamed so self-joins don't collide. Inputs need the
    int64-micros ``ts`` column convention (event_time is derived here)."""
    l = with_event_time(left)
    r = with_event_time(right)
    r = r.select([F.col(c).alias(prefix + c) for c in r.columns])
    if l.isStreaming:
        l = l.withWatermark("event_time", left_watermark)
    if r.isStreaming:
        r = r.withWatermark(prefix + "event_time", right_watermark)
    cond = None
    for k in keys:
        c = l[k] == r[prefix + k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (r[prefix + "event_time"] >= l["event_time"])
        & (
            r[prefix + "event_time"]
            <= l["event_time"] + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, join_type)


def attribution_join(
    stream: DataFrame,
    first_type: str,
    then_type: str,
    *,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Classic funnel attribution: pair each ``first_type`` event with the
    ``then_type`` events by the same user within ``within`` (a watermarked
    stream-stream self-join). Returns one row per qualifying pair."""
    a = stream.filter(F.col("event_type") == first_type)
    b = stream.filter(F.col("event_type") == then_type)
    joined = interval_join(
        a,
        b,
        ["user_id"],
        within=within,
        left_watermark=watermark,
        right_watermark=watermark,
    )
    return joined.select(
        F.col("user_id"),
        F.col("event_id").alias("first_event_id"),
        F.col("r_event_id").alias("then_event_id"),
        F.col("event_time").alias("first_time"),
        F.col("r_event_time").alias("then_time"),
        (F.col("r_ts") - F.col("ts")).alias("lag_us"),
    )

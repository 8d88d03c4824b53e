"""Scale-adaptive scan fan-out for per-row-heavy pipelines.

A Spark scan's parallelism is bounded by its file/row-group layout: a
single file with one row group is ONE task no matter how many cores the
session has (FilePartition splits are byte ranges, but a Parquet task
only reads row groups whose midpoint lands in its range). Pipelines
whose cost is dominated by per-row expression work — tokenize + shingle
+ MinHash/SimHash, md5 position hashes, per-token HOFs, image decodes —
then run on one core while the rest idle (guide §2.5 "input skew: one
huge unsplittable file ... repartition immediately after the read").

``fan_out`` repartitions such a frame to the session's default
parallelism ONLY when its planned partition count is below it — at real
scale (many files / row groups) the scan already exceeds the core count
and this is the identity, so no corpus-wide shuffle is ever added to
the 100 TB shape. The repartition is round-robin with an explicit
partition count: Spark's sort-before-repartition (SPARK-23207, on by
default) keeps the row-to-partition assignment deterministic under task
retry, and the explicit count keeps AQE from coalescing the tiny local
exchange straight back to one partition.

Call it on the NARROW base frame (ids + the text/vector column) right
after the read, before the expensive per-row projection — the shuffled
bytes are then exactly the payload the pipeline must touch anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's
    ``defaultParallelism``) iff its planned partition count is lower.
    Identity when the plan is already at least that parallel — the
    at-scale case — so downstream plan shapes are unchanged there."""
    try:
        spark = df.sparkSession
        target = int(min_parts or spark.sparkContext.defaultParallelism)
        # JVM-side probe: finalizes the physical plan (unavoidable — the
        # partition count IS a physical property) but skips df.rdd's
        # Python-RDD conversion layer, which re-built serializers and a
        # javaToPython stage per call (ADVICE r14)
        nparts = df._jdf.rdd().getNumPartitions()
    except Exception:
        try:
            nparts = df.rdd.getNumPartitions()  # private-API drift fallback
            target = int(
                min_parts or df.sparkSession.sparkContext.defaultParallelism
            )
        except Exception:
            return df  # non-JVM frame: never break the pipeline
    if nparts >= target or target <= 1:
        return df
    return df.repartition(target)

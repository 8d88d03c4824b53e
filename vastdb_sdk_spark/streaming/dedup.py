"""Streaming deduplication — the streaming face of operators/dedup.py.

For continuous ingestion pipelines (training-data collection, event
streams): drop exact duplicates inside a watermark horizon, or route each
micro-batch through the batch MinHash pipeline against the already-ingested
corpus via foreachBatch.

State discipline at scale: ``dropDuplicatesWithinWatermark`` keeps one state
row per key seen within the watermark — state is bounded by (arrival rate x
horizon), not by corpus size. Whole-corpus dedup belongs in the batch tier
(operators/dedup.py) over the accumulated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``key_cols`` digest was already seen within the
    watermark horizon. The digest (md5 over concatenated keys) keeps state
    rows small and uniformly distributed regardless of payload size."""
    digest = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    )
    from .events import with_event_time

    return (
        with_event_time(stream, ts_col)
        .withColumn("__content_hash", digest)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )


def stream_dedup_against_table(stream: DataFrame, table, checkpoint_dir: str):
    """foreachBatch pattern: each micro-batch is de-duplicated exactly
    against the engine table's existing content hashes (anti-join), then
    appended — so the accumulated table stays exact-duplicate-free without
    unbounded stream state. ``table`` must have the stream's columns."""
    session = table.tx._session
    bucket = table.bucket.name
    schema_name = table.schema.name
    table_name = table.name
    cols = [f.name for f in table.arrow_schema]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        digest = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
        )
        batch = (
            batch_df.select(*cols)
            .withColumn("__h", digest)
            .dropDuplicates(["__h"])
        )
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            existing = t.df().select(
                F.md5(
                    F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
                ).alias("__h")
            )
            fresh = batch.join(existing, "__h", "left_anti").drop("__h")
            t.insert_df(fresh)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

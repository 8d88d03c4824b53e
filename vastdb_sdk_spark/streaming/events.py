"""Structured Streaming ingestion + windowed analytics for event streams.

The reference has no streaming (SURVEY.md §2.9) — this is the extension tier
(BASELINE.json north star). Patterns:

- file-source ingestion of an events directory into an engine table
  (micro-batch ``foreachBatch`` append -> one engine transaction per batch,
  so stream ingestion inherits the manifest's atomicity);
- event-time windowed aggregation with watermarking for late data;
- stateful sessionization via ``applyInPandasWithState``.

All readers take an explicit schema (streaming sources must not infer), and
the ts column convention follows the batch tier: int64 epoch-micros
(timestamp[us] parquet read under a long schema yields the raw int64;
see __spark_entry__._t).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch micros
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over a growing directory of parquet files."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive a TIMESTAMP event-time column from epoch-micros for
    watermarking (Spark watermarks require TimestampType)."""
    return df.withColumn("event_time", F.timestamp_micros(F.col(ts_col)))


def windowed_counts(
    df: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data
    handling. At scale: state size is bounded by the watermark horizon; the
    shuffle key (window, event_type) is low-cardinality so enable AQE or add
    user_id salting if one type dominates."""
    return (
        with_event_time(df)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_batch(df: DataFrame, window: str = "1 minute") -> DataFrame:
    """Batch-mode twin of ``windowed_counts`` (same plan minus the watermark)
    — used as the oracle for the streaming result."""
    return (
        with_event_time(df)
        .groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (built-in session_window — state per open
    session, closed by watermark)."""
    return (
        with_event_time(df)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events"
        )
    )


def stream_into_table(stream_df: DataFrame, table, checkpoint_dir: str):
    """Append a stream into an engine table with EXACTLY-ONCE semantics:
    one transaction per micro-batch, and the batch id is recorded in the
    table manifest inside that same transaction (``set_stream_offset``, cf.
    Delta's txnAppId/txnVersion pattern). If the insert commits but the
    checkpoint write doesn't (crash between the two), the replayed batch is
    detected as already-applied and skipped — no duplicate rows. The stream
    identity is derived from the checkpoint dir, so a restarted query with
    the same checkpoint resumes the same offset sequence. ``table`` is a
    bound vastdb_sdk_spark Table whose session outlives the query."""
    import os

    session = table.tx._session
    bucket = table.bucket.name
    schema_name = table.schema.name
    table_name = table.name
    stream_id = f"ckpt:{os.path.abspath(checkpoint_dir)}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            if batch_id <= t.stream_offset(stream_id):
                return  # replayed micro-batch: already committed
            t.insert_df(batch_df)
            t.set_stream_offset(stream_id, batch_id)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_merge_into_table(
    stream_df: DataFrame,
    table,
    keys: list[str],
    checkpoint_dir: str,
    *,
    dedup_batch: bool = True,
):
    """CDC-style streaming UPSERT: each micro-batch is MERGEd into the
    engine table (update matches on ``keys``, insert the rest) inside one
    transaction, with the same exactly-once batch-id bookkeeping as
    ``stream_into_table`` — a replayed batch after checkpoint loss is
    skipped, so upserts are applied once even though MERGE itself is not
    idempotent for aggregating assignments.

    ``dedup_batch`` keeps only the LAST row per key within a micro-batch
    (by the int64-micros ``ts`` column when present, else arbitrary), the
    usual CDC contract when one key changes twice in the same batch —
    Table.merge assumes unique source keys.

    Scale shape per batch: one window (or drop-duplicates) shuffle on the
    keys + merge's inner/anti joins; state lives in the table, not the
    stream — there is no unbounded streaming state at all."""
    import os

    from pyspark.sql import Window

    session = table.tx._session
    bucket = table.bucket.name
    schema_name = table.schema.name
    table_name = table.name
    stream_id = f"ckpt-merge:{os.path.abspath(checkpoint_dir)}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            if batch_id <= t.stream_offset(stream_id):
                return  # replayed micro-batch: already merged
            src = batch_df
            if dedup_batch:
                if "ts" in src.columns:
                    w = Window.partitionBy(*keys).orderBy(F.col("ts").desc())
                    src = (
                        src.withColumn("__rn", F.row_number().over(w))
                        .filter(F.col("__rn") == 1)
                        .drop("__rn")
                    )
                else:
                    src = src.dropDuplicates(keys)
            t.merge(src, on=keys)
            t.set_stream_offset(stream_id, batch_id)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

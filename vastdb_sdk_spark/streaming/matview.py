"""Streaming materialized-view maintenance: ingest micro-batches and keep
a table's aggregate views fresh, per batch, at churn-bounded cost.

Engine extension composing two existing pieces: the exactly-once
micro-batch insert protocol (streaming/events.stream_into_table) and the
feed-driven incremental MV refresh (matview.MaterializedView.refresh).
Each micro-batch runs TWO transactions:

1. insert + stream-offset record (exactly-once; replays skipped), then
2. ``refresh(mode='auto')`` for every (or the named) materialized view —
   the span is append-only by construction, so the refresh is a pure
   delta merge (no base read) for EVERY aggregate mix including min/max.

The split is deliberate: a refresh inside the insert transaction would
hit the staged-DML guard and rebuild from scratch. Crash between the two
transactions is safe — the view stays marked stale, and BOTH recovery
paths fold the missed span: the next fresh batch's refresh covers it
(the feed covers everything since ``built_version``), and a REPLAYED
batch skips only the insert while still running the refresh — so an
availableNow one-shot rerun whose only batch is a replay also restores
per-batch freshness. Refresh is idempotent and no-ops when not stale,
so it needs no offset bookkeeping of its own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stream_into_table_maintaining_views(
    stream_df: DataFrame,
    table,
    checkpoint_dir: str,
    views: list[str] | None = None,
):
    """Build the ingest-and-maintain query. ``views`` restricts which
    materialized views refresh per batch (default: all). Returns the
    DataStreamWriter (call ``.start()``; availableNow trigger)."""
    session = table.tx._session
    bucket = table.bucket.name
    schema_name = table.schema.name
    table_name = table.name
    stream_id = f"ckpt:{os.path.abspath(checkpoint_dir)}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            if batch_id > t.stream_offset(stream_id):
                t.insert_df(batch_df)
                t.set_stream_offset(stream_id, batch_id)
            # a replayed batch skips ONLY the insert (exactly-once). The
            # refresh below still runs: after a crash between the insert
            # tx and the refresh tx, the replay is the only chance an
            # availableNow one-shot run gets to fold the missed span —
            # returning early would end the run with every view stale.
            # Refresh is idempotent and no-ops when nothing is stale, so
            # the common replay costs one metadata check per view.
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            names = views if views is not None else [
                mv.name for mv in t.materialized_views()
            ]
            for name in names:
                t.materialized_view(name).refresh(mode="auto")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

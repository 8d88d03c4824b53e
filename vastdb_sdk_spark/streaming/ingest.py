"""Continuous drop-folder ingestion of JSONL / CSV dumps into engine tables.

Engine extension: the streaming twin of ``sources.ingest.
ingest_table_from_files`` — a Structured Streaming file source watches a
directory, each discovered file becomes part of a micro-batch, and the
batch lands through :func:`..streaming.events.stream_into_table`'s
exactly-once transaction protocol (one engine transaction per micro-batch,
batch id recorded in the manifest, replays skipped). This is the shape a
production corpus-refresh pipeline runs: crawler dumps appear in object
storage, the ingest query picks them up, and downstream scans see each
file exactly once.

The read schema comes from the TABLE, never from inference: streaming
sources require a fixed schema up front, and pinning it to the table's
own schema makes drift between dumps a loud per-batch cast error instead
of a silent column reshuffle. ``maxFilesPerTrigger`` bounds micro-batch
size so one giant backlog replay cannot build a single batch the cluster
must fit in flight.
"""

from __future__ import annotations

from ..errors import InvalidArgument
from ..types import arrow_schema_to_spark
from .events import stream_into_table

_FORMATS = ("json", "csv")


def stream_ingest_files(
    table,
    source_dir: str,
    checkpoint_dir: str,
    format: str = "json",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
):
    """Build the exactly-once drop-folder ingest query for ``table``.
    Returns the DataStreamWriter (call ``.start()``; the default trigger
    is ``availableNow`` via stream_into_table — drain the backlog, then
    stop — re-trigger on a schedule or switch to a continuous trigger for
    a long-lived watcher)."""
    if format not in _FORMATS:
        raise InvalidArgument(
            f"stream ingest format must be one of {_FORMATS}, got {format!r}"
        )
    spark = table.spark
    opts = {"header": "true"} if format == "csv" else {}
    opts.update(options or {})
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(int(max_files_per_trigger))
    reader = spark.readStream.options(**opts).schema(
        arrow_schema_to_spark(table.arrow_schema)
    )
    stream_df = reader.format(format).load(source_dir)
    return stream_into_table(stream_df, table, checkpoint_dir)

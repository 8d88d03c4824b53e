"""Distributed JSONL / CSV ingestion into engine tables.

Engine extension (the reference imports parquet only —
``vastdb.util.create_table_from_files``, vastdb/util.py:18-43 — but
training-data pipelines overwhelmingly arrive as JSONL/CSV dumps). Unlike
parquet import, these formats cannot be zero-copy registered: the engine's
storage layout IS parquet, so ingestion is a distributed
``spark.read.<format>`` -> ``Table.insert_df`` conversion. Schema comes
from the caller (an Arrow schema, exact control over widths) or from
Spark's distributed inference pass.

Scale notes: both the inference pass and the conversion are fully
distributed (one task per input split; JSON/CSV splits are line-based, so
a 100 TB dump parallelizes like any text source). The write lands through
insert_df, which honors the table's ``partition_by`` spec and registers
per-file manifest stats — downstream scans prune exactly as if the data
had been born parquet. Inference costs one extra full read of the text
at creation time; pass ``arrow_schema`` to skip it (and to avoid
inference drift between dumps — the reference pins schemas at
create_table for the same reason, vastdb/schema.py:85-121).
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from ..errors import InvalidArgument
from ..types import spark_type_to_arrow


_FORMATS = ("json", "csv", "orc")


def ingest_table_from_files(
    schema,
    table_name: str,
    files: Iterable[str],
    format: str = "json",
    arrow_schema: pa.Schema | None = None,
    options: dict | None = None,
    partition_by: list[str] | None = None,
):
    """Create ``table_name`` in ``schema`` and load ``files`` (JSONL,
    CSV, or ORC — ORC converts through the distributed reader too, since
    the storage layout is parquet; its schema is self-describing) into it
    distributedly. Returns the Table.

    ``options`` passes through to the Spark reader (e.g. ``{"header":
    "true"}`` for CSV with a header row — applied by default,
    ``{"multiLine": "true"}`` for non-line-delimited JSON arrays).
    """
    if format not in _FORMATS:
        raise InvalidArgument(
            f"ingest format must be one of {_FORMATS}, got {format!r} "
            "(parquet goes through create_table_from_files — zero-copy)"
        )
    paths = list(files)
    if not paths:
        raise InvalidArgument("no input files")
    spark = schema.tx.spark
    opts = {"header": "true", "inferSchema": "true"} if format == "csv" else {}
    opts.update(options or {})
    reader = spark.read.options(**opts)
    if arrow_schema is not None:
        from ..types import arrow_schema_to_spark

        reader = reader.schema(arrow_schema_to_spark(arrow_schema))
    df = reader.format(format).load(paths)
    if arrow_schema is None:
        arrow_schema = pa.schema(
            [
                pa.field(f.name, spark_type_to_arrow(f.dataType), nullable=True)
                for f in df.schema.fields
            ]
        )
    table = schema.create_table(
        table_name, arrow_schema, partition_by=partition_by
    )
    table.insert_df(df)
    return table

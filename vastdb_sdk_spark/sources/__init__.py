from .ingest import ingest_table_from_files
from .parquet_import import create_table_from_files, merge_schemas, ImportMergePolicy
from .shards import (
    group_samples,
    read_jsonl_shards,
    read_webdataset,
    write_webdataset_shards,
)

__all__ = [
    "create_table_from_files",
    "ingest_table_from_files",
    "merge_schemas",
    "ImportMergePolicy",
    "group_samples",
    "read_jsonl_shards",
    "read_webdataset",
    "write_webdataset_shards",
]

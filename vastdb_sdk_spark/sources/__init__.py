from .ingest import ingest_table_from_files
from .parquet_import import create_table_from_files, merge_schemas, ImportMergePolicy

__all__ = [
    "create_table_from_files",
    "ingest_table_from_files",
    "merge_schemas",
    "ImportMergePolicy",
]

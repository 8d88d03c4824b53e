"""Lightweight metadata handles mirroring the reference's value objects.

Reference: TableRef/TableMetadata (vastdb/table_metadata.py:32-120),
VectorIndex (vastdb/_internal.py:810-826), BlobExpansion handle
(vastdb/table.py:1153-1215). Here these are thin views over the manifest —
no RPC state to cache, so "reload" operations on the owning Table are
no-ops and these objects never go stale within a transaction.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TableRef:
    """Fully-qualified table coordinates (reference: TableRef)."""

    bucket: str
    schema: str
    table: str

    @property
    def full_path(self) -> str:
        return f"{self.bucket}/{self.schema}/{self.table}"


@dataclasses.dataclass(frozen=True)
class VectorIndex:
    """Vector-index metadata (reference: VectorIndex,
    _internal.py:818-826)."""

    column: str
    distance_metric: str
    sql_distance_function: str


@dataclasses.dataclass(frozen=True)
class TableMetadata:
    """Table coordinates + kind (reference: TableMetadata; ours carries no
    cached schema/stats because the manifest is always current)."""

    ref: TableRef
    table_type: str = "table"  # "table" | "imports"

    @property
    def is_imports_table(self) -> bool:
        return self.table_type == "imports"


class BlobExpansion:
    """Handle over one blob expansion (reference: BlobExpansion,
    vastdb/table.py:1153-1215 — add_columns/drop_columns/drop mutate the
    expansion's target schema). Obtained via ``Table.blob_expansion()``."""

    def __init__(self, table, name: str, source_column_name: str):
        self._table = table
        self.name = name
        self.source_column_name = source_column_name

    @property
    def table_metadata(self) -> TableMetadata:
        return self._table.table_metadata

    @property
    def tx(self):
        return self._table.tx

    def columns(self):
        """Current target schema of the expansion."""
        from .types import schema_from_b64  # local: avoid import cycle

        cfg = self._table.entry.blob_expansions[self.name]
        return schema_from_b64(cfg["target_schema_b64"])

    def add_columns(self, columns_to_add=None) -> None:
        self._table.alter_blob_expansion(self.name, add_columns=columns_to_add)

    def drop_columns(self, columns_to_remove=None) -> None:
        self._table.alter_blob_expansion(
            self.name,
            drop_columns=[f.name for f in columns_to_remove] if columns_to_remove else None,
        )

    def drop(self) -> None:
        self._table.drop_blob_expansion(self.name)

    def __repr__(self) -> str:
        return f"BlobExpansion({self.name!r}, source={self.source_column_name!r})"

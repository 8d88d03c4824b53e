"""Schema: container of tables; nestable via ``"a/b"`` names.

Reference: vastdb/schema.py:26-174 — create/drop/rename schema, nested
sub-schemas (``_subschema_full_name``, schema.py:38-39), ``create_table``
with sorting key / vector index / imports-table flags, table listing.
"""

from __future__ import annotations

import pyarrow as pa

from .catalog.manifest import IMPORTED_OBJECTS_TABLE_NAME, TableEntry
from .errors import MissingTable, TableExists
from .types import schema_to_b64, validate_supported_schema

# Arrow schema of the per-table imports side table
# (reference columns incl. ObjectName: vastdb/tests/test_imports.py:89-98)
IMPORTS_TABLE_SCHEMA = pa.schema(
    [
        pa.field("ObjectName", pa.string()),
        pa.field("TableName", pa.string()),
        pa.field("NumRows", pa.int64()),
        pa.field("SizeBytes", pa.int64()),
        pa.field("ImportTimeUs", pa.int64()),
    ]
)


class Schema:
    def __init__(self, name: str, bucket):
        self.name = name
        self.bucket = bucket
        self.tx = bucket.tx

    def __repr__(self) -> str:
        return f"Schema({self.bucket.name}/{self.name})"

    @property
    def _state(self):
        return self.bucket._state

    # -- nested schemas ----------------------------------------------------
    def _sub_name(self, name: str) -> str:
        return f"{self.name}/{name}"

    def create_schema(self, name: str):
        return self.bucket.create_schema(self._sub_name(name))

    def schema(self, name: str, fail_if_missing: bool = True):
        return self.bucket.schema(self._sub_name(name), fail_if_missing)

    def schemas(self) -> list:
        prefix = self.name + "/"
        return [
            Schema(n, self.bucket)
            for n in sorted(self.bucket.manifest.schemas)
            if n.startswith(prefix) and "/" not in n[len(prefix):]
        ]

    # -- DDL ---------------------------------------------------------------
    def create_table(
        self,
        name: str,
        columns: pa.Schema,
        fail_if_exists: bool = True,
        *,
        sorting_key: list[str] | None = None,
        vector_index: dict | None = None,
        create_imports_table: bool = False,
        use_external_row_ids_allocation: bool = False,
        partition_by: list[str] | None = None,
    ):
        """Create a table from an Arrow schema
        (reference: vastdb/schema.py:85-121). ``partition_by`` is an engine
        extension: insert_df writes hive-style partition directories and the
        manifest prunes partitions at planning time."""
        from .table import Table

        validate_supported_schema(columns)
        if sorting_key:
            missing = [k for k in sorting_key if k not in columns.names]
            if missing:
                raise MissingTable(f"sorting key columns not in schema: {missing}")
        if partition_by:
            missing = [k for k in partition_by if k not in columns.names]
            if missing:
                raise MissingTable(f"partition columns not in schema: {missing}")
        st = self._state
        entry = TableEntry(
            name=name,
            schema_name=self.name,
            arrow_schema_b64=schema_to_b64(columns),
            sorting_key=list(sorting_key or []),
            use_external_row_ids=use_external_row_ids_allocation,
            vector_index=vector_index,
        )
        if partition_by:
            entry.properties["partition_by"] = list(partition_by)
        try:
            st.manifest.create_table(entry)
        except TableExists:
            if fail_if_exists:
                raise
            return Table(name, self)
        st.changes.record(
            "create_table", entry.to_json(), touched=[("table", self.name, name)]
        )
        self.tx._audit_event(st, "create_table", f"{self.bucket.name}/{self.name}/{name}")
        if create_imports_table:
            self._create_imports_table(name)
        return Table(name, self)

    def _imports_table_name(self, table_name: str) -> str:
        return f"{table_name}/{IMPORTED_OBJECTS_TABLE_NAME}"

    def _create_imports_table(self, table_name: str) -> None:
        st = self._state
        iname = self._imports_table_name(table_name)
        if (self.name, iname) in st.manifest.tables:
            return
        entry = TableEntry(
            name=iname,
            schema_name=self.name,
            arrow_schema_b64=schema_to_b64(IMPORTS_TABLE_SCHEMA),
        )
        st.manifest.create_table(entry)
        st.changes.record(
            "create_table", entry.to_json(), touched=[("table", self.name, iname)]
        )

    def table(self, name: str, fail_if_missing: bool = True):
        from .table import Table

        if (self.name, name) not in self.bucket.manifest.tables:
            if fail_if_missing:
                raise MissingTable(f"{self.name}/{name}")
            return None
        return Table(name, self)

    def tables(self, table_name: str | None = None) -> list:
        """List tables; hides per-table imports side tables like the
        reference hides its bookkeeping tables."""
        from .table import Table

        out = []
        for (s, t) in sorted(self.bucket.manifest.tables):
            if s != self.name:
                continue
            if table_name and t != table_name:
                continue
            if "/" in t:  # imports side tables
                continue
            out.append(Table(t, self))
        return out

    def tablenames(self) -> list[str]:
        return [t.name for t in self.tables()]

    def drop(self) -> None:
        st = self._state
        st.manifest.drop_schema(self.name)
        st.changes.record("drop_schema", self.name, touched=[("schema", self.name)])
        self.tx._audit_event(st, "drop_schema", f"{self.bucket.name}/{self.name}")

    def rename(self, new_name: str) -> None:
        st = self._state
        st.manifest.rename_schema(self.name, new_name)
        st.changes.record(
            "rename_schema",
            self.name,
            new_name,
            touched=[("schema", self.name), ("schema", new_name)],
        )
        self.tx._audit_event(st, "rename_schema", f"{self.name} -> {new_name}")
        self.name = new_name

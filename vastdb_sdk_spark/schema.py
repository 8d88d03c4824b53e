"""Schema: container of tables; nestable via ``"a/b"`` names.

Reference: vastdb/schema.py:26-174 — create/drop/rename schema, nested
sub-schemas (``_subschema_full_name``, schema.py:38-39), ``create_table``
with sorting key / vector index / imports-table flags, table listing.
"""

from __future__ import annotations

import pyarrow as pa

from .catalog.manifest import IMPORTED_OBJECTS_TABLE_NAME, TableEntry
from .errors import InvalidArgument, MissingTable, MissingView, TableExists, ViewExists
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

    def schemas(self, batch_size: int | None = None) -> list:
        out: list = []
        next_key, truncated = 0, True
        while truncated:
            page, next_key, truncated = self.list_schemas(
                next_key=next_key, max_keys=batch_size
            )
            out.extend(page)
        return out

    def list_schemas(
        self,
        next_key: int = 0,
        name_prefix: str = "",
        exact_match: bool = False,
        max_keys: int | None = None,
    ) -> tuple[list, int, bool]:
        """One page of child schemas — ``(schemas, next_key, is_truncated)``
        per the reference listing protocol (vastdb/_internal.py:1188-1236).
        ``name_prefix``/``exact_match`` apply to the child's short name."""
        from .catalog.listing import paginate_names

        prefix = self.name + "/"
        names = sorted(
            n[len(prefix):]
            for n in self.bucket.manifest.schemas
            if n.startswith(prefix) and "/" not in n[len(prefix):]
        )
        if max_keys is None:  # session-wide default (Session(page_size=))
            max_keys = self.tx._session.page_size
        page, key, truncated = paginate_names(
            names, next_key, max_keys, name_prefix, exact_match
        )
        return [Schema(prefix + n, self.bucket) for n in page], key, truncated

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
        # tables and logical views share one namespace; create_view checks
        # the table side, and this is the reverse guard — without it a
        # table silently SHADOWS an existing view (sqlfront resolves
        # tables first), contradicting create_view's collision contract
        if name in self._views_state():
            raise ViewExists(
                f"{self.name}.{name} (a logical view has this name; "
                "tables and views share a namespace — drop the view first)"
            )
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

    def clone_table(self, source, name: str):
        """Zero-copy shallow clone (Delta ``CREATE TABLE ... SHALLOW CLONE``
        analog): the new table's manifest entry references the source's data
        files byte-for-byte — no data moves at any scale. The entries then
        diverge independently: DML on either side writes its own DV
        sidecars/replacement files; ``vacuum`` counts references from every
        table, so shared files survive until both sides drop them."""
        from .table import Table

        if name in self._views_state():  # shared table/view namespace
            raise ViewExists(
                f"{self.name}.{name} (a logical view has this name; "
                "tables and views share a namespace — drop the view first)"
            )
        st = self._state
        entry = TableEntry.from_json(source.entry.to_json())
        entry.name = name
        entry.schema_name = self.name
        st.manifest.create_table(entry)
        st.changes.record(
            "create_table", entry.to_json(), touched=[("table", self.name, name)]
        )
        self.tx._audit_event(
            st,
            "clone_table",
            f"{self.bucket.name}/{self.name}/{name}",
            source=source.path,
        )
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

    def _table_names(self) -> list[str]:
        """Visible (non-bookkeeping) table names, sorted."""
        return sorted(
            t
            for (s, t) in self.bucket.manifest.tables
            if s == self.name and "/" not in t
        )

    def list_tables(
        self,
        next_key: int = 0,
        name_prefix: str = "",
        exact_match: bool = False,
        max_keys: int | None = None,
        names_only: bool = False,
    ) -> tuple[list, int, bool]:
        """One page of tables — ``(tables, next_key, is_truncated)`` per the
        reference listing protocol (vastdb/_internal.py:1483-1531).
        ``names_only=True`` returns bare names (cheaper wire shape in the
        reference; here it skips Table construction). Hides per-table
        imports side tables like the reference hides bookkeeping tables."""
        from .catalog.listing import paginate_names
        from .table import Table

        if max_keys is None:  # session-wide default (Session(page_size=))
            max_keys = self.tx._session.page_size
        page, key, truncated = paginate_names(
            self._table_names(), next_key, max_keys, name_prefix, exact_match
        )
        items = page if names_only else [Table(t, self) for t in page]
        return items, key, truncated

    def tables(
        self, table_name: str | None = None, batch_size: int | None = None
    ) -> list:
        """List tables, paging through list_tables like the reference
        (vastdb/schema.py:136-149: exact_match when a name is given)."""
        out: list = []
        next_key, truncated = 0, True
        while truncated:
            page, next_key, truncated = self.list_tables(
                next_key=next_key,
                name_prefix=table_name or "",
                exact_match=bool(table_name),
                max_keys=batch_size,
            )
            out.extend(page)
        return out

    def tablenames(self, batch_size: int | None = None) -> list[str]:
        out: list[str] = []
        next_key, truncated = 0, True
        while truncated:
            page, next_key, truncated = self.list_tables(
                next_key=next_key, max_keys=batch_size, names_only=True
            )
            out.extend(page)
        return out

    def table_count(self) -> int:
        """Count-only listing (the reference's count-only mode returns just
        the number of matches without materializing entries)."""
        return len(self._table_names())

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

    # -- logical SQL views ---------------------------------------------------
    # (engine extension; the reference reaches SQL via DuckDB where views are
    #  DuckDB-session-local — here they are catalog objects: stored in the
    #  schema's manifest entry, transactional, snapshot/restore-consistent,
    #  and bound by the SQL tier at query time against the reading
    #  transaction's snapshot.)

    def _views_state(self) -> dict:
        sd = self.bucket.manifest.schemas[self.name]
        return sd.setdefault("properties", {}).setdefault("views", {})

    def create_view(self, name: str, sql: str, or_replace: bool = False):
        """Store a logical (non-materialized) view: ``sql`` must be a
        SELECT/WITH statement; it is bound fresh at every use, so the view
        always reflects the reading transaction's snapshot (unlike a
        materialized view there is no state to refresh, and unlike a temp
        view it persists in the catalog and travels with snapshots/restore).
        The view shares the table namespace of its schema."""
        import re as _re

        if not _re.match(r"(?is)\s*(SELECT|WITH)\b", sql or ""):
            raise InvalidArgument(
                "view definition must be a SELECT or WITH statement"
            )
        if name in self._table_names():
            raise TableExists(f"{self.name}.{name} (a table has this name)")
        views = self._views_state()
        if name in views and not or_replace:
            raise ViewExists(f"{self.name}.{name}")
        st = self._state
        cfg = {"sql": sql, "created_version": self.bucket.manifest.version}
        views[name] = cfg
        st.changes.record(
            "set_view", self.name, name, cfg, touched=[("schema", self.name)]
        )
        self.tx._audit_event(
            st, "create_view", f"{self.bucket.name}/{self.name}/{name}"
        )

    def drop_view(self, name: str) -> None:
        views = self._views_state()
        if name not in views:
            raise MissingView(f"{self.name}.{name}")
        del views[name]
        st = self._state
        st.changes.record(
            "drop_view", self.name, name, touched=[("schema", self.name)]
        )
        self.tx._audit_event(
            st, "drop_view", f"{self.bucket.name}/{self.name}/{name}"
        )

    def views(self) -> dict:
        """Name -> {"sql", "created_version"} (a copy)."""
        return {k: dict(v) for k, v in self._views_state().items()}

    def view_sql(self, name: str) -> str:
        views = self._views_state()
        if name not in views:
            raise MissingView(f"{self.name}.{name}")
        return views[name]["sql"]

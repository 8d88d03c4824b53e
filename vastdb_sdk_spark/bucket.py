"""Bucket: top-level container + snapshot scope.

Reference: vastdb/bucket.py:19-73 — ``tx.bucket(name)`` returns a Bucket;
``bucket.create_schema / schema / schemas`` manage schemas;
``bucket.snapshot(name) / snapshots()`` expose point-in-time views stored
under ``.snapshot/<name>`` (vastdb/_internal.py:1238-1264). Here a snapshot
is a named pointer to an immutable manifest version.
"""

from __future__ import annotations

from .catalog.manifest import Manifest
from .errors import MissingSchema, MissingSnapshot, SchemaExists


class Bucket:
    def __init__(
        self,
        name: str,
        tx,
        snapshot_manifest: Manifest | None = None,
        snapshot_name: str | None = None,
    ):
        self.name = name
        self.tx = tx
        # non-None => this Bucket is a read-only snapshot view
        self._snapshot_manifest = snapshot_manifest
        # reference exposes snapshots as named objects under .snapshot/<name>
        self.snapshot_name = snapshot_name

    def __repr__(self) -> str:
        tag = " snapshot" if self._snapshot_manifest is not None else ""
        return f"Bucket({self.name!r}{tag})"

    # -- manifest access ---------------------------------------------------
    @property
    def _state(self):
        return self.tx._state(self.name)

    @property
    def manifest(self) -> Manifest:
        if self._snapshot_manifest is not None:
            return self._snapshot_manifest
        return self._state.manifest

    @property
    def readonly(self) -> bool:
        return self._snapshot_manifest is not None

    # -- schemas -----------------------------------------------------------
    def create_schema(self, name: str, fail_if_exists: bool = True):
        from .schema import Schema

        st = self._state
        try:
            st.manifest.create_schema(name)
        except SchemaExists:
            if fail_if_exists:
                raise
            return Schema(name, self)
        st.changes.record("create_schema", name, touched=[("schema", name)])
        self.tx._audit_event(st, "create_schema", f"{self.name}/{name}")
        return Schema(name, self)

    def schema(self, name: str, fail_if_missing: bool = True):
        from .schema import Schema

        if name not in self.manifest.schemas:
            if fail_if_missing:
                raise MissingSchema(name)
            return None
        return Schema(name, self)

    def list_schemas(
        self,
        next_key: int = 0,
        name_prefix: str = "",
        exact_match: bool = False,
        max_keys: int | None = None,
    ) -> tuple[list, int, bool]:
        """One page of top-level schemas under the reference's listing
        protocol (vastdb/_internal.py:1188-1236): returns
        ``(schemas, next_key, is_truncated)``; pass the returned
        ``next_key`` back in to continue."""
        from .catalog.listing import paginate_names
        from .schema import Schema

        names = sorted(n for n in self.manifest.schemas if "/" not in n)
        if max_keys is None:  # session-wide default (Session(page_size=))
            max_keys = self.tx._session.page_size
        page, key, truncated = paginate_names(
            names, next_key, max_keys, name_prefix, exact_match
        )
        return [Schema(n, self) for n in page], key, truncated

    def schemas(self, batch_size: int | None = None) -> list:
        """Top-level schemas (nested ones are reached via Schema.schemas()).
        Pages through list_schemas like the reference's pagination loop
        (vastdb/bucket.py:58-68)."""
        out: list = []
        next_key, truncated = 0, True
        while truncated:
            page, next_key, truncated = self.list_schemas(
                next_key=next_key, max_keys=batch_size
            )
            out.extend(page)
        return out

    # -- snapshots ---------------------------------------------------------
    def create_snapshot(self, name: str):
        """Record a named snapshot of the bucket's current committed state."""
        st = self._state
        version = st.manifest.version
        st.manifest.snapshots[name] = version
        st.changes.record("set_snapshot", name, version, touched=[("schema", f".snapshot/{name}")])
        self.tx._audit_event(st, "create_snapshot", f"{self.name}@{name}")
        return Bucket(self.name, self.tx, snapshot_manifest=st.store.load(version), snapshot_name=name)

    def snapshot(self, name: str, fail_if_missing: bool = True):
        """Open a read-only view of the bucket as of snapshot ``name``
        (reference: vastdb/bucket.py:43-56)."""
        st = self._state
        version = st.manifest.snapshots.get(name)
        if version is None:
            if fail_if_missing:
                raise MissingSnapshot(name)
            return None
        return Bucket(self.name, self.tx, snapshot_manifest=st.store.load(version), snapshot_name=name)

    def as_of(self, version: int | None = None, timestamp=None):
        """Read-only view of the bucket at an arbitrary committed manifest
        ``version``, or the last version committed at or before
        ``timestamp`` (datetime, ISO string, or epoch seconds) — the
        engine analog of ``VERSION/TIMESTAMP AS OF`` time travel. Named
        snapshots (``snapshot()``) are pointers into this same chain."""
        import datetime as _dt

        from .errors import InvalidArgument

        st = self._state
        if (version is None) == (timestamp is None):
            raise InvalidArgument("as_of needs exactly one of version/timestamp")
        if timestamp is not None:
            if isinstance(timestamp, str):
                ts = _dt.datetime.fromisoformat(timestamp)
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=_dt.timezone.utc)
                timestamp = ts.timestamp()
            elif isinstance(timestamp, _dt.datetime):
                ts = timestamp
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=_dt.timezone.utc)
                timestamp = ts.timestamp()
            version = st.store.version_at(float(timestamp))
        horizon = st.manifest.vacuum_horizon
        if version < horizon and version not in st.manifest.snapshots.values():
            raise MissingSnapshot(
                f"version {version} is below the vacuum horizon ({horizon}):"
                " a VACUUM may have deleted its data files; only"
                " named-snapshot versions remain readable past a vacuum"
            )
        return Bucket(
            self.name,
            self.tx,
            snapshot_manifest=st.store.load(version),
            snapshot_name=f"@v{version}",
        )

    def snapshots(self) -> list:
        st = self._state
        return [
            Bucket(self.name, self.tx, snapshot_manifest=st.store.load(v), snapshot_name=n)
            for n, v in sorted(st.manifest.snapshots.items())
        ]

    def drop_snapshot(self, name: str) -> None:
        st = self._state
        if name not in st.manifest.snapshots:
            raise MissingSnapshot(name)
        del st.manifest.snapshots[name]
        st.changes.record("drop_snapshot", name, touched=[("schema", f".snapshot/{name}")])

"""Pure-SQL front-end over the engine (engine extension).

The reference reaches SQL by handing Arrow data to DuckDB over ADBC
(vastdb/transaction.py:139-144 and the SDK README's SQL examples); the
SELECT tier here is Spark SQL over transaction-consistent views
(``Transaction.sql``). This module adds the *statement* tier on top:
DDL and DML text is dispatched onto the same manifest/DV machinery the
Python API uses, so ``INSERT``/``UPDATE``/``DELETE``/``MERGE`` issued as
SQL get identical transactional + merge-on-read semantics.

Design: no hand-written SQL expression grammar. Only the statement
*skeleton* (keywords + table identifiers) is recognized here; every
expression is parsed by Spark itself —

- column definition lists  -> ``StructType.fromDDL``
- WHERE / SET / scalar expressions -> ``F.expr`` (Catalyst's parser)
- VALUES rows and SELECT bodies    -> ``spark.sql``

so the accepted expression dialect is exactly Spark SQL, and anything
Catalyst can push down stays pushed down.

Identifier convention: tables are ``bucket.schema.table``, or
``schema.table`` when a ``default_bucket`` is given. In SELECT text,
any dotted identifier that resolves to an engine table is bound to a
transaction-consistent temp view; identifiers that don't resolve are
left for Spark (aliases, struct fields, registered views).
"""

from __future__ import annotations

import re

import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import InvalidArgument, MissingBucket, MissingSchema, MissingTable
from .types import spark_type_to_arrow

_IDENT = r"(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
_DOTTED = rf"{_IDENT}(?:\s*\.\s*{_IDENT}){{0,2}}"


def _unquote(part: str) -> str:
    part = part.strip()
    return part[1:-1] if part.startswith("`") else part


def _parts(dotted: str) -> list[str]:
    return [_unquote(p) for p in dotted.split(".")]


def _mask_literals(text: str) -> str:
    """Length-preserving copy with quoted-string contents blanked to ``_``
    so the keyword regexes (THEN/WHEN/WHERE/parens) can't be fooled by data
    that happens to contain them. Callers match patterns against the masked
    copy and span-slice the *original* for the real sub-texts (identical
    offsets by construction). Handles ``''``/``""`` doubled-quote escapes;
    backtick identifier contents are left intact so ``_IDENT`` still
    matches them."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if j + 1 < n and text[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = "_"
            i = j + 1
        elif ch == "`":
            j = text.find("`", i + 1)
            i = (j if j != -1 else n) + 1
        else:
            i += 1
    return "".join(out)


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/bracket depth 0, outside quotes."""
    out, buf, depth, quote = [], [], 0, None
    i = 0
    while i < len(text):
        ch = text[i]
        if quote:
            buf.append(ch)
            if ch == quote:
                # doubled quote is an escape inside SQL strings
                if i + 1 < len(text) and text[i + 1] == quote:
                    buf.append(text[i + 1])
                    i += 1
                else:
                    quote = None
        elif ch in "'\"`":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf or not out:
        out.append("".join(buf))
    return out


def _mask_strings_null(text: str) -> str:
    """Length-preserving copy with every quoted string — single OR double
    quoted, doubled-quote AND backslash escapes — replaced by NUL bytes,
    quotes included. NUL is a non-word character, so ``_DOTTED`` can
    neither match inside a masked literal nor stitch across its edges.
    The previous inline regex (single quotes, ''-escapes only) let a
    double-quoted Spark string literal like \"b.s.t\" — or the tail of
    'it\\'s b.s.t' — be rewritten as a table identifier."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == ch:
                    if j + 1 < n and text[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            end = min(j, n - 1)
            for k in range(i, end + 1):
                out[k] = "\0"
            i = end + 1
        else:
            i += 1
    return "".join(out)


def _view_token(*parts: str) -> str:
    """Identifier-safe, collision-free token for temp-view names: the
    readable parts keep only word characters, and an md5 of the
    NUL-joined ORIGINAL parts disambiguates — '_'-joining alone maps
    (a_b, c) and (a, b_c) to the same name, silently aliasing two
    different tables to one temp view."""
    import hashlib

    safe = "_".join(re.sub(r"[^A-Za-z0-9_]", "_", p) for p in parts)
    h = hashlib.md5("\0".join(parts).encode("utf-8")).hexdigest()[:8]
    return f"{safe}_{h}"


class SqlFrontend:
    """Statement dispatcher bound to one open transaction."""

    def __init__(self, tx, default_bucket: str | None = None):
        self._tx = tx
        self._default_bucket = default_bucket
        self._bn_cache: list[str] | None = None

    # -- identifier resolution --------------------------------------------

    def _bucket_names(self) -> list[str]:
        # memoized per STATEMENT (execute() clears it): without a default
        # bucket, every dotted identifier in SELECT text — including every
        # alias.col reference — pays a table AND a view resolution probe,
        # each scanning the warehouse; a statement with N identifiers over
        # B buckets did ~2*N*B listdir/manifest probes
        if self._bn_cache is not None:
            return self._bn_cache
        import os

        from .catalog.manifest import ManifestStore

        wh = self._tx._session.warehouse
        names = []
        for name in sorted(os.listdir(wh)):
            path = os.path.join(wh, name)
            if os.path.isdir(path) and ManifestStore(path).exists():
                names.append(name)
        self._bn_cache = names
        return names

    def _resolve_table(self, dotted: str, must_exist: bool = True):
        """``b.s.t`` or (with default bucket) ``s.t`` -> (bucket, schema,
        table_name, Table|None)."""
        parts = _parts(dotted)
        if len(parts) == 3:
            b, s, t = parts
        elif len(parts) == 2 and self._default_bucket:
            b, (s, t) = self._default_bucket, parts
        else:
            raise InvalidArgument(
                f"table identifier {dotted!r} must be bucket.schema.table"
                " (or schema.table with a default bucket)"
            )
        schema = self._tx.bucket(b).schema(s)
        if not must_exist:
            return b, s, t, None
        return b, s, t, schema.table(t)

    def _try_resolve(self, dotted: str):
        """Best-effort resolution for SELECT-text rewriting: returns a
        Table or None, never raises (aliases/struct paths won't resolve)."""
        parts = _parts(dotted)
        candidates = []
        if len(parts) == 3:
            candidates.append(tuple(parts))
        elif len(parts) == 2:
            if self._default_bucket:
                candidates.append((self._default_bucket, *parts))
            else:
                candidates.extend((b, *parts) for b in self._bucket_names())
        for b, s, t in candidates:
            try:
                return (b, s, t, self._tx.bucket(b).schema(s).table(t))
            except (MissingBucket, MissingSchema, MissingTable):
                continue
        return None

    def _try_resolve_view(self, dotted: str):
        """Best-effort LOGICAL VIEW resolution: returns (bucket, schema,
        view_name, view_sql) or None. Tables win over views (create_view
        enforces the shared namespace, so a collision cannot exist)."""
        parts = _parts(dotted)
        candidates = []
        if len(parts) == 3:
            candidates.append(tuple(parts))
        elif len(parts) == 2:
            if self._default_bucket:
                candidates.append((self._default_bucket, *parts))
            else:
                candidates.extend((b, *parts) for b in self._bucket_names())
        for b, s, v in candidates:
            try:
                views = self._tx.bucket(b).schema(s).views()
            except (MissingBucket, MissingSchema):
                continue
            if v in views:
                return (b, s, v, views[v]["sql"])
        return None

    # -- SELECT tier -------------------------------------------------------

    def _bind_views(self, text: str, _guard: tuple = ()) -> str:
        """Replace every dotted identifier in ``text`` that resolves to an
        engine table with a temp view pinned to this transaction's
        snapshot — and every identifier that resolves to a LOGICAL VIEW
        with its recursively-bound definition (so views can reference
        tables and other views; ``_guard`` carries the in-flight view
        chain and turns a cycle into a clean error). Quoted strings are
        masked first so literals like 'a.b.c' are never rewritten."""
        masked = _mask_strings_null(text)
        rewrites = {}
        for m in re.finditer(_DOTTED, masked):
            dotted = m.group()
            if "." not in dotted or dotted in rewrites:
                continue
            hit = self._try_resolve(dotted)
            if hit is None:
                vhit = self._try_resolve_view(dotted)
                if vhit is None:
                    continue
                b, s, v, vsql = vhit
                key = (b, s, v)
                if key in _guard:
                    chain = " -> ".join(".".join(k) for k in (*_guard, key))
                    raise InvalidArgument(f"circular view reference: {chain}")
                view = (
                    f"vastdb_lview_{_view_token(b, s, v)}"
                    f"_{self._tx.txid & 0xFFFF:04x}"
                )
                bound = self._bind_views(
                    self._bind_time_travel(vsql), (*_guard, key)
                )
                self._tx.spark.sql(bound).createOrReplaceTempView(view)
                rewrites[dotted] = view
                continue
            b, s, t, table = hit
            view = (
                f"vastdb_sql_{_view_token(b, s, t)}"
                f"_{self._tx.txid & 0xFFFF:04x}"
            )
            table.df().createOrReplaceTempView(view)
            rewrites[dotted] = view
        # longest first so `b.s.t` wins over a nested `s.t` match
        for dotted in sorted(rewrites, key=len, reverse=True):
            pattern = rf"(?<![\w.`]){re.escape(dotted)}(?![\w.`])"
            # apply on the live text but honor the literal mask: rebuild
            # positions from the masked copy
            out, last = [], 0
            for m in re.finditer(pattern, masked):
                out.append(text[last : m.start()])
                out.append(rewrites[dotted])
                last = m.end()
            out.append(text[last:])
            text = "".join(out)
            masked = _mask_strings_null(text)
        return text

    def _bind_time_travel(self, text: str) -> str:
        """Rewrite ``<table> [FOR] VERSION|TIMESTAMP AS OF <v>`` suffixes to
        temp views over the historical manifest (Bucket.as_of / named
        snapshots). Runs before _bind_views so the suffix is consumed
        together with the identifier."""
        masked = _mask_strings_null(text)
        pattern = (
            rf"(?is)({_DOTTED})\s+(?:FOR\s+)?"
            rf"(SYSTEM_VERSION|VERSION|SYSTEM_TIME|TIMESTAMP)\s+AS\s+OF\s+"
            rf"(\0+|\d+)"
        )
        for m in reversed(list(re.finditer(pattern, masked))):
            hit = self._try_resolve(m.group(1))
            if hit is None:
                continue
            b, s, t, _table = hit
            kind = m.group(2).upper()
            raw = text[m.start(3) : m.end(3)]
            bucket = self._tx.bucket(b)
            if raw.isdigit():
                if kind in ("SYSTEM_TIME", "TIMESTAMP"):
                    snap = bucket.as_of(timestamp=float(raw))
                else:
                    snap = bucket.as_of(version=int(raw))
            else:
                literal = raw[1:-1].replace("''", "'")
                if kind in ("SYSTEM_TIME", "TIMESTAMP"):
                    snap = bucket.as_of(timestamp=literal)
                else:
                    # quoted VERSION AS OF = named snapshot
                    snap = bucket.snapshot(literal)
            view = (
                f"vastdb_tt_{_view_token(b, s, t, kind, raw)}"
                f"_{self._tx.txid & 0xFFFF:04x}"
            )
            snap.schema(s).table(t).df().createOrReplaceTempView(view)
            text = text[: m.start()] + view + text[m.end() :]
        return text

    def _select(self, statement: str):
        return self._tx.spark.sql(self._bind_views(self._bind_time_travel(statement)))

    # -- statement dispatch ------------------------------------------------

    def execute(self, statement: str):
        """Execute one statement; returns a DataFrame for SELECT-like
        statements, None for DDL, and a result dict for DML."""
        stmt = statement.strip().rstrip(";").strip()
        self._bn_cache = None  # buckets may have been created/dropped
        head = stmt.split(None, 2)
        kw = head[0].upper() if head else ""
        if kw in ("SELECT", "WITH", "VALUES", "TABLE"):
            return self._select(stmt)
        if kw == "CREATE" and head[1].upper() in ("VIEW", "OR"):
            m = re.match(
                rf"(?is)CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+({_DOTTED})"
                rf"\s+AS\s+(.+)$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    f"cannot parse (expected CREATE [OR REPLACE] VIEW "
                    f"b.s.v AS SELECT ...): {stmt!r}"
                )
            b, sname, v, _ = self._resolve_table(m.group(2), must_exist=False)
            body = m.group(3).strip().rstrip(";")
            # bind-validate NOW: analysis (not execution) — bad SQL, missing
            # tables, or a self-reference fail the CREATE, not the first read
            self._tx.spark.sql(
                self._bind_views(self._bind_time_travel(body))
            )
            self._tx.bucket(b).schema(sname).create_view(
                v, body, or_replace=bool(m.group(1))
            )
            return None
        if kw == "DROP" and head[1].upper() == "VIEW" and not re.match(
            r"(?is)DROP\s+MATERIALIZED", stmt
        ):
            m = re.match(rf"(?is)DROP\s+VIEW\s+({_DOTTED})\s*$", stmt)
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            b, sname, v, _ = self._resolve_table(m.group(1), must_exist=False)
            self._tx.bucket(b).schema(sname).drop_view(v)
            return None
        if kw == "CREATE" and head[1].upper() == "SCHEMA":
            return self._create_schema(stmt)
        if kw == "DROP" and head[1].upper() == "SCHEMA":
            return self._drop_schema(stmt)
        if kw == "CREATE" and head[1].upper() == "TABLE":
            return self._create_table(stmt)
        if kw == "DROP" and head[1].upper() == "TABLE":
            return self._drop_table(stmt)
        if kw == "ALTER" and head[1].upper() == "TABLE":
            return self._alter_table(stmt)
        if kw == "OPTIMIZE":
            m = re.match(
                rf"(?is)OPTIMIZE\s+({_DOTTED})\s+DEDUP"
                rf"(?:\s+BY\s*\(([^()]*)\))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                cols = (
                    [_unquote(c) for c in _split_top(m.group(2))]
                    if m.group(2)
                    else None
                )
                before = table.count_rows()
                table.dedup_rows(columns=cols)
                return {
                    "optimized": "dedup",
                    "rows_removed": before - table.count_rows(),
                }
            m = re.match(
                rf"(?is)OPTIMIZE\s+({_DOTTED})\s+CAP\s+(\d+)\s+PER"
                rf"\s*\(([^()]*)\)\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                cols = [_unquote(c) for c in _split_top(m.group(3))]
                before = table.count_rows()
                table.cap_rows_per_group(cols, int(m.group(2)))
                return {
                    "optimized": "cap",
                    "rows_removed": before - table.count_rows(),
                }
            m = re.match(
                rf"(?is)OPTIMIZE\s+({_DOTTED})"
                rf"(?:\s+ZORDER\s+BY\s*\(([^()]*)\))?"
                rf"(?:\s+TARGET\s+FILE\s+ROWS\s+(\d+))?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            _, _, _, table = self._resolve_table(m.group(1))
            target = int(m.group(3)) if m.group(3) else 4_000_000
            if m.group(2):
                cols = [_unquote(c) for c in _split_top(m.group(2))]
                table.optimize(target_file_rows=target, zorder=cols)
                return {"optimized": "zorder", "cluster_by": cols}
            if table.entry.sorting_key:
                table.optimize(target_file_rows=target)
                return {"optimized": "sort"}
            n = table.compact(target_file_rows=target)
            return {"optimized": "compact", "files_compacted": n}
        if kw == "VACUUM":
            m = re.match(
                rf"(?is)VACUUM\s+({_IDENT})"
                rf"(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            deleted = self._tx._session.vacuum(
                _unquote(m.group(1)),
                retain_versions=int(m.group(2)) if m.group(2) else None,
            )
            return {"deleted_files": len(deleted)}
        if kw == "RESTORE":
            m = re.match(
                rf"(?is)RESTORE\s+TABLE\s+({_DOTTED})\s+TO\s+"
                rf"(?:SYSTEM_)?(VERSION|TIME|TIMESTAMP)\s+AS\s+OF\s+"
                rf"('(?:[^']|'')*'|\d+)\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            b, _, _, table = self._resolve_table(m.group(1))
            raw = m.group(3)
            kind = m.group(2).upper()
            if raw.isdigit() and kind == "VERSION":
                version = int(raw)
            elif raw.startswith("'") and kind == "VERSION":
                # quoted VERSION AS OF = NAMED SNAPSHOT, same as SELECT
                # time travel (_bind_time_travel); routing it to
                # as_of(timestamp=...) crashed in fromisoformat
                literal = raw[1:-1].replace("''", "'")
                version = self._tx.bucket(b).snapshot(literal).manifest.version
            else:
                literal = raw[1:-1].replace("''", "'") if raw.startswith("'") else raw
                ts = float(literal) if not raw.startswith("'") else literal
                version = self._tx.bucket(b).as_of(timestamp=ts).manifest.version
            table.restore(version)
            return {"restored_to_version": version}
        if kw == "TRUNCATE":
            m = re.match(
                rf"(?is)TRUNCATE\s+(?:TABLE\s+)?({_DOTTED})\s*$", stmt
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            _, _, _, table = self._resolve_table(m.group(1))
            table.delete_where(F.lit(True))
            return {"truncated": True}
        if kw == "COPY":
            m = re.match(
                rf"(?is)COPY\s+({_DOTTED})\s+TO\s+'([^']+)'"
                rf"(?:\s+FORMAT\s+(\w+))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                fmt = (m.group(3) or "parquet").lower()
                table.export_files(m.group(2), format=fmt)
                return {"exported": m.group(2), "format": fmt}
            m = re.match(
                rf"(?is)COPY\s+({_DOTTED})\s+FROM\s+'([^']+)'"
                rf"(?:\s+FORMAT\s+(\w+))?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected COPY b.s.t TO 'path' or "
                    f"COPY b.s.t FROM 'path' [FORMAT JSON|CSV|ORC|PARQUET]): {stmt!r}"
                )
            _, _, _, table = self._resolve_table(m.group(1))
            fmt = (m.group(3) or "parquet").lower()
            import glob as _glob

            paths = sorted(_glob.glob(m.group(2))) or [m.group(2)]
            if fmt == "parquet":
                # zero-copy registration, same path as Table.import_files
                table.import_files(paths)
                return {"imported_files": len(paths)}
            if fmt not in ("json", "csv", "orc"):
                raise InvalidArgument(
                    f"COPY FROM format must be JSON, CSV, ORC or PARQUET, "
                    f"got {fmt!r}"
                )
            # text formats convert through the distributed reader with the
            # schema pinned to the TABLE's (drift -> loud cast error, same
            # contract as streaming.ingest.stream_ingest_files)
            from .types import arrow_schema_to_spark

            opts = {"header": "true"} if fmt == "csv" else {}
            df = (
                self._tx.spark.read.options(**opts)
                .schema(arrow_schema_to_spark(table.arrow_schema))
                .format(fmt)
                .load(paths)
            )
            return {"rows_inserted": table.insert_df(df)}
        if kw == "SHOW":
            m = re.match(
                rf"(?is)SHOW\s+CHANGES\s+({_DOTTED})\s+FROM\s+(\d+)"
                rf"(?:\s+TO\s+(\d+))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                return table.read_changes(
                    int(m.group(2)),
                    int(m.group(3)) if m.group(3) else None,
                )
            return self._show(stmt)
        if kw == "CREATE" and head[1].upper() == "PROJECTION":
            m = re.match(
                rf"(?is)CREATE\s+PROJECTION\s+({_IDENT})\s+ON\s+({_DOTTED})"
                rf"\s*\(\s*SORTED\s*\(([^()]*)\)"
                rf"(?:\s*,\s*UNSORTED\s*\(([^()]*)\))?\s*\)\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected CREATE PROJECTION p ON b.s.t "
                    f"(SORTED (c1, ...) [, UNSORTED (c2, ...)])): {stmt!r}"
                )
            _, _, _, table = self._resolve_table(m.group(2))
            sorted_cols = [_unquote(c) for c in _split_top(m.group(3))]
            unsorted_cols = (
                [_unquote(c) for c in _split_top(m.group(4))]
                if m.group(4)
                else []
            )
            table.create_projection(_unquote(m.group(1)), sorted_cols, unsorted_cols)
            return {"created_projection": _unquote(m.group(1))}
        if kw == "CREATE" and head[1].upper() == "MATERIALIZED":
            m = re.match(
                rf"(?is)CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+ON\s+"
                rf"({_DOTTED})\s+GROUP\s+BY\s*\((.*?)\)"
                rf"\s+AGG\s*\((.*)\)(?:\s+BUCKETS\s+(\d+))?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected CREATE MATERIALIZED VIEW v ON "
                    "b.s.t GROUP BY (c1, ...) AGG (out=fn(col), n=count) "
                    f"[BUCKETS k]): {stmt!r}"
                )
            _, _, _, table = self._resolve_table(m.group(2))
            group_by: list = []
            for item in _split_top(m.group(3)):
                bm = re.match(
                    rf"(?is)\s*({_IDENT})\s*=\s*bucket\(\s*({_IDENT})\s*,"
                    rf"\s*(\d+)\s*\)\s*$",
                    item,
                )
                if bm:  # time-bucket key: alias=bucket(col, step_us)
                    group_by.append(
                        (_unquote(bm.group(1)), _unquote(bm.group(2)),
                         int(bm.group(3)))
                    )
                else:
                    group_by.append(_unquote(item))
            aggs: dict = {}
            for item in _split_top(m.group(4)):
                am = re.match(
                    rf"(?is)\s*({_IDENT})\s*=\s*(?:(count)|(\w+)\s*\(\s*"
                    rf"({_IDENT})\s*\))\s*$",
                    item,
                )
                if not am:
                    raise InvalidArgument(
                        f"cannot parse AGG item (expected out=count or "
                        f"out=fn(col)): {item!r}"
                    )
                if am.group(2):
                    aggs[_unquote(am.group(1))] = "count"
                else:
                    aggs[_unquote(am.group(1))] = (
                        am.group(3).lower(),
                        _unquote(am.group(4)),
                    )
            table.create_materialized_view(
                _unquote(m.group(1)),
                group_by,
                aggs,
                num_buckets=int(m.group(5)) if m.group(5) else 16,
            )
            return {"created_matview": _unquote(m.group(1))}
        if kw == "DROP" and head[1].upper() == "MATERIALIZED":
            m = re.match(
                rf"(?is)DROP\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+ON\s+"
                rf"({_DOTTED})\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            _, _, _, table = self._resolve_table(m.group(2))
            table.materialized_view(_unquote(m.group(1))).drop()
            return {"dropped_matview": _unquote(m.group(1))}
        if kw == "DROP" and head[1].upper() == "PROJECTION":
            m = re.match(
                rf"(?is)DROP\s+PROJECTION\s+({_IDENT})\s+ON\s+({_DOTTED})\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            _, _, _, table = self._resolve_table(m.group(2))
            table.projection(_unquote(m.group(1))).drop()
            return {"dropped_projection": _unquote(m.group(1))}
        if kw == "BUILD":
            m = re.match(
                rf"(?is)BUILD\s+COLUMN\s+INDEX\s+ON\s+({_DOTTED})"
                rf"\s*\(\s*({_IDENT})\s*\)"
                rf"(?:\s+FPP\s+([0-9.]+))?(?:\s+SEED\s+(\d+))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                return table.build_column_index(
                    _unquote(m.group(2)),
                    fpp=float(m.group(3)) if m.group(3) else 0.01,
                    seed=int(m.group(4)) if m.group(4) else 42,
                )
            m = re.match(
                rf"(?is)BUILD\s+VECTOR\s+INDEX\s+ON\s+({_DOTTED})"
                rf"(?:\s+KIND\s+(\w+))?"
                rf"(?:\s+CENTROIDS\s+(\d+))?"
                rf"(?:\s+SUBSPACES\s+(\d+))?"
                rf"(?:\s+CODES\s+(\d+))?"
                rf"(?:\s+SEED\s+(\d+))?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected BUILD VECTOR INDEX ON b.s.t "
                    "[KIND IVF|PQ|IVFPQ] [CENTROIDS n] [SUBSPACES m] "
                    f"[CODES k] [SEED s]): {stmt!r}"
                )
            _, _, _, table = self._resolve_table(m.group(1))
            kind = (m.group(2) or "ivf").lower()
            table.build_vector_index(
                int(m.group(3)) if m.group(3) else 64,
                int(m.group(6)) if m.group(6) else 42,
                kind=kind,
                num_subspaces=int(m.group(4)) if m.group(4) else 8,
                num_codes=int(m.group(5)) if m.group(5) else 256,
            )
            return {"built_vector_index": kind}
        if kw == "DROP" and head[1].upper() == "COLUMN":
            m = re.match(
                rf"(?is)DROP\s+COLUMN\s+INDEX\s+ON\s+({_DOTTED})"
                rf"\s*\(\s*({_IDENT})\s*\)\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(f"cannot parse: {stmt!r}")
            _, _, _, table = self._resolve_table(m.group(1))
            table.drop_column_index(_unquote(m.group(2)))
            return {"dropped_column_index": _unquote(m.group(2))}
        if kw == "REFRESH":
            m = re.match(
                rf"(?is)REFRESH\s+COLUMN\s+INDEX\s+ON\s+({_DOTTED})"
                rf"\s*\(\s*({_IDENT})\s*\)\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                return table.refresh_column_index(_unquote(m.group(2)))
            m = re.match(
                rf"(?is)REFRESH\s+VECTOR\s+INDEX\s+ON\s+({_DOTTED})"
                rf"(?:\s+MODE\s+(\w+))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(1))
                return table.refresh_vector_index(
                    (m.group(2) or "auto").lower()
                )
            m = re.match(
                rf"(?is)REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+ON\s+"
                rf"({_DOTTED})(?:\s+MODE\s+(\w+))?\s*$",
                stmt,
            )
            if m:
                _, _, _, table = self._resolve_table(m.group(2))
                return table.materialized_view(_unquote(m.group(1))).refresh(
                    (m.group(3) or "auto").lower()
                )
            m = re.match(
                rf"(?is)REFRESH\s+PROJECTION\s+({_IDENT})\s+ON\s+({_DOTTED})"
                rf"(?:\s+MODE\s+(\w+))?\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected REFRESH VECTOR INDEX ON b.s.t "
                    "[MODE AUTO|INCREMENTAL|FULL], REFRESH PROJECTION p "
                    "ON b.s.t [MODE ...], or REFRESH MATERIALIZED VIEW v "
                    f"ON b.s.t [MODE ...]): {stmt!r}"
                )
            _, _, _, table = self._resolve_table(m.group(2))
            return table.projection(_unquote(m.group(1))).refresh(
                (m.group(3) or "auto").lower()
            )
        if kw == "SYNC":
            m = re.match(
                rf"(?is)SYNC\s+SIGNATURES\s+({_DOTTED})\s+FROM\s+({_DOTTED})"
                rf"(?:\s+ON\s*\(\s*({_IDENT})\s*,\s*({_IDENT})\s*\))?"
                rf"(?:\s+MODE\s+(AUTO|INCREMENTAL|FULL))?\s*$",
                stmt,
            )
            if m:
                from .sources.replicate import sync_minhash_signatures

                _, _, _, sig = self._resolve_table(m.group(1))
                _, _, _, src = self._resolve_table(m.group(2))
                return sync_minhash_signatures(
                    src,
                    sig,
                    id_col=_unquote(m.group(3)) if m.group(3) else "doc_id",
                    text_col=_unquote(m.group(4)) if m.group(4) else "text",
                    mode=(m.group(5) or "auto").lower(),
                )
            m = re.match(
                rf"(?is)SYNC\s+TABLE\s+({_DOTTED})\s+FROM\s+({_DOTTED})"
                rf"\s+ON\s*\(([^()]*)\)\s*$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    "cannot parse (expected SYNC TABLE b.s.dst FROM "
                    "b.s.src ON (key1, ...), or SYNC SIGNATURES b.s.sig "
                    "FROM b.s.src [ON (id_col, text_col)] "
                    f"[MODE AUTO|INCREMENTAL|FULL]): {stmt!r}"
                )
            from .sources.replicate import sync_table

            _, _, _, dst = self._resolve_table(m.group(1))
            _, _, _, src = self._resolve_table(m.group(2))
            keys = [_unquote(c) for c in _split_top(m.group(3))]
            return sync_table(src, dst, keys)
        if kw == "EXPLAIN":
            m = re.match(
                r"(?is)EXPLAIN\s+(FORMATTED\s+|EXTENDED\s+|CODEGEN\s+|"
                r"COST\s+)?(SELECT\b.*|WITH\b.*)$",
                stmt,
            )
            if not m:
                raise InvalidArgument(
                    f"cannot parse (expected EXPLAIN [FORMATTED|EXTENDED|"
                    f"CODEGEN|COST] SELECT ...): {stmt!r}"
                )
            mode = (m.group(1) or "FORMATTED ").strip()
            bound = self._bind_views(self._bind_time_travel(m.group(2)))
            return self._tx.spark.sql(f"EXPLAIN {mode} {bound}")
        if kw in ("DESCRIBE", "DESC"):
            return self._describe(stmt)
        if kw == "INSERT":
            return self._insert(stmt)
        if kw == "DELETE":
            return self._delete(stmt)
        if kw == "UPDATE":
            return self._update(stmt)
        if kw == "MERGE":
            return self._merge(stmt)
        raise InvalidArgument(f"unsupported SQL statement: {stmt[:60]!r}")

    def execute_script(self, script: str) -> list:
        """Run ``;``-separated statements in order; returns each result."""
        return [
            self.execute(s)
            for s in _split_top(script, ";")
            if s.strip()
        ]

    # -- DDL ---------------------------------------------------------------

    def _create_schema(self, stmt: str):
        m = re.match(
            rf"(?is)CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?({_DOTTED})\s*$", stmt
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        parts = _parts(m.group(2))
        if len(parts) == 2:
            b, s = parts
        elif len(parts) == 1 and self._default_bucket:
            b, s = self._default_bucket, parts[0]
        else:
            raise InvalidArgument("CREATE SCHEMA needs bucket.schema")
        self._tx.bucket(b).create_schema(s, fail_if_exists=not m.group(1))
        return None

    def _drop_schema(self, stmt: str):
        m = re.match(rf"(?is)DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?({_DOTTED})\s*$", stmt)
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        parts = _parts(m.group(2))
        if len(parts) == 2:
            b, s = parts
        elif len(parts) == 1 and self._default_bucket:
            b, s = self._default_bucket, parts[0]
        else:
            raise InvalidArgument("DROP SCHEMA needs bucket.schema")
        try:
            self._tx.bucket(b).schema(s).drop()
        except MissingSchema:
            if not m.group(1):
                raise
        return None

    def _create_table(self, stmt: str):
        if m := re.match(
            rf"(?is)CREATE\s+TABLE\s+({_DOTTED})\s+(?:SHALLOW\s+)?CLONE\s+"
            rf"({_DOTTED})\s*$",
            stmt,
        ):
            b, s, t, _ = self._resolve_table(m.group(1), must_exist=False)
            hit = self._try_resolve(m.group(2))
            if hit is None:
                raise InvalidArgument(f"CLONE source not found: {m.group(2)!r}")
            self._tx.bucket(b).schema(s).clone_table(hit[3], t)
            return None
        if m := re.match(
            rf"(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_DOTTED})\s+AS\s+"
            rf"(SELECT\s+.*|WITH\s+.*|TABLE\s+.*|VALUES\s+.*)$",
            stmt,
        ):
            # CTAS: schema inferred from the SELECT, then a plain insert_df
            b, s, t, _ = self._resolve_table(m.group(2), must_exist=False)
            src = self._select(m.group(3))
            arrow = pa.schema(
                [
                    pa.field(
                        f.name, spark_type_to_arrow(f.dataType), nullable=f.nullable
                    )
                    for f in src.schema.fields
                ]
            )
            schema = self._tx.bucket(b).schema(s)
            if m.group(1):
                try:
                    schema.table(t)
                    return None
                except MissingTable:
                    pass
            table = schema.create_table(t, arrow)
            n = table.insert_df(src)
            return {"inserted": n}
        m = re.match(
            rf"(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_DOTTED})\s*\((.*)\)\s*$",
            stmt,
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        b, s, t, _ = self._resolve_table(m.group(2), must_exist=False)
        # Spark's own DDL parser handles the column list, including nested
        # struct/array/map types and NOT NULL markers
        struct = T.StructType.fromDDL(m.group(3))
        arrow = pa.schema(
            [
                pa.field(f.name, spark_type_to_arrow(f.dataType), nullable=f.nullable)
                for f in struct.fields
            ]
        )
        schema = self._tx.bucket(b).schema(s)
        if m.group(1):
            try:
                return schema.table(t) and None
            except MissingTable:
                pass
        schema.create_table(t, arrow)
        return None

    def _drop_table(self, stmt: str):
        m = re.match(rf"(?is)DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_DOTTED})\s*$", stmt)
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        try:
            _, _, _, table = self._resolve_table(m.group(2))
        except MissingTable:
            if m.group(1):
                return None
            raise
        table.drop()
        return None

    def _alter_table(self, stmt: str):
        m = re.match(rf"(?is)ALTER\s+TABLE\s+({_DOTTED})\s+(.*)$", stmt)
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        _, _, _, table = self._resolve_table(m.group(1))
        action = m.group(2).strip()
        if am := re.match(rf"(?is)RENAME\s+TO\s+({_IDENT})\s*$", action):
            table.rename(_unquote(am.group(1)))
            return None
        if am := re.match(
            rf"(?is)RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$", action
        ):
            table.rename_column(_unquote(am.group(1)), _unquote(am.group(2)))
            return None
        if am := re.match(rf"(?is)ADD\s+COLUMN\s+(.*)$", action):
            struct = T.StructType.fromDDL(am.group(1))
            for f in struct.fields:
                table.add_column(
                    pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
                )
            return None
        if am := re.match(rf"(?is)DROP\s+COLUMN\s+({_IDENT})\s*$", action):
            table.drop_column(_unquote(am.group(1)))
            return None
        raise InvalidArgument(f"unsupported ALTER TABLE action: {action!r}")

    # -- catalog statements ------------------------------------------------

    def _like_to_prefix(self, like: str | None) -> str:
        """The listing protocol supports prefix match; accept LIKE patterns
        of the form 'prefix%' (or a bare literal = exact prefix)."""
        if like is None:
            return ""
        pat = like[1:-1].replace("''", "'")
        if pat.endswith("%"):
            pat = pat[:-1]
        if "%" in pat or "_" in pat:
            raise InvalidArgument(
                "only 'prefix%' LIKE patterns are supported in SHOW"
            )
        return pat

    def _show(self, stmt: str):
        spark = self._tx.spark
        like = r"(?:\s+LIKE\s+('(?:[^']|'')*'))?"
        if m := re.match(
            rf"(?is)SHOW\s+SCHEMAS(?:\s+IN\s+({_IDENT}))?{like}\s*$", stmt
        ):
            b = _unquote(m.group(1)) if m.group(1) else self._default_bucket
            if not b:
                raise InvalidArgument("SHOW SCHEMAS needs IN <bucket>")
            prefix = self._like_to_prefix(m.group(2))
            names = [
                s.name
                for s in self._tx.bucket(b).schemas()
                if s.name.startswith(prefix)
            ]
            return spark.createDataFrame(
                [(b, n) for n in names], "bucket STRING, schema_name STRING"
            )
        if m := re.match(
            rf"(?is)SHOW\s+TABLES(?:\s+IN\s+({_DOTTED}))?{like}\s*$", stmt
        ):
            if not m.group(1):
                raise InvalidArgument("SHOW TABLES needs IN <bucket.schema>")
            parts = _parts(m.group(1))
            if len(parts) == 2:
                b, s = parts
            elif len(parts) == 1 and self._default_bucket:
                b, s = self._default_bucket, parts[0]
            else:
                raise InvalidArgument("SHOW TABLES needs IN bucket.schema")
            prefix = self._like_to_prefix(m.group(2))
            names, _, _ = self._tx.bucket(b).schema(s).list_tables(
                name_prefix=prefix, names_only=True, max_keys=1_000_000
            )
            return spark.createDataFrame(
                [(b, s, n) for n in names],
                "bucket STRING, schema_name STRING, table_name STRING",
            )
        if m := re.match(rf"(?is)SHOW\s+COLUMNS\s+IN\s+({_DOTTED})\s*$", stmt):
            _, _, _, table = self._resolve_table(m.group(1))
            return spark.createDataFrame(
                [(n,) for n in table.retrieve_column_names()], "col_name STRING"
            )
        if m := re.match(rf"(?is)SHOW\s+VIEWS\s+IN\s+({_DOTTED})\s*$", stmt):
            parts = _parts(m.group(1))
            if len(parts) == 2:
                b, sname = parts
            elif len(parts) == 1 and self._default_bucket:
                b, sname = self._default_bucket, parts[0]
            else:
                raise InvalidArgument(
                    f"SHOW VIEWS IN expects bucket.schema: {stmt!r}"
                )
            views = self._tx.bucket(b).schema(sname).views()
            return spark.createDataFrame(
                [(n, cfg["sql"]) for n, cfg in sorted(views.items())]
                or [],
                "view_name STRING, sql STRING",
            )
        if m := re.match(
            rf"(?is)SHOW\s+MATERIALIZED\s+VIEWS\s+ON\s+({_DOTTED})\s*$", stmt
        ):
            _, _, _, table = self._resolve_table(m.group(1))
            rows = [
                (
                    mv.name,
                    ", ".join(mv.group_by),
                    ", ".join(
                        f"{o}={fn}({src})" if src else f"{o}={fn}"
                        for o, (fn, src) in mv.aggs.items()
                    ),
                    mv.stale,
                    mv.get_stats().num_rows,
                )
                for mv in table.materialized_views()
            ]
            return spark.createDataFrame(
                rows,
                "view_name STRING, group_by STRING, aggs STRING, "
                "stale BOOLEAN, num_groups LONG",
            )
        if m := re.match(
            rf"(?is)SHOW\s+COLUMN\s+INDEXES\s+ON\s+({_DOTTED})\s*$", stmt
        ):
            _, _, _, table = self._resolve_table(m.group(1))
            rows = [
                (col, cfg["kind"], float(cfg["fpp"]),
                 ";".join(
                     cfg.get("sidecars")
                     or ([cfg["sidecar"]] if cfg.get("sidecar") else [])
                 ))
                for col, cfg in sorted(table.column_indexes().items())
            ]
            return spark.createDataFrame(
                rows,
                "column STRING, kind STRING, fpp DOUBLE, sidecar STRING",
            )
        raise InvalidArgument(f"unsupported SHOW statement: {stmt[:60]!r}")

    def _describe(self, stmt: str):
        spark = self._tx.spark
        if m := re.match(
            rf"(?is)(?:DESCRIBE|DESC)\s+HISTORY\s+({_DOTTED})\s*$", stmt
        ):
            _, _, _, table = self._resolve_table(m.group(1))
            return table.history()
        if m := re.match(
            rf"(?is)(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?({_DOTTED})\s*$", stmt
        ):
            _, _, _, table = self._resolve_table(m.group(1))
            from .types import arrow_type_to_spark, storage_arrow_type

            rows = [
                (
                    f.name,
                    arrow_type_to_spark(storage_arrow_type(f.type)).simpleString(),
                    f.nullable,
                )
                for f in table.arrow_schema
            ]
            return spark.createDataFrame(
                rows, "col_name STRING, data_type STRING, nullable BOOLEAN"
            )
        raise InvalidArgument(f"cannot parse: {stmt!r}")

    # -- DML ---------------------------------------------------------------

    def _insert(self, stmt: str):
        m = re.match(
            rf"(?is)INSERT\s+INTO\s+({_DOTTED})\s*(\(([^)]*)\))?\s*(VALUES\s+.*|SELECT\s+.*|WITH\s+.*|TABLE\s+.*)$",
            stmt,
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        _, _, _, table = self._resolve_table(m.group(1))
        names = [_unquote(c) for c in _split_top(m.group(3))] if m.group(3) else None
        src = self._select(m.group(4))
        arrow = table.arrow_schema
        if names is None:
            if len(src.columns) != len(arrow.names):
                raise InvalidArgument(
                    f"INSERT has {len(src.columns)} columns, table has"
                    f" {len(arrow.names)}"
                )
            names = arrow.names
        elif len(names) != len(src.columns):
            raise InvalidArgument("INSERT column list does not match source arity")
        else:
            # every listed name must be a real column: an unknown name
            # would pass the arity check, never be read by the projection
            # below, and its VALUE would silently vanish (the intended
            # column filled with NULL)
            unknown = [c for c in names if c not in set(arrow.names)]
            if unknown:
                raise InvalidArgument(
                    f"INSERT column(s) not in table: {unknown}; have"
                    f" {list(arrow.names)}"
                )
        src = src.toDF(*names)
        from .types import arrow_type_to_spark, storage_arrow_type

        cols = []
        for f in arrow:
            spark_t = arrow_type_to_spark(storage_arrow_type(f.type))
            if f.name in names:
                cols.append(F.col(f.name).cast(spark_t).alias(f.name))
            else:
                cols.append(F.lit(None).cast(spark_t).alias(f.name))
        n = table.insert_df(src.select(*cols))
        return {"inserted": n}

    def _delete(self, stmt: str):
        m = re.match(
            rf"(?is)DELETE\s+FROM\s+({_DOTTED})(?:\s+WHERE\s+(.*))?$", stmt
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        _, _, _, table = self._resolve_table(m.group(1))
        pred = F.expr(m.group(2)) if m.group(2) else F.lit(True)
        table.delete_where(pred)
        return {"deleted": True}

    def _update(self, stmt: str):
        m = re.match(
            rf"(?is)UPDATE\s+({_DOTTED})\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
            _mask_literals(stmt),  # ' WHERE ' inside a SET literal is data
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        _, _, _, table = self._resolve_table(m.group(1))
        assignments = {}
        for item in _split_top(stmt[m.start(2):m.end(2)]):
            am = re.match(rf"(?s)\s*({_IDENT})\s*=\s*(.*)$", item)
            if not am:
                raise InvalidArgument(f"cannot parse SET item: {item!r}")
            assignments[_unquote(am.group(1))] = F.expr(am.group(2).strip())
        pred = (
            F.expr(stmt[m.start(3):m.end(3)]) if m.group(3) else F.lit(True)
        )
        table.update_where(pred, assignments)
        return {"updated": True}

    def _merge(self, stmt: str):
        """Delta-style MERGE on Table.merge(): equi-key ON; ``WHEN MATCHED
        [AND guard] THEN UPDATE SET *`` / ``UPDATE SET col = expr, ...`` /
        ``DELETE``; ``WHEN NOT MATCHED [AND guard] THEN INSERT *`` /
        ``INSERT (cols) VALUES (exprs)``; ``WHEN NOT MATCHED BY SOURCE
        [AND guard] THEN UPDATE SET col = expr`` / ``DELETE`` (full-sync
        merges). Guards/SET/VALUES expressions are
        Spark SQL, parsed by Catalyst against the joined frame — qualify
        ambiguous columns with the target/source aliases (defaults: the
        bare table names)."""
        # All keyword/paren regexes run against the literal-masked copy so
        # WHEN/THEN/ON/parens inside string data can't derail clause
        # splitting; sub-texts fed to Catalyst are span-sliced from stmt.
        masked = _mask_literals(stmt)
        m = re.match(
            rf"(?is)MERGE\s+INTO\s+({_DOTTED})(?:\s+(?:AS\s+)?(?!USING\b)({_IDENT}))?"
            rf"\s+USING\s+(\((?:[^()]|\([^()]*\))*\)|{_DOTTED})"
            rf"(?:\s+(?:AS\s+)?(?!ON\b)({_IDENT}))?"
            rf"\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            masked,
        )
        if not m:
            raise InvalidArgument(f"cannot parse: {stmt!r}")
        _, _, tname, target = self._resolve_table(m.group(1))
        target_alias = _unquote(m.group(2)) if m.group(2) else tname
        src_text = stmt[m.start(3):m.end(3)].strip()
        source_alias = _unquote(m.group(4)) if m.group(4) else None
        if src_text.startswith("("):
            source = self._select(src_text[1:-1])
        else:
            hit = self._try_resolve(src_text)
            if hit is None:
                raise InvalidArgument(f"USING table not found: {src_text!r}")
            source = hit[3].df()
            if source_alias is None:
                source_alias = _parts(src_text)[-1]
        on = []
        for clause in re.split(r"(?i)\s+AND\s+", m.group(5)):
            em = re.match(
                rf"(?s)\s*(?:{_IDENT}\s*\.\s*)?({_IDENT})\s*=\s*"
                rf"(?:{_IDENT}\s*\.\s*)?({_IDENT})\s*$",
                clause,
            )
            if not em or _unquote(em.group(1)) != _unquote(em.group(2)):
                raise InvalidArgument(
                    f"MERGE ON must be equi-joins on same-named keys: {clause!r}"
                )
            on.append(_unquote(em.group(1)))
        matched_clauses = []
        not_matched_clauses = []
        nmbs_clauses = []

        def _parse_set(text):
            assignments = {}
            for item in _split_top(text):
                am = re.match(
                    rf"(?s)\s*(?:{_IDENT}\s*\.\s*)?({_IDENT})\s*=\s*(.*)$", item
                )
                if not am:
                    raise InvalidArgument(f"cannot parse SET item: {item!r}")
                assignments[_unquote(am.group(1))] = F.expr(am.group(2).strip())
            return assignments

        otail, mtail = stmt[m.start(6):], masked[m.start(6):]
        # coverage check: finditer SKIPS unparseable text (a WHEN clause
        # missing THEN, say) and would silently execute the merge with
        # the surviving subset of clauses — committing wrong data with
        # no error. Every character of the WHEN-tail must belong to a
        # parsed clause.
        covered = 0
        for wm in re.finditer(
            r"(?is)WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+(?:SOURCE|TARGET))?"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(.*?)(?=\s+WHEN\s+(?:NOT\s+)?MATCHED\b|\s*$)",
            mtail,
        ):
            if otail[covered:wm.start()].strip():
                raise InvalidArgument(
                    "cannot parse MERGE clause (missing THEN?): "
                    f"{otail[covered:wm.start()].strip()!r}"
                )
            covered = wm.end()
            action = otail[wm.start(4):wm.end(4)].strip()
            action_masked = mtail[wm.start(4):wm.end(4)].strip()
            guard = (
                F.expr(otail[wm.start(3):wm.end(3)].strip())
                if wm.group(3)
                else None
            )
            by_source = bool(
                wm.group(2) and wm.group(2).upper().rstrip().endswith("SOURCE")
            )
            if by_source and not wm.group(1):
                raise InvalidArgument(
                    "MATCHED BY SOURCE is not valid; use WHEN NOT MATCHED BY SOURCE"
                )
            if wm.group(1) and not by_source:
                # WHEN NOT MATCHED [BY TARGET] -> insert clause
                if re.match(r"(?is)INSERT\s+\*\s*$", action_masked):
                    not_matched_clauses.append((guard, None))
                elif im := re.match(
                    r"(?is)INSERT\s*\(([^()]*)\)\s*VALUES\s*\((.*)\)\s*$",
                    action_masked,
                ):
                    cols = [
                        _unquote(c)
                        for c in _split_top(action[im.start(1):im.end(1)])
                    ]
                    vals = [
                        v.strip()
                        for v in _split_top(action[im.start(2):im.end(2)])
                    ]
                    if len(cols) != len(vals):
                        raise InvalidArgument(
                            "INSERT column list does not match VALUES arity"
                        )
                    not_matched_clauses.append(
                        (guard, {c: F.expr(v) for c, v in zip(cols, vals)})
                    )
                else:
                    raise InvalidArgument(
                        f"WHEN NOT MATCHED supports INSERT * or INSERT (cols)"
                        f" VALUES (exprs): {action!r}"
                    )
                continue
            dest = nmbs_clauses if by_source else matched_clauses
            if re.match(r"(?is)DELETE\s*$", action_masked):
                dest.append(("delete", guard, None))
            elif re.match(r"(?is)UPDATE\s+SET\s+\*\s*$", action_masked):
                dest.append(("update", guard, None))
            elif um := re.match(r"(?is)UPDATE\s+SET\s+(.*)$", action_masked):
                dest.append(("update", guard, _parse_set(action[um.start(1):um.end(1)])))
            else:
                raise InvalidArgument(f"unsupported MERGE action: {action!r}")
        if otail[covered:].strip():
            raise InvalidArgument(
                "cannot parse MERGE clause (missing THEN?): "
                f"{otail[covered:].strip()!r}"
            )
        return target.merge(
            source,
            on,
            when_matched=None,
            when_not_matched=None,
            matched_clauses=matched_clauses,
            not_matched_clauses=not_matched_clauses,
            not_matched_by_source_clauses=nmbs_clauses,
            target_alias=target_alias,
            source_alias=source_alias,
        )

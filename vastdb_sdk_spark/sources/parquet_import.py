"""Create-table-from-parquet-files with schema-merge policies.

Reference: ``vastdb.util.create_table_from_files`` (vastdb/util.py:18-43)
infers a unified schema from the parquet footers and then imports the files
zero-copy. Three merge policies (vastdb/util.py:46-83):

- ``strict``      — all files must have byte-identical schemas;
- ``containment`` — one file's schema must contain all others (the widest
                    wins; reference default);
- ``union``       — field-by-field union; conflicting types on the same
                    field name fail.

Footer reads are driver-side below ``table.FOOTER_SCAN_PARALLEL_MIN``
files (one footer per file — exactly what the reference's client does) and
run as one metadata-only Spark job above it, mirroring ``import_files``:
a 100k-file onboarding reads footers in tasks, and only the schemas (one
IPC blob per file) return to the driver for the merge-policy pass.
"""

from __future__ import annotations

import enum
from typing import Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from ..errors import InvalidArgument


class ImportMergePolicy(enum.Enum):
    strict = "strict"
    containment = "containment"
    union = "union"


def _schema_contains(big: pa.Schema, small: pa.Schema) -> bool:
    for f in small:
        idx = big.get_field_index(f.name)
        if idx < 0 or big.field(idx).type != f.type:
            return False
    return True


def merge_schemas(
    schemas: list[pa.Schema], policy: ImportMergePolicy
) -> pa.Schema:
    if not schemas:
        raise InvalidArgument("no input files")
    if policy is ImportMergePolicy.strict:
        for s in schemas[1:]:
            if s != schemas[0]:
                raise InvalidArgument("strict merge: schemas differ")
        return schemas[0]
    if policy is ImportMergePolicy.containment:
        widest = schemas[0]
        for s in schemas[1:]:
            if _schema_contains(widest, s):
                continue
            if _schema_contains(s, widest):
                widest = s
                continue
            raise InvalidArgument("containment merge: no schema contains the others")
        return widest
    # union
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name in fields:
                if fields[f.name].type != f.type:
                    raise InvalidArgument(
                        f"union merge: conflicting types for {f.name!r}: "
                        f"{fields[f.name].type} vs {f.type}"
                    )
            else:
                fields[f.name] = f
                order.append(f.name)
    return pa.schema([fields[n] for n in order])


def create_table_from_files(
    schema,
    table_name: str,
    parquet_files: Iterable[str],
    schema_merge_func: ImportMergePolicy | str = ImportMergePolicy.containment,
):
    """Infer a unified schema from the files' footers, create the table, and
    import the files zero-copy (reference: vastdb/util.py:18-43)."""
    if isinstance(schema_merge_func, str):
        schema_merge_func = ImportMergePolicy(schema_merge_func)
    paths = list(parquet_files)
    from ..table import FOOTER_SCAN_PARALLEL_MIN

    if len(paths) >= FOOTER_SCAN_PARALLEL_MIN:
        sc = schema.tx.spark.sparkContext
        slices = min(len(paths), sc.defaultParallelism * 4)
        blobs = (
            sc.parallelize(paths, slices)
            .map(lambda p: pq.ParquetFile(p).schema_arrow.serialize().to_pybytes())
            .collect()
        )
        file_schemas = [pa.ipc.read_schema(pa.py_buffer(b)) for b in blobs]
    else:
        file_schemas = [pq.ParquetFile(p).schema_arrow for p in paths]
    unified = merge_schemas(file_schemas, schema_merge_func)
    table = schema.create_table(table_name, unified, create_imports_table=True)
    table.import_files(paths)
    return table

"""Arrow <-> Spark type system mapping.

The reference engine is Arrow-native end-to-end (schemas are
``pyarrow.Schema``, vastdb/schema.py:85-87; supported types enumerated in
vastdb/_internal.py:2614-2765 and docs/types.md). Spark lacks a few of those
types (unsigned ints, float16, time32/64, timestamp[ns]); per SURVEY.md §1.3
we widen them on the way *in* and restore the original Arrow type on the way
*out* using metadata kept in the catalog manifest, so ``select()`` round-trips
the user's schema exactly (watch-list item 3/4 in SURVEY.md §7).

Validation mirrors the reference's gate (vastdb/_ibis_support.py:8-28):
null / dictionary / union / date64 columns raise ``NotSupportedSchema``
(vastdb/tests/test_tables.py:474-523).
"""

from __future__ import annotations

import base64

import pyarrow as pa
from pyspark.sql import types as T

from .errors import NotSupportedSchema

# ---------------------------------------------------------------------------
# validation


def _validate_type(dt: pa.DataType, path: str) -> None:
    if pa.types.is_null(dt) or pa.types.is_dictionary(dt) or pa.types.is_union(dt):
        raise NotSupportedSchema(f"unsupported Arrow type at {path!r}: {dt}")
    if pa.types.is_date64(dt):
        raise NotSupportedSchema(f"date64 not supported (use date32) at {path!r}")
    if pa.types.is_large_string(dt) or pa.types.is_large_binary(dt):
        raise NotSupportedSchema(f"large_* types not supported at {path!r}: {dt}")
    if pa.types.is_list(dt) or pa.types.is_fixed_size_list(dt):
        _validate_type(dt.value_type, f"{path}.item")
    elif pa.types.is_map(dt):
        _validate_type(dt.key_type, f"{path}.key")
        _validate_type(dt.item_type, f"{path}.value")
    elif pa.types.is_struct(dt):
        for f in dt:
            _validate_type(f.type, f"{path}.{f.name}")


def validate_supported_schema(schema: pa.Schema) -> None:
    """Reject schemas the reference would reject (NotSupportedSchema)."""
    for field in schema:
        _validate_type(field.type, field.name)


# ---------------------------------------------------------------------------
# Arrow -> Spark


def arrow_type_to_spark(dt: pa.DataType) -> T.DataType:
    """Map one Arrow type to its Spark SQL type (SURVEY.md §1.3 table)."""
    if pa.types.is_boolean(dt):
        return T.BooleanType()
    if pa.types.is_int8(dt):
        return T.ByteType()
    if pa.types.is_int16(dt):
        return T.ShortType()
    if pa.types.is_int32(dt):
        return T.IntegerType()
    if pa.types.is_int64(dt):
        return T.LongType()
    # unsigned: widen (no unsigned types in Spark SQL)
    if pa.types.is_uint8(dt):
        return T.ShortType()
    if pa.types.is_uint16(dt):
        return T.IntegerType()
    if pa.types.is_uint32(dt):
        return T.LongType()
    if pa.types.is_uint64(dt):
        return T.DecimalType(20, 0)
    if pa.types.is_float16(dt):
        return T.FloatType()
    if pa.types.is_float32(dt):
        return T.FloatType()
    if pa.types.is_float64(dt):
        return T.DoubleType()
    if pa.types.is_string(dt):
        return T.StringType()
    if pa.types.is_binary(dt) or pa.types.is_fixed_size_binary(dt):
        return T.BinaryType()
    if pa.types.is_decimal(dt):
        return T.DecimalType(dt.precision, dt.scale)
    if pa.types.is_date32(dt):
        return T.DateType()
    if pa.types.is_timestamp(dt):
        return T.TimestampNTZType() if dt.tz is None else T.TimestampType()
    if pa.types.is_time(dt):
        # no TimeType in Spark -> integer ticks + metadata
        return T.LongType()
    if pa.types.is_list(dt) or pa.types.is_fixed_size_list(dt):
        return T.ArrayType(arrow_type_to_spark(dt.value_type))
    if pa.types.is_map(dt):
        return T.MapType(arrow_type_to_spark(dt.key_type), arrow_type_to_spark(dt.item_type))
    if pa.types.is_struct(dt):
        return T.StructType(
            [T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable) for f in dt]
        )
    raise NotSupportedSchema(f"unsupported Arrow type: {dt}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable) for f in schema]
    )


def spark_type_to_arrow(dt: T.DataType) -> pa.DataType:
    """Map a Spark SQL type to the Arrow type the engine stores for it —
    the inverse of :func:`arrow_type_to_spark` restricted to Spark-native
    types (used by the SQL front-end's ``CREATE TABLE`` path, where column
    types arrive as Spark DDL text)."""
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.utf8()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return pa.timestamp("us")
    if isinstance(dt, T.ArrayType):
        return pa.list_(spark_type_to_arrow(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(spark_type_to_arrow(dt.keyType), spark_type_to_arrow(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [
                pa.field(f.name, spark_type_to_arrow(f.dataType), nullable=f.nullable)
                for f in dt.fields
            ]
        )
    raise NotSupportedSchema(f"unsupported Spark type for engine storage: {dt}")


# ---------------------------------------------------------------------------
# storage schema: the Arrow schema actually written to parquet, chosen so the
# Spark parquet reader reproduces arrow_schema_to_spark() exactly. Types with
# no Spark equivalent are widened here; the catalog keeps the *original*
# schema and select() casts results back (SURVEY.md §7 watch-list 3).


def storage_arrow_type(dt: pa.DataType) -> pa.DataType:
    if pa.types.is_uint8(dt):
        return pa.int16()
    if pa.types.is_uint16(dt):
        return pa.int32()
    if pa.types.is_uint32(dt):
        return pa.int64()
    if pa.types.is_uint64(dt):
        return pa.decimal128(20, 0)
    if pa.types.is_float16(dt):
        return pa.float32()
    if pa.types.is_time(dt):
        return pa.int64()
    if pa.types.is_timestamp(dt):
        return pa.timestamp("us", tz="UTC") if dt.tz is not None else pa.timestamp("us")
    if pa.types.is_fixed_size_binary(dt):
        return pa.binary()
    if pa.types.is_list(dt) or pa.types.is_fixed_size_list(dt):
        return pa.list_(storage_arrow_type(dt.value_type))
    if pa.types.is_map(dt):
        return pa.map_(storage_arrow_type(dt.key_type), storage_arrow_type(dt.item_type))
    if pa.types.is_struct(dt):
        return pa.struct(
            [pa.field(f.name, storage_arrow_type(f.type), f.nullable) for f in dt]
        )
    return dt


def storage_arrow_schema(schema: pa.Schema) -> pa.Schema:
    return pa.schema(
        [pa.field(f.name, storage_arrow_type(f.type), f.nullable) for f in schema]
    )


def _cast_col(col: pa.ChunkedArray, target: pa.DataType) -> pa.ChunkedArray:
    """Cast with two-step bridges for pairs pyarrow can't cast directly
    (time32 <-> int64)."""
    if col.type == target:
        return col
    if pa.types.is_time32(col.type) and pa.types.is_int64(target):
        return col.cast(pa.int32()).cast(pa.int64())
    if pa.types.is_int64(col.type) and pa.types.is_time32(target):
        return col.cast(pa.int32()).cast(target)
    return col.cast(target)


def cast_to_storage(tbl: pa.Table, storage: pa.Schema) -> pa.Table:
    """Cast an input Arrow table to the storage schema (column order of the
    storage schema; missing nullable columns filled with nulls)."""
    arrays = []
    for f in storage:
        if f.name in tbl.schema.names:
            col = _cast_col(tbl.column(f.name), f.type)
        else:
            col = pa.nulls(len(tbl), f.type)
        arrays.append(col)
    return pa.Table.from_arrays(arrays, schema=storage)


# ---------------------------------------------------------------------------
# manifest (de)serialization — Arrow schema is the source of truth


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(data: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(data)))


# ---------------------------------------------------------------------------
# Spark/Arrow result -> original Arrow types


def cast_table_to_schema(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast a result table (possibly widened by Spark) back to the catalog's
    Arrow schema so select() returns the user's original types."""
    cols = []
    fields = []
    for name in tbl.schema.names:
        col = tbl.column(name)
        if name in target.names:
            f = target.field(name)
            col = _cast_col(col, f.type)
            fields.append(pa.field(name, f.type, f.nullable))
        else:
            fields.append(pa.field(name, col.type))
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))

"""Type-system round-trips — reference pattern: full scalar type matrix
(vastdb/tests/test_tables.py:389-471) with select() returning the original
Arrow types (SURVEY.md §7 watch-list 3/4)."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.types import (
    arrow_schema_to_spark,
    storage_arrow_schema,
)

ALLTYPES = pa.schema(
    [
        ("tb", pa.bool_()),
        ("a1", pa.int8()),
        ("a2", pa.int16()),
        ("a3", pa.int32()),
        ("a4", pa.int64()),
        ("b", pa.float32()),
        ("c", pa.float64()),
        ("s", pa.string()),
        ("d", pa.decimal128(7, 3)),
        ("bin", pa.binary()),
        ("date", pa.date32()),
        ("ts6", pa.timestamp("us")),
        ("l", pa.list_(pa.int32())),
        ("m", pa.map_(pa.string(), pa.float64())),
        ("st", pa.struct([("x", pa.int16())])),
    ]
)

ROWS = pa.table(
    {
        "tb": [True, False, None],
        "a1": pa.array([1, 2, None], pa.int8()),
        "a2": pa.array([10, 20, None], pa.int16()),
        "a3": pa.array([100, 200, None], pa.int32()),
        "a4": pa.array([1000, 2000, None], pa.int64()),
        "b": pa.array([0.5, 1.5, None], pa.float32()),
        "c": pa.array([0.25, 1.25, None], pa.float64()),
        "s": ["x", "yy", None],
        "d": pa.array([Decimal("1234.567"), Decimal("-1.001"), None], pa.decimal128(7, 3)),
        "bin": pa.array([b"\x00\x01", b"zz", None], pa.binary()),
        "date": pa.array([dt.date(2020, 1, 1), dt.date(1999, 12, 31), None], pa.date32()),
        "ts6": pa.array(
            [dt.datetime(2021, 6, 1, 12, 0, 0, 123456), dt.datetime(1970, 1, 2), None],
            pa.timestamp("us"),
        ),
        "l": pa.array([[1, 2], [], None], pa.list_(pa.int32())),
        "m": pa.array([[("k", 1.5)], [], None], pa.map_(pa.string(), pa.float64())),
        "st": pa.array([{"x": 1}, {"x": 2}, None], pa.struct([("x", pa.int16())])),
    }
)


def test_alltypes_roundtrip(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("at", ALLTYPES)
        t.insert(ROWS)
        got = t.select().read_all().sort_by([("a4", "ascending")])
        expected = ROWS.sort_by([("a4", "ascending")])
        assert got.schema == ALLTYPES
        for name in ALLTYPES.names:
            assert got.column(name).equals(expected.column(name)), name


def test_per_type_equality_predicates(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("at", ALLTYPES)
        t.insert(ROWS)
        checks = [
            (D.tb == True, 1),  # noqa: E712
            (D.a1 == 1, 1),
            (D.a4 > 1500, 1),
            (D.b < 1.0, 1),
            (D.s == "yy", 1),
            (D.d == Decimal("1234.567"), 1),
            (D.date == dt.date(2020, 1, 1), 1),
            (D.ts6 >= dt.datetime(2021, 1, 1), 1),
        ]
        for pred, n in checks:
            assert t.select(columns=["a4"], predicate=pred).read_all().num_rows == n, pred


def test_widened_types_roundtrip(clean_schema):
    """uint8/16/32/64 + float16 + time types have no Spark equivalent; the
    engine widens in storage and restores original Arrow types on select
    (SURVEY.md §1.3)."""
    import numpy as np

    schema = pa.schema(
        [
            ("u1", pa.uint8()),
            ("u2", pa.uint16()),
            ("u4", pa.uint32()),
            ("u8", pa.uint64()),
            ("f2", pa.float16()),
            ("t32", pa.time32("ms")),
            ("t64", pa.time64("us")),
        ]
    )
    data = pa.table(
        {
            "u1": pa.array([0, 255], pa.uint8()),
            "u2": pa.array([0, 65535], pa.uint16()),
            "u4": pa.array([0, 4294967295], pa.uint32()),
            "u8": pa.array([0, 18446744073709551615], pa.uint64()),
            "f2": pa.array(np.array([0.5, 1.5], dtype=np.float16), pa.float16()),
            "t32": pa.array([1000, 2000], pa.time32("ms")),
            "t64": pa.array([123456, 654321], pa.time64("us")),
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("u", schema)
        t.insert(data)
        got = t.select().read_all().sort_by([("u1", "ascending")])
        assert got.schema == schema
        for name in schema.names:
            assert got.column(name).equals(data.column(name)), name
        # predicates on widened types still work
        assert t.select(predicate=(D.u8 > 1)).read_all().num_rows == 1


def test_storage_schema_mapping_unit():
    st = storage_arrow_schema(
        pa.schema([("u", pa.uint64()), ("f", pa.float16()), ("t", pa.time32("s"))])
    )
    assert st.field("u").type == pa.decimal128(20, 0)
    assert st.field("f").type == pa.float32()
    assert st.field("t").type == pa.int64()


def test_spark_schema_mapping_unit():
    sp = arrow_schema_to_spark(ALLTYPES)
    assert sp["a1"].dataType.typeName() == "byte"
    assert sp["d"].dataType.simpleString() == "decimal(7,3)"
    assert sp["m"].dataType.typeName() == "map"

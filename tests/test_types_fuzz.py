"""Hypothesis fuzz for the Arrow type boundary (SURVEY.md watch-list #3/#4):
random schemas — scalars, widened unsigned ints, decimals, timestamps,
and depth-2 nesting (list/struct/map) — with random data must round-trip
create_table -> insert -> select bit-exactly, ORIGINAL Arrow schema
included (the engine stores widened/annotated physical types and restores
the logical type at the Arrow boundary)."""

from __future__ import annotations

import datetime
import decimal

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import vastdb_sdk_spark as vastdb


def _vals(strategy):
    return st.lists(st.one_of(st.none(), strategy), min_size=3, max_size=8)


_EPOCH = datetime.datetime(2000, 1, 1)
_SCALARS: list[tuple[pa.DataType, st.SearchStrategy]] = [
    (pa.bool_(), st.booleans()),
    (pa.int8(), st.integers(-128, 127)),
    (pa.int16(), st.integers(-(2**15), 2**15 - 1)),
    (pa.int32(), st.integers(-(2**31), 2**31 - 1)),
    (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
    (pa.uint8(), st.integers(0, 255)),
    (pa.uint16(), st.integers(0, 2**16 - 1)),
    (pa.uint32(), st.integers(0, 2**32 - 1)),
    (pa.float32(), st.floats(width=32, allow_nan=False)),
    (pa.float64(), st.floats(allow_nan=False)),
    (pa.string(), st.text(max_size=12)),
    (pa.binary(), st.binary(max_size=12)),
    (
        pa.decimal128(12, 3),
        st.decimals(
            min_value=decimal.Decimal("-999999.999"),
            max_value=decimal.Decimal("999999.999"),
            places=3,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
    (pa.date32(), st.dates(datetime.date(1970, 1, 1), datetime.date(2100, 1, 1))),
    (
        pa.timestamp("us"),
        st.integers(0, 10**15).map(lambda us: _EPOCH + datetime.timedelta(microseconds=us)),
    ),
]

scalar_col = st.sampled_from(_SCALARS)

# depth-2 composites built over a scalar
composite_col = scalar_col.flatmap(
    lambda tv: st.sampled_from(
        [
            (pa.list_(tv[0]), st.lists(st.one_of(st.none(), tv[1]), max_size=4)),
            (
                pa.struct([("x", tv[0]), ("y", pa.int32())]),
                st.fixed_dictionaries(
                    {"x": st.one_of(st.none(), tv[1]), "y": st.integers(-100, 100)}
                ),
            ),
            (
                pa.map_(pa.string(), tv[0]),
                st.lists(
                    st.tuples(st.text(min_size=1, max_size=4), st.one_of(st.none(), tv[1])),
                    max_size=3,
                    unique_by=lambda kv: kv[0],
                ),
            ),
        ]
    )
)

column = st.one_of(scalar_col, composite_col)


@st.composite
def schema_and_rows(draw):
    cols = draw(st.lists(column, min_size=1, max_size=4))
    n = draw(st.integers(min_value=1, max_value=6))
    fields = [("id", pa.int64())] + [
        (f"c{i}", t) for i, (t, _) in enumerate(cols)
    ]
    data: dict = {"id": list(range(n))}
    for i, (_, vstrat) in enumerate(cols):
        data[f"c{i}"] = [draw(st.one_of(st.none(), vstrat)) for _ in range(n)]
    schema = pa.schema(fields)
    return pa.table(data, schema=schema)


@pytest.fixture(scope="module")
def typefuzz(spark, tmp_path_factory):
    session = vastdb.connect(
        str(tmp_path_factory.mktemp("typefuzz") / "wh"), spark=spark
    )
    session.create_bucket("b")
    with session.transaction() as tx:
        tx.bucket("b").create_schema("s")
    return session


_counter = iter(range(10**6))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schema_and_rows())
def test_fuzz_schema_roundtrip(typefuzz, tbl):
    name = f"t{next(_counter)}"
    with typefuzz.transaction() as tx:
        t = tx.bucket("b").schema("s").create_table(name, tbl.schema)
        t.insert(tbl)
        got = t.select().read_all().sort_by("id")
    expected = tbl.sort_by("id")
    assert got.schema == tbl.schema, f"{got.schema} != {tbl.schema}"
    for col in tbl.column_names:
        assert got.column(col).equals(expected.column(col)), (
            f"column {col}: {got.column(col)} != {expected.column(col)}"
        )

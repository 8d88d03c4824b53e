"""Predicate dialect vs a pyarrow.compute oracle — the reference's core test
pattern (vastdb/tests/test_tables.py:553-629, 1010-1133: every pushdown
operator checked as select(pred) == expected.filter(pc_expr))."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import vastdb_sdk_spark as vastdb
from vastdb_sdk_spark import _ as D

FILTERS5 = pa.table(
    {
        "a": pa.array([111, 222, 333, 444, 555], pa.int32()),
        "b": pa.array([0.5, 1.5, 2.5, 3.5, 4.5], pa.float64()),
        "s": pa.array(["a", "bb", "ccc", None, "xyz"], pa.string()),
    }
)

STRINGS = pa.table(
    {
        "s": pa.array(["a", "ab", "abc", None, "abd", "α", "", "b"]),
        "i": pa.array(list(range(8)), pa.int16()),
    }
)


@pytest.fixture()
def t5(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("f5", FILTERS5.schema)
        t.insert(FILTERS5)
    return clean_schema


def _got(session, pred, table="f5"):
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table(table)
        return t.select(predicate=pred).read_all().sort_by("a" if table == "f5" else "i")


CASES = [
    (D.a == 222, pc.field("a") == 222),
    (D.a != 222, pc.field("a") != 222),
    (D.a < 333, pc.field("a") < 333),
    (D.a <= 333, pc.field("a") <= 333),
    (D.a > 333, pc.field("a") > 333),
    (D.a >= 333, pc.field("a") >= 333),
    (D.b.between(1.0, 3.0), (pc.field("b") >= 1.0) & (pc.field("b") <= 3.0)),
    (D.a.isin([111, 555, 999]), pc.field("a").isin([111, 555, 999])),
    (D.s.isnull(), pc.field("s").is_null()),
    (~D.s.isnull(), ~pc.field("s").is_null()),
    ((D.a > 111) & (D.b < 4.0), (pc.field("a") > 111) & (pc.field("b") < 4.0)),
    ((D.a == 111) | (D.a == 555), (pc.field("a") == 111) | (pc.field("a") == 555)),
    # reference forbids cross-column OR (single-column OR groups only,
    # _internal.py:280-283); we are a documented superset:
    ((D.a == 111) | (D.b > 4.0), (pc.field("a") == 111) | (pc.field("b") > 4.0)),
]


@pytest.mark.parametrize("ours,oracle", CASES, ids=[str(i) for i in range(len(CASES))])
def test_predicate_matrix(t5, ours, oracle):
    expected = FILTERS5.filter(oracle).sort_by("a")
    got = _got(t5, ours)
    assert got.equals(expected), f"{got.to_pydict()} != {expected.to_pydict()}"


@pytest.fixture()
def ts(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("str", STRINGS.schema)
        t.insert(STRINGS)
    return clean_schema


STR_CASES = [
    (D.s.startswith("a"), pc.starts_with(pc.field("s"), "a")),
    (D.s.startswith("ab"), pc.starts_with(pc.field("s"), "ab")),
    (D.s.startswith(""), pc.starts_with(pc.field("s"), "")),
    (D.s.startswith("α"), pc.starts_with(pc.field("s"), "α")),
    (D.s.contains("b"), pc.match_substring(pc.field("s"), "b")),
    (D.s.contains("bc"), pc.match_substring(pc.field("s"), "bc")),
    (D.s == "", pc.field("s") == ""),
]


@pytest.mark.parametrize("ours,oracle", STR_CASES, ids=[str(i) for i in range(len(STR_CASES))])
def test_string_predicates(ts, ours, oracle):
    expected = STRINGS.filter(oracle).sort_by("i")
    got = _got(ts, ours, table="str")
    assert got.equals(expected), f"{got.to_pydict()} != {expected.to_pydict()}"


def test_predicate_true_false(t5):
    with t5.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("f5")
        assert t.select(predicate=True).read_all().num_rows == 5
        empty = t.select(predicate=False).read_all()
        assert empty.num_rows == 0
        assert empty.schema.names == ["a", "b", "s"]  # schema preserved


def test_empty_isin_rejected(t5):
    with pytest.raises(vastdb.NotSupportedCommand):
        D.a.isin([])


def test_unknown_column_rejected(t5):
    with t5.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("f5")
        with pytest.raises(vastdb.InvalidArgument):
            t.select(predicate=(D.nope == 1)).read_all()


def test_struct_subfield_predicate(clean_schema):
    """Reference: vastdb/tests/test_nested.py:103-160."""
    schema = pa.schema(
        [
            ("x", pa.int64()),
            ("s", pa.struct([("x", pa.int16()), ("q", pa.struct([("q1", pa.string())]))])),
        ]
    )
    data = pa.table(
        {
            "x": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(
                [
                    {"x": 10, "q": {"q1": "hello"}},
                    {"x": 20, "q": {"q1": "world"}},
                    {"x": 30, "q": {"q1": "hello"}},
                ],
                schema.field("s").type,
            ),
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("nested", schema)
        t.insert(data)
        got = t.select(columns=["x"], predicate=(D.s["q"]["q1"] == "hello")).read_all()
        assert sorted(got.column("x").to_pylist()) == [1, 3]
        got2 = t.select(columns=["x"], predicate=(D.s["x"] > 15)).read_all()
        assert sorted(got2.column("x").to_pylist()) == [2, 3]


def test_predicate_only_columns_not_in_output(t5):
    """Columns referenced only by the predicate are scanned then dropped
    (reference: _internal.py:2858-2862)."""
    got = _got(t5, (D.b > 2.0))
    assert got.schema.names == ["a", "b", "s"]
    with t5.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("f5")
        got = t.select(columns=["a"], predicate=(D.b > 2.0)).read_all()
        assert got.schema.names == ["a"]
        assert sorted(got.column("a").to_pylist()) == [333, 444, 555]

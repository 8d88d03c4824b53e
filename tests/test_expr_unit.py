"""Pure unit tests (no Spark jobs) for the expression DSL and pruning math
— reference pattern 7 (vastdb/tests/test_util.py etc.)."""

import pyarrow as pa
import pytest

import vastdb_sdk_spark as vastdb
from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.expr import validate_predicate, to_spark_predicate
from vastdb_sdk_spark.plans.pruning import Interval, extract_intervals

SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("s", pa.struct([("x", pa.int32()), ("q", pa.struct([("q1", pa.string())]))])),
    ]
)


def test_bool_coercion_rejected():
    """`and`/`or`/`not` on expressions must raise (they silently coerce in
    naive DSLs); users must use &, |, ~."""
    with pytest.raises(TypeError):
        bool(D.a > 1)
    with pytest.raises(TypeError):
        (D.a > 1) and (D.a < 5)  # noqa: B015


def test_validate_paths():
    validate_predicate(D.s["q"]["q1"] == "x", SCHEMA)
    with pytest.raises(vastdb.InvalidArgument):
        validate_predicate(D.nope == 1, SCHEMA)
    with pytest.raises(vastdb.InvalidArgument):
        validate_predicate(D.a["sub"] == 1, SCHEMA)  # int has no subfield
    with pytest.raises(vastdb.InvalidArgument):
        validate_predicate(D.s["missing"] == 1, SCHEMA)


def test_true_false_shortcuts(spark):
    # (spark fixture needed: F.lit requires an active SparkContext)
    assert to_spark_predicate(None) is None
    assert to_spark_predicate(True) is None
    assert to_spark_predicate(False) is not None


def test_interval_math():
    iv = Interval(1, 10).intersect(Interval(5, 20))
    assert (iv.lo, iv.hi) == (5, 10)
    assert Interval().overlaps(-1e18, 1e18)
    assert not Interval(hi=3).overlaps(4, 9)
    assert Interval(lo=3).overlaps(3, 3)


def test_extract_between_and_not():
    ivs = extract_intervals(D.k.between(2, 8), "k")
    assert ivs and ivs[0].overlaps(5, 5) and not ivs[0].overlaps(9, 12)
    # NOT is conservatively unprunable
    assert extract_intervals(~(D.k > 5), "k") is None


def test_empty_and_intersection_prunes_everything():
    ivs = extract_intervals((D.k > 10) & (D.k < 5), "k")
    assert ivs is not None
    assert all(not iv.overlaps(-1000, 1000) for iv in ivs)


def test_arithmetic_predicates_never_prune():
    """Any arithmetic in a predicate must make the pruner bail (None =
    unconstrained), never mis-prune: (k+1) > 5 is NOT a bound on k."""
    for pred in [
        (D.k + 1) > 5,
        (2 * D.k) <= 10,
        (D.k / 2) == 3,
        (D.k % 7) == 0,
        (10 - D.k) < 4,
        (-D.k) < 0,
    ]:
        assert extract_intervals(pred, "k") is None
    # and arithmetic on ONE conjunct doesn't poison the other
    ivs = extract_intervals(((D.k + 1) > 5) & (D.k <= 100), "k")
    assert ivs and ivs[0].overlaps(100, 100) and not ivs[0].overlaps(101, 200)


def test_arithmetic_compiles_to_spark(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    pred = ((D.k * 2 + 1) % 3 == 0) & ((20 / (D.k + 1)) >= 4)
    rows = sorted(r.k for r in df.filter(pred.to_spark()).collect())
    # k in 0..9 with (2k+1)%3==0 and 20/(k+1)>=4: k=1 (3%3, 10>=4), k=4 (9%3, 4>=4)
    assert rows == [1, 4]


def test_connect_compat_kwargs(tmp_path):
    # reference signature: connect(endpoint=..., access=..., secret=...)
    s = vastdb.connect(
        str(tmp_path / "wh"), endpoint="http://x", access="a", secret="b", ssl_verify=False
    )
    assert s.warehouse.endswith("wh")

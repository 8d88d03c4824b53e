"""Property-based DML testing (SURVEY.md §5 pattern 5, strengthened with
hypothesis): random sequences of insert / delete_where / update_where /
merge are replayed against a plain-Python model, and after every committed
op the engine must match the model on values AND keep ``$row_id`` stable
for every surviving row — the core invariant of the merge-on-read DV
machinery (reference row-id stability contract:
vastdb/tests/test_tables.py:204-278)."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import vastdb_sdk_spark as vastdb

SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.float64()), ("s", pa.utf8())])


def _mk_rows(keys):
    return pa.table(
        {
            "a": pa.array(list(keys), pa.int64()),
            "b": pa.array([k * 0.5 for k in keys], pa.float64()),
            "s": pa.array([f"s{k}" for k in keys], pa.utf8()),
        }
    )


# one op = ("delete", mod, rem) | ("update", mod, rem, val) |
#          ("insert", batch_id) | ("merge", mod, rem, batch_id)
_ops = st.one_of(
    st.tuples(st.just("delete"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(
        st.just("update"),
        st.integers(2, 5),
        st.integers(0, 4),
        st.one_of(st.floats(-100, 100, allow_nan=False), st.none()),
    ),
    st.tuples(st.just("insert"), st.integers(0, 3)),
    st.tuples(st.just("merge"), st.integers(2, 5), st.integers(0, 4), st.integers(0, 3)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_ops, min_size=2, max_size=5))
def test_random_dml_matches_model_and_keeps_row_ids(spark, tmp_path_factory, ops):
    wh = tmp_path_factory.mktemp("prop_wh")
    session = vastdb.connect(str(wh), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        t = tx.bucket("b").create_schema("s1").create_table("t", SCHEMA)
        init_keys = list(range(10))
        ids = t.insert(_mk_rows(init_keys))
    # model: key -> [b, s, row_id]
    model = {
        k: [k * 0.5, f"s{k}", rid.as_py()] for k, rid in zip(init_keys, ids)
    }
    next_key = 100

    for op in ops:
        with session.transaction() as tx:
            t = tx.bucket("b").schema("s1").table("t")
            if op[0] == "delete":
                _, mod, rem = op
                t.delete_where((F.col("a") % mod) == rem)
                model = {k: v for k, v in model.items() if k % mod != rem}
            elif op[0] == "update":
                _, mod, rem, val = op
                t.update_where((F.col("a") % mod) == rem, {"b": val})
                for k, v in model.items():
                    if k % mod == rem:
                        v[0] = val
            elif op[0] == "insert":
                _, n = op
                keys = list(range(next_key, next_key + n))
                next_key += n
                new_ids = t.insert(_mk_rows(keys))
                for k, rid in zip(keys, new_ids):
                    model[k] = [k * 0.5, f"s{k}", rid.as_py()]
            else:  # merge: upsert existing rows (matched) + one new key
                _, mod, rem, n_new = op
                upd_keys = [k for k in model if k % mod == rem]
                new_keys = list(range(next_key, next_key + n_new))
                next_key += n_new
                src = spark.createDataFrame(
                    [(k, -1.25, f"m{k}") for k in upd_keys + new_keys],
                    "a long, b double, s string",
                )
                t.merge(src, on=["a"])
                for k in upd_keys:
                    model[k][0], model[k][1] = -1.25, f"m{k}"
                for k in new_keys:
                    model[k] = [-1.25, f"m{k}", None]  # id assigned by engine

        # verify after each commit: values match the model exactly and
        # previously-known row ids did not move
        with session.transaction() as tx:
            t = tx.bucket("b").schema("s1").table("t")
            got = t.select(internal_row_id=True).read_all().sort_by("a")
        got_rows = {
            a: (b, s_, rid)
            for a, b, s_, rid in zip(
                got["a"].to_pylist(),
                got["b"].to_pylist(),
                got["s"].to_pylist(),
                got["$row_id"].to_pylist(),
            )
        }
        assert set(got_rows) == set(model), "surviving key sets diverged"
        for k, (b_m, s_m, rid_m) in ((k, tuple(v)) for k, v in model.items()):
            b_g, s_g, rid_g = got_rows[k]
            assert b_g == pytest.approx(b_m) if b_m is not None else b_g is None
            assert s_g == s_m
            if rid_m is None:
                model[k][2] = rid_g  # first sighting of a merge-inserted row
            else:
                assert rid_g == rid_m, f"row id moved for key {k}"

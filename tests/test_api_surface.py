"""select_splits, SQL tier, features, spill-path streaming select."""

import pyarrow as pa
import pytest

import vastdb_sdk_spark as vastdb
from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.config import QueryConfig
from vastdb_sdk_spark.sources import create_table_from_files

SF = "/root/testdata/sf0.001"


def test_select_splits(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "t", pa.schema([("a", pa.int64())])
        )
        for i in range(4):  # four files
            t.insert(pa.table({"a": pa.array(range(i * 10, i * 10 + 10), pa.int64())}))
        readers = t.select_splits(num_splits=3)
        assert len(readers) == 3
        rows = []
        for r in readers:
            rows += r.read_all().column("a").to_pylist()
        assert sorted(rows) == list(range(0, 10)) + list(range(10, 20)) + list(
            range(20, 30)
        ) + list(range(30, 40))
        # with predicate
        readers = t.select_splits(predicate=(D.a >= 30), num_splits=2)
        got = sorted(sum((r.read_all().column("a").to_pylist() for r in readers), []))
        assert got == list(range(30, 40))


def test_sql_tier(clean_schema):
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        li = create_table_from_files(s, "li", [f"{SF}/lineitem.parquet"])
        ords = create_table_from_files(s, "ords", [f"{SF}/orders.parquet"])
        df = tx.sql(
            """
            SELECT o_orderpriority, COUNT(*) AS n
            FROM li JOIN ords ON l_orderkey = o_orderkey
            WHERE l_quantity > 45 GROUP BY o_orderpriority
            """,
            li=li,
            ords=ords,
        )
        rows = df.collect()
        assert sum(r.n for r in rows) > 0


def test_sql_sees_transaction_snapshot(clean_schema):
    data = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    tx1 = clean_schema.transaction()
    t1 = tx1.bucket("bkt").schema("s").table("t")
    t1.insert(data)  # uncommitted in tx1
    n = tx1.sql("SELECT COUNT(*) AS n FROM t", t=t1).collect()[0].n
    assert n == 6  # tx1 sees its own write
    tx2 = clean_schema.transaction()
    t2 = tx2.bucket("bkt").schema("s").table("t")
    n2 = tx2.sql("SELECT COUNT(*) AS n FROM t", t=t2).collect()[0].n
    assert n2 == 3  # tx2 does not
    tx1.rollback()
    tx2.rollback()


def test_features(session):
    f = session.features
    assert f.elysium and f.vector_index and f.sql_tier
    f.check_imports_table()  # no-raise contract


def test_spill_streaming_select(clean_schema):
    """Force the spill path with a tiny threshold and verify bounded
    streaming yields identical data and cleans up after itself."""
    import os

    data = pa.table({"a": pa.array(range(1000), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
        cfg = QueryConfig(spill_threshold_rows=10, limit_rows_per_sub_split=128)
        reader = t.select(config=cfg)
        got = reader.read_all()
        assert sorted(got.column("a").to_pylist()) == list(range(1000))
        tmp_root = os.path.join(tx._state("bkt").store.bucket_path, "_tmp")
        leftovers = os.listdir(tmp_root) if os.path.isdir(tmp_root) else []
        assert leftovers == []  # spill dir removed on exhaustion

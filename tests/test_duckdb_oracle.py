"""Engine scan + Spark SQL post-processing vs a DuckDB oracle — the
reference's pattern 3 (vastdb/tests/test_duckdb.py:12-29: vast filter
pushdown feeding DuckDB aggregation, checked against a pyarrow groupby).
Here the whole pipeline runs in the engine and DuckDB is the oracle."""

import duckdb
import pyarrow.parquet as pq

from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.sources import create_table_from_files

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_plus_aggregation(clean_schema):
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        t = create_table_from_files(s, "li", [f"{SF}/lineitem.parquet"])
        df = t.select_df(predicate=(D.l_quantity > 30))
        got = (
            df.groupBy("l_returnflag")
            .agg({"l_extendedprice": "sum", "*": "count"})
            .withColumnRenamed("sum(l_extendedprice)", "s")
            .withColumnRenamed("count(1)", "n")
            .collect()
        )
        got = {r.l_returnflag: (r.n, round(r.s, 2)) for r in got}
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS s
            FROM '{SF}/lineitem.parquet' WHERE l_quantity > 30 GROUP BY 1"""
    ).fetchall()
    expected = {r[0]: (r[1], r[2]) for r in exp}
    assert got == expected


def test_select_stream_matches_duckdb(clean_schema):
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        t = create_table_from_files(s, "orders", [f"{SF}/orders.parquet"])
        got = (
            t.select(columns=["o_orderkey"], predicate=D.o_orderstatus == "F")
            .read_all()
            .column("o_orderkey")
            .to_pylist()
        )
    con = duckdb.connect()
    exp = [
        r[0]
        for r in con.execute(
            f"SELECT o_orderkey FROM '{SF}/orders.parquet' WHERE o_orderstatus = 'F'"
        ).fetchall()
    ]
    assert sorted(got) == sorted(exp)


def test_arrow_export_roundtrip(clean_schema, tmp_path):
    """Reference S10: stream select -> parquet writer (README.md:221-228)."""
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        t = create_table_from_files(s, "nation", [f"{SF}/nation.parquet"])
        reader = t.select()
        out = tmp_path / "export.parquet"
        pq.write_table(reader.read_all(), out)
    assert pq.ParquetFile(out).metadata.num_rows == 25

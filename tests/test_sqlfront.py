"""SQL front-end (sqlfront.py): DDL/DML/SELECT statements dispatched onto
the engine. The reference reaches SQL via DuckDB over ADBC
(vastdb/transaction.py:139-144); here the statement tier is native, so
SQL-issued DML must show the exact transactional/merge-on-read behavior of
the Python API it delegates to."""

import pyarrow as pa
import pytest

import vastdb_sdk_spark as vastdb
from vastdb_sdk_spark.errors import InvalidArgument, MissingSchema, MissingTable


@pytest.fixture()
def sql_session(session):
    session.execute_sql("CREATE SCHEMA bkt.s")
    session.execute_sql(
        "CREATE TABLE bkt.s.t (a BIGINT, b DOUBLE, name STRING)"
    )
    session.execute_sql(
        "INSERT INTO bkt.s.t VALUES"
        " (1, 0.5, 'one'), (2, 1.5, 'two'), (3, 2.5, 'three')"
    )
    return session


def test_ddl_roundtrip(session):
    session.execute_sql("CREATE SCHEMA bkt.s")
    session.execute_sql(
        "CREATE TABLE bkt.s.t (a BIGINT NOT NULL, tags ARRAY<STRING>,"
        " meta STRUCT<k: STRING, v: INT>)"
    )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.arrow_schema.names == ["a", "tags", "meta"]
        assert not t.arrow_schema.field("a").nullable
        assert pa.types.is_list(t.arrow_schema.field("tags").type)
        assert pa.types.is_struct(t.arrow_schema.field("meta").type)
    # IF NOT EXISTS is a no-op on the existing table
    session.execute_sql("CREATE TABLE IF NOT EXISTS bkt.s.t (x INT)")
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("t").arrow_schema.names[0] == "a"
    session.execute_sql("DROP TABLE bkt.s.t")
    with session.transaction() as tx:
        with pytest.raises(MissingTable):
            tx.bucket("bkt").schema("s").table("t")
    session.execute_sql("DROP TABLE IF EXISTS bkt.s.t")  # silent
    session.execute_sql("DROP SCHEMA bkt.s")
    with session.transaction() as tx:
        with pytest.raises(MissingSchema):
            tx.bucket("bkt").schema("s")


def test_insert_and_select(sql_session):
    df = sql_session.execute_sql(
        "SELECT name, a + 1 AS a1 FROM bkt.s.t WHERE b > 1 ORDER BY a"
    )
    assert [(r.name, r.a1) for r in df.collect()] == [("two", 3), ("three", 4)]


def test_select_join_two_tables(sql_session):
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.dim (a BIGINT, label STRING);"
        "INSERT INTO bkt.s.dim VALUES (1, 'L1'), (2, 'L2')"
    )
    rows = sql_session.execute_sql(
        "SELECT t.name, d.label FROM bkt.s.t t JOIN bkt.s.dim d ON t.a = d.a"
        " ORDER BY t.a"
    ).collect()
    assert [(r.name, r.label) for r in rows] == [("one", "L1"), ("two", "L2")]


def test_string_literal_not_rewritten(sql_session):
    # a literal that looks like a table identifier must survive untouched
    rows = sql_session.execute_sql(
        "SELECT 'bkt.s.t' AS lit, count(*) AS n FROM bkt.s.t"
    ).collect()
    assert rows[0].lit == "bkt.s.t" and rows[0].n == 3


def test_default_bucket_two_part_names(sql_session):
    df = sql_session.execute_sql(
        "SELECT count(*) AS n FROM s.t", default_bucket="bkt"
    )
    assert df.collect()[0].n == 3


def test_insert_with_column_list(sql_session):
    sql_session.execute_sql("INSERT INTO bkt.s.t (a, name) VALUES (9, 'nine')")
    r = sql_session.execute_sql(
        "SELECT b, name FROM bkt.s.t WHERE a = 9"
    ).collect()[0]
    assert r.b is None and r.name == "nine"


def test_insert_select(sql_session):
    sql_session.execute_sql(
        "INSERT INTO bkt.s.t SELECT a + 10, b, upper(name) FROM bkt.s.t"
    )
    rows = sql_session.execute_sql(
        "SELECT name FROM bkt.s.t WHERE a > 10 ORDER BY a"
    ).collect()
    assert [r.name for r in rows] == ["ONE", "TWO", "THREE"]


def test_update_delete(sql_session):
    sql_session.execute_sql("UPDATE bkt.s.t SET b = b * 10 WHERE a >= 2")
    sql_session.execute_sql("DELETE FROM bkt.s.t WHERE name = 'three'")
    rows = sql_session.execute_sql(
        "SELECT a, b FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 0.5), (2, 15.0)]


def test_update_is_transactional(sql_session):
    # rollback inside an explicit transaction undoes SQL-issued DML
    with pytest.raises(RuntimeError):
        with sql_session.transaction() as tx:
            tx.execute_sql("DELETE FROM bkt.s.t WHERE a = 1")
            raise RuntimeError("abort")
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()[0].n
        == 3
    )


def test_alter_table(sql_session):
    sql_session.execute_sql(
        "ALTER TABLE bkt.s.t ADD COLUMN extra INT;"
        "ALTER TABLE bkt.s.t RENAME COLUMN extra TO bonus;"
    )
    with sql_session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert "bonus" in t.arrow_schema.names
    sql_session.execute_sql("ALTER TABLE bkt.s.t DROP COLUMN bonus")
    sql_session.execute_sql("ALTER TABLE bkt.s.t RENAME TO t2")
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t2").collect()[0].n
        == 3
    )


def test_merge_upsert(sql_session):
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.src VALUES (2, 99.0, 'TWO'), (7, 7.5, 'seven')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src AS s ON t.a = s.a"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = sql_session.execute_sql(
        "SELECT a, name FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.name) for r in rows] == [
        (1, "one"), (2, "TWO"), (3, "three"), (7, "seven"),
    ]


def test_merge_column_level_set(sql_session):
    """SET col = expr with alias-qualified references to both sides, plus
    INSERT (cols) VALUES (exprs) with NULL for unmentioned columns."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, delta DOUBLE, label STRING);"
        "INSERT INTO bkt.s.src VALUES (2, 10.0, 'TWO'), (7, 7.5, 'seven')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t AS tgt USING bkt.s.src AS s ON tgt.a = s.a"
        " WHEN MATCHED THEN UPDATE SET b = tgt.b + s.delta, name = lower(s.label)"
        " WHEN NOT MATCHED THEN INSERT (a, name) VALUES (s.a, concat('n-', s.label))"
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = sql_session.execute_sql(
        "SELECT a, b, name FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.b, r.name) for r in rows] == [
        (1, 0.5, "one"), (2, 11.5, "two"), (3, 2.5, "three"),
        (7, None, "n-seven"),
    ]


def test_merge_default_alias_is_table_name(sql_session):
    """Without AS aliases, the bare table names qualify columns."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.src VALUES (1, 100.0, 'ONE')"
    )
    sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src ON a = a"
        " WHEN MATCHED THEN UPDATE SET b = t.b + src.b"
    )
    r = sql_session.execute_sql("SELECT b FROM bkt.s.t WHERE a = 1").collect()[0]
    assert r.b == 100.5


def test_merge_conditional_clauses(sql_session):
    """WHEN MATCHED AND <guard> leaves non-qualifying matches untouched;
    WHEN NOT MATCHED AND <guard> drops non-qualifying source rows."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.src VALUES"
        " (1, -1.0, 'skip-update'), (2, 99.0, 'hit'),"
        " (8, -8.0, 'skip-insert'), (9, 9.0, 'new')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src AS s ON t.a = s.a"
        " WHEN MATCHED AND s.b > 0 THEN UPDATE SET *"
        " WHEN NOT MATCHED AND s.b > 0 THEN INSERT *"
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = sql_session.execute_sql(
        "SELECT a, name FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.name) for r in rows] == [
        (1, "one"), (2, "hit"), (3, "three"), (9, "new"),
    ]


def test_merge_multi_clause_first_match_wins(sql_session):
    """UPDATE and DELETE clauses in one MERGE, ordered: a row matching the
    first guard is updated even if it also matches the delete guard."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, flag STRING);"
        "INSERT INTO bkt.s.src VALUES (1, 'keep'), (2, 'drop'), (3, 'keep')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src AS s ON t.a = s.a"
        " WHEN MATCHED AND s.flag = 'keep' THEN UPDATE SET b = t.b + 100"
        " WHEN MATCHED THEN DELETE"
        " WHEN NOT MATCHED THEN INSERT *"
    )
    assert res == {"updated": 2, "deleted": 1, "inserted": 0}
    rows = sql_session.execute_sql(
        "SELECT a, b FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 100.5), (3, 102.5)]


def test_merge_bad_set_column_raises(sql_session):
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src2 (a BIGINT);"
        "INSERT INTO bkt.s.src2 VALUES (1)"
    )
    with pytest.raises(InvalidArgument):
        sql_session.execute_sql(
            "MERGE INTO bkt.s.t USING bkt.s.src2 AS s ON t.a = s.a"
            " WHEN MATCHED THEN UPDATE SET nonexistent = 1"
        )


def test_merge_using_subquery_delete(sql_session):
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING (SELECT 1 AS a) ON t.a = s.a"
        " WHEN MATCHED THEN DELETE"
    )
    assert res["deleted"] == 1
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()[0].n
        == 2
    )


def test_merge_not_matched_by_source(sql_session):
    """WHEN NOT MATCHED BY SOURCE routes target-only rows through ordered
    UPDATE/DELETE clauses (full sync semantics): guarded update marks the
    row, the unguarded DELETE fallback removes the rest."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.src VALUES (2, 99.0, 'TWO'), (7, 7.0, 'seven')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src AS s ON t.a = s.a"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *"
        " WHEN NOT MATCHED BY SOURCE AND t.a = 1 THEN UPDATE SET name = 'stale'"
        " WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert res == {"updated": 2, "deleted": 1, "inserted": 1}
    rows = sql_session.execute_sql(
        "SELECT a, name FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.name) for r in rows] == [
        (1, "stale"), (2, "TWO"), (7, "seven"),
    ]


def test_merge_multi_not_matched_insert_clauses(sql_session):
    """Ordered WHEN NOT MATCHED clauses: the first TRUE guard picks the
    insert shape, the unguarded fallback takes the remainder."""
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.src VALUES (8, -8.0, 'neg'), (9, 9.0, 'pos')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.src AS s ON t.a = s.a"
        " WHEN NOT MATCHED AND s.b > 0 THEN INSERT *"
        " WHEN NOT MATCHED THEN INSERT (a, name) VALUES (s.a, 'defaulted')"
    )
    assert res == {"updated": 0, "deleted": 0, "inserted": 2}
    rows = sql_session.execute_sql(
        "SELECT a, b, name FROM bkt.s.t WHERE a > 3 ORDER BY a"
    ).collect()
    assert [(r.a, r.b, r.name) for r in rows] == [
        (8, None, "defaulted"), (9, 9.0, "pos"),
    ]


def test_keywords_inside_string_literals_are_data(sql_session):
    """THEN/WHEN/WHERE inside quoted literals must not derail the regex
    clause splitters (literal-masked parsing)."""
    sql_session.execute_sql(
        "UPDATE bkt.s.t SET name = 'a WHERE b THEN c' WHERE a = 1"
    )
    r = sql_session.execute_sql("SELECT name FROM bkt.s.t WHERE a = 1").collect()
    assert [x.name for x in r] == ["a WHERE b THEN c"]
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.srcq (a BIGINT, b DOUBLE, name STRING);"
        "INSERT INTO bkt.s.srcq VALUES (1, 1.0, 'x'), (9, 9.0, 'y')"
    )
    res = sql_session.execute_sql(
        "MERGE INTO bkt.s.t USING bkt.s.srcq AS s ON t.a = s.a"
        " WHEN MATCHED AND t.name != 'no THEN here' THEN"
        "   UPDATE SET name = 'IF THEN WHEN MATCHED'"
        " WHEN NOT MATCHED THEN INSERT (a, name) VALUES (s.a, 'lit (WHEN')"
    )
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = sql_session.execute_sql(
        "SELECT a, name FROM bkt.s.t WHERE a IN (1, 9) ORDER BY a"
    ).collect()
    assert [(r.a, r.name) for r in rows] == [
        (1, "IF THEN WHEN MATCHED"), (9, "lit (WHEN"),
    ]


def test_merge_not_matched_by_source_rejects_bad_forms(sql_session):
    sql_session.execute_sql(
        "CREATE TABLE bkt.s.src3 (a BIGINT);"
        "INSERT INTO bkt.s.src3 VALUES (1)"
    )
    base = "MERGE INTO bkt.s.t USING bkt.s.src3 AS s ON t.a = s.a "
    for tail in (
        "WHEN NOT MATCHED BY SOURCE THEN INSERT *",   # insert needs a source row
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",  # no source to copy
        "WHEN MATCHED BY SOURCE THEN DELETE",  # BY SOURCE only valid on NOT
    ):
        with pytest.raises(InvalidArgument):
            sql_session.execute_sql(base + tail)


def test_time_travel_select(sql_session):
    """VERSION AS OF <n>, quoted named snapshots, and TIMESTAMP AS OF all
    bind the historical manifest; current-state reads are unaffected."""
    import datetime as dt

    with sql_session.transaction() as tx:
        v0 = tx.bucket("bkt").manifest.version
        tx.bucket("bkt").create_snapshot("before-zeroing")
    mid = dt.datetime.now(dt.timezone.utc).isoformat()
    sql_session.execute_sql("UPDATE bkt.s.t SET b = 0.0")
    assert (
        sql_session.execute_sql("SELECT sum(b) AS s FROM bkt.s.t").collect()[0].s
        == 0.0
    )
    for suffix in (
        f"VERSION AS OF {v0}",
        "VERSION AS OF 'before-zeroing'",
        f"FOR SYSTEM_TIME AS OF '{mid}'",
        f"TIMESTAMP AS OF '{mid}'",
    ):
        r = sql_session.execute_sql(
            f"SELECT round(sum(b), 2) AS s FROM bkt.s.t {suffix}"
        ).collect()[0]
        assert r.s == 4.5, suffix
    # historical and current joined in one statement
    r = sql_session.execute_sql(
        f"SELECT round(sum(cur.b - old.b), 2) AS drift"
        f" FROM bkt.s.t cur JOIN bkt.s.t VERSION AS OF {v0} old ON cur.a = old.a"
    ).collect()[0]
    assert r.drift == -4.5


def test_bucket_as_of_api(sql_session):
    import time

    sql_session.execute_sql("DELETE FROM bkt.s.t WHERE a = 1")
    with sql_session.transaction() as tx:
        b = tx.bucket("bkt")
        cur = b.manifest.version
        old = b.as_of(version=cur - 1)
        assert old.readonly
        assert old.schema("s").table("t").count_rows() == 3
        assert b.schema("s").table("t").count_rows() == 2
        # timestamp far in the future -> current version; exactly-one-arg
        assert b.as_of(timestamp=time.time() + 3600).manifest.version == cur
        with pytest.raises(InvalidArgument):
            b.as_of()
        with pytest.raises(InvalidArgument):
            b.as_of(version=1, timestamp=0.0)


def test_optimize_and_vacuum_statements(sql_session):
    # unsorted table -> OPTIMIZE compacts; then VACUUM collects orphans
    sql_session.execute_sql("INSERT INTO bkt.s.t VALUES (4, 4.5, 'four')")
    res = sql_session.execute_sql("OPTIMIZE bkt.s.t TARGET FILE ROWS 1000")
    assert res["optimized"] == "compact" and res["files_compacted"] >= 2
    res = sql_session.execute_sql("VACUUM bkt RETAIN 5 VERSIONS")
    assert res["deleted_files"] >= 2  # the pre-compaction files
    rows = sql_session.execute_sql(
        "SELECT count(*) AS n FROM bkt.s.t"
    ).collect()
    assert rows[0].n == 4


def test_optimize_zorder_statement(sql_session):
    res = sql_session.execute_sql(
        "OPTIMIZE bkt.s.t ZORDER BY (a, b) TARGET FILE ROWS 2"
    )
    assert res == {"optimized": "zorder", "cluster_by": ["a", "b"]}
    with sql_session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.entry.properties["cluster_by"] == ["a", "b"]
        # every rewritten file carries min/max stats on both dimensions
        assert all(
            set(f.col_stats) >= {"a", "b"} for f in t.entry.files
        )
    rows = sql_session.execute_sql(
        "SELECT a, name FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.name) for r in rows] == [
        (1, "one"), (2, "two"), (3, "three"),
    ]


def test_clone_and_restore(sql_session):
    # shallow clone shares data files; sides diverge independently
    sql_session.execute_sql("CREATE TABLE bkt.s.t_clone CLONE bkt.s.t")
    with sql_session.transaction() as tx:
        src = tx.bucket("bkt").schema("s").table("t")
        cl = tx.bucket("bkt").schema("s").table("t_clone")
        assert {f.path for f in cl.entry.files} == {f.path for f in src.entry.files}
    sql_session.execute_sql("DELETE FROM bkt.s.t_clone WHERE a = 1")
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()[0].n
        == 3
    )
    assert (
        sql_session.execute_sql(
            "SELECT count(*) AS n FROM bkt.s.t_clone"
        ).collect()[0].n
        == 2
    )
    # restore the original to its pre-DML version
    with sql_session.transaction() as tx:
        v0 = tx.bucket("bkt").manifest.version
    sql_session.execute_sql("UPDATE bkt.s.t SET b = 0.0")
    sql_session.execute_sql("DELETE FROM bkt.s.t WHERE a >= 2")
    res = sql_session.execute_sql(
        f"RESTORE TABLE bkt.s.t TO VERSION AS OF {v0}"
    )
    assert res == {"restored_to_version": v0}
    rows = sql_session.execute_sql(
        "SELECT a, b FROM bkt.s.t ORDER BY a"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 0.5), (2, 1.5), (3, 2.5)]
    # pre-restore state is still time-travelable (history moved forward)
    n = sql_session.execute_sql(
        f"SELECT count(*) AS n FROM bkt.s.t VERSION AS OF {v0 + 2}"
    ).collect()[0].n
    assert n == 1


def test_truncate_and_copy(sql_session, tmp_path):
    out = str(tmp_path / "export_t")
    sql_session.execute_sql(f"COPY bkt.s.t TO '{out}'")
    with sql_session.transaction() as tx:
        assert tx.spark.read.parquet(out).count() == 3
    res = sql_session.execute_sql("TRUNCATE TABLE bkt.s.t")
    assert res == {"truncated": True}
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()[0].n
        == 0
    )


def test_create_table_as_select(sql_session):
    res = sql_session.execute_sql(
        "CREATE TABLE bkt.s.t2 AS"
        " SELECT a, b * 2 AS b2, upper(name) AS uname FROM bkt.s.t WHERE a <= 2"
    )
    assert res == {"inserted": 2}
    rows = sql_session.execute_sql(
        "SELECT a, b2, uname FROM bkt.s.t2 ORDER BY a"
    ).collect()
    assert [(r.a, r.b2, r.uname) for r in rows] == [(1, 1.0, "ONE"), (2, 3.0, "TWO")]
    # CTAS result is a real engine table: DML + time travel work on it
    sql_session.execute_sql("DELETE FROM bkt.s.t2 WHERE a = 1")
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t2").collect()[0].n
        == 1
    )
    assert sql_session.execute_sql(
        "CREATE TABLE IF NOT EXISTS bkt.s.t2 AS SELECT 1 AS x"
    ) is None


def test_show_and_describe(sql_session):
    sql_session.execute_sql(
        "CREATE SCHEMA bkt.s2; CREATE TABLE bkt.s2.extra (x INT)"
    )
    schemas = sql_session.execute_sql("SHOW SCHEMAS IN bkt").collect()
    assert {r.schema_name for r in schemas} == {"s", "s2"}
    tables = sql_session.execute_sql("SHOW TABLES IN bkt.s").collect()
    assert [r.table_name for r in tables] == ["t"]
    assert sql_session.execute_sql(
        "SHOW TABLES IN bkt.s LIKE 'zz%'"
    ).collect() == []
    cols = sql_session.execute_sql("SHOW COLUMNS IN bkt.s.t").collect()
    assert [r.col_name for r in cols] == ["a", "b", "name"]
    desc = sql_session.execute_sql("DESCRIBE TABLE bkt.s.t").collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("a", "bigint"), ("b", "double"), ("name", "string"),
    ]
    hist = sql_session.execute_sql("DESCRIBE HISTORY bkt.s.t").collect()
    assert any(r.op == "create_table" for r in hist)
    assert any(r.op.startswith("insert") for r in hist)


def test_unsupported_statement_raises(sql_session):
    with pytest.raises(InvalidArgument):
        sql_session.execute_sql("GRANT ALL ON bkt.s.t TO nobody")


def test_snapshot_consistent_select(sql_session):
    """A SELECT bound inside a tx sees the tx snapshot even as another
    transaction commits new rows."""
    with sql_session.transaction() as tx:
        df = tx.execute_sql("SELECT count(*) AS n FROM bkt.s.t")
        with sql_session.transaction() as tx2:
            tx2.execute_sql("INSERT INTO bkt.s.t VALUES (50, 5.0, 'fifty')")
        assert df.collect()[0].n == 3  # pinned file list predates tx2
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()[0].n
        == 4
    )


def test_optimize_dedup_statement(sql_session):
    # duplicate two existing rows, then full-row and key-scoped SQL dedup
    sql_session.execute_sql(
        "INSERT INTO bkt.s.t VALUES (1, 0.5, 'one'), (2, 1.5, 'two')"
    )
    res = sql_session.execute_sql("OPTIMIZE bkt.s.t DEDUP")
    assert res == {"optimized": "dedup", "rows_removed": 2}
    rows = sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").collect()
    assert rows[0].n == 3
    # key-scoped: plant a conflicting name for a=1, keep the earliest row
    sql_session.execute_sql("INSERT INTO bkt.s.t VALUES (1, 9.9, 'uno')")
    res = sql_session.execute_sql("OPTIMIZE bkt.s.t DEDUP BY (a)")
    assert res == {"optimized": "dedup", "rows_removed": 1}
    got = {
        r.a: r.name
        for r in sql_session.execute_sql("SELECT a, name FROM bkt.s.t").collect()
    }
    assert got == {1: "one", 2: "two", 3: "three"}
    # idempotent re-run removes nothing
    res = sql_session.execute_sql("OPTIMIZE bkt.s.t DEDUP")
    assert res["rows_removed"] == 0


def test_optimize_cap_statement(sql_session):
    """OPTIMIZE t CAP n PER (cols) — the SQL verb for the per-group
    quota DML; idempotent re-run removes nothing."""
    sql_session.execute_sql(
        "INSERT INTO bkt.s.t VALUES (10, 1.0, 'one'), (11, 2.0, 'one'), "
        "(12, 3.0, 'one'), (13, 4.0, 'two')"
    )
    before = (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t")
        .collect()[0]
        .n
    )
    res = sql_session.execute_sql("OPTIMIZE bkt.s.t CAP 1 PER (name)")
    assert res["optimized"] == "cap" and res["rows_removed"] >= 2
    per_name = {
        r.name: r.n
        for r in sql_session.execute_sql(
            "SELECT name, count(*) AS n FROM bkt.s.t GROUP BY name"
        ).collect()
    }
    assert all(n == 1 for n in per_name.values())
    res2 = sql_session.execute_sql("OPTIMIZE bkt.s.t CAP 1 PER (name)")
    assert res2 == {"optimized": "cap", "rows_removed": 0}
    assert before - res["rows_removed"] == sum(per_name.values())


def test_copy_from_formats(sql_session, tmp_path):
    """COPY t FROM 'path' — parquet registers zero-copy, JSON/CSV convert
    through the distributed reader with the schema pinned to the table's."""
    import json as _json

    # JSONL
    j = tmp_path / "in.jsonl"
    j.write_text(
        "\n".join(
            _json.dumps({"a": i, "b": i + 0.5, "name": f"n{i}"})
            for i in (10, 11)
        )
    )
    res = sql_session.execute_sql(f"COPY bkt.s.t FROM '{j}' FORMAT JSON")
    assert res == {"rows_inserted": 2}
    # CSV (header row, table-pinned schema)
    c = tmp_path / "in.csv"
    c.write_text("a,b,name\n12,12.5,n12\n")
    res = sql_session.execute_sql(f"COPY bkt.s.t FROM '{c}' FORMAT CSV")
    assert res == {"rows_inserted": 1}
    # parquet: zero-copy registration
    with sql_session.transaction() as tx:
        pdir = str(tmp_path / "in_parquet")
        tx.spark.createDataFrame(
            [(20, 20.5, "n20")], "a LONG, b DOUBLE, name STRING"
        ).coalesce(1).write.parquet(pdir)
    res = sql_session.execute_sql(
        f"COPY bkt.s.t FROM '{pdir}/part-*.parquet' FORMAT PARQUET"
    )
    assert res == {"imported_files": 1}
    rows = sql_session.execute_sql(
        "SELECT a, b, name FROM bkt.s.t WHERE a >= 10 ORDER BY a"
    ).collect()
    assert [(r.a, r.b, r.name) for r in rows] == [
        (10, 10.5, "n10"),
        (11, 11.5, "n11"),
        (12, 12.5, "n12"),
        (20, 20.5, "n20"),
    ]

    import pytest as _pytest

    import vastdb_sdk_spark as vastdb

    with _pytest.raises(vastdb.InvalidArgument, match="format must be"):
        sql_session.execute_sql(f"COPY bkt.s.t FROM '{j}' FORMAT AVRO")


def test_show_changes(sql_session):
    with sql_session.transaction() as tx:
        v1 = tx.bucket("bkt").manifest.version
    sql_session.execute_sql("DELETE FROM bkt.s.t WHERE a = 2")
    rows = sql_session.execute_sql(f"SHOW CHANGES bkt.s.t FROM {v1}").collect()
    assert [(r.a, r._change_type) for r in rows] == [(2, "delete")]


def test_copy_to_from_format_symmetry(sql_session, tmp_path):
    # own table: module-shared bkt.s.t is mutated by other tests
    sql_session.execute_sql("CREATE TABLE bkt.s.sym (a BIGINT, name STRING)")
    sql_session.execute_sql(
        "INSERT INTO bkt.s.sym VALUES (1, 'one'), (2, 'two'), (3, 'three')"
    )
    out = str(tmp_path / "dump_json")
    res = sql_session.execute_sql(f"COPY bkt.s.sym TO '{out}' FORMAT JSON")
    assert res == {"exported": out, "format": "json"}
    with sql_session.transaction() as tx:
        assert tx.spark.read.json(out).count() == 3
    # round-trip the JSONL dump back in
    import glob

    files = sorted(glob.glob(out + "/*.json"))
    for f in files:
        sql_session.execute_sql(f"COPY bkt.s.sym FROM '{f}' FORMAT JSON")
    n = sql_session.execute_sql(
        "SELECT count(*) AS n FROM bkt.s.sym"
    ).collect()[0].n
    assert n == 6
    sql_session.execute_sql("DROP TABLE bkt.s.sym")


def test_sql_projection_and_vector_index_lifecycle(session):
    """Round-8 SQL verbs: CREATE/DROP PROJECTION, BUILD/REFRESH VECTOR
    INDEX, REFRESH PROJECTION — thin dispatch onto the same engine
    methods the Python API uses."""
    import numpy as np

    session.execute_sql("CREATE SCHEMA bkt.s")
    rng = np.random.default_rng(3)
    vecs = rng.random((120, 8)).astype("float32")
    data = pa.table(
        {
            "id": pa.array(range(120), pa.int64()),
            "emb": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "v", data.schema, vector_index={"column": "emb", "metric": "l2sq"}
        )
        t.insert(data)

    session.execute_sql(
        "BUILD VECTOR INDEX ON bkt.s.v KIND IVFPQ CENTROIDS 4 SUBSPACES 4 SEED 42"
    )
    with session.transaction() as tx:
        vi = tx.bucket("bkt").schema("s").table("v").entry.vector_index
        assert vi["kind"] == "ivfpq" and not vi["stale"]

    session.execute_sql("INSERT INTO bkt.s.v VALUES (999, ARRAY(" + ",".join(["0.5"] * 8) + "))")
    res = session.execute_sql("REFRESH VECTOR INDEX ON bkt.s.v MODE INCREMENTAL")
    assert res["mode"] == "incremental"

    session.execute_sql("CREATE PROJECTION by_id ON bkt.s.v (SORTED (id))")
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("v")
        assert [p.name for p in t.projections()] == ["by_id"]
    session.execute_sql("INSERT INTO bkt.s.v VALUES (1000, ARRAY(" + ",".join(["0.1"] * 8) + "))")
    res = session.execute_sql("REFRESH PROJECTION by_id ON bkt.s.v")
    assert res["mode"] == "incremental"
    session.execute_sql("DROP PROJECTION by_id ON bkt.s.v")
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("v").projections() == []

    with pytest.raises(InvalidArgument, match="cannot parse"):
        session.execute_sql("BUILD VECTOR INDEX bkt.s.v")


# ---------------------------------------------------------------------------
# logical SQL views (CREATE/DROP VIEW, SHOW VIEWS — catalog objects bound
# fresh at every read against the reading transaction's snapshot)


def test_views_create_select_nest_replace_drop(sql_session):
    s = sql_session
    s.execute_sql(
        "CREATE VIEW bkt.s.v1 AS SELECT name, SUM(a) AS total"
        " FROM bkt.s.t GROUP BY name"
    )
    rows = s.execute_sql(
        "SELECT * FROM bkt.s.v1 ORDER BY name"
    ).collect()
    assert [(r["name"], r["total"]) for r in rows] == [
        ("one", 1), ("three", 3), ("two", 2)
    ]
    # view-on-view + mixing a view and a table in one statement
    s.execute_sql(
        "CREATE VIEW bkt.s.v2 AS SELECT name FROM bkt.s.v1 WHERE total >= 2"
    )
    joined = s.execute_sql(
        "SELECT v.name, t.a FROM bkt.s.v2 v JOIN bkt.s.t t"
        " ON v.name = t.name ORDER BY t.a"
    ).collect()
    assert [(r["name"], r["a"]) for r in joined] == [("two", 2), ("three", 3)]
    # a view reflects LATER table churn (bound fresh, never materialized)
    s.execute_sql("INSERT INTO bkt.s.t VALUES (10, 9.9, 'two')")
    assert (
        s.execute_sql("SELECT total FROM bkt.s.v1 WHERE name = 'two'")
        .first()["total"] == 12
    )
    # OR REPLACE swaps the definition
    s.execute_sql(
        "CREATE OR REPLACE VIEW bkt.s.v1 AS SELECT COUNT(*) AS n FROM bkt.s.t"
    )
    assert s.execute_sql("SELECT n FROM bkt.s.v1").first()["n"] == 4
    shown = s.execute_sql("SHOW VIEWS IN bkt.s").collect()
    assert sorted(r["view_name"] for r in shown) == ["v1", "v2"]
    s.execute_sql("DROP VIEW bkt.s.v2")
    assert [
        r["view_name"]
        for r in s.execute_sql("SHOW VIEWS IN bkt.s").collect()
    ] == ["v1"]


def test_views_errors_and_namespace(sql_session):
    from vastdb_sdk_spark.errors import MissingView, TableExists, ViewExists

    s = sql_session
    s.execute_sql("CREATE VIEW bkt.s.v AS SELECT a FROM bkt.s.t")
    with pytest.raises(ViewExists):
        s.execute_sql("CREATE VIEW bkt.s.v AS SELECT 1")
    with pytest.raises(TableExists):
        s.execute_sql("CREATE VIEW bkt.s.t AS SELECT 1")
    with pytest.raises(MissingView):
        s.execute_sql("DROP VIEW bkt.s.nope")
    # the namespace guard is TWO-way: a table/clone/rename/CTAS onto an
    # existing view's name must fail, not silently shadow the view
    # (sqlfront resolves tables first)
    import pyarrow as _pa

    with pytest.raises(ViewExists):
        with s.transaction() as tx:
            tx.bucket("bkt").schema("s").create_table(
                "v", _pa.schema([("x", _pa.int64())])
            )
    with pytest.raises(ViewExists):
        with s.transaction() as tx:
            sc = tx.bucket("bkt").schema("s")
            sc.clone_table(sc.table("t"), "v")
    with pytest.raises(ViewExists):
        with s.transaction() as tx:
            tx.bucket("bkt").schema("s").table("t").rename("v")
    with pytest.raises(ViewExists):
        s.execute_sql("CREATE TABLE bkt.s.v AS SELECT 1 AS x")
    with pytest.raises(InvalidArgument):
        with s.transaction() as tx:
            tx.bucket("bkt").schema("s").create_view("w", "DROP TABLE x")
    # bad SQL fails the CREATE (bind-validated), not the first read
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        s.execute_sql("CREATE VIEW bkt.s.bad AS SELECT nope FROM bkt.s.t")
    with s.transaction() as tx:
        assert "bad" not in tx.bucket("bkt").schema("s").views()


def test_views_cycle_detected_at_read(sql_session):
    s = sql_session
    s.execute_sql("CREATE VIEW bkt.s.a1 AS SELECT a FROM bkt.s.t")
    s.execute_sql("CREATE VIEW bkt.s.a2 AS SELECT a FROM bkt.s.a1")
    # CREATE-time validation binds a2's CURRENT (acyclic) definition, so
    # the replace goes through — the cycle must surface as a clean error
    # on the next read, not a recursion crash
    s.execute_sql("CREATE OR REPLACE VIEW bkt.s.a1 AS SELECT a FROM bkt.s.a2")
    with pytest.raises(InvalidArgument, match="circular view"):
        s.execute_sql("SELECT * FROM bkt.s.a1")


def test_views_transactional(sql_session):
    s = sql_session
    # rollback discards the view
    try:
        with s.transaction() as tx:
            tx.bucket("bkt").schema("s").create_view(
                "ghost", "SELECT a FROM bkt.s.t"
            )
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with s.transaction() as tx:
        assert "ghost" not in tx.bucket("bkt").schema("s").views()
    # concurrent view DDL on the same schema conflicts (schema-level CAS)
    from vastdb_sdk_spark.errors import Conflict

    t1 = s.transaction()
    t2 = s.transaction()
    t1.bucket("bkt").schema("s").create_view("c1", "SELECT 1 AS x")
    t2.bucket("bkt").schema("s").create_view("c2", "SELECT 2 AS x")
    t1.commit()
    with pytest.raises(Conflict):
        t2.commit()


def test_explain_statement(sql_session):
    s = sql_session
    plan = s.execute_sql(
        "EXPLAIN SELECT name, SUM(a) AS t FROM bkt.s.t GROUP BY name"
    ).first()[0]
    assert "HashAggregate" in plan or "Aggregate" in plan
    # binds engine tables (the temp-view name appears, not an error) and
    # works through logical views and time travel binding
    s.execute_sql("CREATE VIEW bkt.s.ev AS SELECT a FROM bkt.s.t")
    plan2 = s.execute_sql("EXPLAIN EXTENDED SELECT * FROM bkt.s.ev").first()[0]
    assert "Parsed Logical Plan" in plan2
    with pytest.raises(InvalidArgument):
        s.execute_sql("EXPLAIN DROP TABLE bkt.s.t")


def test_ctas_from_logical_view(sql_session):
    """CREATE TABLE AS SELECT over a logical view: the view binds inside
    the CTAS body like any other read, and the result is a real engine
    table with the view's rows frozen at creation."""
    s = sql_session
    s.execute_sql(
        "CREATE VIEW bkt.s.agg AS SELECT name, SUM(a) AS total"
        " FROM bkt.s.t GROUP BY name"
    )
    s.execute_sql("CREATE TABLE bkt.s.frozen AS SELECT * FROM bkt.s.agg")
    rows = s.execute_sql(
        "SELECT * FROM bkt.s.frozen ORDER BY name"
    ).collect()
    assert [(r["name"], r["total"]) for r in rows] == [
        ("one", 1), ("three", 3), ("two", 2)
    ]
    # the table froze: later churn moves the view but not the CTAS copy
    s.execute_sql("INSERT INTO bkt.s.t VALUES (10, 0.0, 'one')")
    assert (
        s.execute_sql("SELECT total FROM bkt.s.agg WHERE name='one'")
        .first()["total"] == 11
    )
    assert (
        s.execute_sql("SELECT total FROM bkt.s.frozen WHERE name='one'")
        .first()["total"] == 1
    )


def test_merge_clause_without_then_fails_loud(sql_session):
    """The clause finditer SKIPS unparseable text: a WHEN MATCHED missing
    THEN used to silently execute the merge with the surviving clause
    subset (insert-only here), committing wrong data with no error."""
    s = sql_session
    s.execute_sql("CREATE TABLE bkt.s.src (a BIGINT, b DOUBLE, name STRING)")
    s.execute_sql("INSERT INTO bkt.s.src VALUES (1, 9.5, 'ONE'), (9, 9.0, 'nine')")
    with pytest.raises(InvalidArgument, match="THEN"):
        s.execute_sql(
            "MERGE INTO bkt.s.t USING bkt.s.src ON a = a"
            " WHEN MATCHED UPDATE SET b = s.b"   # <- missing THEN
            " WHEN NOT MATCHED THEN INSERT *"
        )
    # the target must be untouched (no partial insert-only merge ran)
    assert s.execute_sql("SELECT count(*) AS n FROM bkt.s.t").first()["n"] == 3


def test_insert_unknown_column_fails_loud(sql_session):
    """An INSERT column list naming a non-column used to pass the arity
    check and silently DROP the value (the intended column filled NULL)."""
    with pytest.raises(InvalidArgument, match="nmae"):
        sql_session.execute_sql(
            "INSERT INTO bkt.s.t (a, nmae) VALUES (10, 'x')"
        )
    assert (
        sql_session.execute_sql("SELECT count(*) AS n FROM bkt.s.t").first()["n"]
        == 3
    )


def test_double_quoted_literal_not_rewritten_as_table(sql_session):
    """Spark treats double-quoted strings as literals; the old single-
    quote-only mask let "bkt.s.t" be rewritten into the temp-view name, so
    the predicate silently compared against the view name."""
    sql_session.execute_sql("INSERT INTO bkt.s.t VALUES (7, 0.0, 'bkt.s.t')")
    got = sql_session.execute_sql(
        'SELECT a FROM bkt.s.t WHERE name = "bkt.s.t"'
    ).collect()
    assert [r["a"] for r in got] == [7]


def test_underscore_table_names_do_not_collide(session):
    """vastdb_sql view names were '_'-joined: buck.a_b.c and buck.a.b_c
    mapped to ONE temp view and the second silently overwrote the first —
    a join of the two tables read the same table twice."""
    session.execute_sql("CREATE SCHEMA bkt.a_b")
    session.execute_sql("CREATE SCHEMA bkt.a")
    session.execute_sql("CREATE TABLE bkt.a_b.c (x BIGINT)")
    session.execute_sql("CREATE TABLE bkt.a.b_c (x BIGINT)")
    session.execute_sql("INSERT INTO bkt.a_b.c VALUES (1)")
    session.execute_sql("INSERT INTO bkt.a.b_c VALUES (2)")
    rows = session.execute_sql(
        "SELECT l.x AS lx, r.x AS rx FROM bkt.a_b.c l CROSS JOIN bkt.a.b_c r"
    ).collect()
    assert [(r["lx"], r["rx"]) for r in rows] == [(1, 2)]


def test_restore_to_named_snapshot(sql_session):
    """RESTORE ... TO VERSION AS OF '<name>' must resolve the NAMED
    snapshot (like SELECT time travel does) instead of crashing in
    datetime.fromisoformat."""
    s = sql_session
    with s.transaction() as tx:
        tx.bucket("bkt").create_snapshot("before-load")
    s.execute_sql("INSERT INTO bkt.s.t VALUES (99, 9.9, 'extra')")
    assert s.execute_sql("SELECT count(*) AS n FROM bkt.s.t").first()["n"] == 4
    res = s.execute_sql(
        "RESTORE TABLE bkt.s.t TO VERSION AS OF 'before-load'"
    )
    assert "restored_to_version" in res
    assert s.execute_sql("SELECT count(*) AS n FROM bkt.s.t").first()["n"] == 3

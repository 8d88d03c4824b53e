"""Scale-shaped robustness: wide tables, bulk distributed ingest, DML on
multi-file tables (reference analog: vast_tests/test_scale.py and the
64k-column pagination test)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark import _ as D

SF01 = "/root/testdata/sf0.01"


def test_wide_table_roundtrip(clean_schema):
    ncols = 300
    schema = pa.schema([(f"c{i}", pa.int64()) for i in range(ncols)])
    data = pa.table({f"c{i}": pa.array([i, i * 2], pa.int64()) for i in range(ncols)})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("wide", schema)
        t.insert(data)
        got = t.select(columns=["c0", "c150", "c299"], predicate=(D.c1 == 2)).read_all()
        assert got.num_rows == 1
        assert got.column("c299").to_pylist() == [598]
        assert len(t.columns()) == ncols


def test_bulk_insert_df_and_dml(clean_schema):
    spark = clean_schema.spark
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_quantity", pa.float64()),
            ("l_returnflag", pa.string()),
        ]
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("li", schema)
        n = t.insert_df(
            li.select("l_orderkey", "l_quantity", "l_returnflag").repartition(4)
        )
        assert n == li.count()
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("li")
        assert t.count_rows() == n
        assert len(t.entry.files) > 1  # distributed write -> multiple files
        # DML across multiple files: delete all rows with l_quantity > 49
        victims = t.select_df(predicate=(D.l_quantity > 49.0), internal_row_id=True)
        ids = [r["$row_id"] for r in victims.select("$row_id").collect()]
        assert ids
        t.delete(pa.table({"$row_id": pa.array(ids, pa.uint64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("li")
        assert t.count_rows() == n - len(ids)
        assert t.count_rows(predicate=(D.l_quantity > 49.0)) == 0
        # update a known row after the delete rewrite
        survivor = t.select_df(internal_row_id=True).limit(1).collect()[0]
        t.update(
            pa.table(
                {
                    "$row_id": pa.array([survivor["$row_id"]], pa.uint64()),
                    "l_returnflag": ["Z"],
                }
            )
        )
        got = t.select_df(predicate=(D.l_returnflag == "Z")).count()
        assert got == 1


def test_partitioned_engine_table(clean_schema):
    spark = clean_schema.spark
    schema = pa.schema(
        [("k", pa.int64()), ("region_id", pa.int32()), ("v", pa.float64())]
    )
    rows = [(i, i % 4, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k LONG, region_id INT, v DOUBLE")
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "pt", schema, partition_by=["region_id"]
        )
        n = t.insert_df(df)
        assert n == 1000
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("pt")
        parts = {f.partition.get("region_id") for f in t.entry.files}
        assert {0, 1, 2, 3} <= parts
        # partition pruning at the manifest level
        pruned = t._pruned_files(D.region_id == 2)
        assert pruned is not None and all(
            f.partition["region_id"] == 2 for f in pruned
        )
        got = t.select_df(predicate=(D.region_id == 2))
        assert got.count() == 250
        # partition column values are re-injected correctly
        one = t.select_df(predicate=(D.k == 6)).collect()[0]
        assert one.region_id == 2 and one.v == 6.0


def test_compact_small_files(clean_schema):
    data = pa.table({"a": pa.array(range(10), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("c", data.schema)
        for _ in range(6):
            t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("c")
        assert len(t.entry.files) == 6
        before_ids = sorted(
            t.select(internal_row_id=True).read_all().column("$row_id").to_pylist()
        )
        removed = t.compact(target_file_rows=1000)
        assert removed > 0
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("c")
        assert len(t.entry.files) < 6
        after_ids = sorted(
            t.select(internal_row_id=True).read_all().column("$row_id").to_pylist()
        )
        assert after_ids == before_ids  # row ids preserved through compaction
    assert len(clean_schema.vacuum("bkt")) == 6  # originals now orphaned


def test_vacuum_removes_orphans(clean_schema):
    import os

    data = pa.table({"a": pa.array(range(100), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        # >30% of rows in one batch -> the driver's id-range bound proves
        # the fold up front and the delete routes STRAIGHT to the rewrite
        # (r14: no transient DV sidecar is written any more) — only the
        # original data file is orphaned
        t.delete(pa.table({"$row_id": pa.array(range(40), pa.uint64())}))
    deleted = clean_schema.vacuum("bkt")
    assert len(deleted) == 1 and deleted[0].endswith(".parquet")
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.count_rows() == 60
        assert t.select_df().count() == 60  # data intact after vacuum
        for fe in t.entry.files:
            assert os.path.exists(fe.path)
    # sidecar-then-fold path: two LIGHT deletes (each below the per-batch
    # id-range bound) accumulate DV rows past DV_REWRITE_FRACTION; the
    # second delete's fold pass rewrites the file, orphaning the phase-1
    # file AND every transient DV sidecar written along the way
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        ids = sorted(
            t.select(internal_row_id=True).read_all().column("$row_id").to_pylist()
        )
        t.delete(pa.table({"$row_id": pa.array(ids[:10], pa.uint64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        dv_paths = [p for fe in t.entry.files for p in fe.dv_paths]
        assert dv_paths  # the light delete really took the sidecar path
        data_paths = [fe.path for fe in t.entry.files]
        t.delete(pa.table({"$row_id": pa.array(ids[10:22], pa.uint64())}))
        # 22/60 > DV_REWRITE_FRACTION -> folded: sidecars gone from entry
        assert all(not fe.dv_paths for fe in t.entry.files)
    deleted2 = clean_schema.vacuum("bkt")
    assert set(dv_paths) <= set(deleted2)  # transient sidecars orphaned
    assert set(data_paths) <= set(deleted2)  # pre-fold data file orphaned
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.count_rows() == 38
        assert t.select_df().count() == 38


def test_vacuum_respects_snapshots(clean_schema):
    data = pa.table({"a": pa.array(range(10), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").create_snapshot("keep")
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        # heavy delete routes straight to the fold rewrite (r14: the
        # id-range bound proves 6/10 > DV_REWRITE_FRACTION up front, so
        # no transient DV sidecar exists) — the pre-delete data file is
        # referenced by the snapshot manifest and must survive
        t.delete(pa.table({"$row_id": pa.array(range(6), pa.uint64())}))
    assert len(clean_schema.vacuum("bkt", keep_snapshots=True)) == 0
    with clean_schema.transaction() as tx:
        snap = tx.bucket("bkt").snapshot("keep")
        assert snap.schema("s").table("t").count_rows() == 10  # still readable
    deleted = clean_schema.vacuum("bkt", keep_snapshots=False)
    assert len(deleted) == 1  # the pre-delete data file


def test_vacuum_data_files_sets_as_of_horizon(clean_schema):
    """A vacuum that deletes data files must make as_of to older versions
    fail at BIND time (MissingSnapshot), not mid-scan with FileNotFound;
    named-snapshot versions stay readable (their files were kept)."""
    from vastdb_sdk_spark.errors import MissingSnapshot

    data = pa.table({"a": pa.array(range(100), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        v_old = tx.bucket("bkt").manifest.version
        tx.bucket("bkt").create_snapshot("pinned")
    with clean_schema.transaction() as tx:
        # a SECOND file written after the snapshot, then fold-deleted: its
        # original parquet is referenced only by post-snapshot pre-delete
        # manifests — exactly what default vacuum removes. (The first
        # file can no longer serve this role: r14's direct-rewrite delete
        # writes no transient DV sidecar, and the first file itself is
        # pinned by the snapshot.)
        tx.bucket("bkt").schema("s").table("t").insert(
            pa.table({"a": pa.array(range(100, 200), pa.int64())})
        )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        rid = t.select(internal_row_id=True, columns=["a"]).read_all()
        new_ids = [
            r for r, a in zip(
                rid.column("$row_id").to_pylist(), rid.column("a").to_pylist()
            )
            if a >= 100
        ]
        t.delete(
            pa.table({"$row_id": pa.array(sorted(new_ids)[:40], pa.uint64())})
        )
    assert clean_schema.vacuum("bkt") != []
    with clean_schema.transaction() as tx:
        b = tx.bucket("bkt")
        # current state reads fine; the horizon commit added a version
        assert b.schema("s").table("t").count_rows() == 160
        assert b.as_of(version=b.manifest.version - 1) is not None
        with pytest.raises(MissingSnapshot):
            b.as_of(version=v_old - 1)
        # the named-snapshot version is exempt and still fully readable
        assert (
            b.as_of(version=v_old).schema("s").table("t").count_rows() == 100
        )
        assert b.snapshot("pinned").schema("s").table("t").count_rows() == 100


def test_vacuum_retain_versions_sets_time_travel_horizon(clean_schema):
    from vastdb_sdk_spark.errors import MissingSnapshot

    data = pa.table({"a": pa.array([0], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    for i in range(1, 5):
        with clean_schema.transaction() as tx:
            tx.bucket("bkt").schema("s").table("t").insert(
                pa.table({"a": pa.array([i], pa.int64())})
            )
    with clean_schema.transaction() as tx:
        cur = tx.bucket("bkt").manifest.version
    deleted = clean_schema.vacuum("bkt", retain_versions=2)
    assert any(p.endswith(".json") for p in deleted)
    with clean_schema.transaction() as tx:
        b = tx.bucket("bkt")
        # newest 2 versions remain reachable
        assert b.as_of(version=cur).schema("s").table("t").count_rows() == 5
        assert b.as_of(version=cur - 1).schema("s").table("t").count_rows() == 4
        with pytest.raises(MissingSnapshot):
            b.as_of(version=cur - 2)
        # version_at bisects over surviving versions only
        import time

        assert b.as_of(timestamp=time.time()).manifest.version == cur
    # a named snapshot pins its manifest version through vacuum
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").create_snapshot("keeper")
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("t").insert(
            pa.table({"a": pa.array([99], pa.int64())})
        )
    clean_schema.vacuum("bkt", retain_versions=1)
    with clean_schema.transaction() as tx:
        snap = tx.bucket("bkt").snapshot("keeper")
        assert snap.schema("s").table("t").count_rows() == 5


def test_many_small_inserts_one_tx(clean_schema):
    """50 inserts in one transaction -> one commit, contiguous row ids."""
    schema = pa.schema([("a", pa.int64())])
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("m", schema)
        for i in range(50):
            ids = t.insert(pa.table({"a": pa.array([i], pa.int64())}))
            assert ids.to_pylist() == [i]
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("m")
        assert t.count_rows() == 50
        st = tx._state("bkt")
        assert st.manifest.version >= 2  # catalog versions advanced by commits

# -- deletion vectors (merge-on-read DML) -----------------------------------


def test_delete_writes_dv_not_rewrite(clean_schema):
    data = pa.table({"a": pa.array(range(100), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        orig = [fe.path for fe in t.entry.files]
        t.delete(pa.table({"$row_id": pa.array([3, 7], pa.uint64())}))
        fe = t.entry.files[0]
        # data file untouched; a DV sidecar carries the two ids
        assert [f.path for f in t.entry.files] == orig
        assert fe.dv_rows == 2 and len(fe.dv_paths) == 1
        assert t.count_rows() == 98
        got = t.select(columns=["a"]).read_all().column("a").to_pylist()
        assert sorted(got) == [i for i in range(100) if i not in (3, 7)]
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        # second delete: disjoint accounting, including an already-deleted
        # and a nonexistent id (both must not count)
        t.delete(pa.table({"$row_id": pa.array([3, 5, 10_000], pa.uint64())}))
        fe = t.entry.files[0]
        assert fe.dv_rows == 3 and len(fe.dv_paths) == 2
        assert t.count_rows() == 97
        # row ids stable: $row_id 5 gone, 4 and 6 still present
        ids = t.select(columns=["a"], internal_row_id=True).read_all()
        got_ids = ids.column("$row_id").to_pylist()
        assert 5 not in got_ids and 4 in got_ids and 6 in got_ids


def test_delete_where_dv_and_fold(clean_schema):
    data = pa.table({"a": pa.array(range(1000), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete_where(D.a.isin(list(range(0, 1000, 10))))  # 10% -> DV only
        fe = t.entry.files[0]
        assert fe.dv_rows == 100 and fe.rows == 1000
        assert t.count_rows() == 900
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete_where(D.a < 500)  # pushes past 30% -> fold rewrites
        fe = t.entry.files[0]
        assert fe.dv_rows == 0 and fe.rows == 450
        assert t.count_rows() == 450
        got = t.select(columns=["a"]).read_all().column("a").to_pylist()
        assert sorted(got) == [i for i in range(500, 1000) if i % 10 != 0]


def test_update_after_dv_delete_purges_dv(clean_schema):
    data = pa.table({"a": pa.array(range(10), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete(pa.table({"$row_id": pa.array([2], pa.uint64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.update(pa.table({"$row_id": pa.array([5], pa.uint64()),
                           "a": pa.array([500], pa.int64())}))
        # merge-on-read update: old file DV-masks ids 2 (deleted) and 5
        # (old version); the replacement row landed in a new file
        old = t.entry.files[0]
        assert old.dv_rows == 2 and len(t.entry.files) == 2
        assert t.count_rows() == 9
        got = dict(zip(
            t.select(internal_row_id=True).read_all().column("$row_id").to_pylist(),
            t.select(internal_row_id=True).read_all().column("a").to_pylist(),
        ))
        assert got[5] == 500 and 2 not in got


def test_dv_snapshot_time_travel(clean_schema):
    data = pa.table({"a": pa.array(range(10), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").create_snapshot("before")
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete(pa.table({"$row_id": pa.array([0, 1], pa.uint64())}))
        assert t.count_rows() == 8
    with clean_schema.transaction() as tx:
        snap = tx.bucket("bkt").snapshot("before")
        assert snap.schema("s").table("t").count_rows() == 10


def test_dv_select_splits_and_rollback(clean_schema):
    data = pa.table({"a": pa.array(range(40), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        for i in range(4):
            t.insert(data.slice(i * 10, 10))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete(pa.table({"$row_id": pa.array([12, 25], pa.uint64())}))
        readers = t.select_splits(num_splits=2)
        rows = [r for rd in readers for r in rd.read_all().column("a").to_pylist()]
        assert len(rows) == 38 and 2 not in {12, 25} - set(rows)
    # rollback deletes the staged DV
    try:
        with clean_schema.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("t")
            t.delete(pa.table({"$row_id": pa.array([30], pa.uint64())}))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.count_rows() == 38  # rollback restored


def test_update_twice_then_delete_same_row(clean_schema):
    data = pa.table({"a": pa.array(range(10), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    for val in (100, 200):
        with clean_schema.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("t")
            t.update(pa.table({"$row_id": pa.array([4], pa.uint64()),
                               "a": pa.array([val], pa.int64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        got = t.select(internal_row_id=True).read_all()
        vals = dict(zip(got.column("$row_id").to_pylist(), got.column("a").to_pylist()))
        assert vals[4] == 200 and t.count_rows() == 10
        # now delete the twice-updated row: DV must land on its CURRENT file
        t.delete(pa.table({"$row_id": pa.array([4], pa.uint64())}))
        assert t.count_rows() == 9
        ids = t.select(internal_row_id=True).read_all().column("$row_id").to_pylist()
        assert 4 not in ids and sorted(ids) == [0, 1, 2, 3, 5, 6, 7, 8, 9]


def test_update_where_merge_on_read(clean_schema):
    data = pa.table({"a": pa.array(range(1000), pa.int64()),
                     "b": pa.array([0] * 1000, pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        orig = t.entry.files[0].path
        t.update_where(D.a < 100, {"b": 7})
        # merge-on-read: original file intact + DV, replacement file added
        assert t.entry.files[0].path == orig
        assert t.entry.files[0].dv_rows == 100
        assert t.count_rows() == 1000
        assert t.select_df(predicate=(D.b == 7)).count() == 100
        assert t.select_df(predicate=(D.b == 0)).count() == 900


def test_merge_upsert(clean_schema):
    data = pa.table({"k": pa.array(range(10), pa.int64()),
                     "v": pa.array([f"v{i}" for i in range(10)])})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        spark = tx.spark
        src = spark.createDataFrame(
            [(5, "NEW5"), (7, "NEW7"), (100, "NEW100"), (101, "NEW101")],
            "k LONG, v STRING",
        )
        counts = t.merge(src, on=["k"])
        assert counts == {"updated": 2, "deleted": 0, "inserted": 2}
        assert t.count_rows() == 12
        got = dict(
            (r["k"], r["v"]) for r in t.select_df().collect()
        )
        assert got[5] == "NEW5" and got[7] == "NEW7"
        assert got[100] == "NEW100" and got[101] == "NEW101"
        assert got[3] == "v3"
    # merge survives commit; when_matched=delete; assignments form
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        spark = tx.spark
        src = spark.createDataFrame([(100,), (3,), (999,)], "k LONG")
        counts = t.merge(src, on=["k"], when_matched="delete", when_not_matched=None)
        assert counts == {"updated": 0, "deleted": 2, "inserted": 0}
        assert t.count_rows() == 10
        src2 = spark.createDataFrame([(5,), (6,)], "k LONG")
        counts = t.merge(src2, on=["k"], assignments={"v": "X"}, when_not_matched=None)
        assert counts["updated"] == 2
        got = dict((r["k"], r["v"]) for r in t.select_df().collect())
        assert got[5] == "X" and got[6] == "X" and 3 not in got and 100 not in got


def test_merge_expr_assignments_and_aliases(clean_schema):
    """F.expr assignments with alias-qualified refs to both join sides;
    insert_assignments projects unmatched source rows through expressions."""
    from pyspark.sql import functions as F

    data = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([10, 20], pa.int64()),
                     "tag": pa.array(["a", "b"])})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
        src = tx.spark.createDataFrame(
            [(2, 5), (9, 7)], "k LONG, v LONG"
        )
        counts = t.merge(
            src, on=["k"],
            assignments={"v": F.expr("t.v + s.v")},
            insert_assignments={"k": F.expr("s.k"), "tag": F.expr("upper('new')")},
            target_alias="t", source_alias="s",
        )
        assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
        got = {r["k"]: (r["v"], r["tag"]) for r in t.select_df().collect()}
        assert got[2] == (25, "b")          # v updated, tag untouched
        assert got[9] == (None, "NEW")      # v unmentioned -> NULL
        # plain strings stay literals (pre-existing contract)
        t.merge(src, on=["k"], assignments={"tag": "lit"}, when_not_matched=None)
        assert {r["tag"] for r in t.select_df(predicate=(D.k == 2)).collect()} == {"lit"}
        # unknown assignment target is rejected
        from vastdb_sdk_spark import InvalidArgument

        with pytest.raises(InvalidArgument):
            t.merge(src, on=["k"], assignments={"nope": 1})


def test_merge_into_empty_table(clean_schema):
    """First CDC batch case: merging into a never-written table takes the
    pure-insert path (regression: empty df() lacked __source_file)."""
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", schema)
        src = tx.spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, v STRING")
        counts = t.merge(src, on=["k"])
        assert counts == {"updated": 0, "deleted": 0, "inserted": 2}
        assert t.count_rows() == 2


def test_merge_validation(clean_schema):
    data = pa.table({"k": pa.array([1], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
        src = tx.spark.createDataFrame([(1,)], "z LONG")
        from vastdb_sdk_spark import InvalidArgument

        with pytest.raises(InvalidArgument):
            t.merge(src, on=["z"])
        with pytest.raises(InvalidArgument):
            t.merge(src.withColumnRenamed("z", "k"), on=["k"], when_matched="bogus")


def test_wide_scan_rowid_ranges(clean_schema):
    """Reduced-scale replica of the reference's wide-scan harness
    (vastdb/bench/test_sample.py:146-204: 10k float cols, queries select a
    random column subset over ORed ``vastdb_rowid.between`` row-group
    ranges): 400 float32 columns x 20k rows with external row ids; a
    5-range ORed rowid scan over 60 random columns must (a) return exactly
    the ranges' rows, (b) push the rowid ranges into the parquet scan, and
    (c) prune the unselected 340 columns from ReadSchema."""
    import random

    from pyspark.sql import functions as F

    from vastdb_sdk_spark.plans import inspect as pi

    ncols, nrows = 400, 20_000
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        schema = pa.schema(
            [("vastdb_rowid", pa.int64())]
            + [(f"c{i}", pa.float32()) for i in range(ncols)]
        )
        t = s.create_table("wide", schema, use_external_row_ids_allocation=True)
        spark = t.spark
        src = spark.range(nrows).select(
            F.col("id").alias("vastdb_rowid"),
            *[
                (F.col("id") * (i + 1)).cast("float").alias(f"c{i}")
                for i in range(ncols)
            ],
        )
        t.insert_df(src)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("wide")
        rng = random.Random(42)
        sel = sorted(rng.sample(range(ncols), 60))
        cols = [f"c{i}" for i in sel]
        ranges = [(k * 4000, k * 4000 + 99) for k in range(5)]  # 5 x 100 rows
        pred = None
        for lo, hi in ranges:
            term = D.vastdb_rowid.between(lo, hi)
            pred = term if pred is None else (pred | term)
        df = t.select_df(columns=cols + ["vastdb_rowid"], predicate=pred)
        rows = df.collect()
        assert len(rows) == 500
        # value spot-check: c_i at rowid r is r*(i+1)
        r0 = {r.vastdb_rowid: r for r in rows}
        probe = sel[7]
        assert r0[4050][f"c{probe}"] == float(4050 * (probe + 1))
        # pushdown + pruning
        plan = pi.formatted_plan(df)
        assert "vastdb_rowid" in plan
        dropped = [f"c{i}" for i in range(ncols) if i not in sel][:5]
        for c in dropped:
            pi.assert_column_pruned(df, c)


def test_dedup_rows_in_place(clean_schema):
    """Engine-tier exact dedup: duplicate rows across TWO imports are
    DV-masked in place (no file rewrite), keeper = lowest $row_id,
    idempotent on re-run, and key-scoped dedup keeps one row per key."""
    import pyarrow.parquet as _pq

    a = pa.table(
        {
            "k": pa.array(list(range(1, 11)), pa.int64()),
            "v": pa.array([f"a{i}" for i in range(1, 11)]),
        }
    )
    # file B: 2 exact dups of A (20% of B — below the 30% fold threshold,
    # so B keeps a DV sidecar instead of being rewritten) + 8 new rows
    b = pa.table(
        {
            "k": pa.array([1, 2] + list(range(11, 19)), pa.int64()),
            "v": pa.array(["a1", "a2"] + [f"a{i}" for i in range(11, 19)]),
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("d", a.schema)
        t.insert(a)
        t.insert(b)
        assert t.count_rows() == 20
        t.dedup_rows()  # all-columns dedup
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("d")
        assert t.count_rows() == 18
        rows = t.select(internal_row_id=True).read_all()
        # keepers of the dup pair are the FIRST insert's ids (0,1 not 10,11)
        kept_ids = sorted(rows.column("$row_id").to_pylist())
        assert kept_ids == list(range(10)) + list(range(12, 20))
        # dups were DV-masked in place, not rewritten
        assert any(fe.dv_paths for fe in t.entry.files)
        t.dedup_rows()  # idempotent
        assert t.count_rows() == 18
        # key-scoped: duplicate k values collapse to the lowest $row_id
        t.insert(
            pa.table({"k": pa.array([3, 4], pa.int64()), "v": pa.array(["z3", "z4"])})
        )
        t.dedup_rows(columns=["k"])
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("d")
        got = {r["k"]: r["v"] for r in t.select().read_all().to_pylist()}
        assert got[3] == "a3" and got[4] == "a4" and len(got) == 18
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        with _pytest.raises(vastdb.InvalidArgument):
            t.dedup_rows(columns=["nope"])


def test_dedup_near_rows_in_place(clean_schema):
    """Near-dup table cleanup: a chain of incrementally-edited copies
    collapses transitively to the lowest-$row_id original; unrelated docs
    survive; idempotent on re-run."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    other = "one two three four five six seven eight nine ten " * 4
    data = pa.table(
        {
            "doc": pa.array(
                [
                    base,                       # 0 keeper
                    base + "tail1",             # 1 near-dup of 0
                    base + "tail1 tail2",       # 2 near-dup of 1 (chain)
                    other,                      # 3 unrelated keeper
                    other + "xx",               # 4 near-dup of 3
                ]
            )
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("nd", data.schema)
        t.insert(data)
        t.dedup_near_rows("doc", threshold=0.8)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("nd")
        rows = t.select(internal_row_id=True).read_all()
        assert sorted(rows.column("$row_id").to_pylist()) == [0, 3]
        t.dedup_near_rows("doc", threshold=0.8)  # idempotent
        assert t.count_rows() == 2
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        with _pytest.raises(vastdb.InvalidArgument):
            t.dedup_near_rows("nope")


def test_dedup_near_rows_simhash(clean_schema):
    """method='simhash': planted fingerprint-near copies collapse to the
    lowest $row_id; unrelated docs survive; idempotent. The base doc needs
    a wide distinct vocabulary: with few distinct tokens, one edit swings
    many tight per-bit vote margins and the hamming distance blows past
    the budget (measured: 60 distinct tokens -> distance 2 for a one-token
    edit; 10 distinct tokens repeated -> distance > 3)."""
    base = " ".join(f"tok{i}" for i in range(60))
    other = "one two three four five six seven eight nine ten " * 4
    data = pa.table(
        {
            "doc": pa.array(
                [
                    base,               # 0 keeper
                    base + " tok0",     # 1 one extra token: hamming 2 from 0
                    other,              # 2 unrelated keeper (hamming ~31)
                ]
            )
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("nds", data.schema)
        t.insert(data)
        t.dedup_near_rows("doc", method="simhash", max_hamming=3)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("nds")
        rows = t.select(internal_row_id=True).read_all()
        assert sorted(rows.column("$row_id").to_pylist()) == [0, 2]
        t.dedup_near_rows("doc", method="simhash", max_hamming=3)  # idempotent
        assert t.count_rows() == 2
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        # a string column under method='embedding' (and vice versa) is loud
        with _pytest.raises(vastdb.InvalidArgument, match="list column"):
            t.dedup_near_rows("doc", method="embedding")
        with _pytest.raises(vastdb.InvalidArgument, match="unknown dedup"):
            t.dedup_near_rows("doc", method="fuzzy")


def test_dedup_near_rows_embedding(clean_schema):
    """method='embedding': cosine-near vectors collapse transitively;
    orthogonal vectors survive; string-method on a vector column raises."""
    vecs = [
        [1.0, 0.0, 0.0, 0.0],          # 0 keeper
        [0.999, 0.01, 0.0, 0.0],       # 1 cosine ~1.0 with 0
        [0.998, 0.02, 0.001, 0.0],     # 2 cosine-near 0/1 (chain)
        [0.0, 1.0, 0.0, 0.0],          # 3 orthogonal keeper
    ]
    data = pa.table({"emb": pa.array(vecs, pa.list_(pa.float64()))})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("nde", data.schema)
        t.insert(data)
        t.dedup_near_rows(
            "emb", method="embedding", threshold=0.95, num_planes=8,
            num_bands=4, dim=4,
        )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("nde")
        rows = t.select(internal_row_id=True).read_all()
        assert sorted(rows.column("$row_id").to_pylist()) == [0, 3]
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        with _pytest.raises(vastdb.InvalidArgument, match="string column"):
            t.dedup_near_rows("emb", method="minhash")


def test_dedup_rows_respects_snapshots_and_vacuum(clean_schema):
    """Time travel across an in-place dedup: a snapshot taken before
    dedup_rows still reads every duplicate; vacuum after the fold only
    removes files no committed manifest references."""
    data = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
        t.insert(data)
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").create_snapshot("before")
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("t").dedup_rows()
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        assert t.count_rows() == 3
        snap = tx.bucket("bkt").snapshot("before")
        assert snap.schema("s").table("t").count_rows() == 6
    # snapshot-referenced files survive vacuum; dropping the snapshot
    # releases them
    clean_schema.vacuum("bkt", keep_snapshots=True)
    with clean_schema.transaction() as tx:
        snap = tx.bucket("bkt").snapshot("before")
        assert snap.schema("s").table("t").count_rows() == 6
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").drop_snapshot("before")
    clean_schema.vacuum("bkt", keep_snapshots=False)
    with clean_schema.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("t").count_rows() == 3


def test_dedup_rows_noop_and_map_key_guard(clean_schema):
    """A duplicate-free dedup_rows is a TRUE no-op: no manifest mutation,
    no audit event, projections stay fresh. Map-typed key columns are
    rejected up front (Spark cannot partition on maps)."""
    import vastdb_sdk_spark as vastdb

    data = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("n", data.schema)
        t.insert(data)
        t.create_projection("p", ["a"], [])
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("n")
        t.dedup_rows()  # nothing to dedup
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("n")
        assert "dedup_rows" not in [r.op for r in t.history().collect()]
        assert t.count_rows() == 3
    mschema = pa.schema(
        [("k", pa.int64()), ("m", pa.map_(pa.string(), pa.int64()))]
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("mp", mschema)
        with pytest.raises(vastdb.InvalidArgument, match="map-typed"):
            t.dedup_rows()
        t.dedup_rows(columns=["k"])  # explicit non-map key is fine (empty table)


def test_wide_ingest_chunked_column_updates(clean_schema):
    """Reduced-scale replica of the reference ingest harness
    (vastdb/bench/test_sample.py:46-143: wide rows inserted, then updated
    in 10-column chunks keyed by rowid): 120 float32 columns x 2k rows
    with external rowids; three 10-column chunk updates must land without
    touching the other 90 columns."""
    ncols, nrows = 120, 2000
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        schema = pa.schema(
            [("vastdb_rowid", pa.int64())]
            + [(f"c{i}", pa.float32()) for i in range(ncols)]
        )
        t = s.create_table("wi", schema, use_external_row_ids_allocation=True)
        spark = t.spark
        src = spark.range(nrows).select(
            F.col("id").alias("vastdb_rowid"),
            *[(F.col("id") * (i + 1)).cast("float").alias(f"c{i}") for i in range(ncols)],
        )
        t.insert_df(src)
    for chunk in range(3):
        cols = [f"c{chunk * 10 + j}" for j in range(10)]
        with clean_schema.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("wi")
            upd = {
                "$row_id": pa.array(range(0, 100), pa.uint64()),
                **{
                    c: pa.array([float(-1 - chunk)] * 100, pa.float32())
                    for c in cols
                },
            }
            t.update(pa.table(upd))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("wi")
        assert t.count_rows() == nrows
        got = t.select_df(
            columns=["vastdb_rowid", "c0", "c15", "c29", "c30", "c119"],
            predicate=(D.vastdb_rowid < 100),
        ).collect()
        assert len(got) == 100
        for r in got:
            assert r.c0 == -1.0 and r.c15 == -2.0 and r.c29 == -3.0
            # untouched columns keep their original derived values
            assert r.c30 == float(r.vastdb_rowid * 31)
            assert r.c119 == float(r.vastdb_rowid * 120)
        # rows past the updated range are fully pristine
        far = t.select_df(
            columns=["vastdb_rowid", "c5"], predicate=(D.vastdb_rowid == 1500)
        ).collect()[0]
        assert far.c5 == float(1500 * 6)


def test_parallel_selective_queries(clean_schema):
    """Reference concurrency smoke (vastdb/vast_tests/test_scale.py:14-35:
    10 parallel selective queries): ten threads issue selective scans with
    different predicates against one engine table concurrently; every
    thread must get its exact count (Spark actions are thread-safe and the
    manifest snapshot each transaction pinned is immutable)."""
    from concurrent.futures import ThreadPoolExecutor

    data = pa.table(
        {
            "k": pa.array(list(range(2000)), pa.int64()),
            "grp": pa.array([i % 10 for i in range(2000)], pa.int64()),
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("pq", data.schema)
        t.insert(data)

    def probe(g):
        with clean_schema.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("pq")
            return g, t.count_rows(predicate=(D.grp == g))

    with ThreadPoolExecutor(max_workers=10) as pool:
        got = dict(pool.map(probe, range(10)))
    assert got == {g: 200 for g in range(10)}


def test_sequential_full_scans_stable(clean_schema):
    """Reference HA-latency harness shape (vastdb/vast_tests/test_ha.py:
    12-29: 50 sequential full scans, per-query seconds logged): 25
    sequential full scans must all agree, and latency must not degrade
    (no per-scan state accumulates — generous 5x bound so machine noise
    cannot flake the test; a genuine leak grows far past that)."""
    import time as _time

    data = pa.table({"v": pa.array(range(200_000), pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("ha", data.schema)
        t.insert(data)
    times = []
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("ha")
        for _ in range(25):
            t0 = _time.time()
            assert t.count_rows() == 200_000
            times.append(_time.time() - t0)
    first5 = sum(times[:5]) / 5
    last5 = sum(times[-5:]) / 5
    assert last5 < 5 * first5 + 0.25, (first5, last5)


def test_drop_passage_dup_rows_in_place(clean_schema):
    """Passage-level in-place cleanup: rows dominated by cross-document
    k-token passages are DV-masked (BOTH copies — it is a boilerplate
    filter, not keep-one dedup); lightly-overlapping and unrelated rows
    survive; second pass removes nothing more."""
    boiler = "terms of service apply to all users of this site always " * 3
    data = pa.table(
        {
            "doc": pa.array(
                [
                    boiler,                                        # 0: all dup
                    boiler + " unique closing line here",          # 1: mostly dup
                    "completely original prose with its own words "
                    "and no shared passages at all in any window "
                    "of eight tokens anywhere in this document",   # 2: clean
                ]
            )
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("pd", data.schema)
        t.insert(data)
        t.drop_passage_dup_rows("doc", k=8, max_dup_fraction=0.5)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("pd")
        rows = t.select(internal_row_id=True).read_all()
        assert sorted(rows.column("$row_id").to_pylist()) == [2]
        t.drop_passage_dup_rows("doc", k=8, max_dup_fraction=0.5)  # no-op
        assert t.count_rows() == 1
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        with _pytest.raises(vastdb.InvalidArgument):
            t.drop_passage_dup_rows("nope")


def test_dedup_near_rows_semantic(clean_schema):
    """method='semantic' (SemDeDup candidates): scaled copies collapse to
    the lowest $row_id within their k-means cluster; distinct vectors
    survive; idempotent on re-run."""
    import numpy as np

    rng = np.random.default_rng(13)
    base = rng.standard_normal((20, 8))
    vecs = [v.tolist() for v in base]
    vecs += [(2.0 * base[3]).tolist(), (4.0 * base[7]).tolist()]  # rows 20, 21
    data = pa.table({"emb": pa.array(vecs, pa.list_(pa.float64()))})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("sde", data.schema)
        t.insert(data)
        t.dedup_near_rows(
            "emb", method="semantic", threshold=0.95, num_centroids=4
        )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("sde")
        rows = sorted(
            t.select(internal_row_id=True).read_all().column("$row_id").to_pylist()
        )
        assert rows == list(range(20))  # the scaled copies are gone
        # idempotent: no qualifying pairs remain -> true no-op commit
        t.dedup_near_rows("emb", method="semantic", threshold=0.95, num_centroids=4)
        assert t.count_rows() == 20


def test_cap_rows_per_group_in_place(clean_schema):
    """Engine-tier per-group quota (cap_rows_per_group): losers beyond
    the md5($row_id)-first n per group are DV-masked in place; the
    survivor set matches the hash order exactly, a re-run is a TRUE
    no-op (no second audit event), and validation rejects bad args."""
    import hashlib

    import vastdb_sdk_spark as vastdb

    data = pa.table(
        {
            "g": pa.array(["a"] * 20 + ["b"] * 5 + ["c"], pa.string()),
            "v": pa.array(list(range(26)), pa.int64()),
        }
    )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("cap", data.schema)
        t.insert(data)
        t.cap_rows_per_group(["g"], 4)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("cap")
        assert t.count_rows() == 4 + 4 + 1
        rows = t.select(internal_row_id=True).read_all()
        got = sorted(rows.column("$row_id").to_pylist())
        # survivors = md5(str(row_id))-first 4 ids of each group; insert
        # order gave group a ids 0..19, b 20..24, c 25
        expected = []
        for ids, cap in ((range(20), 4), (range(20, 25), 4), ([25], 4)):
            ranked = sorted(ids, key=lambda i: (hashlib.md5(
                str(i).encode()).hexdigest(), i))
            expected += ranked[:cap]
        assert got == sorted(expected)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("cap")
        t.cap_rows_per_group(["g"], 4)  # already at quota -> true no-op
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("cap")
        assert t.count_rows() == 9
        ops = [r.op for r in t.history().collect()]
        assert ops.count("cap_rows_per_group") == 1
        with pytest.raises(vastdb.InvalidArgument, match="unknown columns"):
            t.cap_rows_per_group(["nope"], 4)
        with pytest.raises(vastdb.InvalidArgument, match="must be >= 1"):
            t.cap_rows_per_group(["g"], 0)
        with pytest.raises(vastdb.InvalidArgument, match="non-empty"):
            t.cap_rows_per_group([], 4)


def test_dedup_near_rows_tfidf(clean_schema):
    """method='tfidf': reworded same-bag rows (the case shingle MinHash
    misses) collapse to the lowest $row_id; disjoint-vocabulary rows
    survive; idempotent; invalid method rejected."""
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    bag = " ".join(words * 3)
    reordered = " ".join(list(reversed(words)) * 3)  # same bag -> cosine 1.0
    other = "one two three four five six seven eight " * 3
    data = pa.table({"doc": pa.array([bag, reordered, other])})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("ndt", data.schema)
        t.insert(data)
        t.dedup_near_rows("doc", method="tfidf", threshold=0.9, max_df=3)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("ndt")
        rows = t.select(internal_row_id=True).read_all()
        assert sorted(rows.column("$row_id").to_pylist()) == [0, 2]
        t.dedup_near_rows("doc", method="tfidf", threshold=0.9, max_df=3)
        assert t.count_rows() == 2
        import pytest as _pytest

        import vastdb_sdk_spark as vastdb

        with _pytest.raises(vastdb.InvalidArgument, match="unknown dedup"):
            t.dedup_near_rows("doc", method="nope")

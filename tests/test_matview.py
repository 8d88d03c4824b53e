"""Materialized aggregate views: build correctness, incremental
maintenance via the change feed, bucket-scoped rewrites, staleness
lifecycle, SQL verbs, and vacuum liveness (matview.py; lifecycle parity
model: the reference's projection objects, vastdb/table.py:1040-1138)."""

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

import vastdb_sdk_spark as vastdb
from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.errors import (
    InvalidArgument,
    MatViewExists,
    MissingMatView,
    NotSupportedCommand,
)
from vastdb_sdk_spark.sources import create_table_from_files

SF = "/root/testdata/sf0.001"


def _docs(clean_schema):
    with clean_schema.transaction() as tx:
        sc = tx.bucket("bkt").schema("s")
        create_table_from_files(sc, "docs", [f"{SF}/documents.parquet"])
    return clean_schema


def _mv_rows(session, name="mv"):
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        return {
            tuple(r[: len(t.materialized_view(name).group_by)]): tuple(
                r[len(t.materialized_view(name).group_by):]
            )
            for r in t.materialized_view(name).df().collect()
        }


def _direct(session, keys, aggs):
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        rows = t.df().groupBy(*keys).agg(*aggs).collect()
        return {tuple(r[: len(keys)]): tuple(r[len(keys):]) for r in rows}


def test_create_and_read_matches_direct_aggregation(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        mv = t.create_materialized_view(
            "mv",
            ["lang", "source"],
            {
                "n": "count",
                "chars": ("sum", "n_chars"),
                "avg_chars": ("avg", "n_chars"),
                "min_id": ("min", "doc_id"),
                "max_chars": ("max", "n_chars"),
            },
            num_buckets=8,
        )
        assert not mv.stale
        assert mv.group_by == ["lang", "source"]
    got = _mv_rows(session)
    want = _direct(
        session,
        ["lang", "source"],
        [
            F.count("*"),
            F.sum("n_chars"),
            F.avg("n_chars"),
            F.min("doc_id"),
            F.max("n_chars"),
        ],
    )
    assert got == want


def test_additive_incremental_no_base_scan(clean_schema):
    """Insert + delete + update churn folds through the feed with NO base
    read (the 100 TB claim: maintenance cost tracks churn, not data)."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count", "chars": ("sum", "n_chars")},
            num_buckets=8,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.doc_id % 7 == 0)
        t.update_where(D.doc_id % 5 == 0, {"n_chars": 1})
        t.insert(
            pa.table(
                {
                    "doc_id": pa.array([900001, 900002], pa.int64()),
                    "text": pa.array(["a", "b"]),
                    "lang": pa.array(["zz", "zz"]),
                    "source": pa.array(["new", "new"]),
                    "n_chars": pa.array([10, None], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        mv = t.materialized_view("mv")
        assert mv.stale
        res = mv.refresh("incremental")
    assert res["mode"] == "incremental"
    assert res["base_scanned"] is False
    got = _mv_rows(session)
    want = _direct(session, ["lang"], [F.count("*"), F.sum("n_chars")])
    assert got == want


def test_minmax_incremental_recomputes_affected_groups_only(clean_schema):
    """Deleting a group's max forces the affected-group recompute path
    (base_scanned True); untouched buckets keep their files verbatim."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang", "source"],
            {"mx": ("max", "n_chars"), "n": "count"}, num_buckets=16,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        before = {
            fj["path"]: os.path.getmtime(fj["path"])
            for fj in t.materialized_view("mv")._cfg["files"]
        }
        # churn one (lang, source) group only
        row = t.df().select("lang", "source").first()
        t.delete_where((D.lang == row["lang"]) & (D.source == row["source"]))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["mode"] == "incremental"
        assert res["base_scanned"] is True
        assert res["buckets_rewritten"] == 1
        cfg = t.materialized_view("mv")._cfg
        untouched = [fj["path"] for fj in cfg["files"] if fj["path"] in before]
        # every bucket except the churn-touched one carries its file verbatim
        assert len(untouched) >= len(before) - 1
        for p in untouched:
            assert os.path.getmtime(p) == before[p]
    got = _mv_rows(session)
    want = _direct(session, ["lang", "source"], [F.max("n_chars"), F.count("*")])
    assert got == want


def test_group_vanishes_when_count_reaches_zero(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count"}, num_buckets=4
        )
        langs = [r[0] for r in t.df().select("lang").distinct().collect()]
    victim = sorted(langs)[0]
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.lang == victim)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["mode"] == "incremental"
    got = _mv_rows(session)
    assert victim not in {k[0] for k in got}
    assert got == _direct(session, ["lang"], [F.count("*")])


def test_group_key_change_update_moves_rows_between_groups(clean_schema):
    """An update that CHANGES a group key emits preimage(-old)/postimage
    (+new) — the delta merge must move the row across groups."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count", "chars": ("sum", "n_chars")},
            num_buckets=4,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.update_where(D.doc_id % 3 == 0, {"lang": "moved"})
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["base_scanned"] is False
    got = _mv_rows(session)
    want = _direct(session, ["lang"], [F.count("*"), F.sum("n_chars")])
    assert got == want
    assert ("moved",) in got


def test_refresh_noop_when_fresh_and_full_mode(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view("mv", ["lang"], {"n": "count"})
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        assert t.materialized_view("mv").refresh()["mode"] == "noop"
        assert t.materialized_view("mv").refresh("full")["mode"] == "full"
    assert _mv_rows(session) == _direct(session, ["lang"], [F.count("*")])


def test_staged_dml_forces_full_fallback(clean_schema):
    """Same hazard contract as refresh_vector_index / Projection.refresh:
    DML staged in THIS transaction is invisible to the committed-span feed,
    so auto falls back to full (which reads staged state) and strict
    incremental refuses."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view("mv", ["lang"], {"n": "count"})
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.doc_id % 2 == 0)  # staged, uncommitted
        with pytest.raises(NotSupportedCommand):
            t.materialized_view("mv").refresh("incremental")
        res = t.materialized_view("mv").refresh("auto")
        assert res["mode"] == "full"
    assert _mv_rows(session) == _direct(session, ["lang"], [F.count("*")])


def test_null_group_keys_are_groups(clean_schema):
    """NULL is a group in GROUP BY semantics: the delta merge joins
    null-safely, so churn on the NULL group maintains it correctly."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.insert(
            pa.table(
                {
                    "doc_id": pa.array([800001, 800002, 800003], pa.int64()),
                    "text": pa.array(["n1", "n2", "n3"]),
                    "lang": pa.array([None, None, "en"], pa.string()),
                    "source": pa.array(["x", "x", "x"]),
                    "n_chars": pa.array([5, 6, 7], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count", "chars": ("sum", "n_chars")},
            num_buckets=4,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.doc_id == 800001)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["mode"] == "incremental"
    got = _mv_rows(session)
    want = _direct(session, ["lang"], [F.count("*"), F.sum("n_chars")])
    assert got == want
    assert (None,) in got and got[(None,)] == (1, 6)


def test_rename_column_keeps_view_valid(clean_schema):
    """Config stores physical names; a metadata-only rename neither breaks
    the view nor marks it stale."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"chars": ("sum", "n_chars")}, num_buckets=4
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.rename_column("lang", "language")
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        mv = t.materialized_view("mv")
        assert mv.group_by == ["language"]
        got = {r[0]: r[1] for r in mv.df().collect()}
        want = {
            r[0]: r[1]
            for r in t.df().groupBy("language").agg(F.sum("n_chars")).collect()
        }
        assert got == want
        assert "language" in mv.df().columns


def test_lifecycle_errors_and_listing(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("mv", [], {"n": "count"})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("mv", ["lang"], {})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("mv", ["nope"], {"n": "count"})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("mv", ["lang"], {"x": ("median", "n_chars")})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("mv", ["lang"], {"x": ("sum", "nope")})
        t.create_materialized_view("mv", ["lang"], {"n": "count"})
        with pytest.raises(MatViewExists):
            t.create_materialized_view("mv", ["lang"], {"n": "count"})
        with pytest.raises(MissingMatView):
            t.materialized_view("ghost")
        assert [m.name for m in t.materialized_views()] == ["mv"]
        st = t.materialized_view("mv").get_stats()
        assert st.num_rows == t.df().select("lang").distinct().count()
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.materialized_view("mv").drop()
        assert t.materialized_views() == []


def test_vacuum_keeps_matview_files(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view("mv", ["lang"], {"n": "count"}, num_buckets=4)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        paths = [fj["path"] for fj in t.materialized_view("mv")._cfg["files"]]
    assert paths
    session.vacuum("bkt")
    for p in paths:
        assert os.path.exists(p)
    # dropping the view orphans its state files; vacuum then reclaims them
    with session.transaction() as tx:
        tx.bucket("bkt").schema("s").table("docs").materialized_view("mv").drop()
    deleted = session.vacuum("bkt")
    assert set(paths) <= set(os.path.abspath(p) for p in deleted)


def test_sql_verbs_roundtrip(clean_schema):
    session = _docs(clean_schema)
    r = session.execute_sql(
        "CREATE MATERIALIZED VIEW mv ON bkt.s.docs GROUP BY (source) "
        "AGG (n=count, chars=sum(n_chars), mx=max(n_chars)) BUCKETS 4"
    )
    assert r == {"created_matview": "mv"}
    with session.transaction() as tx:
        tx.bucket("bkt").schema("s").table("docs").delete_where(
            D.doc_id % 9 == 0
        )
    r = session.execute_sql(
        "REFRESH MATERIALIZED VIEW mv ON bkt.s.docs MODE INCREMENTAL"
    )
    assert r["mode"] == "incremental"
    got = _mv_rows(session)
    want = _direct(
        session, ["source"], [F.count("*"), F.sum("n_chars"), F.max("n_chars")]
    )
    assert got == want
    assert session.execute_sql("DROP MATERIALIZED VIEW mv ON bkt.s.docs") == {
        "dropped_matview": "mv"
    }


def test_snapshot_restore_rolls_back_matview_state(clean_schema):
    """The MV config lives in the manifest: restoring a snapshot restores
    the view to the files/staleness it had at that version."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view("mv", ["lang"], {"n": "count"}, num_buckets=4)
    before = _mv_rows(session)
    with session.transaction() as tx:
        tx.bucket("bkt").create_snapshot("pre_churn")
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.doc_id % 2 == 0)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.materialized_view("mv").refresh()
    assert _mv_rows(session) != before
    with session.transaction() as tx:
        snap = tx.bucket("bkt").snapshot("pre_churn")
        t = snap.schema("s").table("docs")
        got = {
            (r[0],): (r[1],)
            for r in t.materialized_view("mv").df().collect()
        }
    assert got == before


def test_approx_distinct_hll_state_merges_incrementally(clean_schema):
    """approx_distinct persists a Datasketches HLL sketch per group:
    append-only churn UNIONS sketches (no base read) and the merged
    sketch must estimate exactly what a full rebuild estimates; a
    removal span forces the affected-group recompute."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"],
            {"n": "count", "u_src": ("approx_distinct", "source")},
            num_buckets=4,
        )
        baseline = {r["lang"]: r["u_src"] for r in
                    t.materialized_view("mv").df().collect()}
        exact = {r["lang"]: r["u"] for r in
                 t.df().groupBy("lang").agg(
                     F.countDistinct("source").alias("u")).collect()}
        # few distinct sources per lang -> HLL is exact at this cardinality
        assert baseline == exact
    # append-only churn: new sources in one lang
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.insert(
            pa.table(
                {
                    "doc_id": pa.array([700001, 700002], pa.int64()),
                    "text": pa.array(["a", "b"]),
                    "lang": pa.array(["en", "en"]),
                    "source": pa.array(["brand_new_1", "brand_new_2"]),
                    "n_chars": pa.array([5, 6], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["base_scanned"] is False  # hll_union, no base read
        got = {r["lang"]: r["u_src"] for r in
               t.materialized_view("mv").df().collect()}
        # union must equal the full-rebuild estimate
        t.materialized_view("mv").refresh("full")
        full = {r["lang"]: r["u_src"] for r in
                t.materialized_view("mv").df().collect()}
        assert got == full
        assert got["en"] == exact["en"] + 2
    # removal span: sketches can't subtract -> affected-group recompute
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.delete_where(D.source == "brand_new_1")
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        res = t.materialized_view("mv").refresh("incremental")
        assert res["base_scanned"] is True
        got = {r["lang"]: r["u_src"] for r in
               t.materialized_view("mv").df().collect()}
        want = {r["lang"]: r["u"] for r in
                t.df().groupBy("lang").agg(
                    F.countDistinct("source").alias("u")).collect()}
        assert got == want


def test_aggregate_df_routes_to_covering_rollup(clean_schema):
    """aggregate_df over a key SUBSET folds the view's state (count of
    counts, sum of sums, min/max of min/max, HLL union) — results equal
    the direct base aggregation, and the routing is observable."""
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "by_ls", ["lang", "source"],
            {
                "n": "count",
                "chars": ("sum", "n_chars"),
                "mx": ("max", "n_chars"),
                "u": ("approx_distinct", "source"),
            },
            num_buckets=8,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        spec = {
            "n": "count",
            "chars": ("sum", "n_chars"),
            "avg_chars": ("avg", "n_chars"),  # served from sum+nn state
            "mx": ("max", "n_chars"),
            "u_src": ("approx_distinct", "source"),
        }
        assert t.explain_aggregate(["lang"], spec) == {
            "served_by": "matview:by_ls"
        }
        got = {r["lang"]: tuple(r[1:]) for r in
               t.aggregate_df(["lang"], spec).collect()}
        want = {r["lang"]: tuple(r[1:]) for r in
                t.df().groupBy("lang").agg(
                    F.count("*"), F.sum("n_chars"), F.avg("n_chars"),
                    F.max("n_chars"),
                    F.hll_sketch_estimate(F.hll_sketch_agg("source")),
                ).collect()}
        assert got == want
        # exact key match routes too; empty group_by folds to one row
        assert t.explain_aggregate(["lang", "source"], {"n": "count"}) == {
            "served_by": "matview:by_ls"
        }
        total = t.aggregate_df([], {"n": "count"}).collect()[0]["n"]
        assert total == t.df().count()


def test_aggregate_df_falls_back_to_base(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count", "chars": ("sum", "n_chars")},
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        # key not covered (source not in view keys)
        assert t.explain_aggregate(["source"], {"n": "count"}) == {
            "served_by": "base"
        }
        # agg not covered (no min state)
        assert t.explain_aggregate(["lang"], {"m": ("min", "n_chars")}) == {
            "served_by": "base"
        }
        got = {r["source"]: r["n"] for r in
               t.aggregate_df(["source"], {"n": "count"}).collect()}
        want = {r["source"]: r["cnt"] for r in
                t.df().groupBy("source").agg(F.count("*").alias("cnt")).collect()}
        assert got == want
        # stale view never serves
        t.delete_where(D.doc_id % 2 == 0)
        assert t.explain_aggregate(["lang"], {"n": "count"}) == {
            "served_by": "base"
        }
        # ...and the base fallback sees the staged deletes immediately
        n = t.aggregate_df(["lang"], {"n": "count"}, use_matviews=False)
        assert sum(r["n"] for r in n.collect()) == t.df().count()


def test_show_materialized_views_sql(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view(
            "mv", ["lang"], {"n": "count", "c": ("sum", "n_chars")},
        )
    rows = session.execute_sql(
        "SHOW MATERIALIZED VIEWS ON bkt.s.docs"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["view_name"] == "mv" and r["group_by"] == "lang"
    assert "c=sum(n_chars)" in r["aggs"] and r["stale"] is False
    assert r["num_groups"] > 0


def test_time_bucket_keys_continuous_aggregate(clean_schema):
    """Time-bucketed MV keys (the hypertable/continuous-aggregate shape):
    a daily (day, event_type) view over the events stream maintains
    incrementally, and aggregate_df with the same bucket spec routes to
    it — including a coarser rollup to just the day."""
    session = clean_schema
    DAY = 86_400_000_000
    with session.transaction() as tx:
        create_table_from_files(
            tx.bucket("bkt").schema("s"), "events", [f"{SF}/events.parquet"]
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        t.create_materialized_view(
            "daily",
            [("day", "ts", DAY), "event_type"],
            {"n": "count", "total": ("sum", "value")},
            num_buckets=8,
        )
        mv = t.materialized_view("daily")
        got = {(r["day"], r["event_type"]): (r["n"], round(r["total"], 6))
               for r in mv.df().collect()}
        want = {(r["d"], r["event_type"]): (r["n"], round(r["s"], 6))
                for r in t.df().groupBy(
                    (F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                             / DAY) * DAY).alias("d"),
                    "event_type",
                ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .collect()}
        assert got == want and len(got) > 5
    # churn + incremental refresh keeps bucketed groups correct
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        t.delete_where(D.event_id % 5 == 0)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        res = t.materialized_view("daily").refresh("incremental")
        assert res["mode"] == "incremental" and res["base_scanned"] is False
        got = {(r["day"], r["event_type"]): (r["n"], round(r["total"], 6))
               for r in t.materialized_view("daily").df().collect()}
        want = {(r["d"], r["event_type"]): (r["n"], round(r["s"], 6))
                for r in t.df().groupBy(
                    (F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                             / DAY) * DAY).alias("d"),
                    "event_type",
                ).agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .collect()}
        assert got == want
        # routing: same bucket spec routes; coarser day-only rollup too
        spec = {"n": "count", "total": ("sum", "value")}
        assert t.explain_aggregate(
            [("d", "ts", DAY), "event_type"], spec
        ) == {"served_by": "matview:daily"}
        assert t.explain_aggregate([("d", "ts", DAY)], spec) == {
            "served_by": "matview:daily"
        }
        # different step does NOT route
        assert t.explain_aggregate([("h", "ts", DAY // 24)], spec) == {
            "served_by": "base"
        }
        by_day = {r["d"]: r["n"] for r in
                  t.aggregate_df([("d", "ts", DAY)], spec).collect()}
        base_by_day = {r["d"]: r["n"] for r in
                       t.aggregate_df([("d", "ts", DAY)], spec,
                                      use_matviews=False).collect()}
        assert by_day == base_by_day
    # validation
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("bad", [("value", "ts", DAY)], {"n": "count"})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("bad", [("d", "ts", 0)], {"n": "count"})
        with pytest.raises(InvalidArgument):
            t.create_materialized_view("bad", [("_mv_x", "ts", DAY)], {"n": "count"})


def test_time_bucket_sql_verb(clean_schema):
    session = clean_schema
    with session.transaction() as tx:
        create_table_from_files(
            tx.bucket("bkt").schema("s"), "events", [f"{SF}/events.parquet"]
        )
    r = session.execute_sql(
        "CREATE MATERIALIZED VIEW daily ON bkt.s.events "
        "GROUP BY (day=bucket(ts, 86400000000), event_type) "
        "AGG (n=count, total=sum(value)) BUCKETS 4"
    )
    assert r == {"created_matview": "daily"}
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        mv = t.materialized_view("daily")
        assert mv.df().columns[:2] == ["day", "event_type"]
        assert mv.df().count() > 5


def test_matview_binds_into_tx_sql(clean_schema):
    session = _docs(clean_schema)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        t.create_materialized_view("mv", ["lang"], {"n": "count"})
        got = {
            r["lang"]: r["n"]
            for r in tx.sql(
                "SELECT lang, n FROM mv ORDER BY lang",
                mv=t.materialized_view("mv"),
            ).collect()
        }
        want = {r["lang"]: r["cnt"] for r in
                t.df().groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert got == want


def test_count_col_is_nonnull_count(clean_schema):
    """count(col) must be the NON-NULL count: normalize_aggs accepted
    ('count', col) but the state served _mv_count (COUNT(*)), silently
    counting nulls. Covers the fresh build, the incremental fold, and the
    state rollup."""
    import pyarrow as pa

    session = clean_schema
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "nn", pa.schema([("k", pa.string()), ("v", pa.int64())])
        )
        t.insert(pa.table({
            "k": ["a", "a", "a", "b", "b"],
            "v": pa.array([1, None, 3, None, None], pa.int64()),
        }))
        t.create_materialized_view(
            "mv", ["k"],
            {"rows": "count", "vals": ("count", "v"), "sv": ("sum", "v")},
            num_buckets=4,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("nn")
        got = {r["k"]: (r["rows"], r["vals"]) for r in t.materialized_view("mv").df().collect()}
        assert got == {"a": (3, 2), "b": (2, 0)}
        # incremental fold: one new null and one new non-null per group
        t.insert(pa.table({
            "k": ["a", "b"], "v": pa.array([None, 7], pa.int64()),
        }))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("nn")
        mv = t.materialized_view("mv")
        assert mv.stale
        res = mv.refresh()
        assert res["mode"] in ("incremental", "full")
        got = {r["k"]: (r["rows"], r["vals"]) for r in mv.df().collect()}
        assert got == {"a": (4, 2), "b": (3, 1)}
        # rollup to the empty key subset folds non-null counts by addition
        rolled = t.aggregate_df([], {
            "vals": ("count", "v"), "rows": "count",
        })
        row = rolled.collect()[0]
        assert (row["rows"], row["vals"]) == (7, 3)

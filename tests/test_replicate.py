"""CDC replication (sources/replicate.sync_table): feed-driven mirror
maintenance — initial full sync, churn-bounded incremental sync,
net-effect key semantics, cursor idempotence, cross-bucket targets."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.errors import InvalidArgument
from vastdb_sdk_spark.sources import create_table_from_files
from vastdb_sdk_spark.sources.replicate import sync_table

SF = "/root/testdata/sf0.001"


def _pair(clean_schema, dst_schema_name="s"):
    with clean_schema.transaction() as tx:
        sc = tx.bucket("bkt").schema("s")
        create_table_from_files(sc, "src", [f"{SF}/documents.parquet"])
        dsc = (
            sc
            if dst_schema_name == "s"
            else tx.bucket("bkt").create_schema(dst_schema_name)
        )
        dsc.create_table("dst", sc.table("src").arrow_schema)
    return clean_schema


def _tables(tx, dst_schema="s"):
    return (
        tx.bucket("bkt").schema("s").table("src"),
        tx.bucket("bkt").schema(dst_schema).table("dst"),
    )


def _rows(t):
    return sorted(tuple(r) for r in t.select_df().collect())


def test_initial_then_incremental_sync_row_identical(clean_schema):
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        r = sync_table(src, dst, ["doc_id"])
        assert r["upserts"] == 500 and r["deletes"] == 0
    with session.transaction() as tx:
        src, dst = _tables(tx)
        assert _rows(src) == _rows(dst)
    with session.transaction() as tx:
        src, _ = _tables(tx)
        schema = src.arrow_schema
        src.delete_where(D.doc_id % 7 == 0)
        src.update_where(D.doc_id % 5 == 0, {"n_chars": -1})
        src.insert(
            pa.table(
                {
                    "doc_id": pa.array([9001], pa.int64()),
                    "text": pa.array(["x"]),
                    "lang": pa.array(["zz"]),
                    "source": pa.array(["n"]),
                    "n_chars": pa.array([1], pa.int64()),
                }
            ).cast(schema)
        )
    with session.transaction() as tx:
        src, dst = _tables(tx)
        r = sync_table(src, dst, ["doc_id"])
        assert r["deletes"] > 0 and r["upserts"] > 0
    with session.transaction() as tx:
        src, dst = _tables(tx)
        assert _rows(src) == _rows(dst)
        # cursor advanced: replay applies nothing
        r = sync_table(src, dst, ["doc_id"])
        assert r["upserts"] == 0 and r["deletes"] == 0


def test_delete_and_reinsert_same_key_is_one_upsert(clean_schema):
    """A key removed under one $row_id and re-materialized under another
    inside the span must land as ONE upsert, not a delete."""
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:
        src, _ = _tables(tx)
        schema = src.arrow_schema
        src.delete_where(D.doc_id == 10)
        src.insert(
            pa.table(
                {
                    "doc_id": pa.array([10], pa.int64()),
                    "text": pa.array(["reborn"]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["n"]),
                    "n_chars": pa.array([6], pa.int64()),
                }
            ).cast(schema)
        )
    with session.transaction() as tx:
        src, dst = _tables(tx)
        r = sync_table(src, dst, ["doc_id"])
        assert r["deletes"] == 0  # net effect: the key survives
    with session.transaction() as tx:
        src, dst = _tables(tx)
        got = dst.select_df(predicate=(D.doc_id == 10)).collect()
        assert len(got) == 1 and got[0]["text"] == "reborn"
        assert _rows(src) == _rows(dst)


def test_cross_schema_replica_and_validation(clean_schema):
    session = _pair(clean_schema, dst_schema_name="mirror")
    with session.transaction() as tx:
        src, dst = _tables(tx, dst_schema="mirror")
        sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:
        src, _ = _tables(tx, dst_schema="mirror")
        src.delete_where(D.doc_id % 2 == 0)
    with session.transaction() as tx:
        src, dst = _tables(tx, dst_schema="mirror")
        sync_table(src, dst, ["doc_id"])
        assert _rows(src) == _rows(dst)
        with pytest.raises(InvalidArgument, match="key column"):
            sync_table(src, dst, [])
        with pytest.raises(InvalidArgument, match="lacks key"):
            sync_table(src, dst, ["nope"])


def test_explicit_from_version_resyncs_span(clean_schema):
    """An explicit from_version replays that span; because the apply is
    an upsert/delete merge, replaying an ALREADY-applied span leaves the
    replica unchanged (crash-recovery semantics)."""
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:
        src, _ = _tables(tx)
        src.update_where(D.doc_id < 50, {"n_chars": 0})
    with session.transaction() as tx:
        v_before = tx.bucket("bkt").manifest.version
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
        before = _rows(dst)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        r = sync_table(src, dst, ["doc_id"], from_version=v_before - 1)
        assert r["upserts"] > 0  # span re-applied...
    with session.transaction() as tx:
        src, dst = _tables(tx)
        assert _rows(dst) == before  # ...with identical results


def test_sync_sql_verb(clean_schema):
    session = _pair(clean_schema)
    r = session.execute_sql("SYNC TABLE bkt.s.dst FROM bkt.s.src ON (doc_id)")
    assert r["upserts"] == 500
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("src").delete_where(
            D.doc_id % 3 == 0
        )
    r = session.execute_sql("SYNC TABLE bkt.s.dst FROM bkt.s.src ON (doc_id)")
    assert r["deletes"] > 0
    with session.transaction() as tx:
        src, dst = _tables(tx)
        assert _rows(src) == _rows(dst)


# ---------------------------------------------------------------------------
# sync_derived_rows / sync_minhash_signatures (batch dedup-index lifecycle)


def _sig_pair(clean_schema):
    with clean_schema.transaction() as tx:
        sc = tx.bucket("bkt").schema("s")
        create_table_from_files(sc, "src", [f"{SF}/documents.parquet"])
        sc.create_table(
            "sig",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )
    return clean_schema


def _sig_tables(tx):
    return (
        tx.bucket("bkt").schema("s").table("src"),
        tx.bucket("bkt").schema("s").table("sig"),
    )


def _expected_bands(spark_df):
    from vastdb_sdk_spark.operators.dedup import lsh_band_keys, minhash_signatures

    return lsh_band_keys(
        minhash_signatures(spark_df, "text", "doc_id", 16, 3, "xxhash64"),
        4,
        "doc_id",
        "xxhash64",
    )


def test_sync_minhash_signatures_full_then_churn(clean_schema):
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    session = _sig_pair(clean_schema)
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        r = sync_minhash_signatures(src, sig)
        assert r["mode"] == "full" and r["inserted_rows"] == 4 * 500
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        assert _rows(sig) == sorted(
            tuple(x) for x in _expected_bands(src.select_df()).collect()
        )
        v_synced = r["to_version"]
    # churn: delete some docs, rewrite one text, insert a new doc
    with session.transaction() as tx:
        src, _ = _sig_tables(tx)
        src.delete_where(D.doc_id % 7 == 0)
        src.update_where(D.doc_id == 3, {"text": "entirely new rewritten body"})
        src.insert(
            pa.table(
                {
                    "doc_id": pa.array([9001], pa.int64()),
                    "text": pa.array(["fresh document appended after sync"]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["srcX"]),
                    "n_chars": pa.array([34], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        r2 = sync_minhash_signatures(src, sig, mode="incremental")
        assert r2["mode"] == "incremental"
        assert r2["from_version"] == v_synced
        assert r2["deleted_keys"] > 0 and r2["recomputed_keys"] >= 2
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        # the maintained index equals a from-scratch derivation
        assert _rows(sig) == sorted(
            tuple(x) for x in _expected_bands(src.select_df()).collect()
        )
    # replaying the already-applied span is a no-op state-wise
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        before = _rows(sig)
        r3 = sync_minhash_signatures(
            src, sig, from_version=r2["from_version"], mode="incremental"
        )
        assert r3["mode"] == "incremental"
        assert _rows(sig) == before
    # cursor makes the default call a no-op
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        assert sync_minhash_signatures(src, sig)["mode"] == "noop"


def test_sync_derived_rows_validation(clean_schema):
    from vastdb_sdk_spark.sources.replicate import sync_derived_rows

    session = _sig_pair(clean_schema)
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        with pytest.raises(InvalidArgument):
            sync_derived_rows(src, sig, [], lambda d: d)
        with pytest.raises(InvalidArgument):
            sync_derived_rows(src, sig, ["nope"], lambda d: d)


def test_sync_signatures_sql_verb(clean_schema):
    session = _sig_pair(clean_schema)
    r = session.execute_sql("SYNC SIGNATURES bkt.s.sig FROM bkt.s.src")
    assert r["mode"] == "full" and r["inserted_rows"] == 2000
    with session.transaction() as tx:
        src, _ = _sig_tables(tx)
        src.delete_where(D.doc_id < 10)
    r2 = session.execute_sql(
        "SYNC SIGNATURES bkt.s.sig FROM bkt.s.src ON (doc_id, text)"
        " MODE INCREMENTAL"
    )
    assert r2["mode"] == "incremental" and r2["deleted_keys"] == 10
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        assert _rows(sig) == sorted(
            tuple(x) for x in _expected_bands(src.select_df()).collect()
        )


# ---------------------------------------------------------------------------
# property-based: random committed DML, then sync — the maintained derived
# table must ALWAYS equal a from-scratch derivation of the current source


def _word(k):
    return f"w{k % 7} common w{k % 5} tail{k}"


def _doc_batch(keys, tag=""):
    return pa.table(
        {
            "doc_id": pa.array(list(keys), pa.int64()),
            "text": pa.array([_word(k) + tag for k in keys]),
            "lang": pa.array(["en"] * len(keys)),
            "source": pa.array(["s"] * len(keys)),
            "n_chars": pa.array([len(_word(k)) for k in keys], pa.int64()),
        }
    )


def test_property_random_dml_then_sync_equals_rebuild(clean_schema):
    """Deterministic mini-property sweep (hypothesis-style without the
    per-example engine setup cost): several randomized-shape DML scripts
    over the corpus, each followed by one incremental sync; after EVERY
    sync the signature table must equal deriving from scratch."""
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    session = clean_schema
    with session.transaction() as tx:
        sc = tx.bucket("bkt").schema("s")
        t = sc.create_table(
            "src",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        )
        t.insert(_doc_batch(range(40)))
        sc.create_table(
            "sig",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )

    def _tables(tx):
        s = tx.bucket("bkt").schema("s")
        return s.table("src"), s.table("sig")

    with session.transaction() as tx:
        src, sig = _tables(tx)
        sync_minhash_signatures(src, sig)

    scripts = [
        [("delete", 3, 0), ("insert", 100)],
        [("update", 2, 1), ("delete", 5, 2), ("insert", 200)],
        [("insert", 300), ("update", 7, 3)],
        [("delete", 2, 0), ("delete", 2, 1)],  # empties most of the table
        [("insert", 400), ("insert", 500), ("update", 3, 2)],
    ]
    nxt = 1000
    for script in scripts:
        with session.transaction() as tx:
            src, _ = _tables(tx)
            for op in script:
                if op[0] == "delete":
                    src.delete_where(D.doc_id % op[1] == op[2])
                elif op[0] == "update":
                    src.update_where(
                        D.doc_id % op[1] == op[2],
                        {"text": f"rewritten body {op[2]}"},
                    )
                else:
                    src.insert(_doc_batch(range(nxt, nxt + 5), tag=" new"))
                    nxt += 5
        with session.transaction() as tx:
            src, sig = _tables(tx)
            r = sync_minhash_signatures(src, sig, mode="incremental")
            assert r["mode"] == "incremental"
        with session.transaction() as tx:
            src, sig = _tables(tx)
            assert _rows(sig) == sorted(
                tuple(x) for x in _expected_bands(src.select_df()).collect()
            ), f"drift after script {script}"


# ---------------------------------------------------------------------------
# cost-based AUTO routing (mode='auto') and NULL-key rejection


def test_sync_derived_auto_routes_small_table_to_full(clean_schema):
    """Below the size floor the incremental fold's fixed intercept loses
    to a from-scratch rebuild, so AUTO must route 'full' — and the
    result must equal the from-scratch derivation either way."""
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    session = _sig_pair(clean_schema)
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        sync_minhash_signatures(src, sig)
    with session.transaction() as tx:
        src, _ = _sig_tables(tx)
        src.delete_where(D.doc_id % 11 == 0)
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        # default floor (1e5) >> the test corpus -> full
        r = sync_minhash_signatures(src, sig)
        assert r["mode"] == "full"
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        assert _rows(sig) == sorted(
            tuple(x) for x in _expected_bands(src.select_df()).collect()
        )
    # churn fraction is judged from CHANGED FILES' rows (metadata only),
    # so spread the corpus over several files first — then a tiny touch
    # in one file is a small fraction and, with the floor lowered below
    # the corpus, AUTO picks the fold
    for b in range(4):
        with session.transaction() as tx:
            src, _ = _sig_tables(tx)
            src.insert(_doc_batch(range(5000 + 50 * b, 5050 + 50 * b)))
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        sync_minhash_signatures(src, sig)  # catch up on the inserts
    with session.transaction() as tx:
        src, _ = _sig_tables(tx)
        # touch a row in one of the SMALL inserted files (the 500-row
        # base file would alone exceed the 50% changed-row fraction)
        src.update_where(D.doc_id == 5000, {"text": "tiny touch"})
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        r2 = sync_minhash_signatures(src, sig, full_rebuild_floor=1)
        assert r2["mode"] == "incremental"
    # floor low but the span touches >= half the rows -> full again
    with session.transaction() as tx:
        src, _ = _sig_tables(tx)
        src.update_where(D.doc_id >= 0, {"text": "rewrite everything"})
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        r3 = sync_minhash_signatures(src, sig, full_rebuild_floor=1)
        assert r3["mode"] == "full"
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        assert _rows(sig) == sorted(
            tuple(x) for x in _expected_bands(src.select_df()).collect()
        )


def test_sync_derived_unrelated_commit_is_metadata_noop(clean_schema):
    """A span that only touched OTHER tables must return noop without
    advancing the cursor — detected from manifest stats alone."""
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    session = _sig_pair(clean_schema)
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        sync_minhash_signatures(src, sig)
    with session.transaction() as tx:  # churn elsewhere in the bucket
        tx.bucket("bkt").schema("s").create_table(
            "unrelated", pa.schema([("x", pa.int64())])
        ).insert(pa.table({"x": [1, 2, 3]}))
    with session.transaction() as tx:
        src, sig = _sig_tables(tx)
        r = sync_minhash_signatures(src, sig, full_rebuild_floor=1)
        assert r["mode"] == "noop"
        assert r["to_version"] == r["from_version"]


def test_sync_null_keys_rejected(clean_schema):
    """NULL keys have no row identity (anti-joins and MERGE conditions
    never match them) — both sync paths must reject them loudly instead
    of silently re-inserting on every replay."""
    from vastdb_sdk_spark.sources.replicate import (
        sync_derived_rows,
        sync_table,
    )

    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:
        src, _ = _tables(tx)
        src.insert(
            pa.table(
                {
                    "doc_id": pa.array([None], pa.int64()),
                    "text": pa.array(["null-keyed row"]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["srcX"]),
                    "n_chars": pa.array([14], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        src, dst = _tables(tx)
        with pytest.raises(InvalidArgument, match="NULL"):
            sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:
        src, dst = _tables(tx)
        with pytest.raises(InvalidArgument, match="NULL"):
            sync_derived_rows(
                src,
                dst,
                ["doc_id"],
                lambda d: d,
                from_version=1,
                mode="incremental",
            )


def test_sync_table_unrelated_commit_is_metadata_noop(clean_schema):
    """sync_table on a span that only touched OTHER tables returns a
    zero-action result without reading the feed or advancing the cursor
    (a cursor write commits a version of its own and would ratchet)."""
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
    with session.transaction() as tx:  # churn elsewhere in the bucket
        tx.bucket("bkt").schema("s").create_table(
            "elsewhere", pa.schema([("x", pa.int64())])
        ).insert(pa.table({"x": [1]}))
    with session.transaction() as tx:
        src, dst = _tables(tx)
        r = sync_table(src, dst, ["doc_id"])
        assert r["upserts"] == 0 and r["deletes"] == 0
        assert r["to_version"] == r["from_version"]  # cursor untouched


def test_change_span_stats_metadata_shapes(clean_schema):
    """change_span_stats is metadata-only and must classify the three
    span shapes: untouched (0 changed), DV-touched + appended files
    (changed subset), and created-within-span (everything changed)."""
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, _ = _tables(tx)
        v0 = tx.bucket("bkt").manifest.version
        st = src.change_span_stats(v0)
        assert st["changed_files"] == 0 and st["changed_rows"] == 0
        assert st["total_rows"] == 500
    with session.transaction() as tx:
        src, _ = _tables(tx)
        src.insert(_doc_batch(range(7000, 7010)))
    with session.transaction() as tx:
        src, _ = _tables(tx)
        src.delete_where(D.doc_id == 1)  # DV on the 500-row base file
    with session.transaction() as tx:
        src, _ = _tables(tx)
        st = src.change_span_stats(v0)  # whole span: insert + DV
        assert st["changed_files"] == 2
        assert st["changed_rows"] == 510 and st["total_rows"] == 510
        # table existed before v0's successor only as created-in-span
        # for a fresh table: every file counts as changed
        with pytest.raises(InvalidArgument, match="inverted"):
            src.change_span_stats(10**9, v0)


def test_full_resync_deletes_orphans(clean_schema):
    """A re-seeded replica (forced from_version=0) must also DELETE
    destination rows whose keys are gone from the source: the change feed
    carries no tombstones from before the window, so the old upsert-only
    initial sync kept orphans forever, violating the row-identical
    guarantee."""
    session = _pair(clean_schema)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        sync_table(src, dst, ["doc_id"])
        assert _rows(src) == _rows(dst)
    # delete some source rows OUTSIDE any sync span, then force a re-seed
    with session.transaction() as tx:
        src, dst = _tables(tx)
        src.delete_where(D.doc_id < 100)
    with session.transaction() as tx:
        src, dst = _tables(tx)
        # dst still carries the orphans; a forced full resync must drop them
        assert len(_rows(dst)) > len(_rows(src))
        sync_table(src, dst, ["doc_id"], from_version=0)
        assert _rows(src) == _rows(dst)


def test_sync_signatures_config_recorded_and_conflicts_raise(clean_schema):
    """The MinHash parameters are recorded on the signature table by the
    first sync; a later sync passing CONFLICTING values must fail loud —
    an incremental resync under different knobs would re-derive only the
    churned documents, silently mixing two signature spaces in one
    index."""
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    with clean_schema.transaction() as tx:
        sc = tx.bucket("bkt").schema("s")
        create_table_from_files(sc, "src", [f"{SF}/documents.parquet"])
        sc.create_table(
            "sig",
            pa.schema(
                [("doc_id", pa.int64()), ("band_id", pa.int32()),
                 ("band_key", pa.string())]
            ),
        )
    with clean_schema.transaction() as tx:
        src = tx.bucket("bkt").schema("s").table("src")
        sig = tx.bucket("bkt").schema("s").table("sig")
        sync_minhash_signatures(src, sig, hash_fn="md5", num_hashes=8)
    with clean_schema.transaction() as tx:
        sig = tx.bucket("bkt").schema("s").table("sig")
        cfg = sig.entry.properties["minhash_config"]
        assert cfg["hash_fn"] == "md5" and cfg["num_hashes"] == 8
        assert cfg["num_bands"] == 4  # unset -> module default, recorded
    with clean_schema.transaction() as tx:
        src = tx.bucket("bkt").schema("s").table("src")
        sig = tx.bucket("bkt").schema("s").table("sig")
        with pytest.raises(InvalidArgument, match="recorded"):
            sync_minhash_signatures(src, sig, num_hashes=16)
        # unset parameters resolve FROM the record: a parameterless resync
        # is a no-op span, not a default-knob rederive
        res = sync_minhash_signatures(src, sig)
        assert res["to_version"] == res["from_version"]

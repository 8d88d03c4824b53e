"""applyInPandasWithState custom stateful operator + DerivedTable catalog."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.streaming.stateful import threshold_alerts

SF = "/root/testdata/sf0.001"


def _events(spark):
    from vastdb_sdk_spark.streaming.events import EVENTS_SCHEMA

    # subset: state-store streaming tests pay per-key python overhead;
    # explicit schema keeps ts as epoch-micros long (the tier convention)
    return (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(f"{SF}/events.parquet")
        .filter("user_id < 60")
    )


def _python_oracle(rows, threshold=500.0, decay=0.9):
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.value))
    alerts = set()
    for uid, evs in by_user.items():
        score = 0.0
        for ts, value in sorted(evs):
            score = score * decay + float(value)
            if score >= threshold:
                alerts.add((uid, ts))
                score = 0.0
    return alerts


def test_threshold_alerts_single_batch_matches_python(spark, tmp_path):
    """One micro-batch (single file, availableNow) => state semantics must
    equal the sequential per-user python oracle exactly."""
    ev = _events(spark)
    src = str(tmp_path / "src1")
    ev.coalesce(1).write.parquet(src)
    from vastdb_sdk_spark.streaming.events import read_event_stream

    stream = read_event_stream(spark, src, max_files_per_trigger=100)
    alerts = threshold_alerts(stream, threshold=500.0, decay=0.9)
    q = (
        alerts.writeStream.format("memory")
        .queryName("alerts1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM alerts1").collect()
    got_set = {(r.user_id, r.alert_ts) for r in got}
    exp = _python_oracle(ev.select("user_id", "ts", "value").collect())
    assert got_set == exp and len(exp) > 0


def test_threshold_alerts_streaming(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(2).write.parquet(src)
    from vastdb_sdk_spark.streaming.events import read_event_stream

    stream = read_event_stream(spark, src)
    alerts = threshold_alerts(stream, threshold=500.0, decay=0.9)
    q = (
        alerts.writeStream.format("memory")
        .queryName("alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM alerts").collect()
    # micro-batch boundaries may split a user's event sequence differently
    # than the batch run, but every emitted alert must be threshold-valid
    assert len(got) > 0
    for r in got:
        assert r.score >= 500.0


def test_sessionize_stateful_matches_batch_twin(spark, tmp_path):
    """The applyInPandasWithState sessionizer over a REPLAYED MULTI-BATCH
    stream (3 chronological files, maxFilesPerTrigger=1 — state genuinely
    crosses micro-batch boundaries) must equal the batch twin
    (streaming/events.sessionize, i.e. built-in session_window) exactly.
    A per-user sentinel event at max_ts + gap in the final file drains
    every real session (the documented cutover-flush pattern); sentinel
    sessions themselves stay open in state and are never emitted."""
    import pyarrow.parquet as pq

    from vastdb_sdk_spark.streaming.events import (
        EVENTS_SCHEMA,
        read_event_stream,
        sessionize,
    )
    from vastdb_sdk_spark.streaming.stateful import sessionize_stateful

    GAP_US = 10 * 60 * 1_000_000
    ev = _events(spark)
    rows = ev.select("event_id", "ts", "user_id").collect()
    assert len(rows) > 100
    max_ts = max(r.ts for r in rows)
    users = sorted({r.user_id for r in rows})
    flush_ts = max_ts + 2 * GAP_US

    # three chronological files + the flush file; written in order so the
    # file stream (oldest-mtime-first) replays them chronologically
    import time as _time

    src = tmp_path / "sess_src"
    src.mkdir()
    ordered = sorted(rows, key=lambda r: r.ts)
    cut = len(ordered) // 3
    parts = [ordered[:cut], ordered[cut : 2 * cut], ordered[2 * cut :]]
    parts[2] = parts[2] + [None]  # marker: flush events ride the last file
    for i, part in enumerate(parts):
        data = [r for r in part if r is not None]
        tbl = pa.table(
            {
                "event_id": pa.array([r.event_id for r in data], pa.int64()),
                "ts": pa.array([r.ts for r in data], pa.int64()),
                "user_id": pa.array([r.user_id for r in data], pa.int64()),
                "event_type": pa.array(["x"] * len(data)),
                "value": pa.array([0.0] * len(data)),
                "props": pa.array([""] * len(data)),
            }
        )
        if None in part:
            flush = pa.table(
                {
                    "event_id": pa.array(
                        [10**12 + u for u in users], pa.int64()
                    ),
                    "ts": pa.array([flush_ts] * len(users), pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "event_type": pa.array(["__flush"] * len(users)),
                    "value": pa.array([0.0] * len(users)),
                    "props": pa.array([""] * len(users)),
                }
            )
            tbl = pa.concat_tables([tbl, flush])
        pq.write_table(tbl, str(src / f"part-{i:02d}.parquet"))
        _time.sleep(0.05)  # distinct mtimes => deterministic replay order

    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    sess = sessionize_stateful(stream, gap_us=GAP_US)
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_stateful")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stateful").collect()
    }

    # batch twin: the very same sessionize the sessionize_batch gate runs
    # (session_window), over the REAL events only — no sentinels
    batch = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(str(src))
        .filter(F.col("event_type") != "__flush")
    )
    twin = sessionize(batch, gap="10 minutes", watermark="1 hour")
    exp = {
        (
            r.user_id,
            int(r.session_start.timestamp() * 1_000_000),
            int(r.session_end.timestamp() * 1_000_000),
            r.n_events,
        )
        for r in twin.collect()
    }
    assert len(exp) > 10
    assert got == exp


def test_catalog_as_table(clean_schema):
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").create_table(
            "t", pa.schema([("a", pa.int64())])
        )
    with clean_schema.transaction() as tx:
        cat = tx.catalog("bkt", as_table=True)
        got = cat.select(
            columns=["table_name", "object_type"],
            predicate=(D.object_type == "table"),
        ).read_all()
        assert got.column("table_name").to_pylist() == ["t"]
        assert cat.count_rows(predicate=(D.object_type == "schema")) == 1

def _batch_funnel_completed(ev):
    """Batch min-after-previous funnel; completed rows only."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = v.join(c, "user_id").join(p, "user_id").collect()
    return {(r.user_id, r.t1, r.t2, r.t3) for r in rows}


def test_funnel_stateful_matches_batch_twin(spark, tmp_path):
    """Streaming N-stage funnel == the batch w10 plan's completed rows,
    over a chronological 3-file replay (state crosses micro-batches)."""
    from vastdb_sdk_spark.streaming.events import read_event_stream
    from vastdb_sdk_spark.streaming.stateful import funnel_stateful

    ev = _events(spark)
    # 3 chronological files so funnel state genuinely spans batches
    n = ev.count()
    ordered = ev.orderBy("ts").collect()
    import pyarrow.parquet as pq

    src = tmp_path / "fsrc"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = ordered[lo : lo + (n + 2) // 3]
        pq.write_table(
            pa.table({c: [getattr(r, c) for r in chunk] for c in cols}),
            str(src / f"part-{i:03d}.parquet"),
        )
    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    out = funnel_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, *r.stage_ts)
        for r in spark.sql("SELECT * FROM funnel1").collect()
    }
    exp = _batch_funnel_completed(ev)
    assert got == exp and len(exp) > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stages"):
        funnel_stateful(ev, stages=("view",))


def test_anomaly_stateful_matches_batch_twin(spark, tmp_path):
    """Streaming rolling-anomaly == the batch operator's rows for every
    CLOSED observed bucket, over a chronological 3-file replay (bucket
    state and frame history genuinely cross micro-batches). The final
    observed bucket per user never closes, so it is excluded from the
    batch side."""
    import pyarrow.parquet as pq

    from vastdb_sdk_spark.operators.timeseries import rolling_anomaly_flags
    from vastdb_sdk_spark.streaming.events import read_event_stream
    from vastdb_sdk_spark.streaming.stateful import anomaly_stateful

    DAY = 86_400_000_000
    ev = _events(spark)
    n = ev.count()
    ordered = ev.orderBy("ts").collect()
    src = tmp_path / "asrc"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = ordered[lo : lo + (n + 2) // 3]
        pq.write_table(
            pa.table({c: [getattr(r, c) for r in chunk] for c in cols}),
            str(src / f"part-{i:03d}.parquet"),
        )
    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    out = anomaly_stateful(
        stream, step_us=DAY, window=7, min_periods=3, z_threshold=2.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("anom1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ackpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.bucket_ts): (round(r.observed, 6), r.zscore, r.is_anomaly)
        for r in spark.sql("SELECT * FROM anom1").collect()
    }
    batch = rolling_anomaly_flags(
        ev, "ts", ["user_id"], DAY, "value",
        window=7, min_periods=3, z_threshold=2.0,
    ).collect()
    last_bucket = {}
    for r in batch:
        if r.observed is not None:
            last_bucket[r.user_id] = max(
                last_bucket.get(r.user_id, -1), r.bucket_ts
            )
    exp = {
        (r.user_id, r.bucket_ts): (round(r.observed, 6), r.zscore, r.is_anomaly)
        for r in batch
        if r.observed is not None and r.bucket_ts != last_bucket[r.user_id]
    }
    assert got == exp and len(exp) > 50
    # at least one flagged anomaly and one insufficient-history NULL in
    # the compared set, so the equivalence isn't vacuous
    assert any(v[2] for v in exp.values() if v[2] is not None)
    assert any(v[1] is None for v in exp.values())

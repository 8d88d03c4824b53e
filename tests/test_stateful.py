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
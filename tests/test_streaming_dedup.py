"""Streaming dedup + IVF knn-join + table history."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_dedup_exact(spark, tmp_path):
    from vastdb_sdk_spark.streaming.dedup import stream_dedup_exact
    from vastdb_sdk_spark.streaming.events import read_event_stream

    from vastdb_sdk_spark.streaming.events import EVENTS_SCHEMA

    ev = (
        spark.read.schema(EVENTS_SCHEMA).parquet(f"{SF}/events.parquet").limit(500)
    )
    dup_stream_src = str(tmp_path / "src")
    # write the same events twice -> a stream full of exact duplicates
    ev.unionAll(ev).coalesce(1).write.parquet(dup_stream_src)
    stream = read_event_stream(spark, dup_stream_src)
    deduped = stream_dedup_exact(stream, ["event_id"], watermark="10 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
    assert got.n == got.d == 500


def test_stream_dedup_against_table(session, tmp_path):
    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.streaming.dedup import stream_dedup_against_table
    from vastdb_sdk_spark.streaming.events import read_event_stream

    from vastdb_sdk_spark.streaming.events import EVENTS_SCHEMA

    spark = session.spark
    ev = (
        spark.read.schema(EVENTS_SCHEMA).parquet(f"{SF}/events.parquet").limit(300)
    )
    src = str(tmp_path / "src")
    ev.unionAll(ev.limit(100)).coalesce(2).write.parquet(src)  # 100 dupes
    with session.transaction() as tx:
        tx.bucket("bkt").create_schema("s").create_table(
            "ev",
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("ev")
        q = stream_dedup_against_table(
            read_event_stream(spark, src), t, str(tmp_path / "ckpt2")
        ).start()
        q.awaitTermination(180)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("ev")
        n = t.count_rows()
        d = t.df().select("event_id").distinct().count()
        assert n == d == 300


def test_ivf_knn_join(spark):
    import numpy as np

    from vastdb_sdk_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    right, centroids = similarity.build_ivf_index(emb, num_centroids=8, seed=42)
    right = right.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "centroid_id"
    )
    left = emb.limit(20).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    got = similarity.ivf_knn_join(left, right, centroids, k=3, nprobe=3)
    rows = got.collect()
    by_left = {}
    for r in rows:
        by_left.setdefault(r.id_a, []).append(r)
    assert len(by_left) == 20
    for lid, neighbors in by_left.items():
        assert len(neighbors) == 3
        # own vector must be its best match (same centroid, cosine 1)
        best = max(neighbors, key=lambda r: r.cos_sim)
        assert best.id_b == lid and best.cos_sim == 1.0


def test_table_history(clean_schema):
    data = pa.table({"a": pa.array([1, 2], pa.int64())})
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("t", data.schema)
        t.insert(data)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        t.delete(pa.table({"$row_id": pa.array([0], pa.uint64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("t")
        ops = [r.op for r in t.history().collect()]
        assert ops == ["create_table", "insert", "delete"]

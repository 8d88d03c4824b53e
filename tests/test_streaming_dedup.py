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


def test_assign_probe_centroids_scales_to_1024(spark):
    """The probe assignment must work at reference vector-index scale
    (num_centroids >= 1024): centroids ride a broadcast variable into an
    Arrow-batched mapInPandas, so plan size is O(1) in num_centroids —
    the old literal-expression formulation hit JVM codegen limits here."""
    import numpy as np

    from vastdb_sdk_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    dim = len(emb.select("embedding").head()[0])
    rng = np.random.default_rng(7)
    centroids = rng.standard_normal((1024, dim))

    out = similarity.assign_probe_centroids(emb, centroids, "embedding", nprobe=3)
    # O(1) plan: no per-centroid constants leak into the plan text
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, "plan size must not grow with num_centroids"
    rows = out.select("vec_id", "centroid_id").collect()
    assert len(rows) == 50 * 3

    # verify against a numpy reference for every row
    got = {}
    for r in rows:
        got.setdefault(r.vec_id, []).append(r.centroid_id)
    sample = {r.vec_id: np.asarray(r.embedding, float) for r in emb.collect()}
    c_sq = (centroids * centroids).sum(axis=1)
    for vid, vec in sample.items():
        d2 = c_sq - 2.0 * (centroids @ vec)
        want = list(np.argsort(d2, kind="stable")[:3])
        assert got[vid] == want, f"probe mismatch for vec {vid}"


def test_ivf_knn_join_1024_centroids(spark):
    """End-to-end ivf_knn_join at num_centroids=1024 (synthetic centroids;
    KMeans itself is orthogonal). Every vector's own row must survive as its
    top match — assignment and equi-join agree on the same centroid."""
    import numpy as np

    from vastdb_sdk_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    dim = len(emb.select("embedding").head()[0])
    rng = np.random.default_rng(11)
    centroids = rng.standard_normal((1024, dim))

    right = similarity.assign_probe_centroids(
        emb, centroids, "embedding", nprobe=1
    ).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "centroid_id"
    )
    left = emb.limit(10).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    got = similarity.ivf_knn_join(left, right, centroids, k=1, nprobe=2).collect()
    assert len(got) == 10
    for r in got:
        assert r.id_b == r.id_a and r.cos_sim == 1.0


def test_rhp_signature_plane_bound(spark):
    import numpy as np
    import pytest as _pytest

    from vastdb_sdk_spark.operators import similarity

    with _pytest.raises(ValueError, match="at most 32 planes"):
        similarity.rhp_signature_col("embedding", np.zeros((33, 4)))


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


def test_stream_dedup_near_against_table(session, tmp_path):
    """Near-dup-free continuous ingestion: two chronological micro-batches;
    batch 2 carries (a) near-copies of batch-1 docs — must be dropped via
    the persisted signature table, (b) an in-batch near-dup pair — higher
    id dropped, (c) clean docs — must survive. All dedup state lives in
    the corpus + signature tables, not the stream state store."""
    import time as _time

    import pyarrow.parquet as pq

    from vastdb_sdk_spark.streaming.dedup import stream_dedup_near_against_table

    spark = session.spark
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 100")
        .collect()
    )
    b1 = [(r.doc_id, r.text) for r in docs if r.doc_id < 60]
    clean2 = [(r.doc_id, r.text) for r in docs if r.doc_id >= 60]
    near_copies = [(10_000 + d, t + " extra") for d, t in b1[:5]]
    twin_a = (20_000, b1[5][1] + " alpha")
    twin_b = (20_001, b1[5][1] + " alpha beta")  # near-dup of twin_a AND b1[5]
    b2 = clean2 + near_copies + [twin_a, twin_b]

    src = tmp_path / "near_src"
    src.mkdir()
    for i, part in enumerate((b1, b2)):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in part], pa.int64()),
                    "text": pa.array([t for _, t in part]),
                }
            ),
            str(src / f"part-{i}.parquet"),
        )
        _time.sleep(0.05)

    with session.transaction() as tx:
        sc = tx.bucket("bkt").create_schema("s")
        sc.create_table(
            "corpus", pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        )
        sc.create_table(
            "sigs",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )
    with session.transaction() as tx:
        ct = tx.bucket("bkt").schema("s").table("corpus")
        st = tx.bucket("bkt").schema("s").table("sigs")
        stream = spark.readStream.schema("doc_id LONG, text STRING").option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        q = stream_dedup_near_against_table(
            stream, ct, st, str(tmp_path / "ckpt_near"), threshold=0.8
        ).start()
        q.awaitTermination(240)

    # batch-tier twin: replay the same two batches through the SAME batch
    # pipeline (in-batch pairs drop higher ids, then cross-batch pairs vs
    # the kept set) — the corpus has natural near-dups too, so the
    # expectation must come from the algorithm, not from the plant list
    from vastdb_sdk_spark.operators.dedup import minhash_dedup_pairs

    def _pairs(rows):
        pdf = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        return minhash_dedup_pairs(
            pdf, threshold=0.8, hash_fn="xxhash64"
        ).collect()

    kept = []
    for part in (b1, b2):
        in_drop = {r.id_b for r in _pairs(part)}
        surv = [(d, t) for d, t in part if d not in in_drop]
        if kept:
            kept_ids = {d for d, _ in kept}
            cross = _pairs(kept + surv)
            cross_drop = {
                r.id_b for r in cross if r.id_a in kept_ids and r.id_b not in kept_ids
            }
            surv = [(d, t) for d, t in surv if d not in cross_drop]
        kept += surv
    want = {d for d, _ in kept}

    with session.transaction() as tx:
        ct = tx.bucket("bkt").schema("s").table("corpus")
        st = tx.bucket("bkt").schema("s").table("sigs")
        got_ids = {r.doc_id for r in ct.df().select("doc_id").collect()}
        # sanity on the twin itself: planted near-copies + twins are dropped,
        # and most docs survive
        assert not want & {d for d, _ in near_copies}
        assert twin_a[0] not in want and twin_b[0] not in want
        assert len(want) > 80
        assert got_ids == want, (
            sorted(got_ids - want)[:8], sorted(want - got_ids)[:8]
        )
        assert st.count_rows() == len(want) * 4  # num_bands rows per survivor


def test_build_ivf_index_sampled_fit(spark):
    """Sampled k-means fit (the 100 TB path): centroids come from a
    fraction of the corpus but EVERY row gets an assignment, and the
    index still sends each vector to its nearest centroid (numpy check)."""
    import numpy as np

    from vastdb_sdk_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    indexed, centroids = similarity.build_ivf_index(
        emb, num_centroids=8, seed=42, sample_fraction=0.4, sample_key="vec_id"
    )
    rows = indexed.select("vec_id", "embedding", "centroid_id").collect()
    assert len(rows) == n and centroids.shape[0] == 8
    for r in rows[:50]:
        v = np.asarray(r.embedding, float)
        d2 = ((centroids - v) ** 2).sum(axis=1)
        assert r.centroid_id == int(np.argmin(d2))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample_fraction"):
        similarity.build_ivf_index(emb, sample_fraction=1.5)


def test_build_ivf_index_sample_guards(spark):
    import pytest as _pytest

    from vastdb_sdk_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with _pytest.raises(ValueError, match="sample_key given without"):
        similarity.build_ivf_index(emb, sample_key="vec_id")
    with _pytest.raises(ValueError, match="< num_centroids"):
        similarity.build_ivf_index(
            emb, num_centroids=64, sample_fraction=0.01, sample_key="vec_id"
        )


def test_stream_dedup_near_incremental_restarts(session, tmp_path):
    """Multi-RUN continuity: run the ingester to completion, restart with
    the SAME checkpoint (no new data -> no-op), then land a new file with
    a near-copy of an already-ingested doc and restart again — only the
    new batch processes, and the signature table built in run 1 still
    catches the cross-RUN near-dup."""
    import pyarrow.parquet as pq

    from vastdb_sdk_spark.streaming.dedup import stream_dedup_near_against_table

    spark = session.spark
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 40")
        .collect()
    )
    base = [(r.doc_id, r.text) for r in docs]
    src = tmp_path / "inc_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_inc")

    def _write(name, part):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in part], pa.int64()),
                    "text": pa.array([t for _, t in part]),
                }
            ),
            str(src / name),
        )

    def _run():
        with session.transaction() as tx:
            ct = tx.bucket("bkt").schema("s").table("corpus")
            st = tx.bucket("bkt").schema("s").table("sigs")
            stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(
                str(src)
            )
            q = stream_dedup_near_against_table(stream, ct, st, ckpt).start()
            q.awaitTermination(240)

    with session.transaction() as tx:
        sc = tx.bucket("bkt").create_schema("s")
        sc.create_table(
            "corpus", pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        )
        sc.create_table(
            "sigs",
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )
    _write("part-0.parquet", base)
    _run()
    with session.transaction() as tx:
        n1 = tx.bucket("bkt").schema("s").table("corpus").count_rows()
        assert n1 > 30  # base minus any natural near-dups
    _run()  # restart, no new files -> no-op
    with session.transaction() as tx:
        assert tx.bucket("bkt").schema("s").table("corpus").count_rows() == n1
    # new file: one near-copy of an ingested doc + one genuinely new doc
    _write(
        "part-1.parquet",
        [(90_000, base[0][1] + " tail"), (90_001, "entirely new words " * 20)],
    )
    _run()
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("corpus")
        ids = {r.doc_id for r in t.df().select("doc_id").collect()}
        assert 90_001 in ids and 90_000 not in ids
        assert t.count_rows() == n1 + 1


def test_stream_dedup_semantic_against_table(session, tmp_path):
    """Semantic-near-dup-free continuous ingestion: batch 2 carries
    (a) scaled copies of batch-1 vectors (cosine exactly 1 — must drop
    via the persisted band-key table), (b) an in-batch near-identical
    pair (higher id dropped), (c) clean vectors (organic max cosine in
    this corpus is ~0.6, far under 0.95 — must survive). Dedup state is
    corpus + signature tables only."""
    import time as _time

    import numpy as np
    import pyarrow.parquet as pq

    from vastdb_sdk_spark.streaming.dedup import (
        stream_dedup_semantic_against_table,
    )

    spark = session.spark
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter("vec_id < 80")
        .collect()
    )
    dim = len(rows[0].embedding)
    b1 = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows if r.vec_id < 50]
    clean2 = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows if r.vec_id >= 50]
    copies = [(10_000 + i, [2.0 * x for x in v]) for i, (_, v) in enumerate(b1[:5])]
    tw = [x * 0.5 for x in b1[6][1]]
    twin_a, twin_b = (20_000, tw), (20_001, [x * 4.0 for x in tw])
    b2 = clean2 + copies + [twin_a, twin_b]

    src = tmp_path / "sem_src"
    src.mkdir()
    for i, part in enumerate((b1, b2)):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([d for d, _ in part], pa.int64()),
                    "embedding": pa.array(
                        [v for _, v in part], pa.list_(pa.float64())
                    ),
                }
            ),
            str(src / f"part-{i}.parquet"),
        )
        _time.sleep(0.05)

    with session.transaction() as tx:
        sc = tx.bucket("bkt").create_schema("s")
        sc.create_table(
            "vcorpus",
            pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
            ),
        )
        sc.create_table(
            "vsigs",
            pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("band_id", pa.int32()),
                    ("band_key", pa.int64()),
                ]
            ),
        )
    with session.transaction() as tx:
        ct = tx.bucket("bkt").schema("s").table("vcorpus")
        st = tx.bucket("bkt").schema("s").table("vsigs")
        stream = spark.readStream.schema(
            "vec_id LONG, embedding ARRAY<DOUBLE>"
        ).option("maxFilesPerTrigger", 1).parquet(str(src))
        q = stream_dedup_semantic_against_table(
            stream, ct, st, str(tmp_path / "ckpt_sem"),
            threshold=0.95, dim=dim,
        ).start()
        q.awaitTermination(240)

    with session.transaction() as tx:
        ct = tx.bucket("bkt").schema("s").table("vcorpus")
        st = tx.bucket("bkt").schema("s").table("vsigs")
        got = {r.vec_id for r in ct.df().select("vec_id").collect()}
        # scaled copies of batch-1 vectors dropped via the signature table
        assert not got & {d for d, _ in copies}
        # in-batch twin pair: higher id dropped, lower kept UNLESS it is
        # itself a scaled copy of a batch-1 vector (it is: tw = 0.5*b1[6])
        assert twin_b[0] not in got
        assert twin_a[0] not in got  # cosine 1 vs b1[6] -> cross-dropped
        # every original and every clean batch-2 vector survives
        assert {d for d, _ in b1} <= got
        assert {d for d, _ in clean2} <= got
        assert st.count_rows() == len(got) * 4  # num_bands rows/survivor

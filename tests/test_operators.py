"""LLM-pipeline operators: dedup, similarity, multimodal, as-of join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark.operators import asof, dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    # add known near-dups and exact dups deterministically
    base = df.limit(3).collect()
    extra = [
        (10001, base[0].text, base[0].lang, "dup_exact", len(base[0].text)),
        (10002, base[1].text + " tail tokens appended here", base[1].lang, "dup_near", 0),
    ]
    extra_df = spark.createDataFrame(extra, df.schema)
    return df.unionByName(extra_df)


# -- exact dedup -----------------------------------------------------------


def test_exact_duplicate_groups(docs):
    groups = dedup.exact_duplicate_groups(docs, ["text"])
    dup = groups.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1 and dup[0].n_copies == 2


def test_dedup_exact_keeps_one(docs):
    total = docs.count()
    kept = dedup.dedup_exact(docs, ["text"], order_col="doc_id")
    assert kept.count() == total - 1
    # the kept representative is the min doc_id of the dup group
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 10001 not in kept_ids


# -- minhash / LSH ---------------------------------------------------------


def test_minhash_near_dup_pipeline(docs):
    pairs = dedup.minhash_dedup_pairs(
        docs, num_hashes=16, num_bands=4, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 10001) in found  # exact dup: jaccard 1.0
    assert (1, 10002) in found  # near dup: high shingle overlap
    for r in pairs:
        assert r.jaccard >= 0.5


def test_jaccard_values_sane(docs):
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=8, num_bands=4)
    verified = dedup.jaccard_verify_pairs(docs, pairs, threshold=0.0).collect()
    jac = {(r.id_a, r.id_b): r.jaccard for r in verified}
    assert jac.get((0, 10001)) == 1.0


# -- simhash ---------------------------------------------------------------


def test_simhash_near_pairs(docs):
    fps = dedup.simhash(docs)
    assert fps.count() == docs.count()
    pairs = dedup.simhash_near_pairs(fps, max_hamming=3).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found.get((0, 10001)) == 0  # identical text -> identical simhash


# -- similarity search -----------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _numpy_topk(emb_rows, q, k, metric="l2sq"):
    mat = np.array([r.embedding for r in emb_rows], dtype=float)
    ids = np.array([r.vec_id for r in emb_rows])
    if metric == "l2sq":
        d = ((mat - q) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
    else:
        sim = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, -sim))
    return [int(ids[i]) for i in order[:k]]


def test_brute_force_topk_matches_numpy(emb):
    rows = emb.collect()
    q = [float(x) for x in rows[0].embedding]
    got = similarity.brute_force_topk(emb, q, k=5, metric="l2sq", id_col="vec_id")
    got_ids = [r.vec_id for r in got.select("vec_id").collect()]
    assert got_ids == _numpy_topk(rows, np.array(q), 5)


def test_rhp_lsh_topk_recall(emb):
    rows = emb.collect()
    q = [float(x) for x in rows[7].embedding]
    indexed, planes = similarity.build_rhp_index(emb, num_planes=6, seed=42)
    got = similarity.rhp_topk(
        indexed, planes, q, k=5, metric="cosine", multiprobe_hamming=2, id_col="vec_id"
    )
    got_ids = {r.vec_id for r in got.select("vec_id").collect()}
    exact = set(_numpy_topk(rows, np.array(q), 5, metric="cosine"))
    # ANN: query's own vector must be found; recall over exact top-5 >= 2/5
    assert rows[7].vec_id in got_ids
    assert len(got_ids & exact) >= 2


def test_ivf_topk(emb):
    rows = emb.collect()
    q = [float(x) for x in rows[3].embedding]
    indexed, centroids = similarity.build_ivf_index(emb, num_centroids=8, seed=42)
    got = similarity.ivf_topk(
        indexed, centroids, q, k=3, nprobe=3, id_col="vec_id"
    )
    got_ids = [r.vec_id for r in got.select("vec_id").collect()]
    assert rows[3].vec_id == got_ids[0]  # own vector is distance 0


def test_pq_codes_shape_and_determinism(emb):
    enc, books = similarity.build_pq_index(
        emb, num_subspaces=16, num_codes=32, seed=42
    )
    m, ksub, dsub = books.shape
    assert (m, dsub) == (16, 4) and ksub <= 32
    rows = enc.select("vec_id", "pq_codes").orderBy("vec_id").limit(20).collect()
    for r in rows:
        assert len(r.pq_codes) == m
        assert all(0 <= c < ksub for c in r.pq_codes)
    # same seed + corpus -> identical codebooks and codes
    enc2, books2 = similarity.build_pq_index(
        emb, num_subspaces=16, num_codes=32, seed=42
    )
    assert np.allclose(books, books2)
    rows2 = enc2.select("vec_id", "pq_codes").orderBy("vec_id").limit(20).collect()
    assert [r.pq_codes for r in rows] == [r.pq_codes for r in rows2]


def test_pq_topk_rerank_recall(emb):
    rows = emb.collect()
    q = [float(x) for x in rows[3].embedding]
    enc, books = similarity.build_pq_index(emb, num_subspaces=16, seed=42)
    got = similarity.pq_topk(enc, books, q, k=5, id_col="vec_id", rerank=30)
    got_ids = [r.vec_id for r in got.select("vec_id").collect()]
    assert len(got_ids) == 5
    assert got_ids[0] == rows[3].vec_id  # own vector: exact rerank puts it first
    exact = set(_numpy_topk(rows, np.array(q), 5))
    assert len(set(got_ids) & exact) >= 4


def test_pq_validation_errors(emb):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.build_pq_index(emb, num_subspaces=7)
    enc, books = similarity.build_pq_index(emb, num_subspaces=16, num_codes=8)
    q = [0.0] * 64
    with pytest.raises(ValueError, match="rerank"):
        similarity.pq_topk(enc, books, q, k=10, rerank=5)
    with pytest.raises(ValueError, match="query dim"):
        similarity.pq_topk(enc, books, [0.0] * 32, k=2)


def test_embedding_near_dup_pairs(spark):
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.999, 0.01, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    pairs = similarity.embedding_near_dup_pairs(df, threshold=0.99, num_planes=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_embedding_near_dup_pairs_banded(spark):
    """Banded multiprobe: a pair that disagrees on ONE plane still surfaces
    when the disagreeing bit lands in only one of the two bands, and the
    multi-band candidate dedup never double-reports a pair."""
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.999, 0.01, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    pairs = similarity.embedding_near_dup_pairs(
        df, threshold=0.99, num_planes=4, num_bands=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
    assert len(pairs) == 1  # distinct() collapses multi-band hits
    # banded result is a superset of the single-table result by construction
    single = similarity.embedding_near_dup_pairs(
        df, threshold=0.99, num_planes=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in single} <= {(r.id_a, r.id_b) for r in pairs}


def test_embedding_near_dup_adaptive_bucket_sizing(spark):
    """target_bucket_rows sizes planes_per_band as ceil(log2(n/target)) so
    mean bucket population — hence the |bucket|^2 verify cost per bucket —
    stays ~constant as the corpus grows (the r11 decade-scaling fix for
    dd_embed_neardup). Near-1.0 duplicates survive any plane count (they
    flip a sign only when a plane dot sits within epsilon of 0)."""
    import numpy as np_

    rng = np_.random.default_rng(11)
    base = rng.standard_normal((200, 16))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # planted twins for ids 0..9 (tiny perturbation, cosine ~ 1)
    rows += [
        (1000 + i, (base[i] + np_.eye(16)[0] * 1e-9).tolist()) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    pairs = similarity.embedding_near_dup_pairs(
        df, threshold=0.999, num_bands=2, dim=16,
        target_bucket_rows=8, n_rows=len(rows),
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(i, 1000 + i) for i in range(10)}

    # sizing math: n=210, target=8 -> r=ceil(log2(26.25))=5 -> 10 planes
    import math

    assert max(1, math.ceil(math.log2(210 / 8.0))) == 5
    # the r grows with n: 10x the corpus adds ~log2(10) ~ 3-4 band bits,
    # which is what keeps total verify work ~n * target instead of ~n^2
    assert math.ceil(math.log2(2100 / 8.0)) - math.ceil(math.log2(210 / 8.0)) in (3, 4)
    with pytest.raises(ValueError, match="target_bucket_rows"):
        similarity.embedding_near_dup_pairs(
            df, target_bucket_rows=0, n_rows=len(rows)
        )


# -- multimodal ------------------------------------------------------------


def test_multimodal_decode_stub(spark):
    payloads = [(i, bytes([i] * 32)) for i in range(10)]
    df = spark.createDataFrame(payloads, "media_id LONG, payload BINARY")
    out = multimodal.decode_images(df).collect()
    assert len(out) == 10
    byid = {r.media_id: r for r in out}
    # deterministic: same payload -> same fake dimensions
    out2 = {r.media_id: r for r in multimodal.decode_images(df).collect()}
    for i in range(10):
        assert (byid[i].width, byid[i].height) == (out2[i].width, out2[i].height)
        assert 64 <= byid[i].width < 256 and 64 <= byid[i].height < 256
        assert 0.0 <= byid[i].mean_luma <= 1.0


def test_multimodal_features(spark):
    df = spark.createDataFrame(
        [(1, b"aaa"), (2, b"bbb")], "media_id LONG, payload BINARY"
    )
    out = {r.media_id: r.features for r in multimodal.extract_features(df, dim=8).collect()}
    assert len(out[1]) == 8 and out[1] != out[2]


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, (None, None, None, None, 3500, None)), (2, (None, None, None, None, 0, None))],
        multimodal.media_table_schema().simpleString().replace("struct", "STRUCT", 1)
        if False
        else "media_id LONG, meta STRUCT<media_type STRING, format STRING, width INT, height INT, duration_ms LONG, sample_rate INT>",
    )
    out = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    got = {(r.media_id, r.frame_ts_ms) for r in out}
    assert got == {(1, 0), (1, 1000), (1, 2000), (1, 3000)}


def test_resize_images_real_pillow_resizer(spark):
    """Exercise the ``resizer=`` plug-in seam with a REAL codec when the
    environment provides one (skipped where Pillow is absent — this
    container has no image libs, so CI there covers only the deterministic
    fake). Proves the contract: the seam receives raw bytes + target dims
    and its returned bytes land in the output payload unchanged — i.e. a
    user can swap in PIL without touching the Spark-side plumbing."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def make_png(w, h, color):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    def pil_resize(b: bytes, w: int, h: int) -> bytes:
        img = PIL_Image.open(io.BytesIO(b)).resize((w, h))
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()

    df = spark.createDataFrame(
        [(1, make_png(8, 6, (255, 0, 0))), (2, make_png(3, 3, (0, 255, 0))),
         (3, None)],
        "media_id LONG, payload BINARY",
    )
    out = {
        r.media_id: r
        for r in multimodal.resize_images(
            df, width=4, height=2, resizer=pil_resize
        ).collect()
    }
    assert len(out) == 3
    for mid in (1, 2):
        img = PIL_Image.open(io.BytesIO(bytes(out[mid].payload)))
        assert img.size == (4, 2)
        assert (out[mid].width, out[mid].height) == (4, 2)
    assert out[3].payload is None  # null passthrough, dims still stamped
    assert (out[3].width, out[3].height) == (4, 2)


# -- as-of join ------------------------------------------------------------


def test_asof_join_matches_pandas(spark):
    left = [(u, t) for u in (1, 2) for t in (5, 10, 15, 25)]
    right = [(1, 3, 100.0), (1, 10, 110.0), (1, 20, 120.0), (2, 7, 200.0)]
    ldf = spark.createDataFrame(left, "user_id LONG, ts LONG")
    rdf = spark.createDataFrame(right, "user_id LONG, ts LONG, px DOUBLE")
    got = asof.asof_join(ldf, rdf, on="ts", by="user_id", right_cols=["px"])
    got_m = {(r.user_id, r.ts): r.px for r in got.collect()}

    lp = pd.DataFrame(left, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["user_id", "ts", "px"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id")
    exp_m = {
        (r.user_id, r.ts): (None if pd.isna(r.px) else r.px) for r in exp.itertuples()
    }
    assert got_m == exp_m


def test_asof_join_tolerance(spark):
    ldf = spark.createDataFrame([(1, 100)], "k LONG, ts LONG")
    rdf = spark.createDataFrame([(1, 10, 1.0)], "k LONG, ts LONG, v DOUBLE")
    got = asof.asof_join(ldf, rdf, on="ts", by="k", right_cols=["v"], tolerance=50)
    assert got.collect()[0].v is None
    got2 = asof.asof_join(ldf, rdf, on="ts", by="k", right_cols=["v"], tolerance=95)
    assert got2.collect()[0].v == 1.0


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_directions_match_pandas(spark, direction):
    """All three merge_asof directions against the pandas oracle, including
    exact-tie timestamps (inclusive on both sides) and groups missing one
    side entirely."""
    left = [(u, t) for u in (1, 2, 3) for t in (5, 10, 15, 25)]
    right = [
        (1, 3, 100.0), (1, 10, 110.0), (1, 20, 120.0),
        (2, 7, 200.0), (2, 30, 230.0),
        # user 3 has no right rows at all
    ]
    ldf = spark.createDataFrame(left, "user_id LONG, ts LONG")
    rdf = spark.createDataFrame(right, "user_id LONG, ts LONG, px DOUBLE")
    got = asof.asof_join(
        ldf, rdf, on="ts", by="user_id", right_cols=["px"], direction=direction
    )
    got_m = {(r.user_id, r.ts): r.px for r in got.collect()}

    lp = pd.DataFrame(left, columns=["user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["user_id", "ts", "px"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="user_id", direction=direction)
    exp_m = {
        (r.user_id, r.ts): (None if pd.isna(r.px) else r.px) for r in exp.itertuples()
    }
    assert got_m == exp_m


def test_asof_join_fractional_on_column(spark):
    """Double `on` keys must not truncate (pandas merge_asof allows float
    keys): left 5.4 vs rights 5.0/5.6 — truncation to long ties them at 5
    and mis-picks backward; true nearest is forward (5.6). The fractional
    tolerance must likewise be applied to the untruncated distance."""
    ldf = spark.createDataFrame([(1, 5.4)], "k LONG, ts DOUBLE")
    rdf = spark.createDataFrame(
        [(1, 5.0, 50.0), (1, 5.6, 56.0)], "k LONG, ts DOUBLE, v DOUBLE"
    )
    got = asof.asof_join(
        ldf, rdf, on="ts", by="k", right_cols=["v"], direction="nearest"
    )
    assert got.collect()[0].v == 56.0
    # tolerance 0.3: backward dist 0.4 exceeds it; old long-truncated math
    # said |5-5|=0 and kept it
    got2 = asof.asof_join(
        ldf, rdf, on="ts", by="k", right_cols=["v"],
        direction="backward", tolerance=0.3,
    )
    assert got2.collect()[0].v is None
    # pandas oracle over a denser fractional grid
    left = [(1, t / 7.0) for t in range(0, 40, 3)]
    right = [(1, t / 5.0, float(t)) for t in range(0, 25, 2)]
    ldf2 = spark.createDataFrame(left, "k LONG, ts DOUBLE")
    rdf2 = spark.createDataFrame(right, "k LONG, ts DOUBLE, v DOUBLE")
    got3 = asof.asof_join(
        ldf2, rdf2, on="ts", by="k", right_cols=["v"],
        direction="nearest", tolerance=0.25,
    )
    got_m = {round(r.ts, 9): r.v for r in got3.collect()}
    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest", tolerance=0.25)
    exp_m = {
        round(r.ts, 9): (None if pd.isna(r.v) else r.v) for r in exp.itertuples()
    }
    assert got_m == exp_m


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_direction_tolerance_matches_pandas(spark, direction):
    left = [(1, t) for t in range(0, 200, 35)]
    right = [(1, t, float(t)) for t in (12, 60, 61, 150)]
    ldf = spark.createDataFrame(left, "k LONG, ts LONG")
    rdf = spark.createDataFrame(right, "k LONG, ts LONG, v DOUBLE")
    got = asof.asof_join(
        ldf, rdf, on="ts", by="k", right_cols=["v"],
        tolerance=20, direction=direction,
    )
    got_m = {(r.k, r.ts): r.v for r in got.collect()}
    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", tolerance=20, direction=direction)
    exp_m = {(r.k, r.ts): (None if pd.isna(r.v) else r.v) for r in exp.itertuples()}
    assert got_m == exp_m


def test_asof_join_bad_direction_rejected(spark):
    ldf = spark.createDataFrame([(1, 1)], "k LONG, ts LONG")
    with pytest.raises(ValueError):
        asof.asof_join(ldf, ldf, on="ts", by="k", direction="sideways")


def test_salted_agg_matches_plain(spark):
    from vastdb_sdk_spark.operators import skew

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r.l_returnflag: (round(r.sum_l_quantity, 2), r.n_rows)
        for r in skew.salted_agg_sum(
            li, ["l_returnflag"], ["l_quantity"], num_salts=8, salt_from=["l_orderkey"]
        ).collect()
    }
    exp = {
        r.l_returnflag: (round(r.s, 2), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain(spark):
    from vastdb_sdk_spark.operators import skew

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = skew.salted_join(li, o, "l_orderkey", num_salts=4, salt_from=["l_quantity"]).count()
    exp = li.join(o, "l_orderkey").count()
    assert got == exp


def test_parallel_selects_threadsafe(clean_schema):
    """Reference pattern 6: concurrent scans (vast_tests/test_scale.py)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D

    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "t", pa.schema([("a", pa.int64())])
        )
        t.insert(pa.table({"a": pa.array(range(5000), pa.int64())}))

    def scan(i):
        with clean_schema.transaction() as tx:
            t = tx.bucket("bkt").schema("s").table("t")
            return t.select(predicate=(D.a % 1 == 0) if False else (D.a >= i)).read_all().num_rows

    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(scan, range(8)))
    assert results == [5000 - i for i in range(8)]


def test_range_join_bucketed(spark):
    pts = spark.createDataFrame([(i,) for i in (5, 15, 55, 120)], "x LONG")
    ivs = spark.createDataFrame(
        [(0, 10, "a"), (50, 60, "b"), (100, 200, "c")], "lo LONG, hi LONG, tag STRING"
    )
    got = asof.range_join_bucketed(pts, ivs, "x", "lo", "hi", bucket_width=16)
    m = {(r.x, r.tag) for r in got.collect()}
    assert m == {(5, "a"), (55, "b"), (120, "c")}


def test_resize_images_stub(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"imagebytes-1")), (2, bytearray(b"imagebytes-2")), (3, None)],
        "media_id LONG, payload BINARY",
    )
    out = {r.media_id: r for r in multimodal.resize_images(df, 8, 8).collect()}
    assert len(out) == 3
    assert out[1].width == 8 and out[1].height == 8
    assert len(out[1].payload) == 64
    assert out[3].payload is None
    # deterministic: same payload + dims -> same bytes; different dims differ
    again = {r.media_id: r for r in multimodal.resize_images(df, 8, 8).collect()}
    assert bytes(again[1].payload) == bytes(out[1].payload)
    other = {r.media_id: r for r in multimodal.resize_images(df, 4, 4).collect()}
    assert bytes(other[1].payload) != bytes(out[1].payload)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.resize_images(df, 0, 8)


# -- asof hypothesis fuzz vs pandas ----------------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_asof_case = hst.fixed_dictionaries(
    {
        "float_keys": hst.booleans(),
        "direction": hst.sampled_from(["backward", "forward", "nearest"]),
        "tolerance": hst.sampled_from([None, 3, 17]),
        "left_ts": hst.lists(
            hst.integers(0, 60), min_size=1, max_size=12, unique=True
        ),
        "right_ts": hst.lists(
            hst.integers(0, 60), min_size=0, max_size=12, unique=True
        ),
        "groups": hst.integers(1, 2),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=_asof_case)
def test_asof_join_fuzz_matches_pandas(spark, case):
    """Random series x {backward, forward, nearest} x tolerance x
    int/float keys must equal pandas merge_asof exactly (incl. groups
    with no right rows and exact-tie timestamps)."""
    scale = 0.7 if case["float_keys"] else 1
    t_type = "DOUBLE" if case["float_keys"] else "LONG"
    tol = case["tolerance"] if case["tolerance"] is None else case["tolerance"] * scale

    left = [
        (g, t * scale) for g in range(case["groups"]) for t in case["left_ts"]
    ]
    right = [
        (g, t * scale, float(g * 1000 + t))
        for g in range(case["groups"])
        for t in case["right_ts"]
    ]
    ldf = spark.createDataFrame(left, f"k LONG, ts {t_type}")
    rdf = (
        spark.createDataFrame(right, f"k LONG, ts {t_type}, v DOUBLE")
        if right
        else spark.createDataFrame([], f"k LONG, ts {t_type}, v DOUBLE")
    )
    got = asof.asof_join(
        ldf, rdf, on="ts", by="k", right_cols=["v"],
        direction=case["direction"], tolerance=tol,
    )
    got_m = {(r.k, round(float(r.ts), 9)): r.v for r in got.collect()}

    ts_dtype = "float64" if case["float_keys"] else "int64"
    lp = pd.DataFrame(left, columns=["k", "ts"]).astype(
        {"k": "int64", "ts": ts_dtype}
    ).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).astype(
        {"k": "int64", "ts": ts_dtype, "v": "float64"}
    ).sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=case["direction"], tolerance=tol
    )
    exp_m = {
        (r.k, round(float(r.ts), 9)): (None if pd.isna(r.v) else r.v)
        for r in exp.itertuples()
    }
    assert got_m == exp_m


def test_knn_join_blocked_matches_broadcast(spark):
    """The blocked exact k-NN join must return exactly what the broadcast
    reference returns — including tie-breaks (planted duplicate vectors)
    and degenerate block counts (empty cells, blocks > rows)."""
    import random

    random.seed(7)
    dim = 8
    lrows = [(i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(23)]
    rrows = [(j, [random.uniform(-1, 1) for _ in range(dim)]) for j in range(37)]
    # duplicate right vectors -> exact cosine ties, broken by right id
    rrows.append((100, list(rrows[0][1])))
    rrows.append((101, list(rrows[0][1])))
    ldf = spark.createDataFrame(lrows, "id_a LONG, vec_a ARRAY<DOUBLE>")
    rdf = spark.createDataFrame(rrows, "id_b LONG, vec_b ARRAY<DOUBLE>")

    ref = {
        (r.id_a, r.id_b): round(r.cos_sim, 5)
        for r in similarity.knn_join_cosine(ldf, rdf, k=5)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .collect()
    }
    for nl, nr in ((1, 1), (3, 4), (8, 50)):
        got = {
            (r.id_a, r.id_b): round(r.cos_sim, 5)
            for r in similarity.knn_join_cosine_blocked(
                ldf, rdf, k=5, num_left_blocks=nl, num_right_blocks=nr
            ).collect()
        }
        assert got == ref, (nl, nr, set(got) ^ set(ref))

    # cost-based routing: auto with a tiny broadcast_row_limit takes the
    # blocked route (non-vector columns joined back, same column order
    # and results); an unknown strategy is rejected
    rdf_extra = rdf.withColumn("tag", F.concat(F.lit("t"), F.col("id_b")))
    base = similarity.knn_join_cosine(ldf, rdf_extra, k=5)
    routed = similarity.knn_join_cosine(
        ldf, rdf_extra, k=5, broadcast_row_limit=3
    )
    assert routed.columns == base.columns
    as_map = lambda df: {
        (r.id_a, r.id_b): (r.cos_sim, r.tag) for r in df.collect()
    }
    bm, rm = as_map(base), as_map(routed)
    assert set(bm) == set(rm)  # same pairs, same tie-breaks
    for key, (cos_b, tag_b) in bm.items():
        cos_r, tag_r = rm[key]
        # the blocked route rounds cos_sim to 6 decimals (its contract);
        # beyond that only low-order summation bits differ
        assert tag_r == tag_b and abs(cos_r - cos_b) < 2e-6, key
    with pytest.raises(ValueError, match="strategy"):
        similarity.knn_join_cosine(ldf, rdf, strategy="hash")
    # the blocked route refuses duplicate ids (they'd merge left groups
    # and fan out the join-back); broadcast keeps pure row semantics
    dup_r = rdf.unionByName(rdf.limit(1))
    with pytest.raises(ValueError, match="unique right ids"):
        similarity.knn_join_cosine(ldf, dup_r, k=2, strategy="blocked")
    assert similarity.knn_join_cosine(
        ldf.limit(2), dup_r, k=2, strategy="broadcast"
    ).count() == 4

    # gemm chunking smaller than the block must not change anything
    got = {
        (r.id_a, r.id_b): round(r.cos_sim, 5)
        for r in similarity.knn_join_cosine_blocked(
            ldf, rdf, k=5, num_left_blocks=2, num_right_blocks=2, gemm_chunk=4
        ).collect()
    }
    assert got == ref


def test_build_ivf_index_autosizes_centroids(emb):
    """num_centroids=None sizes the quantizer ~sqrt(N) (clamped >= 16) so
    cluster sizes stay O(sqrt(N)) as the corpus grows instead of linear
    under a forever-fixed count."""
    n = emb.count()
    indexed, centroids = similarity.build_ivf_index(emb, num_centroids=None)
    expected = int(min(65536, max(16, round(n ** 0.5))))
    assert centroids.shape[0] == expected
    assert indexed.select("centroid_id").distinct().count() <= expected


# -- passage-level (exact-substring) duplication ---------------------------


def test_passage_dup_stats_plants(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            # doc 2 shares doc 1's full 4-gram stream plus its own tail
            (2, "alpha beta gamma delta epsilon zeta own tail here"),
            (3, "totally different words in this one entirely"),
            (4, "tiny"),  # shorter than k: whole stream is one passage
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: r
        for r in dedup.passage_dup_stats(df, "text", "doc_id", k=4).collect()
    }
    # docs 1+2 share doc 1's three 4-grams; flagged on BOTH sides
    assert out[1].n_dup_passages == 3 and out[1].n_passages == 3
    assert out[1].dup_passage_fraction == 1.0
    assert out[2].n_dup_passages == 3 and out[2].n_passages == 6
    assert out[3].n_dup_passages == 0
    assert out[4].n_passages == 1 and out[4].n_dup_passages == 0

    kept = dedup.filter_passage_dups(
        df, "text", "doc_id", k=4, max_dup_fraction=0.5
    )
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {2, 3, 4}

    with pytest.raises(ValueError, match="k must be"):
        dedup.passage_dup_stats(df, "text", "doc_id", k=1)


def test_passage_dup_stats_empty_docs_not_mutual_dups(spark):
    """Empty-token docs (null / '' / punctuation-only) have NO passages —
    they must not collapse onto a shared md5('') gram and count as 100%
    mutual duplicates of each other (filter_passage_dups would otherwise
    destroy every blank page in a web corpus)."""
    df = spark.createDataFrame(
        [
            (1, ""),
            (2, ".,!?"),
            (3, None),
            (4, "real words live here in this document"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: r
        for r in dedup.passage_dup_stats(df, "text", "doc_id", k=4).collect()
    }
    assert len(out) == 4  # every input row comes back
    for i in (1, 2, 3):
        assert out[i].n_passages == 0
        assert out[i].n_dup_passages == 0
        assert out[i].dup_passage_fraction == 0.0
    assert out[4].n_passages > 0
    kept = dedup.filter_passage_dups(df, "text", "doc_id", k=4)
    assert kept.count() == 4  # nothing dropped


def test_knn_join_blocked_preserves_large_ids(spark):
    """ids above 2^53 (e.g. xxhash64-derived) must survive the
    applyInPandas round-trip exactly — an int64-with-nulls column becomes
    float64 in pandas and silently rounds; the sentinel+flag union keeps
    the id columns null-free."""
    big = 9007199254740993  # 2^53 + 1: not representable as float64
    vecs = [
        (big, [1.0, 0.0]),
        (big + 2, [0.9, 0.1]),
        (big + 4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vid LONG, v ARRAY<DOUBLE>")
    left = df.select(F.col("vid").alias("id_a"), F.col("v").alias("vec_a"))
    right = df.select(F.col("vid").alias("id_b"), F.col("v").alias("vec_b"))
    out = similarity.knn_join_cosine_blocked(
        left, right, k=1, num_left_blocks=2, num_right_blocks=2
    ).collect()
    got = {(r.id_a, r.id_b) for r in out}
    # each vector's nearest neighbor is itself — exact ids, no rounding
    assert got == {(big, big), (big + 2, big + 2), (big + 4, big + 4)}


def test_build_pq_index_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, -1.0]) for i in range(3)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    enc, books = similarity.build_pq_index(df, num_subspaces=2, num_codes=256)
    assert books.shape[1] <= 3  # codes clamped to the training-set size
    assert enc.count() == 3


def test_ivfpq_topk_rerank_recall(emb):
    rows = emb.collect()
    q = [float(x) for x in rows[3].embedding]
    enc, C, B = similarity.build_ivfpq_index(
        emb, num_centroids=8, num_subspaces=16, seed=42
    )
    got = similarity.ivfpq_topk(
        enc, C, B, q, k=5, nprobe=6, id_col="vec_id", rerank=30
    )
    got_ids = [r.vec_id for r in got.select("vec_id").collect()]
    assert len(got_ids) == 5
    assert got_ids[0] == rows[3].vec_id  # own vector survives pruning + rerank
    exact = set(_numpy_topk(rows, np.array(q), 5))
    assert len(set(got_ids) & exact) >= 3


def test_ivfpq_validation_and_pruning(emb):
    enc, C, B = similarity.build_ivfpq_index(
        emb, num_centroids=8, num_subspaces=16, seed=42
    )
    with pytest.raises(ValueError, match="nprobe"):
        similarity.ivfpq_topk(enc, C, B, [0.0] * 64, k=2, nprobe=99)
    with pytest.raises(ValueError, match="query dim"):
        similarity.ivfpq_topk(enc, C, B, [0.0] * 32, k=2)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.build_ivfpq_index(emb, num_centroids=4, num_subspaces=7)
    # nprobe=1 scans at most the biggest cluster, never the corpus
    one = similarity.ivfpq_topk(enc, C, B, [0.0] * 64, k=500, nprobe=1)
    sizes = {
        r.centroid_id: r.n
        for r in enc.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert one.count() <= max(sizes.values())


# -- perceptual image hashing ----------------------------------------------


def test_phash_images_and_near_pairs(spark):
    """pHash: identical payloads hash identically; distinct payloads
    differ; None payload -> null hash; and the 64-bit fingerprints plug
    straight into the SimHash pigeonhole pair join for image near-dup."""
    rows = [
        (1, b"image-payload-alpha"),
        (2, b"image-payload-alpha"),   # exact dup of 1
        (3, b"image-payload-beta"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    out = {r.media_id: r.phash for r in multimodal.phash_images(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert out[4] is None
    # determinism across runs
    again = {r.media_id: r.phash for r in multimodal.phash_images(df).collect()}
    assert out == again

    fps = (
        multimodal.phash_images(df)
        .filter(F.col("phash").isNotNull())
        .withColumnRenamed("phash", "simhash")
    )
    pairs = dedup.simhash_near_pairs(fps, "media_id", max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_phash_custom_pixels_seam(spark):
    """A real decoder plugs in through pixels= without touching the
    plumbing: a constant-image pixel field yields an all-low-frequency
    DCT whose fingerprint is stable."""
    import numpy as np

    df = spark.createDataFrame(
        [(1, b"x"), (2, b"completely different payload")],
        "media_id LONG, payload BINARY",
    )
    const = lambda payload: np.full((32, 32), 0.5)
    out = {r.media_id: r.phash for r in multimodal.phash_images(df, pixels=const).collect()}
    # same pixel field regardless of payload -> same hash
    assert out[1] == out[2]


def test_phash_non_square_decoder(spark):
    """A real decoder emits (h, w) arrays; the separable DCT must accept
    them, and hash_size larger than the image must fail loudly."""
    import numpy as np

    df = spark.createDataFrame([(1, b"x")], "media_id LONG, payload BINARY")
    rect = lambda p: np.arange(480 * 640, dtype=np.float64).reshape(480, 640) / 1e5
    out = multimodal.phash_images(df, pixels=rect).collect()
    assert out[0].phash is not None

    tiny = lambda p: np.ones((4, 4))
    with pytest.raises(Exception, match="hash_size"):
        multimodal.phash_images(df, pixels=tiny).collect()


def test_phash_hash_size_over_8_rejected(spark):
    """hash_size > 8 cannot fit n^2 bits in the 64-bit fingerprint; it
    must raise instead of silently truncating to the last 64 bits."""
    df = spark.createDataFrame([(1, b"x")], "media_id LONG, payload BINARY")
    with pytest.raises(ValueError, match="64-bit"):
        multimodal.phash_images(df, hash_size=9)
    with pytest.raises(ValueError, match="hash_size"):
        multimodal.phash_images(df, hash_size=0)


def test_knn_join_blocked_non_integral_ids(spark):
    """string/binary id columns take the NULL absent-side sentinel (an
    integer-literal cast may not analyze for them); results must still be
    exact. The float64-rounding hazard the 0-sentinel guards against is
    integral-only."""
    rows = [("alpha", [1.0, 0.0]), ("beta", [0.9, 0.1]), ("gamma", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vid STRING, v ARRAY<DOUBLE>")
    left = df.select(F.col("vid").alias("id_a"), F.col("v").alias("vec_a"))
    right = df.select(F.col("vid").alias("id_b"), F.col("v").alias("vec_b"))
    out = similarity.knn_join_cosine_blocked(
        left, right, k=1, num_left_blocks=2, num_right_blocks=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(v, v) for v, _ in rows}

    bdf = spark.createDataFrame(
        [(bytes([i]), v) for i, (_, v) in enumerate(rows)],
        "vid BINARY, v ARRAY<DOUBLE>",
    )
    bl = bdf.select(F.col("vid").alias("id_a"), F.col("v").alias("vec_a"))
    br = bdf.select(F.col("vid").alias("id_b"), F.col("v").alias("vec_b"))
    bout = similarity.knn_join_cosine_blocked(
        bl, br, k=1, num_left_blocks=2, num_right_blocks=2
    ).collect()
    assert {(bytes(r.id_a), bytes(r.id_b)) for r in bout} == {
        (bytes([i]), bytes([i])) for i in range(3)
    }


def test_semantic_dedup_marks_and_pairs(spark):
    """SemDeDup composition: scaled copies normalize bit-identically
    (same cluster, cos exactly 1), keep='min'/'max' pick deterministic
    representatives, singletons keep, threshold bounds validated."""
    import numpy as np

    rng = np.random.default_rng(5)
    # zero-centered: uniform(0,1) vectors all share the positive orthant
    # and organically exceed cos 0.95 — gaussians concentrate near 0
    vecs = rng.standard_normal((60, 8))
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    # scaled duplicates of ids 0..4 at negative ids
    rows += [(-(i + 1), (2.0 * vecs[i]).tolist()) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    pairs = similarity.semantic_dup_pairs(
        df, "vec_id", "embedding", threshold=0.95, num_centroids=4, seed=42
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(-(i + 1), i) for i in range(5)}
    assert all(r.cos_sim == 1.0 for r in pairs)

    marks = similarity.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, num_centroids=4, keep="max"
    ).collect()
    dropped = {r.vec_id for r in marks if not r.keep}
    assert dropped == {-(i + 1) for i in range(5)}
    assert len(marks) == 65
    # keep='min' flips the representatives to the negative copies
    marks_min = similarity.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, num_centroids=4, keep="min"
    ).collect()
    assert {r.vec_id for r in marks_min if not r.keep} == set(range(5))
    # singletons: sem_cluster NULL, keep True
    single = [r for r in marks if r.vec_id == 50][0]
    assert single.keep and single.sem_cluster is None

    with pytest.raises(ValueError, match="threshold"):
        similarity.semantic_dup_pairs(df, threshold=1.5)
    with pytest.raises(ValueError, match="keep"):
        similarity.semantic_dedup(df, keep="first")
    with pytest.raises(ValueError, match="target_cluster_rows"):
        similarity.semantic_dup_pairs(df, target_cluster_rows=1)

    # the UNTOUCHED default (num_centroids=None) sizes centroids for a
    # FIXED cluster-row target — linear total pair work — and must still
    # recover exactly the planted bit-identical duplicates (planted pairs
    # share a cluster at any centroid count, so the green is sizing-
    # independent by construction)
    auto_pairs = similarity.semantic_dup_pairs(
        df, "vec_id", "embedding", threshold=0.95, seed=42
    ).collect()
    assert {(r.id_a, r.id_b) for r in auto_pairs} == {
        (-(i + 1), i) for i in range(5)
    }


def test_norm_hoist_survives_collapse_project(spark):
    """CollapseProject inlines a non-cheap alias referenced ONCE back into
    a transform() lambda body — re-evaluating the L2-norm aggregate per
    element, O(d^2) per row. The when(norm > 0, ...) barrier makes the
    alias referenced twice, which CollapseProject refuses to collapse.
    Pins the hoist in the OPTIMIZED plan for truncate_embeddings and
    semantic_dup_pairs; a future optimizer rule or refactor that re-inlines
    the aggregate fails here, not in a bench regression."""
    from vastdb_sdk_spark.operators import similarity

    rng = np.random.default_rng(7)
    rows = [(i, v.tolist()) for i, v in enumerate(rng.standard_normal((30, 8)))]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    def assert_hoisted(plan_df, label):
        opt = plan_df._jdf.queryExecution().optimizedPlan().toString()
        bad = [
            ln
            for ln in opt.splitlines()
            if "transform(" in ln and "sqrt(aggregate(" in ln
        ]
        assert not bad, f"{label}: norm aggregate inlined into lambda: {bad[0][:200]}"

    tr = similarity.truncate_embeddings(df, dims=4)
    assert_hoisted(tr, "truncate_embeddings")
    # values: still exact unit-norm truncation
    row = tr.filter(F.col("vec_id") == 0).collect()[0]
    v = np.array(rows[0][1][:4])
    np.testing.assert_allclose(
        np.array(row.embedding_trunc), v / np.linalg.norm(v), rtol=1e-12
    )

    pairs = similarity.semantic_dup_pairs(
        df, "vec_id", "embedding", threshold=0.95, num_centroids=2, seed=1
    )
    assert_hoisted(pairs, "semantic_dup_pairs")


def test_semantic_dup_pairs_twolevel_clamp_recall(spark):
    """Near-duplicate RECALL in the centroid-clamp regime, where
    assign_probe_centroids goes two-level/approximate (C >= threshold,
    coarse groups genuinely pruned: 16 groups, 8 probed). Every other
    gate builds with C <= 64 — this is the only test exercising the
    regime the 100-TB auto-sizing actually lands in. Plants 60
    NEAR-duplicate pairs (noise, cos ~0.997 — not bit-identical, so
    co-assignment is NOT guaranteed by determinism alone) in a 20k
    gaussian corpus at C=256 and asserts (a) planted-pair recall >= 0.9
    and (b) the two-level assign loses at most one pair vs the exact
    flat assign (measured: both find 59/60; the shared miss is a
    k-means boundary split, inherent to SemDeDup's same-cluster rule)."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_base, n_pairs, dim = 20000, 60, 16
    X = rng.normal(size=(n_base, dim))
    rows = [(i, X[i].tolist()) for i in range(n_base)]
    planted = []
    for j in range(n_pairs):
        a = j * 200
        v = X[a] / np.linalg.norm(X[a])
        noise = rng.normal(size=dim)
        noise *= 0.08 / np.linalg.norm(noise)
        w = v + noise
        bid = n_base + j
        rows.append((bid, w.tolist()))
        cos = float(v @ (w / np.linalg.norm(w)))
        planted.append((a, bid, cos))
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
    ).repartition(16)
    wanted = [(a, b) for a, b, c in planted if c >= 0.95]
    recalls = {}
    for label, thr in (("twolevel", 32), ("flat", 10**9)):
        pairs = similarity.semantic_dup_pairs(
            df, threshold=0.95, num_centroids=256, twolevel_threshold=thr
        )
        got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
               for r in pairs.collect()}
        recalls[label] = sum(1 for p in wanted if p in got)
    assert recalls["twolevel"] >= 0.9 * len(wanted), recalls
    assert recalls["twolevel"] >= recalls["flat"] - 1, recalls


def test_semantic_dup_pairs_grid_equivalence(spark):
    """The (chunk_i, chunk_j) cell grid is a pure parallelization of the
    per-cluster pair search: every unordered pair maps to exactly one
    cell, so a tiny gemm_chunk (forcing the g>1 grid path with cross
    cells) must yield the IDENTICAL (id_a, id_b, cos_sim) set as a
    gemm_chunk larger than any cluster (the one-cell-per-cluster path)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((120, 8))
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    rows += [(1000 + i, (3.0 * vecs[i]).tolist()) for i in range(15)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    kw = dict(threshold=0.8, num_centroids=3, seed=42)
    one_cell = similarity.semantic_dup_pairs(
        df, "vec_id", "embedding", gemm_chunk=100_000, **kw
    ).collect()
    grid = similarity.semantic_dup_pairs(
        df, "vec_id", "embedding", gemm_chunk=7, **kw
    ).collect()
    as_set = lambda rs: {(r.id_a, r.id_b, r.cos_sim) for r in rs}
    assert len(grid) == len(as_set(grid))  # no pair computed twice
    assert as_set(grid) == as_set(one_cell)
    assert {(r.id_a, r.id_b) for r in one_cell} >= {
        (i, 1000 + i) for i in range(15)
    }


def test_truncate_embeddings_and_matryoshka_funnel(spark):
    import math

    import pytest as _pytest

    from vastdb_sdk_spark.operators.similarity import (
        matryoshka_topk,
        truncate_embeddings,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    t = {r["vec_id"]: r["embedding_trunc"]
         for r in truncate_embeddings(df, 2).collect()}
    # renormalized: [0.9, 0.1] -> unit length
    n = math.hypot(0.9, 0.1)
    assert t[2] == _pytest.approx([0.9 / n, 0.1 / n])
    assert t[1] == _pytest.approx([1.0, 0.0])
    raw = {r["vec_id"]: r["embedding_trunc"]
           for r in truncate_embeddings(df, 2, renormalize=False).collect()}
    assert raw[2] == _pytest.approx([0.9, 0.1])

    # funnel: query along dim 0; shortlist by 2-dim cosine, re-rank full
    got = matryoshka_topk(df, [1.0, 0.0, 0.0, 0.0], k=3, dims=2, shortlist=4)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids == [1, 2, 4]  # full-dim cosine order
    with _pytest.raises(ValueError, match="shortlist"):
        matryoshka_topk(df, [1.0, 0.0], k=5, dims=2, shortlist=3)
    with _pytest.raises(ValueError, match="dims"):
        truncate_embeddings(df, 0)


def test_minhash_join_links_edited_copies(spark):
    from vastdb_sdk_spark.operators.dedup import minhash_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    left = spark.createDataFrame(
        [(i, (base + f"doc {i} ") * 3) for i in range(12)],
        "doc_id long, text string",
    )
    right = spark.createDataFrame(
        [(100 + i, (base + f"doc {i} ") * 3) for i in range(0, 12, 2)]
        + [(900, "totally different words nothing shared at all here")],
        "rid long, body string",
    )
    out = minhash_join(
        left,
        right,
        left_text="text",
        right_text="body",
        left_id="doc_id",
        right_id="rid",
        threshold=0.9,
        num_hashes=16,
        num_bands=4,
        shingle_k=3,
        hash_fn="md5",
    ).collect()
    got = {(r["left_id"], r["right_id"]) for r in out}
    # verbatim copies have identical signatures -> recall is guaranteed
    assert got == {(i, 100 + i) for i in range(0, 12, 2)}
    assert all(abs(r["jaccard"] - 1.0) < 1e-9 for r in out)


def test_minhash_join_bucket_cap_and_validation(spark):
    from vastdb_sdk_spark.operators.dedup import minhash_join
    import pytest as _pt

    boiler = [(i, "same boilerplate text everywhere repeated") for i in range(6)]
    left = spark.createDataFrame(boiler, "doc_id long, text string")
    right = spark.createDataFrame(
        [(100 + i, t) for i, t in boiler], "rid long, body string"
    )
    full = minhash_join(
        left, right, right_text="body", right_id="rid", threshold=0.9
    )
    assert full.count() == 36
    capped = minhash_join(
        left,
        right,
        right_text="body",
        right_id="rid",
        threshold=0.9,
        max_bucket_size=3,
    )
    assert capped.count() == 0  # every bucket oversized -> dropped
    with _pt.raises(ValueError):
        minhash_join(left, right, threshold=0.0)


def test_pca_recovers_planted_subspace(spark):
    import numpy as np
    from vastdb_sdk_spark.operators.similarity import pca_fit, pca_project

    # exact rank-2 corpus in coordinates 1 and 4 of an 8-dim space, plus a
    # constant offset on coordinate 0 that centering must remove
    rows = []
    for i in range(40):
        a, b = float((i * 7) % 13), float((i * 11) % 17)
        v = [3.0, a, 0.0, 0.0, b, 0.0, 0.0, 0.0]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = pca_fit(df, k=2)
    assert model["n"] == 40 and model["dim"] == 8
    ev = model["explained_variance"]
    assert ev[0] >= ev[1] > 1.0
    # rank 2 exactly: the top-2 eigenvalues carry the whole trace
    assert abs(sum(ev) - model["total_variance"]) < 1e-9
    # components live in span(e1, e4): all other coords ~0
    C = np.asarray(model["components"])
    mask = np.ones(8, dtype=bool)
    mask[[1, 4]] = False
    assert np.abs(C[:, mask]).max() < 1e-9
    # orthonormal, sign-fixed
    assert np.allclose(C @ C.T, np.eye(2), atol=1e-12)
    assert all(C[i, np.argmax(np.abs(C[i]))] > 0 for i in range(2))
    # projection preserves pairwise distances exactly (data in-span)
    proj = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(df, model).collect()
    }
    for i in (1, 7, 23):
        a, b = float((i * 7) % 13), float((i * 11) % 17)
        true_d2 = a * a + b * b  # distance to row 0 (a=b=0)
        got_d2 = float(((proj[i] - proj[0]) ** 2).sum())
        assert abs(got_d2 - true_d2) < 1e-8


def test_pca_validation_and_model_shape(spark):
    import pytest as _pt
    from vastdb_sdk_spark.operators.similarity import pca_fit, pca_project

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    with _pt.raises(ValueError):
        pca_fit(df, k=0)
    with _pt.raises(ValueError):
        pca_fit(df, k=3)  # k > dim
    with _pt.raises(ValueError):
        pca_fit(df.filter("vec_id < 0"), k=1)  # empty input
    model = pca_fit(df, k=2)
    with _pt.raises(ValueError):
        pca_project(df, {"mean": model["mean"], "components": [[1.0]]})
    out = pca_project(df, model)
    assert out.columns == ["vec_id", "embedding", "pca"]
    assert len(out.first()["pca"]) == 2


def test_assign_centroids_twolevel_matches_flat(spark):
    """Two-level coarse->fine assignment (large centroid counts): exact
    duplicates always co-assign (deterministic per vector), the flat and
    two-level paths agree on the overwhelming majority of rows, and the
    result is independent of partitioning."""
    import numpy as np

    rng = np.random.default_rng(3)
    cents = rng.standard_normal((512, 12))
    rows = [(i, v.tolist()) for i, v in enumerate(rng.standard_normal((400, 12)))]
    # bit-identical twins
    rows += [(10_000 + i, list(rows[i][1])) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    flat = {
        r.vec_id: r.centroid_id
        for r in similarity.assign_probe_centroids(
            df, cents, "embedding", twolevel_threshold=10**9
        ).collect()
    }
    two = {
        r.vec_id: r.centroid_id
        for r in similarity.assign_probe_centroids(
            df, cents, "embedding", twolevel_threshold=2
        ).collect()
    }
    # duplicates co-assign under BOTH paths
    for i in range(20):
        assert two[i] == two[10_000 + i]
        assert flat[i] == flat[10_000 + i]
    # near-total agreement with the exact assign even on unclustered
    # gaussians (the adversarial case; w=8 coarse probes measured 0.955)
    agree = sum(flat[k] == two[k] for k in flat) / len(flat)
    assert agree >= 0.93, agree
    # partitioning-independent
    two_r = {
        r.vec_id: r.centroid_id
        for r in similarity.assign_probe_centroids(
            df.repartition(13), cents, "embedding", twolevel_threshold=2
        ).collect()
    }
    assert two_r == two


def test_knn_join_cosine_shared_column_names_across_strategies(spark):
    """left and right sharing a non-id column name ('text') must produce
    the same rows on both routes — the blocked join-back used unqualified
    selection and raised an ambiguous-column error."""
    import numpy as np

    rng = np.random.default_rng(3)
    left = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist(), f"l{i}") for i in range(20)],
        "id_a LONG, vec_a ARRAY<DOUBLE>, text STRING",
    )
    right = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist(), f"r{i}") for i in range(30)],
        "id_b LONG, vec_b ARRAY<DOUBLE>, text STRING",
    )
    wide = similarity.knn_join_cosine(left, right, k=3, strategy="broadcast")
    narrow = similarity.knn_join_cosine(left, right, k=3, strategy="blocked")
    assert wide.columns == narrow.columns
    key = lambda r: (r[0], r[3])  # (id_a, id_b)
    a = sorted(map(tuple, wide.collect()), key=key)
    b = sorted(map(tuple, narrow.collect()), key=key)
    assert a == b


def test_rhp_topk_multiprobe_hamming_three_reaches_h3_buckets(spark):
    """multiprobe_hamming=3 must actually probe hamming-3 buckets (the
    old hand-rolled expansion silently capped at 2)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    indexed, planes = similarity.build_rhp_index(df, num_planes=6, dim=8)
    q = rows[0][1]
    got2 = {r.vec_id for r in similarity.rhp_topk(
        indexed, planes, q, k=200, multiprobe_hamming=2, id_col="vec_id"
    ).collect()}
    got3 = {r.vec_id for r in similarity.rhp_topk(
        indexed, planes, q, k=200, multiprobe_hamming=3, id_col="vec_id"
    ).collect()}
    got6 = {r.vec_id for r in similarity.rhp_topk(
        indexed, planes, q, k=200, multiprobe_hamming=6, id_col="vec_id"
    ).collect()}
    assert got2 <= got3 <= got6
    assert got6 == {r[0] for r in rows}  # h=num_planes probes everything
    assert len(got3) > len(got2)  # h=3 buckets genuinely reachable


def test_build_rhp_index_empty_frame_raises_value_error(spark):
    df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="pass dim="):
        similarity.build_rhp_index(df)


def test_dedup_exact_null_safe_digest_and_null_order_groups(spark):
    from vastdb_sdk_spark.operators.dedup import dedup_exact, exact_duplicate_groups

    # ('x', NULL) vs (NULL, 'x'): concat_ws used to skip NULLs, colliding
    # the two distinct rows into one digest and silently dropping one
    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("x", None)], "a STRING, b STRING"
    )
    kept = dedup_exact(df, cols=["a", "b"])
    assert sorted(((r.a, r.b) for r in kept.collect()), key=str) == sorted(
        [("x", None), (None, "x")], key=str
    )
    groups = exact_duplicate_groups(df, cols=["a", "b"]).collect()
    assert sorted(g.n_copies for g in groups) == [1, 2]
    # null-vs-empty-string stay distinct too (the length prefix)
    df2 = spark.createDataFrame([("", "y"), (None, "y")], "a STRING, b STRING")
    assert dedup_exact(df2, cols=["a", "b"]).count() == 2
    # a duplicate group whose order_col is NULL everywhere keeps a REAL
    # member (min_by alone would emit an all-NULL row)
    df3 = spark.createDataFrame(
        [("t", None), ("t", None), ("u", 5)], "text STRING, ts LONG"
    )
    rows = dedup_exact(df3, cols=["text"], order_col="ts").collect()
    assert sorted(((r.text, r.ts) for r in rows), key=str) == sorted(
        [("t", None), ("u", 5)], key=str
    )


def test_minhash_empty_docs_not_mutual_duplicates(spark):
    """'!!!' and '???' tokenize to [] -> both used to collapse to the
    degenerate '' shingle and verify as Jaccard-1.0 duplicates."""
    from vastdb_sdk_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_dedup_pairs, minhash_join,
    )

    df = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, None), (4, ""),
         (5, "the quick brown fox jumps over the lazy dog"),
         (6, "the quick brown fox jumps over the lazy dog")],
        "doc_id LONG, text STRING",
    )
    pairs = minhash_dedup_pairs(df, num_hashes=16, num_bands=4, threshold=0.8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(5, 6)}
    assert lsh_candidate_pairs(df).filter("id_a < 5").count() == 0
    joined = minhash_join(df, df.withColumnRenamed("doc_id", "rid"),
                          right_id="rid", threshold=0.8)
    assert {(r.left_id, r.right_id) for r in joined.collect()} == {
        (5, 5), (5, 6), (6, 5), (6, 6)
    }


def test_lsh_band_validation(spark):
    from vastdb_sdk_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="must be in"):
        lsh_candidate_pairs(df, num_hashes=16, num_bands=32)
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(df, num_hashes=16, num_bands=5)


def test_lsh_token_empty_guard_no_filter_side_tokenize(spark):
    """The token-empty exclusion must NOT be a filter: PushDownPredicates
    substitutes a filter's alias references back to the tokenizer expression
    (verified on pyspark 4.1.2), re-running the regex split once per row on
    top of the signature pipeline's own evaluation — the r11 2x regression.
    Pins the mark_empty/skip_col path: no Filter node in the optimized plan
    may contain the tokenizer's split()."""
    from vastdb_sdk_spark.operators.dedup import lsh_candidate_pairs, minhash_join

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id LONG, text STRING"
    )
    for plan_df in (
        lsh_candidate_pairs(df, num_hashes=8, num_bands=4),
        minhash_join(
            df, df.withColumnRenamed("doc_id", "rid"), right_id="rid",
            threshold=0.8,
        ),
    ):
        opt = plan_df._jdf.queryExecution().optimizedPlan().toString()
        bad = [
            ln for ln in opt.splitlines()
            if "Filter" in ln and "split(" in ln
        ]
        assert not bad, f"filter-side tokenization reintroduced: {bad[0][:200]}"


def test_unmanaged_candidate_cache_is_bounded(spark):
    """The unmanaged minhash APIs persist their candidate frames; a long
    session calling them per table must not accumulate caches without bound
    (the r11 session-spread suspect). The registry keeps at most the cap,
    oldest-first, and re-persisting the SAME pipeline replaces its entry
    (CacheManager shares one entry across identical plans)."""
    from vastdb_sdk_spark.operators import dedup

    base = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    before = list(dedup._unmanaged_caches)
    frames = []
    for k in range(dedup._UNMANAGED_CACHE_CAP + 2):
        # distinct filters => semantically distinct pipelines
        frames.append(
            dedup.minhash_dedup_pairs(
                base.filter(F.col("doc_id") >= k), num_hashes=8, num_bands=4
            )
        )
        frames[-1].count()
    assert len(dedup._unmanaged_caches) <= dedup._UNMANAGED_CACHE_CAP
    # same pipeline re-run: replaces, not grows
    n = len(dedup._unmanaged_caches)
    dedup.minhash_dedup_pairs(
        base.filter(F.col("doc_id") >= 1), num_hashes=8, num_bands=4
    ).count()
    assert len(dedup._unmanaged_caches) == n
    # evicted frames still compute correct (empty) results
    assert frames[0].count() == frames[0].count()
    spark.catalog.clearCache()
    del dedup._unmanaged_caches[:]
    dedup._unmanaged_caches.extend(before)


def test_remove_duplicate_lines_null_text_counts(spark):
    from vastdb_sdk_spark.operators.dedup import remove_duplicate_lines

    df = spark.createDataFrame(
        [(1, "a\nb\na"), (2, None)], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in remove_duplicate_lines(df).collect()}
    # null text used to report n_lines_dropped = -1 (size(split(NULL)))
    assert rows[2].n_lines_dropped >= 0
    assert rows[1].n_lines_dropped >= 0

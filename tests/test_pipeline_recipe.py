"""End-to-end pretraining-data pipeline recipe: every stage of the
LLM-data tier chained over the documents corpus, asserting the invariants
a production pipeline would gate on. This is the "a reference user could
run their whole workflow here" integration test."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_full_pretraining_pipeline(spark):
    from vastdb_sdk_spark.functions.scrub import pii_counts, scrub_pii
    from vastdb_sdk_spark.functions.text import (
        dup_ngram_fraction,
        normalize_text,
        quality_score,
        token_count,
        tokens,
    )
    from vastdb_sdk_spark.operators.contamination import decontaminate
    from vastdb_sdk_spark.operators.dedup import (
        dedup_keep_representative,
        minhash_dedup_pairs,
    )
    from vastdb_sdk_spark.operators.sampling import (
        chunk_fixed_tokens,
        pack_greedy,
        quality_percentile_filter,
        resample_to_mix,
        train_test_split,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 1. normalize + scrub (pure maps)
    clean = docs.select(
        "doc_id", "lang", "source",
        scrub_pii(normalize_text(F.col("text"))).alias("text"),
    )
    assert clean.count() == n0  # maps never drop rows

    # 2. repetition + quality gating: drop degenerate docs, keep the top
    # 80% by quality per source
    scored = clean.select(
        "*",
        F.round(quality_score(F.col("text")), 4).alias("quality"),
        dup_ngram_fraction(tokens(F.col("text")), 2).alias("rep2"),
    ).filter(F.col("rep2") < 0.9)
    gated = quality_percentile_filter(
        scored, F.col("quality"), keep_fraction=0.8, stratum_col="source"
    ).drop("rep2")
    n_gated = gated.count()
    assert 0 < n_gated <= scored.count()

    # 3. near-dedup, transitively keep one per cluster
    pairs = minhash_dedup_pairs(gated, threshold=0.8, hash_fn="xxhash64")
    deduped = dedup_keep_representative(gated, pairs)
    n_dedup = deduped.count()
    assert n_dedup <= n_gated
    # re-running finds nothing new (idempotence)
    pairs2 = minhash_dedup_pairs(deduped, threshold=0.8, hash_fn="xxhash64")
    assert dedup_keep_representative(deduped, pairs2).count() == n_dedup

    # 4. decontaminate against a planted eval set (verbatim slice of a doc)
    probe = deduped.orderBy("doc_id").limit(1).collect()[0]
    ev = spark.createDataFrame(
        [(1, " ".join(probe.text.split()[:30]))], "doc_id LONG, text STRING"
    )
    safe = decontaminate(deduped, ev, n=8)
    n_safe = safe.count()
    assert n_safe < n_dedup  # the probe's source doc was quarantined
    assert safe.filter(F.col("doc_id") == probe.doc_id).count() == 0

    # 5. language mix + leak-proof split
    mixed = resample_to_mix(
        safe, "doc_id", "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}
    )
    split = train_test_split(mixed, "doc_id", test_fraction=0.1)
    marks = {r.split for r in split.select("split").distinct().collect()}
    assert marks <= {"train", "test"}
    # growing the corpus cannot migrate rows between splits: re-split of a
    # subset agrees with the full split on every shared doc
    sub = train_test_split(mixed.limit(50), "doc_id", test_fraction=0.1)
    full_m = {r.doc_id: r.split for r in split.collect()}
    for r in sub.collect():
        assert full_m[r.doc_id] == r.split

    # 6. context-window chunking + packing
    train = split.filter(F.col("split") == "train")
    chunks = chunk_fixed_tokens(train, text_col="text", size=64, overlap=8)
    assert chunks.count() >= train.count()  # every non-empty doc chunks
    assert chunks.filter(F.col("n_chunk_tokens") > 64).count() == 0
    packed = pack_greedy(
        chunks.withColumn("n_tok", F.col("n_chunk_tokens")),
        size_col="n_tok", budget=512, stratum_col="doc_id",
        order_col="chunk_id",
    )
    # bins respect the budget for everything smaller than one window
    over = packed.groupBy("doc_id", "pack_bin").agg(
        F.sum("n_tok").alias("tot")
    ).filter(F.col("tot") > 512 + 64)
    assert over.count() == 0


def test_incremental_view_maintenance_via_change_feed(session):
    """The CDC loop an incremental pipeline runs: a per-lang document
    count is maintained from consume_changes deltas only (never
    rescanning the corpus) and must equal a full recompute after every
    commit — inserts, deletes and updates that MOVE a row between
    groups."""
    import pyarrow as pa

    from collections import Counter

    with session.transaction() as tx:
        t = tx.bucket("bkt").create_schema("inc").create_table(
            "docs", pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
        )
        t.insert(pa.table({"doc_id": [1, 2, 3], "lang": ["en", "en", "de"]}))

    view = Counter()

    def drain():
        with session.transaction() as tx:
            t = tx.bucket("bkt").schema("inc").table("docs")
            for r in t.consume_changes("lang_counts").collect():
                if r._change_type in ("insert", "update_postimage"):
                    view[r.lang] += 1
                elif r._change_type in ("delete", "update_preimage"):
                    view[r.lang] -= 1
            truth = Counter(
                {row.lang: row.n for row in t.df().groupBy("lang").count()
                 .withColumnRenamed("count", "n").collect()}
            )
        return truth

    # bootstrap: cursor starts at current; seed the view from a full scan
    truth = drain()
    view = Counter(truth)

    from vastdb_sdk_spark import _ as D

    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("inc").table("docs")
        t.insert(pa.table({"doc_id": [4], "lang": ["fr"]}))
        t.update_where(D.doc_id == 3, {"lang": "en"})  # de -> en
    truth = drain()
    assert +view == +truth

    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("inc").table("docs")
        t.delete_where(D.lang == "en")
    truth = drain()
    assert +view == +truth


def test_hybrid_retrieval_bm25_then_embedding_rerank(spark):
    """Hybrid retrieval composition: BM25 keyword shortlist over the
    documents table, embedding cosine re-rank of the shortlist (ids are
    shared across the two tables in the testdata). The re-ranked top-k
    is a subset of the shortlist and ordered by cosine."""
    from pyspark.sql import functions as F

    from vastdb_sdk_spark.functions.vector import cosine_similarity
    from vastdb_sdk_spark.operators.lm import bm25_scores

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").head()[0]

    shortlist = (
        bm25_scores(docs, ["hash", "join", "filter"], "text", "doc_id")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(100)
    )
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    reranked = (
        shortlist.join(emb, shortlist.doc_id == emb.vec_id)
        .withColumn("cos", cosine_similarity(F.col("embedding"), qlit))
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "bm25", "cos")
    )
    rows = reranked.collect()
    assert len(rows) == 10
    short_ids = {r.doc_id for r in shortlist.collect()}
    assert all(r.doc_id in short_ids for r in rows)
    cosines = [r.cos for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_round8_curation_recipe(session):
    """The round-8 surface composed end to end on ENGINE tables:
    classifier-gated DML, in-place semantic dedup, append + INCREMENTAL
    IVF-PQ refresh, then BPE learned on the surviving corpus — the
    workflow a curation user actually runs, not isolated operators."""
    import numpy as np
    import pyarrow as pa

    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.operators.bpe import bpe_segment, learn_bpe_merges
    from vastdb_sdk_spark.operators.lm import linear_classifier_scores

    spark = session.spark
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    with session.transaction() as tx:
        sc = tx.bucket("bkt").create_schema("s")
        t = sc.create_table(
            "corpus", pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        )
        t.insert_df(docs)
    # 1. classifier gate: drop the lowest-probability quartile (engine DML)
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("corpus")
        scores = linear_classifier_scores(
            t.select_df(), {"hash": 0.75, "group": -1.25, "sort": -0.5},
            bias=0.0,
        )
        cut = scores.approxQuantile("clf_prob", [0.25], 0.0)[0]
        drop_ids = [
            r.doc_id for r in scores.filter(F.col("clf_prob") < cut).collect()
        ]
        n0 = t.count_rows()
        if drop_ids:
            t.delete_where(D.doc_id.isin(drop_ids))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("corpus")
        n1 = t.count_rows()
        assert n1 == n0 - len(drop_ids) and n1 > 0

    # 2. embeddings table with a planted scaled dup; in-place semantic dedup
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((40, 8))
    data = pa.table(
        {
            "vec_id": pa.array(list(range(40)) + [999], pa.int64()),
            "emb": pa.array(
                [v.tolist() for v in vecs] + [(2.0 * vecs[5]).tolist()],
                pa.list_(pa.float64()),
            ),
        }
    )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "vectors", data.schema,
            vector_index={"column": "emb", "metric": "l2sq"},
        )
        t.insert(data)
        t.dedup_near_rows("emb", method="semantic", threshold=0.95, num_centroids=4)
        assert t.count_rows() == 40  # the scaled copy is gone
    # 3. build IVF-PQ on the committed state, append, incremental refresh
    with session.transaction() as tx:
        tx.bucket("bkt").schema("s").table("vectors").build_vector_index(
            kind="ivfpq", num_centroids=4, num_subspaces=4, seed=42
        )
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("vectors")
        t.insert(pa.table({
            "vec_id": pa.array([5000], pa.int64()),
            "emb": pa.array([[0.42] * 8], pa.list_(pa.float64())),
        }))
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("vectors")
        assert t.refresh_vector_index()["mode"] == "incremental"
        got = t.vector_search(
            [0.42] * 8, columns=["vec_id"], limit=3,
            approximate=True, nprobe=2, rerank=20,
        )
        assert got.column("vec_id").to_pylist()[0] == 5000

    # 4. BPE learned on the SURVIVING corpus; segmentation reconstructs
    with session.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("corpus")
        surviving = t.select_df()
        merges = learn_bpe_merges(surviving, num_merges=20)
        seg = bpe_segment(surviving, merges, "text", "doc_id")
        assert seg.count() == n1
        assert seg.agg(F.min("n_bpe_tokens")).collect()[0][0] >= 0


def test_diverse_sampling_recipe_cluster_then_cap(spark):
    """Round-9 curation recipe: topic-bucket the embedding corpus
    (nearest-centroid assignment), then draw a per-cluster quota
    (cap_per_group) — the "diverse subset" selection step of embedding
    curation (cluster-balanced sampling), plus an exact length report
    per language for the budget decision. Composes three round-9
    operators end-to-end."""
    import numpy as np

    from vastdb_sdk_spark.operators.sampling import (
        cap_per_group,
        exact_group_percentiles,
    )
    from vastdb_sdk_spark.operators.similarity import assign_probe_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    crows = sorted(
        emb.filter(F.col("vec_id") < 4).collect(), key=lambda r: r.vec_id
    )
    C = np.asarray([r.embedding for r in crows], dtype=np.float64)
    assigned = assign_probe_centroids(
        emb.select("vec_id", "embedding"), C, "embedding", nprobe=1
    )
    quota = 5
    sample = cap_per_group(assigned, "centroid_id", quota, id_col="vec_id")
    per_cluster = {
        r.centroid_id: r.n
        for r in sample.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_cluster, "no clusters assigned"
    assert all(n <= quota for n in per_cluster.values())
    # the sample is deterministic
    again = {
        (r.centroid_id, r.vec_id) for r in
        cap_per_group(assigned, "centroid_id", quota, id_col="vec_id")
        .select("centroid_id", "vec_id").collect()
    }
    assert again == {
        (r.centroid_id, r.vec_id)
        for r in sample.select("centroid_id", "vec_id").collect()
    }

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    report = exact_group_percentiles(
        docs, "n_chars", "lang", percentiles=(0.5, 0.9), id_col="doc_id"
    ).collect()
    assert report and all(r.p50 <= r.p90 for r in report)

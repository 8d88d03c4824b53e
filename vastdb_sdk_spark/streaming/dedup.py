"""Streaming deduplication — the streaming face of operators/dedup.py.

For continuous ingestion pipelines (training-data collection, event
streams): drop exact duplicates inside a watermark horizon, or route each
micro-batch through the batch MinHash pipeline against the already-ingested
corpus via foreachBatch.

State discipline at scale: ``dropDuplicatesWithinWatermark`` keeps one state
row per key seen within the watermark — state is bounded by (arrival rate x
horizon), not by corpus size. Whole-corpus dedup belongs in the batch tier
(operators/dedup.py) over the accumulated table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pinning import pin_scope as _pin_scope


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``key_cols`` digest was already seen within the
    watermark horizon. The digest (md5 over concatenated keys) keeps state
    rows small and uniformly distributed regardless of payload size."""
    digest = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    )
    from .events import with_event_time

    return (
        with_event_time(stream, ts_col)
        .withColumn("__content_hash", digest)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )


def stream_dedup_against_table(stream: DataFrame, table, checkpoint_dir: str):
    """foreachBatch pattern: each micro-batch is de-duplicated exactly
    against the engine table's existing content hashes (anti-join), then
    appended — so the accumulated table stays exact-duplicate-free without
    unbounded stream state. ``table`` must have the stream's columns."""
    session = table.tx._session
    bucket = table.bucket.name
    schema_name = table.schema.name
    table_name = table.name
    cols = [f.name for f in table.arrow_schema]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        digest = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
        )
        batch = (
            batch_df.select(*cols)
            .withColumn("__h", digest)
            .dropDuplicates(["__h"])
        )
        with session.transaction() as tx:
            t = tx.bucket(bucket).schema(schema_name).table(table_name)
            existing = t.df().select(
                F.md5(
                    F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
                ).alias("__h")
            )
            fresh = batch.join(existing, "__h", "left_anti").drop("__h")
            t.insert_df(fresh)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_dedup_near_against_table(
    stream: DataFrame,
    corpus_table,
    sig_table,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.8,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
):
    """Continuous NEAR-duplicate-free ingestion — the streaming face of the
    MinHash-LSH batch pipeline (operators/dedup.py), with all dedup state in
    ENGINE TABLES instead of the stream state store (state grows with the
    corpus; the state store must not — SURVEY §2.9 scale discipline).

    Per micro-batch (foreachBatch):

    1. in-batch pass: LSH candidates + exact-Jaccard verify within the
       batch (same pipeline as ``minhash_dedup_pairs``, composed here with
       an explicit persist lifecycle); for every verified pair the higher
       id is dropped (conservative: a chain a~b~c keeps only a).
    2. cross-batch pass: the batch's LSH band keys equi-join the persisted
       signature table — candidates are (new, old) id pairs sharing a
       band, verified by exact Jaccard against the corpus table's text
       (only suspects are re-read, the corpus is semi-joined down first).
    3. survivors are appended to ``corpus_table`` and their band keys to
       ``sig_table`` in ONE engine transaction, with the micro-batch id
       recorded via ``set_stream_offset`` — a replayed batch after a
       checkpoint/commit race is detected and skipped (exactly-once, the
       same txnAppId pattern as stream_into_table).

    Shuffle volume per batch: O(batch x num_bands) band rows joined
    against the signature table (equi-join on an 8-byte hash key) — never
    batch x corpus. ``max_bucket_size`` caps in-batch candidate buckets
    (the quadratic-bomb guard); note the members of a capped bucket still
    land in the signature table, so heavy boilerplate must be removed by
    EXACT dedup upstream (stream_dedup_exact / dedup_rows) — the cap is a
    backstop, not a boilerplate strategy. Caller contract: ids are globally unique across the
    stream and corpus; ``sig_table`` has columns (doc_id int64,
    band_id int32, band_key int64); ``corpus_table`` has the stream's
    columns."""
    from ..operators.dedup import (
        jaccard_verify_pairs,
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    import os

    session = corpus_table.tx._session
    bucket = corpus_table.bucket.name
    schema_name = corpus_table.schema.name
    corpus_name = corpus_table.name
    sig_name = sig_table.name
    cols = [f.name for f in corpus_table.arrow_schema]
    stream_id = f"ckpt:{os.path.abspath(checkpoint_dir)}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # release every pin (internal localCheckpoint) per batch —
        # same lifecycle contract as the explicit persists below
        with _pin_scope():
            # every persist in this batch is released in the finally — a
            # long-running stream must not accumulate CacheManager entries
            # (hence lsh_candidate_pairs + jaccard_verify_pairs composed here
            # with an explicit lifecycle, not minhash_dedup_pairs' internal
            # batch-oriented persist)
            batch = batch_df.select(*cols).dropDuplicates([id_col])
            cached = []

            def _persist(df):
                cached.append(df.persist())
                return cached[-1]

            try:
                # 1. in-batch near-dups: drop the higher id of every verified pair
                in_cand = _persist(
                    lsh_candidate_pairs(
                        batch, text_col, id_col, num_hashes, num_bands,
                        shingle_k, "xxhash64", max_bucket_size,
                    )
                )
                in_pairs = jaccard_verify_pairs(
                    batch, in_cand, text_col, id_col, threshold, shingle_k
                )
                in_drop = in_pairs.select(F.col("id_b").alias(id_col)).distinct()
                survivors = _persist(batch.join(in_drop, id_col, "left_anti"))
                sigs = minhash_signatures(
                    survivors, text_col, id_col, num_hashes, shingle_k, "xxhash64"
                )
                bands = _persist(lsh_band_keys(sigs, num_bands, id_col, "xxhash64"))
                with session.transaction() as tx:
                    ct = tx.bucket(bucket).schema(schema_name).table(corpus_name)
                    st = tx.bucket(bucket).schema(schema_name).table(sig_name)
                    if batch_id <= ct.stream_offset(stream_id):
                        return  # replayed micro-batch: already committed
                    # 2. cross-batch candidates via the persisted signature table
                    old_bands = st.df().select(
                        F.col(id_col).alias("__old_id"), "band_id", "band_key"
                    )
                    cand = (
                        bands.join(old_bands, ["band_id", "band_key"])
                        .select(
                            F.col(id_col).alias("id_a"),
                            F.col("__old_id").alias("id_b"),
                        )
                        .distinct()
                    )
                    old_texts = ct.df().select(id_col, text_col)
                    union_docs = survivors.select(id_col, text_col).unionByName(
                        old_texts
                    )
                    verified = jaccard_verify_pairs(
                        union_docs, cand, text_col, id_col, threshold, shingle_k
                    )
                    # persisted: consumed by BOTH inserts below — without it the
                    # verify stage (a corpus semi-join + shingle pass) runs twice
                    cross_drop = _persist(
                        verified.select(F.col("id_a").alias(id_col)).distinct()
                    )
                    fresh = survivors.join(cross_drop, id_col, "left_anti")
                    ct.insert_df(fresh)
                    st.insert_df(
                        bands.join(cross_drop, id_col, "left_anti").select(
                            id_col, "band_id", "band_key"
                        )
                    )
                    ct.set_stream_offset(stream_id, batch_id)
            finally:
                for df in cached:
                    df.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_dedup_semantic_against_table(
    stream: DataFrame,
    corpus_table,
    sig_table,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 16,
    num_bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
):
    """Continuous SEMANTIC-near-duplicate-free ingestion — the embedding
    face of :func:`stream_dedup_near_against_table`: same engine-table
    state discipline (corpus + banded-signature tables, stream state
    store stays empty), but the similarity is embedding cosine and the
    band keys are banded random-hyperplane signatures
    (operators/similarity.rhp_band_keys — deterministic for a fixed
    seed, so keys from different batches/sessions join correctly).

    Per micro-batch (foreachBatch):

    1. in-batch pass: LSH-banded candidate pairs + exact-cosine verify
       within the batch (embedding_near_dup_pairs); the higher id of
       every verified pair is dropped.
    2. cross-batch pass: the batch's band keys equi-join the persisted
       signature table; candidate (new, old) pairs are verified by exact
       cosine against the corpus table's vectors — the corpus is
       semi-joined down to the suspects first, so only suspect vectors
       are re-read.
    3. survivors + their band keys land in ONE engine transaction with
       the micro-batch id recorded via set_stream_offset (exactly-once;
       a replayed batch is detected and skipped).

    Shuffle per batch: O(batch x num_bands) band rows against the
    signature table — never batch x corpus. Pass ``dim`` to keep plan
    construction free of per-batch head() probes. Caller contract: ids
    globally unique and integral; ``sig_table`` columns
    (id_col int64, band_id int32, band_key int64)."""
    import os

    from ..functions.vector import dot as vdot
    from ..functions.vector import norm as vnorm
    from ..operators.similarity import embedding_near_dup_pairs, rhp_band_keys

    session = corpus_table.tx._session
    bucket = corpus_table.bucket.name
    schema_name = corpus_table.schema.name
    corpus_name = corpus_table.name
    sig_name = sig_table.name
    cols = [f.name for f in corpus_table.arrow_schema]
    stream_id = f"ckpt:{os.path.abspath(checkpoint_dir)}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # release every pin (internal localCheckpoint) per batch —
        # same lifecycle contract as the explicit persists below
        with _pin_scope():
            batch = batch_df.select(*cols).dropDuplicates([id_col])
            cached = []

            def _persist(df):
                cached.append(df.persist())
                return cached[-1]

            try:
                in_pairs = embedding_near_dup_pairs(
                    batch, id_col, vec_col, threshold, num_planes, seed,
                    num_bands, dim=dim,
                )
                in_drop = in_pairs.select(F.col("id_b").alias(id_col)).distinct()
                survivors = _persist(batch.join(in_drop, id_col, "left_anti"))
                bands = _persist(
                    rhp_band_keys(
                        survivors, vec_col, id_col, num_planes, num_bands,
                        seed, dim=dim,
                    )
                )
                with session.transaction() as tx:
                    ct = tx.bucket(bucket).schema(schema_name).table(corpus_name)
                    st = tx.bucket(bucket).schema(schema_name).table(sig_name)
                    if batch_id <= ct.stream_offset(stream_id):
                        return  # replayed micro-batch: already committed
                    old_bands = st.df().select(
                        F.col(id_col).alias("__old_id"), "band_id", "band_key"
                    )
                    cand = (
                        bands.join(old_bands, ["band_id", "band_key"])
                        .select(
                            F.col(id_col).alias("id_a"),
                            F.col("__old_id").alias("id_b"),
                        )
                        .distinct()
                    )
                    # norms hoisted to the join inputs (one fold per row, not
                    # two per candidate pair; the Join is a collapse barrier)
                    va = survivors.select(
                        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
                    ).withColumn("__na", vnorm(F.col("__va")))
                    old_ids = cand.select(F.col("id_b").alias(id_col)).distinct()
                    vb = (
                        ct.df()
                        .select(id_col, vec_col)
                        .join(old_ids, id_col, "left_semi")
                        .select(
                            F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("__vb"),
                        )
                        .withColumn("__nb", vnorm(F.col("__vb")))
                    )
                    verified = (
                        cand.join(va, "id_a")
                        .join(vb, "id_b")
                        .filter(
                            vdot(F.col("__va"), F.col("__vb"))
                            / (F.col("__na") * F.col("__nb"))
                            >= threshold
                        )
                    )
                    cross_drop = _persist(
                        verified.select(F.col("id_a").alias(id_col)).distinct()
                    )
                    fresh = survivors.join(cross_drop, id_col, "left_anti")
                    ct.insert_df(fresh)
                    st.insert_df(
                        bands.join(cross_drop, id_col, "left_anti").select(
                            id_col, "band_id", "band_key"
                        )
                    )
                    ct.set_stream_offset(stream_id, batch_id)
            finally:
                for df in cached:
                    df.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

"""CDC replication: keep a destination engine table in sync with a source
table by applying the source's row-level change feed.

Engine extension composing read_changes (table.py — the Delta-CDF-style
feed whose cost tracks the changed-file span) with the multi-clause MERGE
machinery: downstream mirrors, cross-bucket replicas, and derived serving
copies stay row-identical to the source at churn cost, never full-copy
cost. The source and destination may live in different buckets or even
different warehouses — the feed is just a DataFrame and the merge runs in
the destination's transaction.

Net-effect semantics: the feed is a two-version diff, so per KEY the span
collapses to one action — the key's final image (insert / update_postimage
row) upserts; a key whose only trace is a removal (delete /
update_preimage with no final image) deletes. A key deleted under one
``$row_id`` and reinserted under another inside the span is ONE upsert.
The whole apply is one MERGE (one inner + one anti join on the key).

The sync cursor (last applied source version) is recorded in the
destination's manifest via the stream-offset mechanism — atomically with
the data, the same exactly-once discipline as streaming ingest — so a
replayed or crashed sync resumes idempotently: re-applying an
already-applied span upserts identical rows and deletes nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..errors import InvalidArgument


def sync_table(
    src,
    dst,
    key_cols: list[str],
    from_version: int | None = None,
) -> dict:
    """Apply the source's committed changes since ``from_version``
    (default: the recorded cursor; 0 = full initial sync) to ``dst``.
    Both tables must carry ``key_cols`` (a logical row identity — the
    feed's ``$row_id`` is storage identity and deliberately NOT used
    across tables). Returns ``{"from_version", "to_version", "upserts",
    "deletes"}`` and records ``to_version`` as the new cursor."""
    if not key_cols:
        raise InvalidArgument("sync_table needs at least one key column")
    for side, t in (("source", src), ("destination", dst)):
        missing = [c for c in key_cols if c not in t.arrow_schema.names]
        if missing:
            raise InvalidArgument(f"{side} table lacks key columns {missing}")
    data_cols = [c for c in src.arrow_schema.names]
    missing = [c for c in data_cols if c not in dst.arrow_schema.names]
    if missing:
        raise InvalidArgument(f"destination lacks source columns {missing}")

    cursor_id = f"sync:{src.path}"
    if from_version is None:
        from_version = max(dst.stream_offset(cursor_id), 0)
    to_version = src.bucket.manifest.version
    if to_version <= from_version:
        return {
            "from_version": from_version,
            "to_version": from_version,
            "upserts": 0,
            "deletes": 0,
        }
    if from_version <= 0:
        # initial sync: no readable pre-version to diff against — every
        # current source row is a final image (the merge still upserts,
        # so re-running an interrupted initial sync is idempotent)
        finals = src.select_df(columns=data_cols)
        removed = finals.select(*key_cols).limit(0)
    else:
        feed = src.read_changes(from_version, to_version)
        finals = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*data_cols)
        removed = feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(*key_cols).distinct()
    # keys whose final state is "gone": removed and not re-materialized
    gone = removed.join(
        finals.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    action = F.lit("upsert")
    source = finals.withColumn("__sync_action", action).unionByName(
        gone.select(
            *[F.col(c) for c in key_cols],
            *[
                F.lit(None).cast(dict(finals.dtypes)[c]).alias(c)
                for c in data_cols
                if c not in key_cols
            ],
            F.lit("delete").alias("__sync_action"),
        )
    )
    non_key = [c for c in data_cols if c not in key_cols]
    res = dst.merge(
        source,
        on=list(key_cols),
        matched_clauses=[
            ("delete", F.expr("s.__sync_action = 'delete'"), None),
            ("update", None, {c: F.expr(f"s.{c}") for c in non_key}),
        ],
        not_matched_condition=F.expr("s.__sync_action <> 'delete'"),
        when_not_matched="insert",
        insert_assignments={c: F.expr(f"s.{c}") for c in data_cols},
        target_alias="t",
        source_alias="s",
    )
    dst.set_stream_offset(cursor_id, to_version)
    return {
        "from_version": from_version,
        "to_version": to_version,
        "upserts": res.get("updated", 0) + res.get("inserted", 0),
        "deletes": res.get("deleted", 0),
    }

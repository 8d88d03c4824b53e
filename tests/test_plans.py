"""Plan-quality assertions: pushdown, pruning, file skipping, broadcast —
the `.explain`-and-iterate loop, mechanized (SURVEY.md §4)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark import _ as D
from vastdb_sdk_spark.plans import inspect as pi
from vastdb_sdk_spark.plans.pruning import Interval, extract_intervals, prune_files
from vastdb_sdk_spark.sources import create_table_from_files

SF = "/root/testdata/sf0.01"


def test_engine_scan_pushdown_and_pruning(clean_schema):
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        t = create_table_from_files(s, "li", [f"{SF}/lineitem.parquet"])
        df = t.select_df(columns=["l_orderkey"], predicate=(D.l_quantity > 45))
        pi.assert_filter_pushed(df, "GreaterThan(l_quantity,45.0)")
        pi.assert_column_pruned(df, "l_comment")
        pi.assert_column_pruned(df, "l_extendedprice")
        assert pi.exchange_count(df) == 0


def test_star_join_broadcasts(spark):
    import __spark_entry__ as e

    df = e.queries()["j1_star_join_revenue"](spark, SF)
    assert pi.broadcast_join_count(df) >= 3  # all dims broadcast at this SF
    assert pi.exchange_count(df) == 1  # only the final aggregation shuffles


def test_interval_extraction():
    assert extract_intervals((D.k > 5) & (D.k <= 9), "k")[0].overlaps(6, 6)
    assert not extract_intervals((D.k > 5) & (D.k <= 9), "k")[0].overlaps(10, 99)
    ors = extract_intervals((D.k == 1) | (D.k == 7), "k")
    assert len(ors) == 2
    assert extract_intervals(D.k.isin([1, 2, 3]), "k") is not None
    # unconstrained shapes
    assert extract_intervals(D.j > 5, "k") is None
    assert extract_intervals((D.k > 5) | (D.j > 1), "k") is None


def test_zorder_prunes_every_dimension(clean_schema):
    """optimize(zorder=[x, y]) must make a narrow predicate on EITHER
    column scan a strict subset of files; the lexicographic sort key
    (x, y) is the contrast — there a y-only predicate scans everything
    because every file spans the full y range."""
    import random

    rng = random.Random(7)
    pairs = [(i // 200, i % 200) for i in range(40_000)]  # x,y grid 0..199
    rng.shuffle(pairs)
    xs = pa.array([p[0] for p in pairs], pa.int64())
    ys = pa.array([p[1] for p in pairs], pa.int64())
    schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        s.create_table("zt", schema).insert(pa.table({"x": xs, "y": ys}))
        s.create_table("lex", schema, sorting_key=["x", "y"]).insert(
            pa.table({"x": xs, "y": ys})
        )
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("zt").optimize(
            target_file_rows=2500, zorder=["x", "y"]
        )
        tx.bucket("bkt").schema("s").table("lex").optimize(target_file_rows=2500)
    with clean_schema.transaction() as tx:
        zt = tx.bucket("bkt").schema("s").table("zt")
        lex = tx.bucket("bkt").schema("s").table("lex")
        n_z, n_lex = len(zt.entry.files), len(lex.entry.files)
        assert n_z >= 8 and n_lex >= 8
        y_pred = (D.y >= 0) & (D.y < 12)
        z_scan = pi.scanned_file_count(zt.select_df(predicate=y_pred))
        lex_scan = pi.scanned_file_count(lex.select_df(predicate=y_pred))
        assert lex_scan == n_lex  # trailing key: no pruning at all
        assert z_scan <= n_z // 2  # z-order: y alone prunes most files
        # the leading dimension prunes too
        x_pred = (D.x >= 0) & (D.x < 12)
        assert pi.scanned_file_count(zt.select_df(predicate=x_pred)) <= n_z // 2
        # correctness on both layouts
        assert zt.select_df(predicate=y_pred).count() == 12 * 200
        assert lex.select_df(predicate=y_pred).count() == 12 * 200
        both = zt.select_df(predicate=y_pred & (D.x >= 150))
        assert both.count() == 50 * 12


def test_zorder_rejections(clean_schema):
    from vastdb_sdk_spark.errors import InvalidArgument, NotSupportedCommand

    schema = pa.schema([("k", pa.int64()), ("name", pa.string())])
    with clean_schema.transaction() as tx:
        s = tx.bucket("bkt").schema("s")
        t = s.create_table("zr", schema)
        t.insert(pa.table({"k": pa.array([1, 2]), "name": ["a", "b"]}))
        with pytest.raises(InvalidArgument):
            t.optimize(zorder=["nope"])
        with pytest.raises(InvalidArgument):
            t.optimize(zorder=["name"])  # non-numeric
        srt = s.create_table("zs", schema, sorting_key=["k"])
        srt.insert(pa.table({"k": pa.array([1]), "name": ["a"]}))
        with pytest.raises(NotSupportedCommand):
            srt.optimize(zorder=["k"])


def test_manifest_file_pruning_after_optimize(clean_schema):
    """After optimize(), a sort-key range predicate must scan a strict
    subset of files — planning-time skipping, before Spark even sees the
    file list."""
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "e",
            pa.schema([("k", pa.int64()), ("v", pa.int64())]),
            sorting_key=["k"],
        )
        import random

        rng = random.Random(42)
        vals = list(range(40000))
        rng.shuffle(vals)
        t.insert(pa.table({"k": pa.array(vals, pa.int64()), "v": pa.array(vals, pa.int64())}))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("e")
        t.optimize(target_file_rows=5000)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("e")
        total_files = len(t.entry.files)
        assert total_files >= 4
        df_all = t.select_df()
        df_pruned = t.select_df(predicate=(D.k >= 100) & (D.k < 200))
        assert pi.scanned_file_count(df_pruned) < pi.scanned_file_count(df_all)
        assert pi.scanned_file_count(df_pruned) <= 2
        # correctness unchanged
        got = df_pruned.count()
        assert got == 100
        # point lookup touches one file
        df_point = t.select_df(predicate=(D.k == 12345))
        assert pi.scanned_file_count(df_point) == 1
        assert df_point.count() == 1


def test_interval_extraction_datetime_and_prefix():
    import datetime as dt

    ivs = extract_intervals(D.ts >= dt.datetime(1997, 1, 1), "ts")
    assert ivs[0].overlaps("1997-06-01 00:00:00", "1997-06-02 00:00:00")
    assert not ivs[0].overlaps("1996-01-01 00:00:00", "1996-02-01 00:00:00")
    pfx = extract_intervals(D.s.startswith("abc"), "s")
    assert pfx[0].overlaps("abcdef", "abq")
    assert not pfx[0].overlaps("abb", "abb")
    assert not pfx[0].overlaps("abd", "abz")


def test_temporal_literal_on_string_column_never_false_prunes(clean_schema):
    """A datetime literal against a STRING sort column makes Spark cast the
    COLUMN to timestamp, so a 'T'-separated stored string matches the
    predicate — but the min/max stats probe compares the normalized
    space-separated ISO string lexically ('T' > ' '), which used to
    false-prune the file holding the matching rows. The type-aware gate
    must keep every file; the matching timestamp-typed pairing must still
    prune."""
    import datetime as dt

    from vastdb_sdk_spark.plans.pruning import (
        _temporal_stats_hazard,
        prune_files,
        prune_files_by_partition,
    )

    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "ts_str", pa.schema([("ts", pa.string()), ("v", pa.int64())]),
            sorting_key=["ts"],
        )
        rows = [
            f"2024-01-{d:02d}T{h:02d}:00:00" for d in range(1, 11) for h in range(24)
        ]
        t.insert(pa.table({"ts": pa.array(rows), "v": pa.array(range(len(rows)), pa.int64())}))
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("ts_str").optimize(target_file_rows=60)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("ts_str")
        pred = D.ts >= dt.datetime(2024, 1, 9)
        # semantics first: Spark casts the string column, rows DO match
        n = t.select_df(predicate=pred).count()
        assert n == 48
        # the gate: no file with matching rows may be dropped
        pruned = t._pruned_files(pred)
        assert pruned is None or len(pruned) == len(t.entry.files)

    # unit level: string/unknown column type -> keep-all; timestamp -> prune
    class FE:
        def __init__(self, lo, hi):
            self.col_stats = {"ts": [lo, hi]}
            self.partition = {"ts": lo}

    files = [FE("2024-01-01T00:00:00", "2024-01-05T23:00:00")]
    pred = D.ts >= dt.datetime(2024, 1, 9)
    assert prune_files(files, "ts", pred, col_type=pa.string()) == files
    assert prune_files(files, "ts", pred, col_type=None) == files
    assert prune_files_by_partition(files, pred, col_types={"ts": pa.string()}) == files
    # matching granularity still prunes: timestamp column stats are stored
    # space-separated, and a non-overlapping file is dropped
    ok = [FE("2024-01-01 00:00:00", "2024-01-05 23:00:00")]
    assert prune_files(ok, "ts", pred, col_type=pa.timestamp("us")) == []
    keep = [FE("2024-01-08 00:00:00", "2024-01-12 00:00:00")]
    assert prune_files(keep, "ts", pred, col_type=pa.timestamp("us")) == keep
    # the walker must not recurse into synthesized ColumnRef children
    # (Expr.__getattr__ fabricates .inner on a ColumnRef)
    assert prune_files(keep, "ts", D.ts.startswith("2024"), col_type=pa.string()) == keep
    # date literal on a timestamp column is a granularity MISMATCH
    # (midnight stat '.. 00:00:00' sorts above the bare date probe)
    assert _temporal_stats_hazard(
        D.ts == dt.date(2024, 1, 1), "ts", pa.timestamp("us")
    )
    assert not _temporal_stats_hazard(
        D.ts == dt.date(2024, 1, 1), "ts", pa.date32()
    )


def test_string_sortkey_prefix_pruning(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "st", pa.schema([("name", pa.string()), ("v", pa.int64())]),
            sorting_key=["name"],
        )
        names = [f"{c}{i:03d}" for c in "abcdefgh" for i in range(500)]
        import random

        random.Random(3).shuffle(names)
        t.insert(pa.table({"name": pa.array(names), "v": pa.array(range(len(names)), pa.int64())}))
    with clean_schema.transaction() as tx:
        tx.bucket("bkt").schema("s").table("st").optimize(target_file_rows=1000)
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("st")
        total = len(t.entry.files)
        pruned = t._pruned_files(D.name.startswith("c"))
        assert pruned is not None and len(pruned) < total
        assert t.select_df(predicate=D.name.startswith("c")).count() == 500


def test_partition_pruning(clean_schema):
    """Files imported with constant partition values are pruned at the
    manifest level when the predicate excludes their partition."""
    import pyarrow.parquet as pq

    base = pq.ParquetFile(f"/root/testdata/sf0.001/region.parquet").schema_arrow
    schema = base.append(pa.field("batch", pa.string()))
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table("r", schema)
        t.import_partitioned_files(
            {"/root/testdata/sf0.001/region.parquet": {"batch": "b1"}}
        )
        t.import_partitioned_files(
            {"/root/testdata/sf0.001/region.parquet": {"batch": "b2"}}
        )
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").table("r")
        all_df = t.select_df()
        one = t.select_df(predicate=(D.batch == "b1"))
        # NB: both partitions reference the SAME physical file, so count
        # distinct scan tasks via the pruned manifest, not inputFiles()
        assert len(t._pruned_files(D.batch == "b1")) == 1
        assert t._pruned_files(D.batch == "b3") == []
        assert one.count() == 5 and all_df.count() == 10


def test_pruning_conservative_without_stats(clean_schema):
    with clean_schema.transaction() as tx:
        t = tx.bucket("bkt").schema("s").create_table(
            "t", pa.schema([("k", pa.int64())])
        )
        t.insert(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
        # no sorting key -> no stats -> no pruning, still correct
        assert t.select_df(predicate=(D.k == 2)).count() == 1


def test_round5_operator_plan_shapes(spark):
    """Plan-quality gates for the round-5 operators: scrubbing is a pure
    map (zero exchanges), contamination and the salted/resample joins
    broadcast their small side, and nothing falls back to sort-merge."""
    import __spark_entry__ as entry

    qs = entry.queries()
    scrub = qs["tx_pii_scrub"](spark, SF)
    assert pi.exchange_count(scrub) == 0
    assert "Python" not in pi.formatted_plan(scrub)

    cont = qs["dd_contamination"](spark, SF)
    assert pi.broadcast_join_count(cont) >= 1
    assert pi.sortmerge_join_count(cont) == 0

    resample = qs["ds_resample_mix"](spark, SF)
    assert pi.broadcast_join_count(resample) >= 1
    assert pi.sortmerge_join_count(resample) == 0

    sj = qs["skew_salted_join"](spark, SF)
    assert pi.broadcast_join_count(sj) >= 1
    assert pi.sortmerge_join_count(sj) == 0

    frames = qs["mm_frame_sample"](spark, SF)
    assert pi.exchange_count(frames) == 0
    assert "Python" not in pi.formatted_plan(frames)


def test_round6_operator_plan_shapes(spark):
    """Plan-quality gates for the round-6 operators: repetition stats and
    chunking are pure maps (zero exchanges, no Python); the quantizer's
    scale aggregate comes back via broadcast (no sort-merge); the quality
    filter is exactly one window shuffle; the IVF probe assignment is one
    Arrow-batched Python stage with O(1) plan size."""
    import __spark_entry__ as entry

    qs = entry.queries()
    rep = qs["tx_repetition"](spark, SF)
    assert pi.exchange_count(rep) == 0
    assert "Python" not in pi.formatted_plan(rep)

    chunk = qs["tx_chunk_windows"](spark, SF)
    assert pi.exchange_count(chunk) == 0
    assert "Python" not in pi.formatted_plan(chunk)

    quant = qs["ann_quantize_int8"](spark, SF)
    # the 1-row scale aggregate joins back as BroadcastNestedLoopJoin
    # (BuildRight, one broadcast row) — broadcast, but not a hash join
    qplan = pi.formatted_plan(quant)
    assert "BroadcastExchange" in qplan
    assert pi.sortmerge_join_count(quant) == 0

    qf = qs["ds_quality_filter"](spark, SF)
    assert pi.exchange_count(qf) <= 2  # window + the doc_id/source join

    import numpy as np

    from vastdb_sdk_spark.operators.similarity import assign_probe_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probed = assign_probe_centroids(
        emb, np.zeros((512, 64)) + np.eye(512, 64), "embedding", nprobe=2
    )
    plan = pi.formatted_plan(probed)
    assert "MapInPandas" in plan
    assert len(plan) < 20_000  # plan size independent of num_centroids


def test_pq_plan_size_independent_of_codebook(spark):
    """PQ encode + ADC ride broadcast variables through mapInPandas, so
    the plan stays O(1) no matter how many codes/subspaces the index has
    (the same invariant assign_probe_centroids pins for IVF)."""
    import numpy as np

    from vastdb_sdk_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    enc = emb.withColumn(
        "pq_codes", F.array(*[F.lit(0) for _ in range(16)])
    )
    books = np.zeros((16, 4096, 4))
    scored = pq_topk(enc, books, [0.0] * 64, k=5, rerank=None)
    plan = pi.formatted_plan(scored)
    assert "MapInPandas" in plan
    assert len(plan) < 20_000  # independent of num_codes


def test_wordcount_shaped_ops_plan_shapes(spark):
    """Passage-dup stats and unigram-LM scoring must stay word-count
    shaped: bounded exchanges on hashed/id keys, no Python stage, no
    cartesian product (the unigram normalizer crossJoin is a 1-row
    BROADCAST nested loop — constant cost at any corpus size)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    pd_df = qs["dd_passage_dups"](spark, SF)
    pd_plan = pi.formatted_plan(pd_df)
    assert pi.exchange_count(pd_df) <= 4
    assert "Python" not in pd_plan
    assert "CartesianProduct" not in pd_plan

    lm_df = qs["tx_unigram_logprob"](spark, SF)
    lm_plan = pi.formatted_plan(lm_df)
    assert pi.exchange_count(lm_df) <= 5
    assert "Python" not in lm_plan
    assert "CartesianProduct" not in lm_plan


def test_round7_filter_plan_shapes(spark):
    """Gopher/C4 heuristic filters are pure map-side gates: zero
    exchanges, no Python stage — at 100 TB they run AT the scan before
    any shuffle-bearing operator."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("tx_gopher_flags", "tx_c4_filter"):
        df = qs[name](spark, SF)
        assert pi.exchange_count(df) == 0, name
        assert "Python" not in pi.formatted_plan(df), name

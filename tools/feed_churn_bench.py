#!/usr/bin/env python
"""Measure the change feed's churn-span claim (SCALING.md): with a FIXED
churn, read_changes cost must stay ~flat as the table grows (it reads only
the changed-file span), while a full-table scan grows linearly. At small
absolute sizes the feed's fixed costs (two-sided read of changed files,
content hash, one join) exceed a trivially-fast full scan — the claim is
the SLOPE, not the intercept, so this harness measures both at 1x / 10x /
100x of the sf0.1 orders table (150k / 1.5M / 15M rows) with the same
15k-row churn and the same 50k-row file size.

Protocol per size: build a sorted multi-file engine table, commit, UPDATE a
fixed contiguous 15k-key range (prunes to ~2 files + replacements), then
median-of-N on a warm session:
  - feed:  read_changes(v1) -> count + sum aggregation
  - full:  select_df()      -> same aggregation
Writes one JSON line for FEED_CHURN_r{N}.json with per-size timings and the
growth ratios.

Usage: python tools/feed_churn_bench.py [--runs 5] [--out FEED_CHURN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHURN_ROWS = 15_000


def measure(session, spark, name, src_df, runs, file_rows):
    from pyspark.sql import functions as F

    from vastdb_sdk_spark import _ as D

    with session.transaction() as tx:
        sc = tx.bucket("b").schema("s")
        import pyarrow as pa

        arrow = pa.Schema.from_pandas(src_df.limit(1).toPandas())
        t = sc.create_table(name, arrow, sorting_key=["o_orderkey"])
        t.insert_df(src_df)
    with session.transaction() as tx:
        t = tx.bucket("b").schema("s").table(name)
        t.optimize(target_file_rows=file_rows)
    with session.transaction() as tx:
        b = tx.bucket("b")
        v1 = b.manifest.version
        t = b.schema("s").table(name)
        total_files = len(t.entry.files)
        n_rows = t.count_rows()
        t.update_where(
            D.o_orderkey.between(1, CHURN_ROWS), {"o_totalprice": -1.0}
        )

    def _agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
        ).collect()[0]

    feed_times, full_times = [], []
    with session.transaction() as tx:
        b = tx.bucket("b")
        t = b.schema("s").table(name)
        old = {
            (f.path, f.dv_rows, tuple(f.dv_paths))
            for f in b.as_of(version=v1).schema("s").table(name).entry.files
        }
        new = {(f.path, f.dv_rows, tuple(f.dv_paths)) for f in t.entry.files}
        changed_files = len({p for p, *_ in old ^ new})
        for i in range(runs + 1):
            t0 = time.time()
            fr = _agg(t.read_changes(v1))
            if i:
                feed_times.append(time.time() - t0)
            t0 = time.time()
            _agg(t.select_df())
            if i:
                full_times.append(time.time() - t0)
    # materialized-view maintenance under the SAME fixed churn: an
    # additive (count/sum) view refreshes per churn cycle — the delta
    # merge reads only the feed span + affected state buckets, so the
    # refresh median must stay ~flat as the base grows
    with session.transaction() as tx:
        tx.bucket("b").schema("s").table(name).create_materialized_view(
            "mv", ["o_orderstatus"],
            {"n": "count", "total": ("sum", "o_totalprice")},
            num_buckets=8,
        )
    mv_times = []
    for i in range(runs + 1):
        with session.transaction() as tx:
            t = tx.bucket("b").schema("s").table(name)
            t.update_where(
                D.o_orderkey.between(1, CHURN_ROWS),
                {"o_totalprice": float(-(i + 2))},
            )
        with session.transaction() as tx:
            t = tx.bucket("b").schema("s").table(name)
            t0 = time.time()
            res = t.materialized_view("mv").refresh(mode="incremental")
            if i:
                mv_times.append(time.time() - t0)
        assert res["mode"] == "incremental" and not res["base_scanned"]
    return {
        "table_rows": int(n_rows),
        "total_files": int(total_files),
        "changed_files_both_versions": int(changed_files),
        "feed_rows": int(fr.n),
        "feed_sec_median": round(statistics.median(feed_times), 4),
        "full_scan_sec_median": round(statistics.median(full_times), 4),
        "mv_refresh_sec_median": round(statistics.median(mv_times), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1/orders.parquet")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--file-rows", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.session import build_spark

    spark = build_spark(app_name="feed_churn_bench")
    wh = tempfile.mkdtemp(prefix="feedchurn_")
    session = vastdb.connect(wh, spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        tx.bucket("b").create_schema("s")

    base = spark.read.parquet(args.base)
    n_base = base.count()

    def scaled(mult):
        # offset-keyed copies, same scheme as tools/gen_scale_replica.py:
        # key cardinality grows linearly, dup structure per copy constant
        parts = [
            base.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * 10 * n_base)
            )
            for k in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    sizes = []
    for mult in (1, 10, 100):
        sizes.append(
            measure(
                session, spark, f"orders_x{mult}", scaled(mult),
                args.runs, args.file_rows,
            )
        )

    def ratio(key, i, j):
        return round(sizes[j][key] / max(sizes[i][key], 1e-9), 2)

    out = {
        "churn_rows": CHURN_ROWS,
        "sizes": sizes,
        "feed_growth_1x_to_100x": ratio("feed_sec_median", 0, 2),
        "full_growth_1x_to_100x": ratio("full_scan_sec_median", 0, 2),
        "feed_over_full_at_100x": round(
            sizes[2]["feed_sec_median"] / sizes[2]["full_scan_sec_median"], 3
        ),
        "mv_refresh_growth_1x_to_100x": ratio("mv_refresh_sec_median", 0, 2),
        "runs": args.runs,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Decade measurement for the Bloom index BUILD path (the r10 verdict's
scale-design fix): import orders at two scale dirs as fixed-size file
chunks (so 10x data = ~10x files, the shape a real decade step has),
then time ``build_column_index('o_orderkey')`` — the task-side sidecar
write — as median of N fresh builds. Also reports sidecar bytes on disk
so the capped-bitmap claim is checkable.

Usage: python tools/bloom_build_decade.py [--a ...] [--b ...] [--runs 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

import vastdb_sdk_spark as vastdb  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402

ROWS_PER_FILE = 18_750  # sf0.1 orders (150k) -> 8 files; sf1 -> ~80


def measure(spark, sf_dir: str, runs: int) -> dict:
    wh = tempfile.mkdtemp(prefix="bloom_decade_")
    try:
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        tbl = pq.read_table(f"{sf_dir}/orders.parquet")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table("orders", tbl.schema)
            for i in range(0, tbl.num_rows, ROWS_PER_FILE):
                t.insert(tbl.slice(i, ROWS_PER_FILE))
        times = []
        n_files = sidecar_bytes = 0
        for _ in range(runs):
            with session.transaction() as tx:
                t = tx.bucket("b").schema("s").table("orders")
                t0 = time.time()
                r = t.build_column_index("o_orderkey")
                times.append(time.time() - t0)
                n_files = r["indexed_files"]
                side = t.entry.properties["column_indexes"][
                    t._physical_of("o_orderkey")
                ]["sidecars"]
                sidecar_bytes = sum(
                    os.path.getsize(p)
                    for d in side
                    for p in glob.glob(os.path.join(d, "*.parquet"))
                )
        return {
            "rows": tbl.num_rows,
            "files": n_files,
            "build_sec": round(statistics.median(times), 3),
            "sidecar_bytes": sidecar_bytes,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="/root/testdata/sf0.1")
    ap.add_argument("--b", default="/root/repo/.scale/sf1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    spark = build_spark(app_name="bloom_build_decade")
    a = measure(spark, args.a, args.runs)
    b = measure(spark, args.b, args.runs)
    out = {
        "a": {"dir": args.a, **a},
        "b": {"dir": args.b, **b},
        "ratio": round(b["build_sec"] / a["build_sec"], 2),
        "data_ratio": round(b["rows"] / a["rows"], 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

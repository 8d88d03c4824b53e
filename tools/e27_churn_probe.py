#!/usr/bin/env python
"""Fixed-churn scaling probe for the incremental matview fold (the e27 /
e18 cost claim: refresh cost tracks CHURN, not base-table size).

Protocol: for each base documents table (sf0.1 = 5k docs, .scale/sf1 =
50k docs — a 10x size step), split the table into 16 row-range parquet
shards (file-granular change pruning needs file granularity — a
single-file table makes every churn touch "all files" by construction,
which is a fixture artifact, not an engine property), import, build the
by_lang matview, then run N epochs of IDENTICAL churn (update_where on
doc_id < 200 — the same 200 rows at both sizes, confined to shard 0)
and time ONLY the incremental refresh (mode="incremental": raises
rather than silently rebuilding). Canaries quoted per point against the
pinned sf0.1 baseline (this box drifts ~3x intra-day).

If the fold cost is flat across the 10x base step, the cost-tracks-churn
claim is measured, not asserted.

Usage: python tools/e27_churn_probe.py [--epochs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

import vastdb_sdk_spark as vastdb  # noqa: E402
from bench import canary_drift, measure_canaries  # noqa: E402
from vastdb_sdk_spark import _ as D  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402
from vastdb_sdk_spark.sources import create_table_from_files  # noqa: E402

CHURN_ROWS = 200


def split_shards(src: str, out_dir: str, n: int = 16) -> list[str]:
    """Row-range shards (shard 0 holds the lowest doc_ids, so the fixed
    churn set doc_id < 200 touches exactly one file)."""
    t = pq.read_table(src)
    t = t.sort_by("doc_id")
    paths = []
    step = -(-t.num_rows // n)
    for i in range(n):
        part = t.slice(i * step, step)
        if part.num_rows == 0:
            break
        p = os.path.join(out_dir, f"docs-{i:03d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def probe(spark, base_dir: str, epochs: int) -> dict:
    canary = measure_canaries(spark, "/root/testdata/sf0.1", 3)
    drift = canary_drift(canary)
    shard_dir = tempfile.mkdtemp(prefix="e27probe_shards_")
    shards = split_shards(f"{base_dir}/documents.parquet", shard_dir)
    wh = tempfile.mkdtemp(prefix="e27probe_wh_")
    session = vastdb.connect(wh, spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "docs", shards)
    with session.transaction() as tx:
        tx.bucket("b").schema("s").table("docs").create_materialized_view(
            "by_lang",
            ["lang"],
            {"n": "count", "chars": ("sum", "n_chars")},
            num_buckets=8,
        )
    n_rows = pq.read_metadata(f"{base_dir}/documents.parquet").num_rows
    walls = []
    for epoch in range(epochs):
        with session.transaction() as tx:
            t = tx.bucket("b").schema("s").table("docs")
            t.update_where(D.doc_id < CHURN_ROWS, {"n_chars": -(epoch + 2)})
        with session.transaction() as tx:
            mv = tx.bucket("b").schema("s").table("docs").materialized_view(
                "by_lang"
            )
            t0 = time.time()
            summary = mv.refresh(mode="incremental")
            walls.append(time.time() - t0)
    med = statistics.median(walls[1:])  # epoch 0 pays first-touch caches
    return {
        "base_dir": base_dir,
        "base_rows": int(n_rows),
        "n_shards": len(shards),
        "churn_rows": CHURN_ROWS,
        "refresh_walls": [round(x, 3) for x in walls],
        "warm_median": round(med, 3),
        "drift": drift,
        "normalized": round(med / drift, 3),
        "last_summary": summary,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()
    spark = build_spark(app_name="e27_churn_probe")
    out = {}
    for label, base in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/root/repo/.scale/sf1"),
    ):
        out[label] = probe(spark, base, args.epochs)
        print(f"POINT {label}: " + json.dumps(out[label]))
    ratio = out["sf1"]["normalized"] / max(out["sf0.1"]["normalized"], 1e-9)
    print(
        "RESULT "
        + json.dumps(
            {
                "size_step": round(
                    out["sf1"]["base_rows"] / out["sf0.1"]["base_rows"], 1
                ),
                "churn_fixed_at": CHURN_ROWS,
                "normalized_ratio": round(ratio, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

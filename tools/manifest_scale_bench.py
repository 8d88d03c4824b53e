#!/usr/bin/env python
"""Manifest-at-scale micro-benchmark (SCALING.md): synthesize a TableEntry
with N files (default 200k — 100 TB at 512 MB files), then measure the
latency of every catalog operation whose cost is O(files):

- serialize: Manifest.to_json + json.dumps (the write half of a commit)
- parse: json.loads + Manifest.from_json (every transaction's bind step)
- prune: plans/pruning.prune_files over a point predicate on the sort key
- entry_clone: TableEntry.from_json(to_json()) (the DML tier's
  pre-mutation clone of one table's entry)
- commit: full ManifestStore.commit of a small ChangeSet against a bucket
  whose manifest already carries the N-file table (load + copy + apply +
  O_EXCL write + CAS pointer swap)
- reload: ManifestStore.load of the committed version

Prints one JSON line. SCALING.md claims the JSON manifest holds to ~200k
files before segmented encoding is needed; this measures that headroom.

Usage: python tools/manifest_scale_bench.py [--files 200000]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

from vastdb_sdk_spark.catalog.manifest import (  # noqa: E402
    ChangeSet,
    FileEntry,
    Manifest,
    ManifestStore,
    TableEntry,
)
from vastdb_sdk_spark.plans.pruning import prune_files  # noqa: E402


def synth_entry(n_files: int, rows_per_file: int = 4_000_000) -> TableEntry:
    schema = pa.schema([("ts", pa.int64()), ("v", pa.float64())])
    b64 = base64.b64encode(schema.serialize().to_pybytes()).decode()
    files = []
    for i in range(n_files):
        lo = i * rows_per_file
        files.append(
            FileEntry(
                path=f"data/part-{i:08d}.parquet",
                rows=rows_per_file,
                row_id_base=lo,
                sorted_by=["ts"],
                col_stats={"ts": [lo, lo + rows_per_file - 1]},
            )
        )
    return TableEntry(
        name="big",
        schema_name="s",
        arrow_schema_b64=b64,
        files=files,
        next_row_id=n_files * rows_per_file,
        sorting_key=["ts"],
        sorting_done=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=200_000)
    args = ap.parse_args()
    n = args.files
    entry = synth_entry(n)
    m = Manifest(version=1)
    m.schemas["s"] = {"properties": {}}
    m.tables[("s", "big")] = entry

    out: dict = {"files": n}

    t0 = time.time()
    js = json.dumps(m.to_json())
    out["serialize_sec"] = round(time.time() - t0, 3)
    out["manifest_mb"] = round(len(js) / 1e6, 1)

    t0 = time.time()
    m2 = Manifest(version=1, data=json.loads(js))
    out["parse_sec"] = round(time.time() - t0, 3)
    assert len(m2.tables[("s", "big")].files) == n

    # point-predicate prune on the sort key via the deferred-expr namespace
    from vastdb_sdk_spark import _ as D

    t0 = time.time()
    hit = prune_files(entry.files, "ts", D.ts == 4_000_000 * (n // 2) + 17)
    out["prune_sec"] = round(time.time() - t0, 3)
    out["prune_hits"] = len(hit)

    t0 = time.time()
    TableEntry.from_json(entry.to_json())
    out["entry_clone_sec"] = round(time.time() - t0, 3)

    with tempfile.TemporaryDirectory() as d:
        store = ManifestStore(d)
        store.init_bucket()
        base = store.load()
        cs = ChangeSet()
        cs.record("create_schema", "s", touched=[("schema", "s")])
        cs.record(
            "create_table", entry.to_json(), touched=[("table", "s", "big")]
        )
        t0 = time.time()
        committed = store.commit(base, cs)
        out["commit_big_table_sec"] = round(time.time() - t0, 3)

        # the common case: a SMALL commit (one schema) against a bucket that
        # already holds the 200k-file table — pays load+copy+rewrite of the
        # whole manifest
        base2 = store.load(committed.version)
        cs2 = ChangeSet()
        cs2.record("create_schema", "s2", touched=[("schema", "s2")])
        t0 = time.time()
        store.commit(base2, cs2)
        out["commit_small_change_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        store.load()
        out["reload_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

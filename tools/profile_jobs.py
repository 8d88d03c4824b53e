#!/usr/bin/env python
"""Profile a query's Spark-job count and wall time: how many jobs does one
bench iteration launch (build + noop save), and how long does each take?

Engine lifecycle gates (e4, e9, e25, ...) spend their wall in MANY SMALL
JOBS (import, rowid collects, DV writes, manifest commits), not in any one
plan — so the job count per iteration is the first-order cost model, and
the per-job timeline says which phase to attack.

Usage: python tools/profile_jobs.py <query> [sf_dir] [--jobs]
  --jobs  print per-job descriptions + durations (from AppStatusStore)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402


def job_ids(spark) -> list[int]:
    return sorted(spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    show_jobs = "--jobs" in sys.argv
    spark = build_spark(app_name="profile_jobs")
    fn = entry_mod.queries()[name]
    # warm up: one full cold iteration (codegen compile, warehouse build)
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    cold = time.time() - t0

    before = job_ids(spark)
    t0 = time.time()
    df = fn(spark, sf_dir)
    t_build = time.time() - t0
    mid = job_ids(spark)
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    t_save = time.time() - t0
    after = job_ids(spark)

    build_jobs = len(set(mid) - set(before))
    save_jobs = len(set(after) - set(mid))
    print(
        f"{name}: cold={cold:.3f}s warm: build={t_build:.3f}s"
        f" ({build_jobs} jobs) + save={t_save:.3f}s ({save_jobs} jobs)"
        f" = {t_build + t_save:.3f}s, {build_jobs + save_jobs} jobs total"
    )
    if show_jobs:
        st = spark.sparkContext.statusTracker()
        new = sorted(set(after) - set(before))
        for jid in new:
            info = st.getJobInfo(jid)
            if info is None:
                continue
            print(f"  job {jid}: status={info.status} stages={list(info.stageIds)}")
    spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())

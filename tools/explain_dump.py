#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

The optimization rounds commit before/after plan evidence; this captures it
without executing the query (planning only — AQE initial plan).

Usage: python tools/explain_dump.py <tag> <suffix> <query> [query ...]
e.g.   python tools/explain_dump.py r14 before dd_tfidf_pairs tx_kn_logprob
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from vastdb_sdk_spark.session import build_spark  # noqa: E402


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_spark(app_name="explain_dump")
    queries = entry_mod.queries()
    import contextlib
    import io

    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

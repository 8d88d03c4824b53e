#!/usr/bin/env python
"""Cross-round bench comparison that reads NORMALIZED values only.

This box drifts up to ~3x intra-day (adjudicated in VERDICT r12: every
suspected 3-4x regression of the round was machine weather), so raw
cross-round deltas are noise. This tool compares two BENCH_COLD.json
artifacts in baseline-machine seconds:

- new-format artifacts (r13+) carry ``all_queries_normalized`` produced
  from canary checkpoints interleaved through the run — used verbatim;
- old-format artifacts are normalized post-hoc by their single start-of-
  run canary block (the best available correction; one factor for the
  whole session).

Usage: python tools/bench_compare.py OLD.json NEW.json [move_threshold]
Exit 0 always (reporting tool, not a gate); one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import canary_drift  # noqa: E402


def normalized_queries(
    artifact: dict, mode: str = "checkpoints"
) -> tuple[dict[str, float], str]:
    """(name -> baseline-machine seconds, how) for one artifact.

    mode="checkpoints" uses the per-query position-matched normalization
    when present. mode="start" divides raw values by the START-of-run
    canary drift only — required when the OTHER side of a comparison is
    an old-format artifact: checkpoint drifts embed the session's JVM
    warm-up profile (canaries JIT ~40% faster by mid-run, measured
    r13), which cancels only when BOTH sides are position-normalized.
    Mixing the two schemes manufactures ~1.5x phantom movers."""
    raw = artifact.get("all_queries", {})
    if mode == "checkpoints" and "all_queries_normalized" in artifact:
        return dict(artifact["all_queries_normalized"]), "checkpoints"
    drift = canary_drift(artifact.get("canary", {}))
    return {k: v / drift for k, v in raw.items()}, f"start-canary/{drift}"


#: a flanking checkpoint is "quiet" when its drift is at or below this —
#: the r13 spike signature read 2-2.5x per-query while both flanks
#: measured 0.79-0.88
QUIET_DRIFT = 1.2


def suspect_spikes(
    new: dict, slow_movers: dict[str, dict], quiet: float = QUIET_DRIFT
) -> dict[str, dict]:
    """Queries whose cross-round slowdown is UNEXPLAINED by the canaries:
    the per-query ratio crossed the mover threshold while BOTH flanking
    checkpoints of the new run measured quiet drift. That is the exact
    signature of a machine spike shorter than the 25-query checkpoint
    cadence (dd_lsh_pairs_fast / tpch_q22, r13) — but it is also what a
    real regression looks like, so the output is a bench_one worklist,
    not a verdict."""
    cps = sorted(
        (c for c in new.get("canary_checkpoints", []) if "at_sec" in c),
        key=lambda c: c["at_sec"],
    )
    detail = new.get("queries_detail", {})
    out = {}
    for q, mv in slow_movers.items():
        at = detail.get(q, {}).get("at_sec")
        if at is None or len(cps) < 2:
            continue
        before = [c for c in cps if c["at_sec"] <= at]
        after = [c for c in cps if c["at_sec"] >= at]
        if not before or not after:
            continue
        d_before = before[-1]["drift"]
        d_after = after[0]["drift"]
        if max(d_before, d_after) <= quiet:
            out[q] = {
                **mv,
                "at_sec": at,
                "flank_drifts": [round(d_before, 4), round(d_after, 4)],
                "hint": "suspect sub-cadence spike — bench_one this",
            }
    return out


def compare(old: dict, new: dict, threshold: float = 1.5) -> dict:
    both_new = (
        "all_queries_normalized" in old and "all_queries_normalized" in new
    )
    mode = "checkpoints" if both_new else "start"
    qo, how_o = normalized_queries(old, mode)
    qn, how_n = normalized_queries(new, mode)
    common = sorted(set(qo) & set(qn))
    ratios = {
        q: round(qn[q] / qo[q], 3) for q in common if qo[q] > 0 and qn[q] > 0
    }
    movers = {
        q: {"old": round(qo[q], 3), "new": round(qn[q], 3), "ratio": r}
        for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r >= threshold or r <= 1 / threshold
    }
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    slow = {q: m for q, m in movers.items() if m["ratio"] >= threshold}
    return {
        "common_queries": len(common),
        "normalization": {"old": how_o, "new": how_n},
        "total_ratio": round(tot_n / tot_o, 3) if tot_o else None,
        "median_ratio": (
            round(statistics.median(ratios.values()), 3) if ratios else None
        ),
        "movers": movers,
        "suspect_spikes": suspect_spikes(new, slow),
    }


def main() -> int:
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    print(json.dumps(compare(old, new, threshold)))
    return 0


if __name__ == "__main__":
    sys.exit(main())

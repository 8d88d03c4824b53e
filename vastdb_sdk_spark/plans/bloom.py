"""Per-file Bloom-filter column indexes for planning-time file skipping.

Engine extension: min/max stats (plans/pruning.py) skip files for SORTED
or clustered columns, but a point lookup on an unsorted high-cardinality
column (order id, user id, content hash) intersects every file's [min,
max] and prunes nothing. A per-file Bloom filter answers "is value v
POSSIBLY in this file?" — at 100 TB / ~100k files, a miss-free membership
test turns a 100k-task scan into a handful of tasks. Reference precedent
for auxiliary per-object indexing: the reference's semi-sorted projections
(vastdb/table.py:1040-1138) and Elysium sorted scans (865-887); the Bloom
variant covers the unsorted-column case both leave open.

Correctness is UNCONDITIONAL, not staleness-gated: the sidecar is keyed
by data-file path, a Bloom has no false negatives, deletes only shrink a
file's value set, and any rewrite/insert produces a NEW path that is
simply absent from the sidecar and therefore never pruned. Refresh is
incremental by construction — it builds bitmaps only for paths not yet
indexed and drops entries for dead paths.

Hashing is pure-Python md5 double-hashing (h1 + i*h2 mod m), so build
(inside an Arrow-batched applyInPandas over per-file distinct values) and
probe (driver-side, planning time) share one implementation and no Spark
expression round-trip."""

from __future__ import annotations

import base64
import decimal
import hashlib
import json
import math
import os
from typing import Any, Iterable

from .pruning import _NEG_INF, _POS_INF, _nonempty, extract_intervals

_MIN_BITS = 64
_EXACT_INT = 2**53  # doubles are integer-exact up to here


def _canon(value: Any) -> Any:
    """Canonical form shared by build AND probe, so every pair of values
    Spark's equality would MATCH (numeric type promotion: 5 == 5.0 ==
    Decimal('5') == '5' == True&1) formats to one string before hashing.
    Without this, a float literal on an int-indexed column (col == 5.0)
    hashes '5.0' while the build hashed '5' — a FALSE NEGATIVE that
    silently prunes files containing matching rows, violating the
    module's unconditional-correctness contract. Collisions this
    normalization introduces between values Spark would NOT match (e.g.
    strings '007' and '7') are safe: Bloom collisions only ever create
    false positives (kept files), never lost rows.

    Integers above 2^53 canonicalize through float: Spark compares
    bigint-vs-double LOSSILY in double (9007199254740993 == 2^53.0
    matches there), so exact-int hashing would produce a false negative
    for exactly that cross-type pair; collapsing the >2^53 range to its
    double image only merges values (more false positives, still
    sound), and bigint-vs-bigint probes canonicalize identically on
    both sides so exact equality keeps working."""
    def _num(f: float):
        # one normal form for every numeric's double image (a >2^53
        # int's image can itself be <= 2^53 — e.g. float(2^53+1) ==
        # 2^53.0 — so the image goes through the SAME rule)
        return int(f) if f.is_integer() and abs(f) <= _EXACT_INT else f

    if isinstance(value, bool):
        return int(value)
    if isinstance(value, int):
        return value if abs(value) <= _EXACT_INT else _num(float(value))
    if isinstance(value, float):
        return _num(value)
    if isinstance(value, decimal.Decimal):
        return _num(float(value))  # Spark compares decimal-vs-double in double
    if isinstance(value, str):
        try:
            f = float(value)
        except ValueError:
            return value
        return _num(f) if math.isfinite(f) else value
    return value


def _hash_pair(value: Any, seed: int) -> tuple[int, int]:
    d = hashlib.md5(f"{seed}:{_canon(value)}".encode()).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big") | 1


def sizing(n_values: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_values`` at target false-positive rate."""
    n = max(1, n_values)
    m = max(_MIN_BITS, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bitmap(values: Iterable[Any], fpp: float, seed: int) -> dict:
    """Bloom bitmap over ``values`` (nulls excluded by the caller);
    returns {m, k, bits (b64)}."""
    vals = list(values)
    m, k = sizing(len(vals), fpp)
    bits = bytearray(m // 8)
    for v in vals:
        h1, h2 = _hash_pair(v, seed)
        for i in range(k):
            p = (h1 + i * h2) % m
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "k": k, "bits": base64.b64encode(bytes(bits)).decode()}


def might_contain(entry: dict, value: Any, seed: int) -> bool:
    bits = base64.b64decode(entry["bits"])
    m, k = entry["m"], entry["k"]
    h1, h2 = _hash_pair(value, seed)
    for i in range(k):
        p = (h1 + i * h2) % m
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def extract_points(pred: Any, col: str) -> list | None:
    """The exact candidate values ``col`` can take under ``pred``, or None
    when the constraint is not a pure point set (ranges, unconstrained).
    Sound for Bloom pruning: if pred's rows all have col in the returned
    set, a file containing none of them cannot match."""
    ivs = extract_intervals(pred, col)
    if ivs is None:
        return None
    pts = []
    for iv in ivs:
        if not _nonempty(iv):
            continue  # contradictory branch constrains nothing it can match
        if iv.lo is _NEG_INF or iv.hi is _POS_INF or iv.lo != iv.hi:
            return None
        pts.append(iv.lo)
    return pts


# sidecars are written once under a unique path and never mutated, so a
# process-wide cache by path can never serve stale bits
_SIDECAR_CACHE: dict[str, dict] = {}


def load_sidecar(path: str) -> dict:
    cached = _SIDECAR_CACHE.get(path)
    if cached is None:
        with open(path) as fh:
            cached = json.load(fh)
        if len(_SIDECAR_CACHE) > 64:
            _SIDECAR_CACHE.clear()
        _SIDECAR_CACHE[path] = cached
    return cached


def prune_files_by_bloom(files: list, col: str, pred: Any, cfg: dict) -> list:
    """Drop files whose Bloom bitmap proves none of the predicate's point
    values are present. Files absent from the sidecar (inserted/rewritten
    after the index build) are always kept."""
    pts = extract_points(pred, col)
    if not pts:  # None (not a point set) or [] (contradiction -> minmax
        return files  # pruning already emptied it)
    try:
        side = load_sidecar(cfg["sidecar"])
    except (OSError, ValueError):
        return files
    seed = cfg.get("seed", 42)
    out = []
    for fe in files:
        entry = side.get(os.path.abspath(fe.path))
        if entry is None or any(might_contain(entry, p, seed) for p in pts):
            out.append(fe)
    return out

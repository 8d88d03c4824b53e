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

Correctness is UNCONDITIONAL, not staleness-gated: sidecar entries are
keyed by data-file path, a Bloom has no false negatives, deletes only
shrink a file's value set, and any rewrite/insert produces a NEW path that
is simply absent from the sidecar and therefore never pruned.

Scale design (format 2): the sidecar is a parquet DATASET (one row per
data file: path, m, k, bits), written task-side by the index build job —
the driver never holds the bitmaps. Bitmap size is CAPPED
(``max_bits``, default 2^20 bits = 128 KiB/file); past the cap the
false-positive rate degrades gracefully (never correctness). Refresh
appends a delta directory for new files instead of rewriting, and
compacts only when dead entries exist. Probing streams the dataset in
Arrow batches restricted to the candidate paths, so planning-time driver
memory is bounded by a batch, not the index; small sidecars are cached.

Versioning: configs carry ``format`` (sidecar layout) and
``hash_version`` (the value-canonicalization scheme below). A probe
against a config with a missing or unexpected version keeps all files —
an old sidecar can make pruning a no-op but can never cause a false
negative (the failure mode a silently hash-incompatible probe would
have: pruning files that DO contain matching rows).

Hashing is md5 double-hashing (h1 + i*h2 mod m) over a canonical value
form, so the task-side build (numpy-vectorized position scatter) and the
driver-side probe share one implementation with bit-identical results."""

from __future__ import annotations

import base64
import decimal
import hashlib
import math
import os
import warnings
from typing import Any, Iterable

import numpy as np

from .pruning import (
    _NEG_INF,
    _POS_INF,
    _has_temporal_literal,
    _nonempty,
    extract_intervals,
)

_MIN_BITS = 64
_MAX_BITS = 1 << 20  # default per-file cap: 128 KiB bitmap
_EXACT_INT = 2**53  # doubles are integer-exact up to here
FORMAT_VERSION = 2  # parquet sidecar dataset (v1 = monolithic JSON)
HASH_VERSION = 2  # _canon'ed md5 (v1 hashed raw reprs)
# sidecar directories at most this large (bytes on disk) are cached as a
# path->entry dict; larger ones are re-streamed per probe
_CACHE_DIR_BYTES = 32 << 20


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
    if isinstance(value, (int, np.integer)):
        value = int(value)
        return value if abs(value) <= _EXACT_INT else _num(float(value))
    if isinstance(value, (float, np.floating)):
        return _num(float(value))
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


def sizing(n_values: int, fpp: float, max_bits: int = _MAX_BITS) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_values`` at target false-positive rate.

    ``m`` is capped at ``max_bits``: an uncapped Bloom grows linearly with
    per-file distinct count (~9.6 bits/value at fpp 0.01), which at the
    module's own motivating scale (100k files, user-id-class columns)
    makes the INDEX itself a storage/planning bottleneck. Past the cap
    the achieved fpp degrades (k re-optimized for the capped m) — files
    stop being prunable long before any correctness risk."""
    n = max(1, n_values)
    cap = _cap_bits(max_bits)
    m = max(_MIN_BITS, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    if m > cap:
        # the effective cap rounds DOWN to a byte multiple (never above
        # the caller's max_bits) — rounding the capped m up overshot the
        # stated cap by up to 7 bits
        m = cap
        eff = (1 - math.exp(-max(1, round(m / n * math.log(2))) * n / m)) ** max(
            1, round(m / n * math.log(2))
        )
        warnings.warn(
            f"bloom bitmap capped at {m} bits for {n} distinct values; "
            f"effective fpp ~{eff:.3g} (target {fpp})",
            stacklevel=2,
        )
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _cap_bits(max_bits: int) -> int:
    """The cap ``sizing`` actually enforces: byte-aligned (rounded DOWN,
    so the stated limit is never exceeded), floored at _MIN_BITS."""
    return max(_MIN_BITS, (int(max_bits) // 8) * 8)


def is_capped(n_values: int, fpp: float, max_bits: int = _MAX_BITS) -> bool:
    """Whether ``sizing`` caps the bitmap for this distinct count — the
    ONE home of the uncapped-m formula (and the same ``_cap_bits``
    effective cap sizing enforces), shared by the task-side builder
    (which stamps it per sidecar row) and any caller that wants to
    report capping without re-deriving the arithmetic."""
    n = max(1, n_values)
    m = max(_MIN_BITS, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    return (m + 7) // 8 * 8 > _cap_bits(max_bits)


def bitmap_bytes(values: Iterable[Any], m: int, k: int, seed: int) -> bytes:
    """Raw Bloom bitmap over ``values`` (nulls excluded by the caller).

    md5 runs per value (C-speed digest, the irreducible cost); the k
    probe positions and the bit scatter are numpy-vectorized. Positions
    reduce h1, h2 mod m FIRST — algebraically identical to
    (h1 + i*h2) % m in exact arithmetic but free of uint64 overflow, so
    the vectorized build and the scalar probe are bit-identical."""
    h1 = []
    h2 = []
    for v in values:
        a, b = _hash_pair(v, seed)
        h1.append(a % m)
        h2.append(b % m)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if h1:
        a1 = np.asarray(h1, dtype=np.int64)[:, None]
        a2 = np.asarray(h2, dtype=np.int64)[:, None]
        pos = (a1 + np.arange(k, dtype=np.int64)[None, :] * a2) % m
        np.bitwise_or.at(
            bits, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8)
        )
    return bits.tobytes()


def build_bitmap(values: Iterable[Any], fpp: float, seed: int) -> dict:
    """Bloom bitmap over ``values`` (nulls excluded by the caller);
    returns {m, k, bits (b64)} — the in-memory/test-facing form.
    Sidecar datasets store the raw :func:`bitmap_bytes` instead."""
    vals = list(values)
    m, k = sizing(len(vals), fpp)
    raw = bitmap_bytes(vals, m, k, seed)
    return {"m": m, "k": k, "bits": base64.b64encode(raw).decode()}


def might_contain(entry: dict, value: Any, seed: int) -> bool:
    bits = entry["bits"]
    if isinstance(bits, str):
        bits = base64.b64decode(bits)
    m, k = entry["m"], entry["k"]
    h1, h2 = _hash_pair(value, seed)
    h1 %= m
    h2 %= m
    for i in range(k):
        p = (h1 + i * h2) % m
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def extract_points(pred: Any, col: str) -> list | None:
    """The exact candidate values ``col`` can take under ``pred``, or None
    when the constraint is not a pure point set (ranges, unconstrained).
    Sound for Bloom pruning: if pred's rows all have col in the returned
    set, a file containing none of them cannot match.

    Temporal literals disable pruning entirely: ``extract_intervals``
    normalizes datetime/date to ISO strings (the min/max-stats format),
    but a datetime literal against a STRING column makes Spark cast the
    COLUMN to timestamp — an equality the string-keyed hash cannot
    replicate ('2026-08-16T10:00:00' with a T separator matches the
    timestamp but not the normalized space-separated probe string), so
    any temporal literal on ``col`` anywhere in ``pred`` returns None."""
    if _has_temporal_literal(pred, col):
        return None
    try:
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
    except TypeError:  # mixed-type point comparisons: degrade, don't crash
        return None


# _has_temporal_literal moved to plans.pruning (shared with the min/max
# pruner, which gates the same false-prune hazard type-aware); re-exported
# here because extract_points' contract references it.


# ---------------------------------------------------------------------------
# sidecar dataset I/O (format 2)

# sidecar directories are written once under a unique timestamped path
# and never mutated, so a process-wide cache by dir can never serve
# stale bits; only dirs under _CACHE_DIR_BYTES are cached, the TOTAL is
# LRU-bounded by _CACHE_TOTAL_BYTES (dict insertion order = recency),
# and superseded dirs simply age out
_SIDECAR_CACHE: dict[str, tuple[dict, int]] = {}
_CACHE_TOTAL_BYTES = 256 << 20


def sidecar_dir_size(path: str) -> int:
    total = 0
    try:
        for de in os.scandir(path):
            if de.is_file():
                total += de.stat().st_size
    except OSError:
        return 0
    return total


def _parquet_dataset(path: str):
    import pyarrow.dataset as pads

    # Spark writes _SUCCESS markers alongside the parts
    return pads.dataset(path, format="parquet", exclude_invalid_files=False,
                        ignore_prefixes=[".", "_"])


def sidecar_paths(dirs: list[str]) -> set[str]:
    """All data-file paths indexed across ``dirs`` (path column only —
    manifest-sized, never the bitmaps)."""
    out: set[str] = set()
    for d in dirs:
        for batch in _parquet_dataset(d).to_batches(columns=["path"]):
            out.update(batch.column("path").to_pylist())
    return out


def _batch_rows(batch):
    """(path, entry) rows of one Arrow batch — the ONE home of the sidecar
    row shape, shared by the cache-build and streaming branches."""
    pd_batch = batch.to_pydict()
    for p, m, k, bits in zip(
        pd_batch["path"], pd_batch["m"], pd_batch["k"], pd_batch["bits"]
    ):
        yield p, {"m": m, "k": k, "bits": bits}


def _cache_put(d: str, cached: dict, nbytes: int) -> None:
    """LRU insert bounded by TOTAL cached bytes (bitmaps are ~half-set and
    incompressible, so on-disk dir size ~= in-memory size): evict oldest
    dirs until under budget instead of the old clear-everything-at-64."""
    _SIDECAR_CACHE[d] = (cached, nbytes)
    total = sum(n for _, n in _SIDECAR_CACHE.values())
    while total > _CACHE_TOTAL_BYTES and len(_SIDECAR_CACHE) > 1:
        old_d, (_, old_n) = next(iter(_SIDECAR_CACHE.items()))
        if old_d == d and len(_SIDECAR_CACHE) == 1:
            break
        del _SIDECAR_CACHE[old_d]
        total -= old_n


def _iter_entries(d: str, candidates: set[str] | None):
    """Yield (path, entry) rows from one sidecar dir. Small dirs are
    loaded once into the process LRU cache; large dirs stream in Arrow
    batches (restricted to ``candidates``) so the driver never
    materializes a 100k-file index."""
    hit = _SIDECAR_CACHE.get(d)
    if hit is not None:  # LRU touch
        _SIDECAR_CACHE[d] = _SIDECAR_CACHE.pop(d)
    cached = hit[0] if hit is not None else None
    if cached is None:
        nbytes = sidecar_dir_size(d)
        if nbytes <= _CACHE_DIR_BYTES:
            cached = {}
            for batch in _parquet_dataset(d).to_batches():
                cached.update(_batch_rows(batch))
            _cache_put(d, cached, nbytes)
    if cached is not None:
        if candidates is None:
            yield from cached.items()
        else:
            for p in candidates:
                e = cached.get(p)
                if e is not None:
                    yield p, e
        return
    import pyarrow.compute as pc
    import pyarrow as pa

    flt = None
    if candidates is not None:
        flt = pc.field("path").isin(pa.array(sorted(candidates)))
    for batch in _parquet_dataset(d).to_batches(filter=flt):
        yield from _batch_rows(batch)


def prune_files_by_bloom(files: list, col: str, pred: Any, cfg: dict) -> list:
    """Drop files whose Bloom bitmap proves none of the predicate's point
    values are present. Files absent from the sidecar (inserted/rewritten
    after the index build) are always kept, as is everything under a
    config whose format/hash version this code doesn't know — version
    skew degrades pruning to a no-op, never to a lost row."""
    if (
        cfg.get("format") != FORMAT_VERSION
        or cfg.get("hash_version") != HASH_VERSION
    ):
        return files
    pts = extract_points(pred, col)
    if not pts:  # None (not a point set) or [] (contradiction -> minmax
        return files  # pruning already emptied it)
    # STRING columns only prune on string literals: a numeric probe makes
    # Spark cast the COLUMN (Java Double.parseDouble semantics — '7d',
    # hex floats, 'Infinity' all parse), equalities Python-side _canon
    # cannot replicate, so a non-str literal would risk a false negative.
    # The reverse direction (int column, numeric-string literal) stays
    # prunable — _canon collapses those forms exactly. A config without
    # the col_type stamp gets the same keep-all treatment as a version
    # mismatch.
    if cfg.get("col_type") != "integer" and not all(
        isinstance(v, str) for v in pts
    ):
        return files
    seed = cfg.get("seed", 42)
    cand = {os.path.abspath(fe.path) for fe in files}
    absent: set[str] = set()
    try:
        for d in cfg.get("sidecars", []):
            remaining = cand - absent
            if not remaining:
                break
            for p, entry in _iter_entries(d, remaining):
                if not any(might_contain(entry, v, seed) for v in pts):
                    absent.add(p)
    except (
        OSError, ValueError, KeyError,
        ZeroDivisionError, IndexError, TypeError,
    ):  # unreadable dir or corrupt entry (m=0, short bits): keep all —
        return files  # degrade to no pruning, never a planning crash
    if not absent:
        return files
    return [fe for fe in files if os.path.abspath(fe.path) not in absent]

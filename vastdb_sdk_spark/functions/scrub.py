"""PII detection and scrubbing for training-data pipelines.

Beyond-parity (BASELINE.json north star): the reference has no text-
hygiene surface; these are the redaction primitives a pretraining corpus
pass needs, designed Spark-first — every pattern is a single JVM-side
``regexp_count`` / ``regexp_replace`` expression, so detection and
redaction run inside whole-stage codegen with zero Python in the path,
and the patterns are deliberately restricted to the regex subset that
Java (Spark) and RE2 (DuckDB, Go tooling) interpret identically: no
backreferences, no lookaround, no possessive quantifiers — which is what
makes the gate queries oracle-checkable bit-for-bit.

At 100 TB: scrubbing is a pure map — no shuffle, no state; it composes
with scan pruning and runs at parquet-read speed. Order of redaction
matters only for overlapping matches, so URLs are redacted before
emails (a URL may embed ``user@host`` path segments), and IPs before
phones (both are digit runs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern design notes:
# - EMAIL: local part per RFC-lite; TLD >= 2 alpha.
# - URL: scheme to first whitespace — intentionally greedy; redacting too
#   much of a URL is safe, leaking part of one is not. Whitespace is an
#   EXPLICIT character class, not \s: Java's \s includes \x0b (vertical
#   tab) while RE2's does not, so `[^\s]+` would redact differently across
#   Spark and DuckDB on text containing vertical tabs.
# - IPV4: dotted quad with word boundaries; octet-range validation (<=255)
#   is NOT regex-encoded — a false positive redaction is harmless.
# - PHONE: international-ish +CC-NNN-NNNN with -/./space separators; kept
#   narrow on purpose (digit runs in scientific text shouldn't be eaten).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": "https?://[^ \\t\\n\\r\\f\\x0b]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[-. ]\d{3}[-. ]\d{4}",
}

# redaction order (see module docstring): URL before EMAIL, IP before PHONE
_SCRUB_ORDER = ("url", "email", "ipv4", "phone")


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in a string column (JVM regexp_count)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind]))


def pii_counts(col: Column | str) -> list[Column]:
    """One aliased count column per PII kind: n_email, n_url, ..."""
    return [pii_count(col, k).alias(f"n_{k}") for k in PII_PATTERNS]


def scrub_pii(col: Column | str, kinds: tuple[str, ...] = _SCRUB_ORDER) -> Column:
    """Replace every PII match with a typed token (``<EMAIL>``, ``<URL>``,
    ``<IPV4>``, ``<PHONE>``). Chained regexp_replace — one codegen'd
    expression, replacement is global in both Spark and DuckDB('g')."""
    col = F.col(col) if isinstance(col, str) else col
    out = col
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def scrub_sql(expr: str, kinds: tuple[str, ...] = _SCRUB_ORDER) -> str:
    """The DuckDB twin of :func:`scrub_pii` over SQL text ``expr`` —
    identical patterns, global flag. Used by the oracle gates; kept next
    to the patterns so they cannot drift apart."""
    out = expr
    for k in kinds:
        pat = PII_PATTERNS[k].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '<{k.upper()}>', 'g')"
    return out


def count_sql(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count`: length(regexp_extract_all(...))."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"

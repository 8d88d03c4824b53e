"""Text-analysis expressions for LLM-data pipelines — all JVM-side.

Beyond-parity operators (BASELINE.json north star): tokenization, token
counting, n-gram shingling, quality scoring, language-ID heuristics,
rolling-hash fingerprints. Every function returns a Spark ``Column`` built
from built-in functions, so they vectorize in whole-stage codegen; nothing
here uses a Python UDF. Each has a direct ANSI-SQL twin used by the DuckDB
oracles in ``__spark_entry__.py`` — keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny deterministic stopword sets for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "una"],
}


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens, empty strings removed."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-grams of the lowercased text (for Jaccard similarity)."""
    lowered = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(1))),
        lambda i: F.substring(lowered, i, n),
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles from a token-array column. IMPORTANT: pass a plain
    column *reference* (stage the tokenization in a prior select) — the
    expression is embedded once per shingle element, so an inline ``tokens()``
    expression here would be re-evaluated O(n) times per row."""
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        )
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-token shingles joined by a single space (MinHash input). Prefer the
    staged form (tokens in one select, shingles_from_tokens in the next) in
    hot paths — see shingles_from_tokens."""
    return shingles_from_tokens(tokens(col), k)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    stops = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(stops)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation noise,
    natural stopword density."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return (len_score + punct_score + stop_score) / 3

def lang_id(col: Column) -> Column:
    """Tiny n-gram/stopword language-ID heuristic: pick the language whose
    marker words hit the most tokens; 'und' (undetermined) when nothing hits."""
    toks = tokens(col)
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best


#: Control characters stripped by normalize_text. Explicit class (not \p{Cc})
#: so Spark's Java regex and DuckDB's RE2 agree byte-for-byte — the same
#: Java/RE2-common-subset discipline as functions/scrub.py. \x09-\x0d
#: (tab/newline/CR/FF/VT) are whitespace, handled by the collapse step.
CONTROL_CHARS_RE = "[\\x00-\\x08\\x0e-\\x1f\\x7f]"
#: Whitespace runs collapsed to one space; explicit class, not \s (Java's \s
#: and RE2's disagree on \x0b).
WS_RUN_RE = "[ \\t\\n\\r\\f\\x0b]+"


def normalize_text(col: Column) -> Column:
    """Pretraining-corpus text normalization: strip control characters,
    collapse whitespace runs to single spaces, trim. Pure chained
    regexp_replace + trim — zero shuffle, whole-stage codegen, and the
    pattern constants are restricted to the Java/RE2-common subset so the
    DuckDB oracle audits the result bit-for-bit. (Unicode NFC/NFKC needs
    a JVM Normalizer UDF or a Pandas UDF — out of the pure-expression
    tier by design; document upstream if the corpus needs it.)"""
    out = F.regexp_replace(col, CONTROL_CHARS_RE, "")
    out = F.regexp_replace(out, WS_RUN_RE, " ")
    return F.trim(out)


def dup_ngram_fraction(toks: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that repeat an earlier occurrence
    within the SAME document — the Gopher repetition-quality family
    (Rae et al. 2021 §A1.1: "duplicate n-gram fraction"): highly
    repetitive machine-generated text scores near 1, natural prose near 0.

    Pure array HOFs over a staged token column (pass a column REFERENCE,
    same contract as shingles_from_tokens) — one whole-stage-codegen
    expression, zero shuffle, zero Python. SQL twin:
    ``1 - len(list_distinct(grams)) / len(grams)`` over the identical
    gram construction."""
    grams = shingles_from_tokens(toks, n)
    total = F.size(grams)
    return F.lit(1.0) - F.size(F.array_distinct(grams)) / F.greatest(
        total, F.lit(1)
    ).cast("double")


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit-ish document fingerprint: first 16 hex chars of
    md5 over the normalized token stream (stable across engines — md5 is
    available in both Spark and DuckDB, unlike xxhash64)."""
    normalized = F.concat_ws(" ", tokens(col))
    return F.substring(F.md5(normalized), 1, 16)

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


# ---------------------------------------------------------------------------
# Gopher / C4 heuristic document filters (Rae et al. 2021 "Scaling Language
# Models" §A1.1; Raffel et al. 2020 "Exploring the Limits of Transfer
# Learning" §2.2). Pure Column expressions with exact DuckDB SQL twins —
# zero shuffle, whole-stage codegen, compose with scan pruning. At 100 TB
# these are map-only gates that run AT the scan, before any shuffle-bearing
# operator sees a byte.

#: Lines are kept by the C4 rule only when they end in terminal punctuation.
C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def gopher_quality_flags(col: Column, stop_words: list[str] | None = None):
    """Per-document Gopher quality-rule columns, returned as a dict of
    named Columns (select them with ``**``): word count bounds, mean word
    length bounds, alphabetic-word fraction, distinct-stop-word presence,
    and the conjunction ``gopher_ok``. Thresholds follow the published
    rules (50..100000 words, mean word length 3..10, >=80% words with an
    alphabetic character, >=2 distinct stop words); pass ``stop_words``
    to override the tiny built-in English marker set.

    Every sub-flag rides along so a pipeline can report WHICH rule fired
    (the paper's ablation practice) instead of a bare boolean."""
    stops = stop_words or LANG_MARKERS["en"]
    toks = tokens(col)
    n = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    ) / F.greatest(n, F.lit(1)).cast("double")
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ) / F.greatest(n, F.lit(1)).cast("double")
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in stops]))
    )
    words_ok = (n >= 50) & (n <= 100_000)
    mean_ok = (mean_len >= 3.0) & (mean_len <= 10.0)
    alpha_ok = alpha_frac >= 0.80
    stop_ok = n_stop >= 2
    return {
        "n_words": n,
        "mean_word_len": F.round(mean_len, 4),
        "alpha_word_frac": F.round(alpha_frac, 4),
        "n_stop_words": n_stop,
        "words_ok": words_ok,
        "mean_len_ok": mean_ok,
        "alpha_ok": alpha_ok,
        "stop_ok": stop_ok,
        "gopher_ok": words_ok & mean_ok & alpha_ok & stop_ok,
    }


def c4_kept_lines(col: Column, min_words: int = 5) -> Column:
    """C4 line rule: split on newlines, trim, keep lines that end in
    terminal punctuation, carry >= ``min_words`` whitespace words, and do
    not mention 'javascript' (case-insensitive). Returns the kept-line
    array; join with '\\n' for the cleaned document."""
    lines = F.transform(F.split(col, "\n"), F.trim)
    ends_ok = lambda ln: F.substring(ln, -1, 1).isin(*C4_TERMINAL_PUNCT)  # noqa: E731
    words = lambda ln: F.size(F.split(ln, " +"))  # noqa: E731
    return F.filter(
        lines,
        lambda ln: ends_ok(ln)
        & (words(ln) >= min_words)
        & (~F.lower(ln).contains("javascript")),
    )


def c4_doc_ok(col: Column, kept: Column | None = None, min_lines: int = 3) -> Column:
    """C4 document rule: drop documents containing a curly brace (code),
    the 'lorem ipsum' placeholder, or fewer than ``min_lines`` surviving
    lines. Pass the precomputed ``c4_kept_lines`` column to stage the
    line work once when both are selected."""
    kept = kept if kept is not None else c4_kept_lines(col)
    return (
        (~col.contains("{"))
        & (~F.lower(col).contains("lorem ipsum"))
        & (F.size(kept) >= min_lines)
    )


#: GPT-2-style pretokenizer, restricted to the Java/RE2-common subset (no
#: lookahead — RE2 has none; ASCII classes, ordered alternation which both
#: engines apply leftmost-first in default mode): contraction suffixes,
#: space-prefixed letter runs, space-prefixed digit runs, space-prefixed
#: non-space punctuation runs (apostrophe excluded so contractions win),
#: bare apostrophe. Deliberate deltas from real GPT-2 (it needs lookahead
#: for its whitespace rules): a SPACE is consumed only as the optional
#: prefix of the following run — a second consecutive space matches no
#: alternative and is skipped — while non-space whitespace (\n, \t) falls
#: into the punctuation class and IS counted as a run.
BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[a-zA-Z]+"
    "| ?[0-9]+"
    "| ?[^a-zA-Z0-9 ']+"
    "|'"
)


def bpe_pretokens(col: Column) -> Column:
    """BPE-ish pretokenization (the GPT-2 pretokenizer shape): the text
    split into contraction/letter/digit/punctuation pieces BEFORE any
    merge table is applied. Real BPE vocabularies only split these pieces
    further, so ``size(bpe_pretokens(x))`` is a LOWER bound on the real
    token count and its distribution tracks tokenizer-true counts far
    better than whitespace words (punctuation and digit runs count).
    One regexp_extract_all — zero shuffle, codegen, exact DuckDB twin."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_count(col: Column) -> Column:
    """Pretoken count — the cheap tokenizer-aware length estimate for
    context packing / pricing / length-bucket stats."""
    return F.size(bpe_pretokens(col))


# sentence boundary: one-or-more terminators followed by whitespace.
# Deliberately RE2-common (no lookbehind — DuckDB's regexp_split_to_array
# is RE2), same single-source discipline as the scrub patterns: the
# terminator run is CONSUMED by the split, so both engines produce the
# identical sentence list. A trailing terminator leaves no empty tail
# (filtered), and abbreviation dots ("e.g. x") split — acceptable for
# corpus statistics, documented.
SENTENCE_SPLIT_RE = "[.!?]+[ \\t\\n\\r]+"


def sentences(col: Column) -> Column:
    """Sentence strings (terminators stripped at boundaries, trimmed,
    empties removed). Pure codegen'd Column expression."""
    return F.filter(
        F.transform(
            F.split(col, SENTENCE_SPLIT_RE),
            lambda s: F.regexp_replace(F.trim(s), "[.!?]+$", ""),
        ),
        lambda s: s != F.lit(""),
    )


def sentence_count(col: Column) -> Column:
    return F.size(sentences(col))


# URL canonicalization — the URL-dedup key of web-curation pipelines
# (CommonCrawl-style: the same page arrives under scheme/case/tracking-
# param/fragment variants; dedup must key on a canonical form). All
# patterns are RE2-common and single-sourced into the SQL oracle.
URL_SPLIT_RE = "^(?i)[a-z][a-z0-9+.-]*://([^/?#]+)([^?#]*)(?:\\?([^#]*))?.*$"
URL_TRACKING_PARAM_RE = "(?:^|&)(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)=[^&]*"
URL_DEFAULT_PORT_RE = ":(?:80|443)$"
URL_WWW_RE = "^www\\."


def canonical_url(col: Column) -> Column:
    """Canonical dedup key for a URL column:

    - host lowercased, leading ``www.`` and default ``:80``/``:443``
      ports stripped (scheme dropped entirely — http/https duplicates
      collapse);
    - path kept case-SENSITIVE, trailing ``/`` stripped;
    - tracking params (utm_*, fbclid, gclid, msclkid, ref) removed, the
      query otherwise kept in original order, ``?`` dropped when empty;
    - fragment always dropped.

    Non-URL strings (no ``scheme://``) canonicalize to NULL — the
    caller's signal to fall back to another key. Pure codegen'd
    regexp expressions, zero shuffle."""
    host = F.regexp_extract(col, URL_SPLIT_RE, 1)
    path = F.regexp_extract(col, URL_SPLIT_RE, 2)
    query = F.regexp_extract(col, URL_SPLIT_RE, 3)
    host_c = F.regexp_replace(
        F.regexp_replace(F.lower(host), URL_WWW_RE, ""),
        URL_DEFAULT_PORT_RE,
        "",
    )
    path_c = F.regexp_replace(path, "/+$", "")
    query_c = F.regexp_replace(
        F.regexp_replace(query, URL_TRACKING_PARAM_RE, ""), "^&", ""
    )
    out = F.concat(
        host_c,
        path_c,
        F.when(query_c != "", F.concat(F.lit("?"), query_c)).otherwise(
            F.lit("")
        ),
    )
    return F.when(host != "", out)


# HTML stripping — the extract-text-from-markup stage of web curation.
# RE2-common (no backreferences/lookarounds), single-sourced into the SQL
# oracle. Deliberately a TAG stripper, not a parser: malformed markup
# degrades to leftover text, never to an error.
HTML_BLOCK_RE = "(?is)<(?:script|style)\\b[^>]*>.*?</(?:script|style)>"
HTML_TAG_RE = "(?s)<[^>]*>"
HTML_COMMENT_RE = "(?s)<!--.*?-->"
# (entity, replacement) applied in order; amp LAST so '&amp;lt;' ends as
# '&lt;' (the double-escaped literal), not '<'
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_html(col: Column) -> Column:
    """Markup-to-text: drop comments and whole script/style blocks, strip
    remaining tags, decode the common entities, collapse whitespace runs,
    trim. Pure codegen'd regexp chain, zero shuffle."""
    c = F.regexp_replace(col, HTML_COMMENT_RE, " ")
    c = F.regexp_replace(c, HTML_BLOCK_RE, " ")
    c = F.regexp_replace(c, HTML_TAG_RE, " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, WS_RUN_RE, " "))


def collapse_repeated_lines(col: Column) -> Column:
    """Drop CONSECUTIVE duplicate lines (chat echo, boilerplate stutter,
    scraped-menu repetition): a line survives iff it differs from the
    line directly above it; order and everything non-consecutive are
    preserved. Counterpart to corpus-level line dedup
    (operators/dedup.remove_duplicate_lines): this one is purely
    row-local — a codegen'd Column expression, zero shuffle.

    SQL twin (DuckDB): the same filter over (line, position) with the
    previous element by index — keep in sync with the
    ``tx_collapse_repeats`` oracle."""
    lines = F.split(col, "\n", -1)
    # when/otherwise (lazy per-row) rather than `|`: element_at(lines, 0)
    # would raise under ANSI mode if evaluated for the first element
    kept = F.filter(
        lines,
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            x != F.element_at(lines, i)
        ),
    )
    return F.array_join(kept, "\n")

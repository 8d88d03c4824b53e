"""Byte-pair-encoding tokenizer TRAINING and application for LLM-data
pipelines (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the algorithm behind GPT/LLaMA-family
tokenizers; functions/text.bpe_pretokenize supplies the pre-token split).

Spark-first split of work, mirroring how production tokenizer trainers
(HuggingFace, SentencePiece-BPE) actually run:

- **word counting is distributed** — one explode + groupBy(word), the
  word-count shape with map-side partial aggregation. This is the only
  corpus-sized pass: a 100 TB corpus reduces to a vocabulary-sized
  (word, count) table (~1e6 rows for web text, Heaps' law), optionally
  capped at ``top_words`` by frequency.
- **the merge loop is driver-side over that dict** — BPE's sequential
  dependency (merge i+1's pair counts depend on merge i) makes the loop
  inherently iterative over a tiny structure; distributing it would add
  a shuffle per merge for no coverage gain. Pair counts are maintained
  INCREMENTALLY (count once, then per merge update only the words that
  contain the merged pair — the standard trainer optimization), so the
  loop is O(num_merges * affected_words), not O(num_merges * vocab).
- **applying merges is distributed again** — the learned merge ranks ride
  a broadcast; each Arrow batch greedily merges per pre-token with a
  per-batch word cache (Zipf makes the cache hit rate ~99%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, count) table — the sufficient statistic BPE
    training needs from the corpus. Same tokenizer as the rest of the
    engine (lowercased alphanumeric runs)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict = {}
    for sym, n in vocab.items():
        for a, b in zip(sym, sym[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    top_words: int | None = 200_000,
    counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus. Words are split
    into characters plus a ``</w>`` end-of-word marker (so merges can't
    cross word boundaries and word-final units stay distinct, per the
    original algorithm); each step merges the globally most frequent
    adjacent pair, ties broken lexicographically (deterministic across
    runs and partitionings — counts are exact integers).

    ``top_words`` caps the driver-side dict by frequency (ties broken by
    word) — the tail it drops contributes negligibly to pair counts.
    ``counts``: a precomputed :func:`word_counts` frame (fit-once reuse).
    Stops early when no pair occurs twice. Returns [(left, right), ...].
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    cnt = counts if counts is not None else word_counts(df, text_col)
    if top_words is not None:
        cnt = cnt.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
            int(top_words)
        )
    rows = cnt.collect()  # vocabulary-sized by construction, never corpus
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r.word) + (END_OF_WORD,)
        vocab[sym] = vocab.get(sym, 0) + r.n

    pair_counts = _pair_counts(vocab)
    # pair -> set of words currently containing it (incremental updates)
    where: dict = {}
    for sym in vocab:
        for p in zip(sym, sym[1:]):
            where.setdefault(p, set()).add(sym)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pair, best_c = None, 1
        for p, c in pair_counts.items():
            if c < 2:
                continue
            if c > best_c or (c == best_c and p < pair):
                pair, best_c = p, c
        if pair is None:
            break
        merges.append(pair)
        # re-segment ONLY the words containing the pair; adjust pair
        # counts by the delta of each word's pair multiset
        for sym in list(where.get(pair, ())):
            n = vocab.pop(sym, 0)
            if not n:
                continue
            for p in zip(sym, sym[1:]):
                pair_counts[p] = pair_counts.get(p, 0) - n
                s = where.get(p)
                if s is not None:
                    s.discard(sym)
            new_sym = _merge_word(sym, pair)
            vocab[new_sym] = vocab.get(new_sym, 0) + n
            for p in zip(new_sym, new_sym[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                where.setdefault(p, set()).add(new_sym)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list: every document becomes its subword
    sequence (word-final units carry the ``</w>`` marker). The merge
    ranks ride ONE broadcast; encoding is greedy lowest-rank-first per
    pre-token inside an Arrow-batched mapInPandas with a per-batch word
    cache — zero shuffle, O(1) plan size at any merge-table size.
    Returns (id_col, out_col array<string>, n_bpe_tokens)."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    staged = df.select(
        F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__tk")
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(out_col, T.ArrayType(T.StringType()), False),
            T.StructField("n_bpe_tokens", T.IntegerType(), False),
        ]
    )

    def encode_batches(batches):
        rk = bc.value
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is not None:
                return hit
            sym = list(word) + [END_OF_WORD]
            while len(sym) > 1:
                best_i, best_r = -1, None
                for i in range(len(sym) - 1):
                    r = rk.get((sym[i], sym[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best_i, best_r = i, r
                if best_r is None:
                    break
                sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
            cache[word] = sym
            return sym

        for pdf in batches:
            ids, toks_out, n_out = [], [], []
            for rid, words in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                pieces: list[str] = []
                for w in words:
                    pieces.extend(enc(w))
                ids.append(rid)
                toks_out.append(pieces)
                n_out.append(len(pieces))
            yield pd.DataFrame(
                {id_col: ids, out_col: toks_out, "n_bpe_tokens": n_out}
            )

    return staged.mapInPandas(encode_batches, schema=out_schema)

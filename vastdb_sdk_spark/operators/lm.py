"""Corpus-fit statistical language-model scoring for LLM-data pipelines.

Beyond-parity (BASELINE.json north star): the standard data-quality signal
a perplexity filter provides (CCNet/Gopher-style), re-expressed without an
external KenLM artifact — the model IS the corpus's own unigram
distribution, fit distributedly in the same job that scores. Documents
whose tokens are improbable under the corpus distribution (gibberish,
boilerplate soup, wrong-language text) score low; filtering on a
percentile of this score composes with quality_percentile_filter.

Scale design: fitting is ONE explode + groupBy(token) — the classic
word-count shape with map-side partial aggregation. Scoring joins the
token stream back to the count table: with ``top_n`` set (the 100 TB
path) the vocabulary is capped to the most frequent top_n tokens and
BROADCAST, so the scoring join is map-side — no shuffle of the exploded
token stream and no Zipf-head skew (the "the" bucket never concentrates
on one reducer). Without ``top_n`` the join is a shuffle equi-join on
token — exact, fine at gate scale, skew-exposed at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def fit_unigram_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus token counts — the unigram model's sufficient statistic:
    one explode + groupBy(token) with map-side partial aggregation.
    Returns (tok, __c). At corpus scale, ``.persist()`` this frame (it is
    vocabulary-sized, not corpus-sized) and pass it to
    :func:`unigram_logprob_scores` as ``counts`` so the normalizer, the
    vocabulary cap and the scoring join all read ONE materialization
    instead of re-deriving the explode+groupBy lineage per use."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    return toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    top_n: int | None = None,
    out_col: str = "unigram_logprob",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Mean token log-probability per document under the corpus's own
    add-``smoothing`` unigram model:

        p(t) = (c(t) + a) / (total + a * (V + 1))

    with ``c(t)`` the corpus count (0 for out-of-vocabulary tokens when
    ``top_n`` caps the vocabulary), ``total`` the corpus token count and
    ``V`` the full distinct-token count — the "+1" reserves mass for OOV.
    Returns one row per input row: (id_col, n_tokens, out_col); documents
    with zero tokens get a NULL score.

    ``counts``: a precomputed (ideally persisted) frame from
    :func:`fit_unigram_counts`. Without it, the returned plan re-derives
    the explode+groupBy lineage for each of its three uses (normalizer,
    vocabulary cap, scoring join) — fine at test scale, ~3x the scan cost
    at corpus scale, where fit-once-score-many is the right shape anyway.

    Exact SQL twin (DuckDB): same counts via unnest(string_split_regex),
    same ln() expression — keep in sync with the ``tx_unigram_logprob``
    oracle in ``__spark_entry__.py``.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    cnt = counts if counts is not None else fit_unigram_counts(df, text_col)
    # total/V come from the FULL distribution even when the scoring vocab
    # is capped — the cap changes which tokens fall into the OOV bucket,
    # not the model's normalizer.
    tot = cnt.agg(
        F.sum("__c").alias("__total"), F.count(F.lit(1)).alias("__v")
    )
    if top_n is not None:
        vocab = cnt.orderBy(F.col("__c").desc(), F.col("tok").asc()).limit(int(top_n))
        joined = toks.join(F.broadcast(vocab), "tok", "left")
    else:
        joined = toks.join(cnt, "tok")
    lp = F.log(
        (F.coalesce(F.col("__c"), F.lit(0)).cast("double") + F.lit(float(smoothing)))
        / (
            F.col("__total").cast("double")
            + F.lit(float(smoothing)) * (F.col("__v").cast("double") + F.lit(1.0))
        )
    )
    scored = (
        joined.crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.avg(lp).alias(out_col))
    )
    # re-attach rows whose token stream is empty (explode dropped them)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    )

"""Deterministic sampling / split / packing operators
(vastdb_sdk_spark/operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from vastdb_sdk_spark.operators import sampling


def _py_bucket(key: int, buckets: int = 10_000) -> int:
    # the documented SQL twin, with pmod semantics for negatives
    folded = key % 3_037_000_493
    return (folded * 2_654_435_761) % buckets


def test_hash_bucket_matches_sql_twin_and_survives_huge_keys(spark):
    keys = [0, 1, 42, 9_999, 3_037_000_492, 3_037_000_493,
            2**40, 2**62, 2**63 - 1, -1, -(2**62)]
    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    got = {
        r.k: r.b
        for r in df.select("k", sampling.hash_bucket("k").alias("b")).collect()
    }
    for k in keys:
        assert got[k] == _py_bucket(k), k
        assert 0 <= got[k] < 10_000


def test_hash_sample_deterministic_across_partitionings(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    a = {r.k for r in sampling.hash_sample(df, "k", 0.25).collect()}
    b = {
        r.k
        for r in sampling.hash_sample(df.repartition(17), "k", 0.25).collect()
    }
    assert a == b
    assert 0.2 < len(a) / 5_000 < 0.3


def test_train_test_split_stable_under_corpus_growth(spark):
    small = spark.range(0, 2_000).withColumnRenamed("id", "k")
    big = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s = {
        (r.k, r.split)
        for r in sampling.train_test_split(small, "k", 0.1).collect()
    }
    g = {
        (r.k, r.split)
        for r in sampling.train_test_split(big, "k", 0.1).collect()
    }
    # growing the corpus never migrates an existing row between splits
    assert s <= g


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(10_000)],
        "k LONG, lang STRING",
    )
    out = sampling.stratified_sample(df, "k", "lang", {"en": 0.1}, 0.8)
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 0.05 < counts["en"] / 5_000 < 0.15
    assert 0.75 < counts["de"] / 5_000 < 0.85


def test_pack_greedy_bin_invariants(spark):
    df = spark.createDataFrame(
        [(i, "s", 100 + (i % 7) * 50) for i in range(200)],
        "doc_id LONG, lang STRING, n_tokens LONG",
    )
    packed = sampling.pack_greedy(
        df, "n_tokens", budget=512, stratum_col="lang"
    ).collect()
    by_bin = {}
    for r in sorted(packed, key=lambda r: r.doc_id):
        by_bin.setdefault(r.pack_bin, []).append(r.n_tokens)
    # bins are contiguous from 0 and every bin STARTS under budget (an
    # oversized doc may overflow its own bin but never merges into the next)
    assert sorted(by_bin) == list(range(len(by_bin)))
    for sizes in by_bin.values():
        prefix = 0
        for s in sizes:
            assert prefix < 512  # each doc begins inside the budget window
            prefix += s


def test_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 2_000), (2, 100)], "doc_id LONG, n_tokens LONG"
    )
    packed = {
        r.doc_id: r.pack_bin
        for r in sampling.pack_greedy(df, "n_tokens", budget=512).collect()
    }
    # doc 1 exceeds the budget alone: it occupies bins without being dropped
    assert packed[0] == 0
    assert packed[1] is not None and packed[2] is not None
    assert packed[2] > packed[1] >= 0


def test_exact_group_percentiles_nearest_rank(spark):
    """Type-1 percentile: value at sorted rank ceil(p*n), integer-exact."""
    from vastdb_sdk_spark.operators.sampling import exact_group_percentiles

    # group a: values 1..10 -> p50 = rank ceil(5)=5 -> 5; p90 -> rank 9 -> 9
    # group b: values [7] -> every percentile is 7
    rows = [("a", i) for i in range(1, 11)] + [("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r.g: r
        for r in exact_group_percentiles(
            df, "v", "g", percentiles=(0.5, 0.9)
        ).collect()
    }
    assert (out["a"].n, out["a"].p50, out["a"].p90) == (10, 5, 9)
    assert (out["b"].n, out["b"].p50, out["b"].p90) == (1, 7, 7)


def test_exact_group_percentiles_no_float_boundary(spark):
    """n=30, p=0.9: double 0.9*30 = 27.000000000000004 would ceil to 28 —
    the integer formula must pick rank 27."""
    from vastdb_sdk_spark.operators.sampling import exact_group_percentiles

    df = spark.createDataFrame(
        [("g", i) for i in range(1, 31)], "g string, v long"
    )
    out = exact_group_percentiles(df, "v", "g", percentiles=(0.9,)).collect()
    assert out[0].p90 == 27


def test_exact_group_percentiles_validation(spark):
    import pytest as _pytest

    from vastdb_sdk_spark.operators.sampling import exact_group_percentiles

    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with _pytest.raises(ValueError, match="non-empty"):
        exact_group_percentiles(df, "v", "g", percentiles=())
    with _pytest.raises(ValueError, match="must be in"):
        exact_group_percentiles(df, "v", "g", percentiles=(1.5,))

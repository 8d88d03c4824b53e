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


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis, deterministic)


def test_weighted_sample_deterministic_and_proportional(spark):
    from vastdb_sdk_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, w DOUBLE")
    # the 10 rows with 100x weight should dominate a k=20 sample across
    # independent seeds (each heavy row beats each light row w.p. ~100/101)
    heavy_hits = 0
    for seed in (1, 2, 3):
        got = {r["doc_id"] for r in weighted_sample(df, "w", 20, seed=seed).collect()}
        assert len(got) == 20
        heavy_hits += len([i for i in got if i < 10])
        # deterministic: the same seed reproduces the identical set
        again = {r["doc_id"] for r in weighted_sample(df, "w", 20, seed=seed).collect()}
        assert got == again
    assert heavy_hits >= 24  # >= 8 of 10 heavy rows per seed on average


def test_weighted_sample_groups_and_eligibility(spark):
    from vastdb_sdk_spark.operators.sampling import weighted_sample

    rows = [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, -1.0), ("a", 4, None),
            ("b", 5, 2.0)]
    df = spark.createDataFrame(rows, "g STRING, doc_id LONG, w DOUBLE")
    got = weighted_sample(df, "w", 2, group_cols=["g"]).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], set()).add(r["doc_id"])
    # negative/null weights are never sampled, even when k exceeds the
    # eligible count
    assert by_g == {"a": {1, 2}, "b": {5}}
    # keep_col marks the same survivors without dropping rows
    flagged = weighted_sample(df, "w", 2, group_cols=["g"], keep_col="keep")
    kept = {r["doc_id"] for r in flagged.collect() if r["keep"]}
    assert kept == {1, 2, 5}
    assert flagged.count() == 5


def test_weighted_sample_plan_uses_window_group_limit(spark):
    from vastdb_sdk_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i + 1)) for i in range(30)],
        "doc_id LONG, g STRING, w DOUBLE",
    )
    # grouped: rank-filter-by-constant compiles to WindowGroupLimit
    # (map-side per-group pre-trim before the shuffle)
    grouped = (
        weighted_sample(df, "w", 5, group_cols=["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in grouped
    # global: the constant partition collapses further, to a top-k
    # TakeOrdered — each task ships at most k rows to the driver-side heap
    top = (
        weighted_sample(df, "w", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in top


def test_weighted_sample_k_validation(spark):
    import pytest as _pytest

    from vastdb_sdk_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], "doc_id LONG, w DOUBLE")
    with _pytest.raises(ValueError, match="k=0"):
        weighted_sample(df, "w", 0)


# ---------------------------------------------------------------------------
# DSIR importance weighting + Gumbel-top-k resampling


def _dsir_corpus(spark):
    # target-like docs talk about spark; off-target docs about cooking
    rows = []
    for i in range(40):
        rows.append((i, "on" if i % 2 == 0 else "off",
                     "spark shuffle join partition broadcast stage"
                     if i % 2 == 0 else
                     "bake flour sugar butter oven whisk"))
    return spark.createDataFrame(rows, "doc_id LONG, grp STRING, text STRING")


def test_dsir_weights_separate_target_like_docs(spark):
    from vastdb_sdk_spark.operators.sampling import dsir_logratio_weights

    d = _dsir_corpus(spark)
    target = d.filter("grp = 'on'")
    w = dsir_logratio_weights(d, target, num_buckets=1000)
    rows = {r["doc_id"]: r["dsir_weight"] for r in w.collect()}
    assert len(rows) == 40
    on = [rows[i] for i in range(0, 40, 2)]
    off = [rows[i] for i in range(1, 40, 2)]
    # every target-like doc outweighs every off-target doc
    assert min(on) > max(off)
    # deterministic across runs
    again = {r["doc_id"]: r["dsir_weight"]
             for r in dsir_logratio_weights(d, target, num_buckets=1000).collect()}
    assert rows == again


def test_dsir_weights_empty_text_is_zero(spark):
    from vastdb_sdk_spark.operators.sampling import dsir_logratio_weights

    d = spark.createDataFrame(
        [(1, "spark join"), (2, ""), (3, None)], "doc_id LONG, text STRING"
    )
    w = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_logratio_weights(d, d.limit(1)).collect()}
    assert w[2] == 0.0 and w[3] == 0.0


def test_dsir_select_prefers_high_weight_and_is_deterministic(spark):
    from vastdb_sdk_spark.operators.sampling import dsir_select

    d = _dsir_corpus(spark)
    target = d.filter("grp = 'on'")
    sel = dsir_select(d, target, k=10, num_buckets=1000)
    got = sorted(r["doc_id"] for r in sel.collect())
    assert len(got) == 10
    # weight gap between the two clusters dwarfs Gumbel noise here, so
    # the selection is all target-like docs
    assert all(i % 2 == 0 for i in got)
    again = sorted(r["doc_id"] for r in
                   dsir_select(d, target, k=10, num_buckets=1000).collect())
    assert got == again
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k=0"):
        dsir_select(d, target, k=0)


def test_sample_to_token_budget_floor_semantics(spark):
    from vastdb_sdk_spark.operators.sampling import sample_to_token_budget
    import hashlib

    rows = [(i, "web" if i < 8 else "code", 10) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sample_to_token_budget(
        df, {"web": 25, "code": 40}, tokens_col="n_tokens"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # floor semantics: cumulative-before < budget keeps the crosser ->
    # web keeps 3 docs (0,10,20 before-values), code keeps all 4 (40 > 30 total)
    assert len(by_src["web"]) == 3
    assert sorted(by_src["code"]) == [8, 9, 10, 11]
    # the web selection is the md5-order prefix, reproducible by hand
    web_order = sorted(range(8), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert sorted(by_src["web"]) == sorted(web_order[:3])
    # determinism + keep_col variant agree
    marked = sample_to_token_budget(
        df, {"web": 25, "code": 40}, tokens_col="n_tokens", keep_col="keep"
    ).collect()
    assert {r["doc_id"] for r in marked if r["keep"]} == {r["doc_id"] for r in out}
    # absent group dropped; zero budget drops the group
    none_code = sample_to_token_budget(df, {"web": 25}).collect()
    assert {r["source"] for r in none_code} == {"web"}
    zero = sample_to_token_budget(df, {"web": 0, "code": 1}).collect()
    assert {r["source"] for r in zero} == {"code"} and len(zero) == 1
    import pytest as _pt

    with _pt.raises(ValueError):
        sample_to_token_budget(df, {})
    with _pt.raises(ValueError):
        sample_to_token_budget(df, {"web": -1})


def test_assign_shards_deterministic_order(spark):
    import hashlib
    from vastdb_sdk_spark.operators.sampling import assign_shards

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    out = assign_shards(df, 4).collect()
    # shard is the Knuth fold, pos is the md5 rank within the shard —
    # replay both by hand
    def shard_of(i):
        return ((i % 3037000493) * 2654435761) % 4

    by_shard = {}
    for r in out:
        assert r["shard"] == shard_of(r["doc_id"])
        by_shard.setdefault(r["shard"], []).append(r)
    for sh, rows in by_shard.items():
        rows.sort(key=lambda r: r["pos"])
        expect = sorted(
            (r["doc_id"] for r in rows),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        assert [r["doc_id"] for r in rows] == expect
        assert [r["pos"] for r in rows] == list(range(len(rows)))
    # re-run identical; repartitioning does not change the assignment
    again = assign_shards(df.repartition(7), 4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }
    import pytest as _pt

    with _pt.raises(ValueError):
        assign_shards(df, 0)

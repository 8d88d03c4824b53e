"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps SURVEY.md §2 inventory items (and the beyond-parity
LLM-pipeline operators) to Spark DataFrame builders; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL for each. Conventions for hash-stable
cross-engine comparison:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded (sums to 2dp, ratios/avgs to 4dp) so
  accumulation-order differences between engines cannot flip the hash;
- LIMIT queries always have a total ORDER BY with a unique tie-break;
- tokenization/hashing for text operators uses the same regex + md5 on both
  sides (md5 is the only hash both engines share).

Predicate-pushdown queries (p2..p11) are expressed through the engine's own
DSL in ``vastdb_sdk_spark.expr`` where that adds coverage, and through plain
DataFrame ops otherwise — Catalyst compiles both to the same pushed-down
scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# ---------------------------------------------------------------------------
# helpers


def _local_df(spark, rows, schema):
    """Small literal frame as a pure Catalyst plan — see
    vastdb_sdk_spark/localrel.py (a createDataFrame LogicalRDD costs
    ~0.3 s of Python-RDD scan per action that reads it)."""
    from vastdb_sdk_spark.localrel import local_df

    return local_df(spark, rows, schema)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(us); read it under an explicit
        # int64 schema so engine-side comparisons/windows use the raw
        # epoch-micros long directly: same ordering, no session-timezone
        # dependence, and one convention shared with the streaming tier
        # (streaming/events.py EVENTS_SCHEMA).
        from vastdb_sdk_spark.streaming.events import EVENTS_SCHEMA

        return spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _us(ts: str) -> int:
    """Epoch-micros of a UTC timestamp string (for filtering the events.ts
    int64 column; the DuckDB oracle compares native TIMESTAMPs)."""
    import datetime as dt

    d = dt.datetime.fromisoformat(ts).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000


# identical tokenization on both engines: lowercase, split on non-[a-z0-9],
# drop empties (see vastdb_sdk_spark/functions/text.py)
def _tokens(col):
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit(""))


_SQL_TOKENS = (
    "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"
)


# Independent naive BPE trainer for the tx_bpe_learned oracle. Shares NO
# code with operators/bpe.py: word counts come from DuckDB over the raw
# parquet (same tokenizer as every other SQL oracle), and the merge loop
# recomputes pair counts from scratch each step (the O(V * merges) naive
# form, vs the engine's incremental trainer) — so a bug in the engine's
# incremental bookkeeping would surface as a merge-table divergence and a
# hash mismatch at the gate. The driver's correctness gate always runs at
# sf0.01 on /root/testdata; SPARK_GRAFT_ORACLE_SF_DIR overrides the corpus
# path for local oracle checks at other scale factors.
_BPE_ORACLE_MERGES: dict[str, list] = {}


def _naive_bpe_merges(sf_dir: str, num_merges: int = 30,
                      top_words: int = 200_000) -> list:
    if sf_dir in _BPE_ORACLE_MERGES:
        return _BPE_ORACLE_MERGES[sf_dir]
    import duckdb

    tok = _SQL_TOKENS.format(c="text")
    rows = duckdb.connect().execute(
        f"SELECT w AS word, count(*) AS n FROM (SELECT unnest({tok}) AS w"
        f" FROM '{sf_dir}/documents.parquet') GROUP BY w"
        f" ORDER BY n DESC, w ASC LIMIT {top_words}"
    ).fetchall()
    vocab = {tuple(w) + ("</w>",): n for w, n in rows}
    merges = []
    for _ in range(num_merges):
        pc: dict = {}
        for sym, n in vocab.items():
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + n
        eligible = [(c, p) for p, c in pc.items() if c >= 2]
        if not eligible:
            break
        best_c = max(c for c, _ in eligible)
        pair = min(p for c, p in eligible if c == best_c)
        merges.append(pair)
        new_vocab: dict = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    _BPE_ORACLE_MERGES[sf_dir] = merges
    return merges


# ---------------------------------------------------------------------------
# S/P: scans, projections, predicates (SURVEY.md §2.1-2.2)


def q_s1_scan_project(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < "1996-01-01") & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_partkey", "l_extendedprice")


def q_p2_comparisons(spark, sf):
    p = _t(spark, sf, "part")
    return p.filter(
        (F.col("p_size") >= 30) & (F.col("p_retailprice") < 1200.0)
    ).select("p_partkey", "p_size", "p_retailprice")


def q_p3_between(spark, sf):
    o = _t(spark, sf, "orders")
    return o.filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31 23:59:59")
    ).select("o_orderkey", "o_totalprice")


def q_p4_isin(spark, sf):
    c = _t(spark, sf, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )


def q_p5_isnull(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.withColumn("prio_or_null", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")))
        .filter(F.col("prio_or_null").isNull())
        .select("o_orderkey")
    )


def q_p6_startswith(spark, sf):
    p = _t(spark, sf, "part")
    return p.filter(F.col("p_name").startswith("red ")).select("p_partkey", "p_name")


def q_p7_contains(spark, sf):
    p = _t(spark, sf, "part")
    return p.filter(F.col("p_name").contains("widget")).select("p_partkey", "p_name")


def q_p8_struct_field(spark, sf):
    ev = _t(spark, sf, "events")
    nested = ev.withColumn("s", F.struct("event_type", "user_id"))
    return nested.filter(F.col("s.event_type") == "click").select(
        "event_id", F.col("s.user_id").alias("user_id")
    )


def q_p10_literals(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.filter(
        (F.col("ts") >= _us("2024-01-02 00:00:00"))
        & (F.col("ts") < _us("2024-01-05 00:00:00"))
        & (F.col("value") > 50.0)
        & (F.col("event_type") != "error")
    ).select("event_id", "event_type", "value")


def q_p11_false_predicate(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(F.lit(False)).select("l_orderkey", "l_quantity")


def q_o1_limit_topk(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# A: aggregations (§2.4)


def q_a1_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_a2_count_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


def q_a3_having(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 8)
    )


def q_a4_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_a5_conditional_agg(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_f"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_o"),
    )


# ---------------------------------------------------------------------------
# J: joins (§2.3 — the tier the reference delegates to DuckDB)


def q_j1_star_join_revenue(spark, sf):
    """Flagship: revenue per nation through the full star schema; dimension
    tables broadcast (they are tiny at any SF), fact tables shuffle on join
    keys once."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q3(spark, sf):
    """TPC-H Q3 (shipping priority): broadcast the filtered customer dim,
    shuffle lineitem/orders once on the join key, top-10 by revenue with a
    unique tie-break for a stable LIMIT."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q18(spark, sf):
    """TPC-H Q18 (large-volume customers): map-side partial agg on lineitem,
    semi-filter via the aggregated order keys, broadcast customer."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 320)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


def q_tpch_q10(spark, sf):
    """TPC-H Q10 (returned items): revenue lost to returns per customer in
    a quarter; nation broadcast, top-20 stable LIMIT."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q5(spark, sf):
    """TPC-H Q5 (local supplier volume): one year of one region's orders
    where the supplier and customer share a nation. Fact tables shuffle on
    orderkey once; supplier/nation/region are broadcast dims, so the
    nation-match condition rides the broadcast join instead of a second
    shuffle."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q6(spark, sf):
    """TPC-H Q6 (forecasting revenue): pure scan-side query — date range,
    discount band, and quantity cap all push down to the parquet scan, then
    a single global aggregate. The plan should be scan -> partial agg ->
    one-row exchange."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q_tpch_q7(spark, sf):
    """TPC-H Q7 (volume shipping): trade between two nations by year and
    direction. supplier and customer are pre-filtered to the two nations
    BEFORE the fact-table joins (inner broadcast joins against the 2-row
    nation slices), so ~92% of lineitem rows drop at the first hash-join
    probe instead of after the full 5-way join; the OR-pair disjunction
    then only has to exclude the two same-nation combinations."""
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = _t(spark, sf, "orders")
    n1 = _t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_6")
    ).select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_6")
    ).select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    c = _t(spark, sf, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6")
    rpair = (F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair | rpair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q13(spark, sf):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join with
    an extra non-key condition folded into the join predicate (customers
    with zero qualifying orders must still appear with c_count = 0), then a
    second aggregation over the first."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q14(spark, sf):
    """TPC-H Q14 (promo revenue share): one month of lineitem against the
    part dim (broadcast), conditional numerator over the same aggregate
    denominator — a single pass, no second scan."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = _t(spark, sf, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q15(spark, sf):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    max. The scalar-subquery max is a window max over the aggregated frame
    — that frame is one row per supplier (tiny at any SF), so the
    single-partition window is not a scale hazard. Revenue is rounded
    BEFORE the max comparison so both engines compare identical values."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = rev.withColumn("mx", F.max("total_revenue").over(W.partitionBy())).filter(
        F.col("total_revenue") == F.col("mx")
    )
    return top.join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


def q_tpch_q17(spark, sf):
    """TPC-H Q17 (small-quantity-order revenue): the correlated per-part
    average subquery is decorrelated into a groupBy-on-partkey aggregate
    joined back to lineitem — the standard Spark rewrite; the brand filter
    broadcasts. (Adapted: testdata part has no p_container, so the filter
    is brand-only.)"""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q_tpch_q2(spark, sf):
    """TPC-H Q2 (minimum-cost supplier): for each size-15 STANDARD part, the
    EUROPE supplier(s) with the minimum account balance among those that
    shipped it. (Adapted: testdata has no partsupp — supplier-part pairs
    derive from lineitem, min s_acctbal stands in for min ps_supplycost.)
    The correlated min decorrelates to a groupBy + join-back on identical
    double values (no arithmetic, so cross-engine equality is exact); all
    dims broadcast; top-100 stable LIMIT."""
    pairs = (
        _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    s_eur = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = pairs.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(s_eur), F.col("l_suppkey") == F.col("s_suppkey"))
    minb = j.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        j.join(
            minb,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


def q_tpch_q4(spark, sf):
    """TPC-H Q4 (order priority checking): the EXISTS subquery decorrelates
    to a left-semi join whose non-equi late-shipment condition evaluates
    inside the hash join. (Adapted: no commit/receipt dates in testdata, so
    'late' = shipped after the order date.)"""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q8(spark, sf):
    """TPC-H Q8 (national market share): NATION_5's share of AMERICA-region
    revenue on PROMO parts per order year. Every dimension broadcasts; the
    two fact tables shuffle once on orderkey; numerator and denominator
    come out of one aggregate pass."""
    p = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf, "customer")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = _t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = _t(spark, sf, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


def q_tpch_q9(spark, sf):
    """TPC-H Q9 (product type profit): profit per supplier nation and order
    year over 'gear' parts. (Adapted: no partsupp — supply cost proxied at
    10% of p_retailprice; part names are '<adj> <noun>' so the name filter
    is '%gear%'.) part/supplier/nation broadcast; lineitem-orders is the
    one big shuffle."""
    p = _t(spark, sf, "part").filter(F.col("p_name").contains("gear"))
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def q_tpch_q11(spark, sf):
    """TPC-H Q11 (important stock): per-part shipped value for NATION_3
    suppliers, kept when above 1/10,000 of the total. (Adapted: no partsupp
    — value = sum(extendedprice * quantity) of that nation's lines.) The
    scalar total is a 1-row aggregate cross-joined back (broadcast), NOT a
    global window — no single-partition stage at scale."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    sn = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    val = (
        li.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value_raw"))
    )
    total = val.agg(F.sum("value_raw").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_raw") > F.lit(0.0001) * F.col("total_value"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("value_raw", 2).alias("value"),
        )
    )


def q_tpch_q12(spark, sf):
    """TPC-H Q12 (shipping priority classes): late 1996 lines joined to
    their orders, conditional high/low-priority counts per line status.
    (Adapted: no shipmode/receiptdate — 'late' = shipped >30 days after the
    order date, groups by l_linestatus.)"""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q16(spark, sf):
    """TPC-H Q16 (part/supplier relationship): distinct shipping suppliers
    per (brand, type, size) bucket, excluding negative-balance suppliers
    (the 'complaints' NOT IN analog, a broadcast anti-join) and one brand.
    Supplier-part pairs derive from lineitem (no partsupp in testdata)."""
    li = _t(spark, sf, "lineitem")
    bad = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q19(spark, sf):
    """TPC-H Q19 (discounted revenue): a disjunction of three brand/size/
    quantity conjunctions evaluated inside one broadcast hash join; the
    shared quantity bound (l_quantity <= 30) pushes to the lineitem scan.
    One aggregate row out."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") <= 30)
    p = _t(spark, sf, "part")
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch1 | branch2 | branch3)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q20(spark, sf):
    """TPC-H Q20 (potential part promotion): suppliers whose 1996 shipped
    quantity of 'red' parts exceeds 1.3x the per-supplier average — a
    two-level aggregate with the scalar average broadcast back into the
    filter. (Adapted: no partsupp availqty, so the threshold is relative.)"""
    red = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = _t(spark, sf, "supplier")
    per_supp = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
    )
    avg1 = per_supp.agg(F.avg("red_qty").alias("avg_qty"))
    return (
        per_supp.crossJoin(F.broadcast(avg1))
        .filter(F.col("red_qty") > F.lit(1.3) * F.col("avg_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("red_qty", 2).alias("red_qty_r"))
    )


def q_tpch_q21(spark, sf):
    """TPC-H Q21 (suppliers who kept orders waiting): late lines of NATION_1
    suppliers on finished orders where another supplier contributed a line
    (EXISTS -> left-semi self-join) but no other supplier was late (NOT
    EXISTS -> left-anti self-join). lineitem self-joins twice on orderkey —
    both sides pre-filtered before the shuffle. (Adapted: 'late' = shipped
    >45 days after order date.)"""
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lf = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = lf.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    ).select("l_orderkey", "l_suppkey")
    n1 = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    s1 = (
        _t(spark, sf, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(F.broadcast(s1), F.col("l_suppkey") == F.col("s_suppkey"))
    all_f = lf.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late2 = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    return (
        l1.join(
            all_f,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late2,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q_tpch_q22(spark, sf):
    """TPC-H Q22 (global sales opportunity): above-average-balance customers
    from seven nations with no large orders, counted per nation. The
    scalar average is a 1-row broadcast; the no-orders test is a left-anti
    join. (Adapted: cntrycode = c_nationkey — testdata has no phone — and
    'no orders' becomes 'no orders over 300k': every testdata customer has
    at least one order, so the literal anti-join would gate on an empty
    result.)"""
    c = _t(spark, sf, "customer")
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_custkey")
    )
    avg1 = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = (
        c.filter(F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
        .crossJoin(F.broadcast(avg1))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_j2_semi_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1997-01-01", "1997-12-31 23:59:59")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_j3_anti_join(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 150000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


def q_j4_outer_join_counts(spark, sf):
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# W: window functions (§2.5)


def q_w1_topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_w2_running_sum(spark, sf):
    ev = _t(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 3).alias("running_value"),
    )


def q_w3_lag_delta(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 3).alias("delta"),
    )


def q_w4_dense_rank(spark, sf):
    p = _t(spark, sf, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_partkey", "p_brand", F.dense_rank().over(w).alias("price_rank")
    )


# ---------------------------------------------------------------------------
# SET: set operations (§2.7)


def q_set1_union(spark, sf):
    c = _t(spark, sf, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    return a.union(b).distinct()


def q_set2_intersect(spark, sf):
    o = _t(spark, sf, "orders")
    y96 = o.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31 23:59:59")).select("o_custkey")
    y97 = o.filter(F.col("o_orderdate").between("1997-01-01", "1997-12-31 23:59:59")).select("o_custkey")
    return y96.intersect(y97)


def q_set3_except(spark, sf):
    o = _t(spark, sf, "orders")
    y96 = o.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31 23:59:59")).select("o_custkey")
    y97 = o.filter(F.col("o_orderdate").between("1997-01-01", "1997-12-31 23:59:59")).select("o_custkey")
    return y96.subtract(y97)  # EXCEPT (set semantics), not EXCEPT ALL


# ---------------------------------------------------------------------------
# F: scalar/JSON functions (§2.8 — blob expansion analog)


def q_f1_json_expansion(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# F2+: scalar string/date/conditional functions (§2.8 — the superset tier)


def q_f2_string_funcs(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.levenshtein("p_type", F.lit("ECONOMY")).alias("type_edit_dist"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


def q_f3_date_funcs(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since_epoch_start"),
    )


def q_f4_conditional(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("RESIDENTIAL")).alias(
            "segment_or_residential"
        ),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.round(F.abs("c_acctbal"), 2).alias("bal_abs"),
    )


def q_f5_array_agg(spark, sf):
    """Array aggregation: per customer the sorted list of order keys (array
    columns cross-checked between engines via canonical sorted order)."""
    o = _t(spark, sf, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("__keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # serialize the array to a canonical string: list-typed cells are the one
    # place engine drivers canonicalize differently
    return agg.select(
        "o_custkey",
        F.concat_ws(",", F.transform(F.col("__keys"), lambda x: x.cast("string"))).alias(
            "order_keys"
        ),
        "n_orders",
    )


def q_skew_salted_agg(spark, sf):
    """Two-stage salted aggregation (operators/skew.salted_agg_sum): the
    hot-key fix for skewed groupBys — (key, salt) partials, then key
    finals, two uniform shuffles instead of one skewed one. Gated on an
    INTEGER sum (n_chars): integer addition is order-independent, so the
    salted result must equal the plain GROUP BY bit-for-bit regardless of
    how the salt splits rows (a double sum would drift at the ulp level).
    Salt is a deterministic hash of doc_id, never rand()."""
    from vastdb_sdk_spark.operators.skew import salted_agg_sum

    d = _t(spark, sf, "documents")
    out = salted_agg_sum(
        d, ["lang"], ["n_chars"], num_salts=16, salt_from=["doc_id"]
    )
    return out.select("lang", "sum_n_chars", "n_rows")


def q_skew_salted_join(spark, sf):
    """Salted broadcast join (operators/skew.salted_join): the big side's
    salt spreads each hot key over num_salts tasks; the broadcast side is
    replicated across all salts. An inner equi-join must preserve exactly
    the unsalted join's rows — gated against the plain SQL join+GROUP BY.
    The dim side is derived in-plan (distinct event_type + its length) so
    the gate needs no extra table."""
    from vastdb_sdk_spark.operators.skew import salted_join

    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("type_len", F.length("event_type").cast("long"))
    )
    joined = salted_join(
        ev, dim, on="event_type", num_salts=8, salt_from=["event_id"]
    )
    return joined.groupBy("event_type", "type_len").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_a7_approx_distinct(spark, sf):
    """approx_count_distinct (HLL++), gated deterministically: the sketch
    estimate is engine-specific by construction, so the output is the exact
    count plus a boolean 'estimate within 5% of exact' — the oracle computes
    the exact count and asserts the flag TRUE. A wrong sketch (or a >5%
    drift) flips the flag and fails the hash."""
    o = _t(spark, sf, "orders")
    # r14: two-level aggregation. Mixing countDistinct with
    # approx_count_distinct in ONE agg makes Catalyst's distinct rewrite
    # carry the partial HLL++ sketch buffer (400+ longs, ~3 KB) through
    # EVERY (status, custkey) group of the first-level aggregate — a
    # ~300 MB shuffle at sf0.1 for a 3-row result. Deduplicate the pairs
    # first (narrow shuffle), then count + sketch over the distinct
    # pairs: HLL++ registers are a max over hashed values, so inserting
    # each custkey once yields the IDENTICAL estimate (set semantics).
    dedup = o.select("o_orderstatus", "o_custkey").distinct()
    agg = dedup.groupBy("o_orderstatus").agg(
        # count(col) skips NULLs — same semantics as countDistinct over
        # the raw rows (and as the oracle's COUNT(DISTINCT o_custkey))
        F.count("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx"),
    )
    return agg.select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("__approx") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("within_tol"),
    )


def q_a6_cube(spark, sf):
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_w5_first_last(spark, sf):
    o = _t(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


def q_a8_grouping_sets(spark, sf):
    """GROUPING SETS — the generalization rollup/cube (a4/a6) specialize;
    one shuffle, Expand node feeds all three grouping shapes."""
    o = _t(spark, sf, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_a9_percentiles(spark, sf):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price"),
    )


def q_a10_approx_percentile(spark, sf):
    """approx_percentile (Greenwald-Khanna sketch), gated like a7: the
    sketch value is engine-specific, so the output is the exact
    interpolated percentile plus a boolean 'sketch within 5% of exact'
    per group — the oracle computes the exact quantile and asserts the
    flag. A sketch drift beyond tolerance flips the flag and fails the
    hash."""
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_exact"),
        F.approx_percentile(
            "l_extendedprice", F.lit(0.9), F.lit(1000)
        ).alias("__p90_sketch"),
    )
    return agg.select(
        "l_returnflag",
        "p90_exact",
        (
            F.abs(F.col("__p90_sketch") - F.col("p90_exact"))
            <= 0.05 * F.abs(F.col("p90_exact"))
        ).alias("within_tol"),
    )


def q_f6_levenshtein(spark, sf):
    """Edit-distance scalar (fuzzy matching primitive for entity
    resolution; same algorithm both engines)."""
    c = _t(spark, sf, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000042")).alias("dist"),
    )


def q_w8_attribution_join(spark, sf):
    """Batch twin of streaming/join.attribution_join (watermarked
    stream-stream self-join): view -> purchase pairs per user within 30
    minutes. The same function powers the streaming path; the oracle is a
    plain interval self-join."""
    from vastdb_sdk_spark.streaming.join import attribution_join

    ev = _t(spark, sf, "events")
    return attribution_join(ev, "view", "purchase", within="30 minutes").select(
        "user_id", "first_event_id", "then_event_id"
    )


def q_w7_event_time_window(spark, sf):
    """Tumbling event-time window aggregation (the batch twin of the
    streaming windowed_counts operator). Window start computed as integer
    micros floored to the hour — timezone-free on both engines."""
    ev = _t(spark, sf, "events")
    hour_us = 3_600_000_000
    ws = F.expr(f"(ts div {hour_us}) * {hour_us}")  # exact integer division
    return ev.groupBy(ws.alias("window_start_us"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_w6_ntile(spark, sf):
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey", "o_orderpriority", F.ntile(4).over(w).alias("price_quartile")
    )


# ---------------------------------------------------------------------------
# O5/ANN: vector search (§2.6 O5) + similarity extensions


def _query_vec(spark, sf, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf, "embeddings").filter(F.col("vec_id") == vec_id).select("embedding").head()
    )
    return [float(x) for x in row[0]]


def _planted_ann_corpus(spark, sf):
    """Shared planted-oracle fixture for the approximate-NN gates
    (round-9 conversion from self-certifying recall booleans): the query
    is vec 0 shifted +0.5 on coordinate 0, and the corpus is embeddings
    UNION ten rows at ids -(i+1) whose only difference from the query is
    a further +0.01*(i+1) on coordinate 0. Measured margins at sf0.01
    AND sf0.1: planted l2sq <= 0.01 vs organic minimum 0.25 (25x);
    planted cosine >= 0.9971 vs organic maximum 0.899. So for BOTH
    metrics the true top-10 is exactly -1..-10 in that rank order, and
    any indexed search at healthy probe settings must reproduce it.
    Returns (corpus_df, query_vec)."""
    base = _query_vec(spark, sf, 0)
    vec = list(base)
    vec[0] += 0.5
    rows = [
        (-(i + 1), [float(vec[0] + 0.01 * (i + 1))] + [float(x) for x in vec[1:]])
        for i in range(10)
    ]
    # literal plan, not a createDataFrame LogicalRDD: the RDD-backed frame
    # costs ~0.3 s of Python-RDD scan per ACTION for ten rows (r14
    # measurement), paid by every ann_* gate that unions this fixture
    from vastdb_sdk_spark.localrel import local_df

    planted = local_df(spark, rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    corpus = (
        _t(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .unionByName(planted)
    )
    return corpus, vec


def _ranked_planted_ids(topk_df, dist_col: str):
    """(rank, vec_id) rows from a top-k result, ranked by ascending
    distance (ties on id — matching every topk operator's own order).
    The window spans k=10 rows, so the single-partition sort is free."""
    from pyspark.sql import Window as W

    w = W.orderBy(F.col(dist_col).asc(), F.col("vec_id").asc())
    return topk_df.select(
        F.row_number().over(w).alias("rank"), "vec_id"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_o5_vector_topk_l2(spark, sf):
    vec = _query_vec(spark, sf, 0)
    emb = _t(spark, sf, "embeddings")
    qv = F.array(*[F.lit(v) for v in vec])
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            qv,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("dist_sq", d2)
        .orderBy(F.col("dist_sq").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("dist_sq", 4).alias("dist_sq_r"))
        .drop("dist_sq")
    )


def q_ann_cosine_topk(spark, sf):
    vec = _query_vec(spark, sf, 0)
    emb = _t(spark, sf, "embeddings")
    qv = F.array(*[F.lit(v) for v in vec])
    e = F.col("embedding")
    cos = _dot(e, qv) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(qv, qv)))
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("cos_sim", cos)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("cos_sim", 4).alias("cos_sim_r"))
    )


# ---------------------------------------------------------------------------
# DD: deduplication (beyond-parity, BASELINE.json north star)


def q_tx_html_strip(spark, sf):
    """HTML-to-text extraction (functions/text.strip_html — the markup
    removal stage of web curation; RE2-common regexp chain single-
    sourced into the oracle): docs are wrapped in DETERMINISTIC markup —
    tags, attributes, a comment, a script block whose body must vanish
    WHOLE, and entity escapes — and the stripped text plus its length
    must match the oracle byte-for-byte. Zero shuffle, zero Python."""
    from vastdb_sdk_spark.functions.text import strip_html

    d = _t(spark, sf, "documents")
    i = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<!-- header --><div class="a"><h1>Doc &amp; '),
        i,
        F.lit("</h1><script>var x = 1 < 2;</script><p>"),
        F.col("text"),
        F.lit("</p><style>p { color: red }</style>&nbsp;tail&lt;"),
        i,
        F.lit("&gt;</div>"),
    )
    clean = strip_html(html)
    return d.select(
        "doc_id", clean.alias("clean"), F.length(clean).alias("n_chars")
    )


def q_tx_url_canon(spark, sf):
    """URL canonicalization (functions/text.canonical_url — the URL-dedup
    key of CommonCrawl-style pipelines; patterns RE2-common and
    single-sourced into the oracle, the scrub.py discipline): docs are
    augmented with DETERMINISTIC messy URL variants — scheme/case/www/
    default-port/tracking-param/fragment noise by doc_id % 4, plus a
    non-URL — and the canonical form must collapse variants 0 and 1 to
    the same key, strip :80 and the trailing slash on variant 2, and
    map the non-URL to NULL. Pure codegen'd regexps, zero shuffle."""
    from vastdb_sdk_spark.functions.text import canonical_url

    d = _t(spark, sf, "documents")
    i = F.col("doc_id").cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM:443/Docs/"), i,
                F.lit("/?utm_source=x&id="), i, F.lit("&utm_campaign=y#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://example.com/Docs/"), i, F.lit("?id="), i),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://Example.com:80/Docs/"), i, F.lit("/")),
        )
        .otherwise(F.concat(F.lit("not a url "), i))
    )
    return d.select("doc_id", canonical_url(url).alias("canonical"))


def q_ann_matryoshka_topk(spark, sf):
    """Matryoshka truncated-dimension search funnel (operators/
    similarity.matryoshka_topk — Kusupati et al. 2022: the first d'
    dims of an MRL embedding are themselves an embedding, so the
    shortlist scan reads d'/d of the vector bytes): cosine over the
    first 16 of 64 dims -> TakeOrdered(100) -> exact full-dim re-rank
    -> top-10. No joins, no Python, no index build; the oracle replays
    both stages with DuckDB list slicing and must match id-for-id AND
    on both rounded cosines."""
    from vastdb_sdk_spark.operators.similarity import matryoshka_topk

    vec = _query_vec(spark, sf, 3)
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 3)
    out = matryoshka_topk(emb, vec, k=10, dims=16, shortlist=100)
    return out.select(
        "vec_id",
        F.round("cos_trunc", 4).alias("cos_trunc"),
        F.round("cos_full", 4).alias("cos_full"),
    )


def q_dd_exact(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def q_dd_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    fp = F.substring(F.md5(F.concat_ws(" ", _tokens(F.col("text")))), 1, 16)
    return d.select("doc_id", fp.alias("fingerprint"))


def q_dd_minhash_sig(spark, sf):
    """MinHash signature (4 universal-hash permutations of a single md5 base
    per 3-token shingle) + LSH band key — one md5 per shingle regardless of
    signature width (operators/dedup.py)."""
    from vastdb_sdk_spark.operators.dedup import minhash_signatures

    d = _t(spark, sf, "documents")
    sigs = minhash_signatures(d, num_hashes=4, shingle_k=3, hash_fn="md5")
    mh = [F.element_at("minhash_sig", i + 1).alias(f"mh{i}") for i in range(4)]
    out = sigs.select("doc_id", *mh)
    band_src = F.concat_ws(
        "|", *[F.col(f"mh{i}").cast("string") for i in range(4)]
    )
    return out.select(
        "doc_id", "mh0", "mh1", "mh2", "mh3",
        F.substring(F.md5(band_src), 1, 16).alias("lsh_band"),
    )


def q_dd_ngram_overlap(spark, sf):
    """Near-dup candidates by shared 8-char-gram count between documents of
    the same source (inverted gram index, same-source blocking; pairs
    emitted per bucket — the shuffle carries the gram stream ONCE).

    The input repartition spreads the ~2000x gram EXPLODE across cores:
    the bench parquet is a single split, so without it each self-join side
    scans+explodes ~10M gram rows in ONE task (measured 20.6s isolated,
    every pre-join stage at 1/1 tasks; 3.5s repartitioned). At production
    scale parquet splits provide this parallelism natively; the
    repartition costs one shuffle of the raw docs."""
    par = spark.sparkContext.defaultParallelism
    d = (
        _t(spark, sf, "documents")
        .select("doc_id", "source", "text")
        .repartition(par)
    )
    lowered = F.lower(F.col("text"))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lowered) - 7, F.lit(1))),
            lambda i: F.substring(lowered, i, 8),
        )
    )
    # Inverted-index pair generation (r15; guide §2.3/§2.4): the old
    # shape localCheckpointed the exploded gram stream and SELF-JOINED it
    # on (gram, source) — the ~10M-row stream crossed the exchange TWICE
    # (once per join side) before the per-bucket pair fan-out. A
    # prefix-filter (PPJoin) cannot prune here: the threshold (40 shared
    # grams) is tiny relative to per-doc gram counts (~2000), so every
    # pair sharing one gram must be examined either way. What CAN shrink
    # is the shuffle: group the stream ONCE per (source, gram), drop
    # single-doc buckets for free, and emit each bucket's ordered id
    # pairs map-side — one corpus-sized exchange instead of two, no
    # eager materialization, and the pair aggregate gets map-side
    # partial aggregation. Bucket pair volume is IDENTICAL to the join's
    # (sorted ids, a < b), so shared-gram counts are unchanged.
    g = d.select("doc_id", "source", F.explode(grams).alias("gram"))
    buckets = (
        g.groupBy("source", "gram")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(combos).alias("pr"))
        .groupBy(F.col("pr.a").alias("doc_a"), F.col("pr.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= 40)
    )
    return pairs


# ---------------------------------------------------------------------------
# TX: text analysis (beyond-parity)


def q_tx_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def q_tx_quality(spark, sf):
    d = _t(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    stripped = F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", "")
    punct_ratio = F.length(stripped) / F.greatest(F.length("text"), F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(["the", "and", "of", "to", "in"])))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    stop_score = F.least(stop_ratio * 5, F.lit(1.0))
    return d.select(
        "doc_id",
        F.round((len_score + punct_score + stop_score) / 3, 4).alias("quality"),
    )


def q_tx_langid(spark, sf):
    """Marker-token language ID: en vs de vs 'und'; same CASE logic as the
    SQL oracle."""
    d = _t(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    en_hits = F.size(F.filter(toks, lambda t: t.isin(["the", "and", "of", "to", "in"])))
    de_hits = F.size(F.filter(toks, lambda t: t.isin(["der", "die", "und", "ist", "nicht"])))
    pred = (
        F.when((en_hits == 0) & (de_hits == 0), "und")
        .when(de_hits > en_hits, "de")
        .otherwise("en")
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


# ---------------------------------------------------------------------------
# DS: dataset assembly — deterministic sampling / splitting / packing
# (operators/sampling.py; beyond-parity north star)


def q_ds_stratified_sample(spark, sf):
    """Stratified deterministic sampling: keep 30% of 'en' docs and 60% of
    every other language, membership decided by a Knuth multiplicative hash
    of doc_id (operators/sampling.stratified_sample) — reproducible across
    runs, partitionings, and engines; no rand()."""
    from vastdb_sdk_spark.operators.sampling import stratified_sample

    d = _t(spark, sf, "documents")
    out = stratified_sample(d, "doc_id", "lang", {"en": 0.3}, default_fraction=0.6)
    return out.select("doc_id", "lang", "source")


def q_ds_train_test_split(spark, sf):
    """Hash-based train/test split + per-split stats
    (operators/sampling.train_test_split): membership is a pure function of
    doc_id, so growing the corpus can never migrate a test doc into train —
    the leakage-prevention property a versioned pretraining set needs."""
    from vastdb_sdk_spark.operators.sampling import train_test_split

    d = _t(spark, sf, "documents")
    out = train_test_split(d, "doc_id", test_fraction=0.1)
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def q_ds_resample_mix(spark, sf):
    """Weighted domain resampling (operators/sampling.resample_to_mix):
    undersample languages to a target 40/20/20/20 en/de/zh/fr mix ('es' is
    dropped), keeping the binding stratum whole. Membership is the same
    engine-reproducible Knuth hash as the other sampling gates; the
    per-stratum thresholds are computed declaratively (aggregate broadcast
    back, no driver collect), and the oracle recomputes them in SQL from
    the same double arithmetic."""
    from vastdb_sdk_spark.operators.sampling import resample_to_mix

    d = _t(spark, sf, "documents")
    out = resample_to_mix(
        d, "doc_id", "lang", {"en": 0.4, "de": 0.2, "zh": 0.2, "fr": 0.2}
    )
    return out.select("doc_id", "lang")


def q_tx_pii_scrub(spark, sf):
    """PII detection + redaction (functions/scrub): the corpus carries no
    real PII, so deterministic PII is injected per doc (email/URL/IPv4/
    phone built from doc_id, plus a second email on every third doc), then
    counted and scrubbed. The patterns live in the restricted Java/RE2-
    common regex subset, so DuckDB reproduces both the counts and the
    redacted text byte-for-byte — scrub_sql()/count_sql() are generated
    from the SAME pattern table the Spark expressions use."""
    from vastdb_sdk_spark.functions.scrub import (
        PII_PATTERNS,
        pii_count,
        scrub_pii,
    )

    d = _t(spark, sf, "documents")
    ds = F.col("doc_id").cast("string")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), ds, F.lit("@example.com via"),
        F.lit(" https://data.example.org/doc/"), ds,
        F.lit(" or +1-555-"), F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0."), (F.pmod(F.col("doc_id"), F.lit(254)) + 1).cast("string"), F.lit(" ."),
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(" cc admin@corp.io")).otherwise(F.lit("")),
    )
    staged = d.select("doc_id", aug.alias("__aug"))
    return staged.select(
        "doc_id",
        scrub_pii(F.col("__aug")).alias("scrubbed"),
        *[
            pii_count(F.col("__aug"), k).cast("long").alias(f"n_{k}")
            for k in PII_PATTERNS
        ],
    )


def q_dd_contamination(spark, sf):
    """Train/eval n-gram contamination (operators/contamination.
    ngram_contamination): eval set = every 97th doc, train = the rest;
    a train doc is contaminated when it shares a word 8-gram with an eval
    doc. The eval side's distinct grams are broadcast, so the corpus probe
    is a map-side hash join — the GPT-3-style decontamination shape that
    survives 100 TB.

    The synthetic corpus has no natural 8-gram overlap, so contamination
    is PLANTED (same device as the embedding twins): every eval doc gets a
    train-side twin (id + 5M) that embeds its full text behind a prefix.
    The gate's expected output is exactly one pair per eval doc whose
    n_shared equals that doc's distinct-8-gram count — a recall loss
    (missed plant) or precision loss (phantom pair) fails the hash.
    Output: (train_id, eval_id, n_shared)."""
    from vastdb_sdk_spark.operators.contamination import ngram_contamination

    d = _t(spark, sf, "documents").select("doc_id", "text")
    ev = d.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    planted = ev.select(
        (F.col("doc_id") + F.lit(5_000_000)).alias("doc_id"),
        F.concat(F.lit("copied fragment "), F.col("text")).alias("text"),
    )
    tr = d.filter(F.pmod(F.col("doc_id"), F.lit(97)) != 0).unionByName(planted)
    return ngram_contamination(tr, ev, n=8)


def q_tx_pack_greedy(spark, sf):
    """Context-window packing (operators/sampling.pack_greedy): documents
    packed into 512-token bins per language by prefix token count — one
    range shuffle on (lang, doc_id), no UDF. Output = per-bin occupancy."""
    from vastdb_sdk_spark.operators.sampling import pack_greedy

    d = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.size(_tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_greedy(d, "n_tokens", budget=512, stratum_col="lang")
    return packed.groupBy("lang", "pack_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


def q_tx_bigram_topk(spark, sf):
    """Vocabulary mining: corpus-wide top-50 token bigrams. POSITIONS are
    exploded (a cheap integer sequence), and each bigram is built per row
    post-explode — Spark's Generate re-evaluates its child per OUTPUT
    row, so exploding a pre-built bigram array costs O(n_tokens^2)
    expression work per doc (the pathology passage_dup_stats documents).
    One shuffle on the bigram key; top-k with a unique tie-break."""
    d = _t(spark, sf, "documents")
    staged = d.select(_tokens(F.col("text")).alias("__tk")).filter(
        F.size("__tk") >= 2
    )
    pos = staged.select(
        "__tk",
        F.explode(F.sequence(F.lit(1), F.size("__tk") - 1)).alias("__p"),
    )
    bigram = F.concat_ws(
        " ",
        F.element_at(F.col("__tk"), F.col("__p")),
        F.element_at(F.col("__tk"), F.col("__p") + 1),
    )
    return (
        pos.select(bigram.alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# MM: multimodal metadata plumbing (decode itself is stubbed; see
# vastdb_sdk_spark/operators/multimodal.py for the mapInPandas pipeline)


def q_mm_blob_meta(spark, sf):
    d = _t(spark, sf, "documents")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        (F.lit(64) + F.col("n_chars") % 64).cast("int").alias("fake_width"),
        (F.lit(64) + (F.col("n_chars") * 7) % 64).cast("int").alias("fake_height"),
    )


def q_mm_frame_sample(spark, sf):
    """Video frame-sampling plan (operators/multimodal.frame_sample_plan):
    one row per (media_id, frame_ts_ms) at a 1000 ms stride, derived from
    metadata duration — pure JVM sequence/explode, no decode, no Python.
    Media metadata is synthesized deterministically from documents
    (duration = n_chars * 10 ms, docs with doc_id % 7 == 0 get duration 0
    to pin the empty-plan edge); the oracle replays it with DuckDB
    generate_series."""
    from vastdb_sdk_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0, F.lit(0))
            .otherwise(F.col("n_chars") * 10)
            .cast("long")
            .alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return frame_sample_plan(media, every_ms=1000)


# ---------------------------------------------------------------------------
# AS-OF join (custom operator Spark lacks; oracle: DuckDB's native ASOF JOIN)


def q_asof_last_purchase(spark, sf):
    """For each 'view' event, the value of the user's most recent 'purchase'
    at or before it — vastdb_sdk_spark.operators.asof.asof_join (union +
    last_value window: one shuffle, no nested-loop join)."""
    from vastdb_sdk_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "ts", "user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(views, purchases, on="ts", by="user_id", right_cols=["value"])
    return out.select(
        "event_id", "user_id", F.round("value", 6).alias("last_purchase_value")
    )


# ---------------------------------------------------------------------------
# SimHash (bit-string form so the 64-bit fingerprint is portable SQL)

def q_dd_simhash_fast(spark, sf):
    """Production SimHash path: xxhash64 token hashes (native 64-bit, no hex
    parsing), same packed-counter aggregation. The fingerprint VALUES are
    engine-specific (DuckDB has no xxhash64), so the gate asserts two
    structural invariants the oracle CAN check deterministically:

    - ``fp_consistent`` (per doc): every doc with the same exact text got
      the same fingerprint — per-text distinct-fingerprint count == 1.
      A nondeterministic or partitioning-sensitive aggregation breaks it.
      Texts are keyed by their xxhash64 digest so the shuffle key is 8
      bytes, never the document body (a 64-bit collision between two
      different texts is the only false-negative path — negligible and
      detectable, since it would flip the gate red, not silently green).
    - ``fp_diverse`` (corpus scalar, repeated per row): distinct
      fingerprints >= half of distinct texts — a degenerate fingerprint
      (constant, truncated, or sign-collapsed votes) breaks it. The slack
      is deliberate: SimHash maps near-duplicate texts to IDENTICAL
      fingerprints by design, so fp-partition == text-partition would be
      wrong; on this corpus the collision mass is far below 50%.

    Exact value semantics of the algorithm are pinned by the md5 twin
    dd_simhash."""
    from vastdb_sdk_spark.operators.dedup import simhash

    d = _t(spark, sf, "documents")
    fp = simhash(d, "text", "doc_id").join(
        d.select("doc_id", F.xxhash64("text").alias("td")), "doc_id"
    )
    # three consumers below (per-text agg, diversity agg, final join) —
    # persist the per-doc fingerprint frame so the tokenize+vote pipeline
    # runs once, the same checkpoint-before-fan-out any multi-consumer
    # reader of an expensive projection wants at scale
    fp = fp.persist()
    per_text = fp.groupBy("td").agg(
        F.countDistinct("simhash").alias("n_fp")
    )
    diversity = fp.agg(
        (
            F.countDistinct("simhash") * 2 >= F.countDistinct("td")
        ).alias("fp_diverse")
    )
    return (
        fp.join(per_text, "td")  # same shuffle key as the agg — no re-shuffle
        .select("doc_id", (F.col("n_fp") == 1).alias("fp_consistent"))
        .crossJoin(F.broadcast(diversity))
    )


def q_dd_lsh_pairs_fast(spark, sf):
    """Production MinHash-LSH near-dup path: xxhash64 shingle base + long
    band keys. Candidate generation differs from the md5 path, but the
    OUTPUT is candidates verified at exact Jaccard >= 0.9 — and on this
    corpus both hash families' banded LSH recall every >=0.9 pair, so the
    surviving pair sets are identical. Gated against the md5 path's DuckDB
    oracle: lost recall, broken band keys, or a verify bug in the fast
    path diverges the pair set and fails the hash."""
    from vastdb_sdk_spark.operators.dedup import minhash_dedup_pairs

    d = _t(spark, sf, "documents")
    return minhash_dedup_pairs(
        d, num_hashes=16, num_bands=4, threshold=0.9, shingle_k=3
    )


def q_dd_simhash(spark, sf):
    """64-bit SimHash as a bit string: per token md5, bit j votes +1/-1;
    fingerprint bit = sign of vote sum. Packed-counter aggregate (32 longs
    hold 64 one-counters) — see operators/dedup.simhash."""
    from vastdb_sdk_spark.operators.dedup import simhash

    fp = simhash(_t(spark, sf, "documents"), "text", "doc_id", hash_fn="md5")
    # bin() emits the two's-complement binary string (64 chars when the
    # sign bit is set, unpadded otherwise) — one expression node where a
    # per-bit when/concat chain was 64, a pure driver-planning-time win
    return fp.select(
        "doc_id", F.lpad(F.bin("simhash"), 64, "0").alias("simhash_bits")
    )


def q_sessionize_batch(spark, sf):
    """Gap-based sessionization (streaming/events.sessionize, built on
    Spark's session_window) run in batch mode — the SAME function the
    streaming tier uses, so the oracle pins the session semantics the
    stream inherits. Spark's session range is [start, last_event + gap):
    an event exactly gap later opens a NEW session, hence the oracle's
    lag-diff split condition is >= gap. Oracle = classic lag + cumulative-
    sum session reconstruction in SQL."""
    from vastdb_sdk_spark.streaming.events import sessionize

    ev = _t(spark, sf, "events")
    s = sessionize(ev, gap="10 minutes", watermark="1 hour")
    return s.select("user_id", "session_start", "session_end", "n_events")


def q_range_join_purchases(spark, sf):
    """Point-in-interval range join (operators/asof.range_join_bucketed):
    purchases falling within [view.ts, view.ts + 1h] for the same user.
    The interval explodes into 1h-wide buckets so the theta condition
    becomes an equi-join on bucket + residual filter — a hash join, never
    Spark's broadcast-nested-loop fallback for inequality joins. The
    oracle runs the plain theta join in DuckDB. Timestamps follow the
    engine's epoch-micros long convention."""
    from vastdb_sdk_spark.operators.asof import range_join_bucketed

    HOUR_US = 3_600_000_000
    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.lit(HOUR_US)).alias("end_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value"
    )
    joined = range_join_bucketed(
        purch, views,
        left_point="p_ts", right_start="start_ts", right_end="end_ts",
        bucket_width=HOUR_US,
        extra_on=lambda l, r: l["p_user"] == r["v_user"],
    )
    return joined.groupBy("view_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_dd_simhash_pairs(spark, sf):
    """SimHash near-pair search (operators/dedup.simhash_near_pairs): the
    pigeonhole block join — 64 bits split into max_hamming+1 = 4 blocks,
    any pair within the budget agrees on >=1 block, so the self-join key
    is a 16-bit block value, never a cross product. The corpus has no
    natural near-pairs, so twins are planted (every 50th doc duplicated at
    id + 1M -> hamming 0); the oracle computes ground truth by exact
    ALL-PAIRS hamming over its own md5-reproduced fingerprints — a recall
    loss in the block join (missed pair) or a phantom pair fails the
    hash. Fingerprint equality itself is pinned by dd_simhash."""
    from vastdb_sdk_spark.operators.dedup import simhash, simhash_near_pairs

    d = _t(spark, sf, "documents").select("doc_id", "text")
    twins = d.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    aug = d.unionByName(twins)
    fp = simhash(aug, "text", "doc_id", hash_fn="md5")
    return simhash_near_pairs(fp, max_hamming=3)


# ---------------------------------------------------------------------------
# multimodal decode stub through mapInPandas (oracle: same md5 arithmetic in
# SQL — proves the Python-side batch plumbing produces exactly the declared
# deterministic transform)


def q_mm_decode_stub(spark, sf):
    import hashlib

    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id", "text")

    def batches(it):
        for pdf in it:
            digests = pdf["text"].map(lambda s: hashlib.md5(s.encode("utf-8")).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fake_width": digests.map(lambda h: 64 + h[0] % 192),
                    "fake_height": digests.map(lambda h: 64 + h[1] % 192),
                    "luma_sum": digests.map(lambda h: sum(h[2:10])),
                }
            )

    return d.mapInPandas(
        batches,
        "doc_id LONG, fake_width INT, fake_height INT, luma_sum INT",
    )


# ---------------------------------------------------------------------------
# full near-dup pipelines with SQL oracles


def q_dd_lsh_pairs(spark, sf):
    """MinHash-LSH candidate pairs + exact Jaccard >= 0.9 (the scalable
    near-dup plan; operators/dedup.py)."""
    from vastdb_sdk_spark.operators.dedup import minhash_dedup_pairs

    d = _t(spark, sf, "documents")
    return minhash_dedup_pairs(
        d, num_hashes=16, num_bands=4, threshold=0.9, shingle_k=3, hash_fn="md5"
    )


def q_dd_embed_neardup(spark, sf):
    """LSH-bucketed embedding near-dup (operators/similarity.
    embedding_near_dup_pairs, banded random-hyperplane index): candidates
    come from an equi-join on (band_id, band_bits) — |bucket|^2 per bucket,
    never corpus^2 — then exact-cosine verification at threshold 0.95.

    The synthetic embeddings are near-orthogonal (max pairwise cosine
    ~0.51), so true near-duplicates are planted inside the query: every
    vector gets a twin with +1e-6 on coordinate 0 (cosine ~= 1 - 1e-14).
    The oracle reproduces the identical augmentation in SQL and computes
    the ground-truth pair set by exact all-pairs at sf0.01 — a recall or
    precision defect in the bucketed path (broken signature, band split,
    candidate dedup, or verify filter) changes the pair set and fails the
    hash. Output is the id pairs alone: the planted cosines sit at the
    double-rounding knife edge, so values stay out of the hash on purpose."""
    from vastdb_sdk_spark.operators.similarity import embedding_near_dup_pairs

    # Tuning notes (sf0.1, measured): persisting the augmented union is
    # SLOWER (4.9s -> 6.1s; materialization barrier + InMemoryRelation
    # breaks scan/transform codegen fusion), so the plan stays fully
    # pipelined.  Bucket sizing is ADAPTIVE (r12): target_bucket_rows=10
    # reproduces the hand-tuned 10-bit bands at sf0.1 (n=10k -> 1024
    # buckets) and GROWS the band bits with the corpus (n=100k -> 14-bit
    # bands) so the |bucket|^2 verify join — the decade-scaling hotspot,
    # 3.55x for 10x data at fixed bits — stays ~n * target_bucket_rows.
    # Twin recall is banding-independent: a cosine~1 pair flips a sign
    # bit only when a plane dot sits within 1e-6 of 0.
    import pyarrow.parquet as _pq

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    twins = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(1e-6)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    aug = emb.unionByName(twins)
    n_aug = 2 * _pq.ParquetFile(f"{sf}/embeddings.parquet").metadata.num_rows
    pairs = embedding_near_dup_pairs(
        aug, threshold=0.95, num_bands=2, dim=64,
        target_bucket_rows=10, n_rows=n_aug,
    )
    return pairs.select("id_a", "id_b")


# ---------------------------------------------------------------------------
# E: the engine itself under the oracle gate — these route through
# vastdb_sdk_spark's full path (bucket/schema/table catalog, zero-copy
# import, manifest scan, predicate DSL pushdown), not spark.read directly.


_ENGINE_WAREHOUSES: dict = {}


def _engine_table(spark, sf, table_name):
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    key = (sf, table_name)
    if key not in _ENGINE_WAREHOUSES:
        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_wh_"), spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, table_name, [f"{sf}/{table_name}.parquet"])
        _ENGINE_WAREHOUSES[key] = session
    session = _ENGINE_WAREHOUSES[key]
    tx = session.transaction()
    return tx.bucket("b").schema("s").table(table_name)
    # tx intentionally left open while the DataFrame is consumed


def _engine_sorted_table(spark, sf):
    """lineitem loaded into an engine table with sorting_key=l_shipdate and
    optimize()d — scans with shipdate ranges prune files from the manifest
    before Spark plans (the Elysium benefit, end-to-end)."""
    import tempfile

    import vastdb_sdk_spark as vastdb

    key = (sf, "__sorted_lineitem")
    if key not in _ENGINE_WAREHOUSES:
        import pyarrow.parquet as pq

        import vastdb_sdk_spark as vastdb

        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_whs_"), spark=spark)
        session.create_bucket("b")
        arrow_schema = pq.ParquetFile(f"{sf}/lineitem.parquet").schema_arrow
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table("li_sorted", arrow_schema, sorting_key=["l_shipdate"])
            t.import_files([f"{sf}/lineitem.parquet"])
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("li_sorted").optimize(
                target_file_rows=100_000
            )
        _ENGINE_WAREHOUSES[key] = session
    session = _ENGINE_WAREHOUSES[key]
    tx = session.transaction()
    return tx.bucket("b").schema("s").table("li_sorted")


def _engine_sorted_events(spark, sf):
    """Events in a sorted engine table (sorting_key = user_id, ts) — the
    analog of the reference perf bench's Elysium stock-bars table sorted on
    (sid, ts) (vastdb/bench/test_perf.py:24-59). optimize() globally
    range-sorts so the el1–el5 selective queries below (the reference's own
    5-query protocol mapped onto events) prune manifest files on the lead
    sort key before Spark plans."""
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb

    key = (sf, "__sorted_events")
    if key not in _ENGINE_WAREHOUSES:
        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_whe_"), spark=spark)
        session.create_bucket("b")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.int64()),  # micros-as-long (parquet TIMESTAMP(us))
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        with session.transaction() as tx:
            t = tx.bucket("b").create_schema("s").create_table(
                "events", schema, sorting_key=["user_id", "ts"]
            )
            t.insert_df(_t(spark, sf, "events"))
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("events").optimize(
                target_file_rows=12_500
            )
        _ENGINE_WAREHOUSES[key] = session
    tx = _ENGINE_WAREHOUSES[key].transaction()
    return tx.bucket("b").schema("s").table("events")


# ts stays a FILTER column only (these queries mirror the reference bench,
# which projects the payload columns; the engine sees ts as micros-long,
# the oracle as native TIMESTAMP)
_EL_COLS = ["event_id", "user_id", "value"]


def q_e12_engine_restore(spark, sf):
    """Restore closes the loop on time travel: import orders, run
    destructive DML (delete + update), then RESTORE to the pre-DML version
    — the final scan must be byte-identical to the pristine table, which is
    exactly what the oracle (plain SELECT) asserts."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_restore_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
    with session.transaction() as tx:
        v0 = tx.bucket("b").manifest.version
    session.execute_sql(
        "DELETE FROM b.s.orders WHERE o_orderstatus = 'O';"
        "UPDATE b.s.orders SET o_totalprice = 0.0 WHERE o_orderkey % 2 = 0"
    )
    session.execute_sql(f"RESTORE TABLE b.s.orders TO VERSION AS OF {v0}")
    return session.execute_sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM b.s.orders"
    )


def q_el1_sorted_point(spark, sf):
    """Reference bench query 1: point lookup on the lead sort key
    (`sid = 10033007` ≙ user_id = 7) — prunes to one file."""
    t = _engine_sorted_events(spark, sf)
    return t.select_df(columns=_EL_COLS, predicate=(t["user_id"] == 7))


def q_el2_sorted_ts_between(spark, sf):
    """Reference bench query 2: `ts BETWEEN` two timestamps (second sort
    key; integer-micros comparison, tz-free)."""
    t = _engine_sorted_events(spark, sf)
    lo = 1704844800000000  # 2024-01-10 00:00:00 UTC in micros
    hi = 1705017600000000  # 2024-01-12 00:00:00 UTC
    return t.select_df(
        columns=_EL_COLS, predicate=(t["ts"] >= lo) & (t["ts"] < hi)
    )


def q_el3_sorted_conjunction(spark, sf):
    """Reference bench query 3: sort-key equality AND non-key comparison
    (`bid_qty = 684000 AND ask_close > 1` ≙ user_id = 11 AND value > 1)."""
    t = _engine_sorted_events(spark, sf)
    return t.select_df(
        columns=_EL_COLS, predicate=(t["user_id"] == 11) & (t["value"] > 1.0)
    )


def q_el4_sorted_or_ranges(spark, sf):
    """Reference bench query 4: OR of two narrow BETWEEN ranges on a
    non-key column (`ask_open BETWEEN ... OR ask_open BETWEEN ...`)."""
    t = _engine_sorted_events(spark, sf)
    return t.select_df(
        columns=_EL_COLS,
        predicate=t["value"].between(437.4, 437.5)
        | t["value"].between(38.0, 38.1),
    )


def q_el5_sorted_isin(spark, sf):
    """Reference bench query 5: IN-list on a categorical column
    (`ticker IN ('BANR','KELYB')` ≙ event_type IN two values)."""
    t = _engine_sorted_events(spark, sf)
    return t.select_df(
        columns=_EL_COLS + ["event_type"],
        predicate=t["event_type"].isin(["click", "error"]),
    )


def q_e13_engine_zorder(spark, sf):
    """Z-order clustering: events rewritten on a Morton curve over
    (user_id, value), then a 2-D selective predicate — both dimensions
    prune files via manifest min/max stats (see
    tests/test_plans.py::test_zorder_prunes_every_dimension for the
    pruning assertion; here the gate checks the clustered table still
    answers exactly)."""
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb

    key = (sf, "__zorder_events")
    if key not in _ENGINE_WAREHOUSES:
        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_whz_"), spark=spark)
        session.create_bucket("b")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.int64()),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        with session.transaction() as tx:
            t = tx.bucket("b").create_schema("s").create_table("events", schema)
            t.insert_df(_t(spark, sf, "events"))
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("events").optimize(
                target_file_rows=1250, zorder=["user_id", "value"]
            )
        _ENGINE_WAREHOUSES[key] = session
    tx = _ENGINE_WAREHOUSES[key].transaction()
    t = tx.bucket("b").schema("s").table("events")
    return t.select_df(
        columns=_EL_COLS,
        predicate=t["user_id"].between(3, 5) & t["value"].between(100.0, 140.0),
    )


def q_e4_engine_dml(spark, sf):
    """Engine DML under the oracle gate: delete all 'F'-status orders by
    $row_id, zero out 1-URGENT totals via update, then scan. The oracle
    reproduces the end state with WHERE + CASE over the pristine table.

    NOTE — not the recommended pattern at scale: collecting $row_id to the
    driver mirrors the reference's client API shape (update/delete take
    client-supplied rowids, vastdb/table.py:779-843) and is exercised here
    for parity. At 100 TB use predicate DML — ``delete_where`` /
    ``update_where`` (table.py delete_where/update_where), fully
    distributed, no driver collect — gated by e8_engine_predicate_dml,
    which produces this exact same end state."""
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_dml_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
        # ids land on the driver as ARROW, not Row objects: same
        # client-rowid API shape, but .collect() materializes ~50k Row
        # objects (~0.8 s at sf0.1) where toArrow() is one columnar
        # transfer (guide §6 "Arrow for driver transfers")
        del_ids = (
            t.select_df(predicate=(D.o_orderstatus == "F"), internal_row_id=True)
            .select("$row_id")
            .toArrow()
            .column("$row_id")
        )
        t.delete(pa.table({"$row_id": del_ids.cast(pa.uint64())}))
        upd_ids = (
            t.select_df(
                predicate=(D.o_orderpriority == "1-URGENT"), internal_row_id=True
            )
            .select("$row_id")
            .toArrow()
            .column("$row_id")
        )
        t.update(
            pa.table(
                {
                    "$row_id": upd_ids.cast(pa.uint64()),
                    "o_totalprice": pa.array(
                        [-1.0] * len(upd_ids), pa.float64()
                    ),
                }
            )
        )
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("orders")
    return t.select_df(columns=["o_orderkey", "o_totalprice", "o_orderstatus"])


def q_e5_engine_projection(spark, sf):
    """Semi-sorted projection routing under the gate: a covering projection
    sorted by o_custkey serves the scan; results must equal the base table."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    key = (sf, "__proj_orders")
    if key not in _ENGINE_WAREHOUSES:
        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_proj_"), spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
            t.create_projection("by_cust", ["o_custkey"], ["o_totalprice"])
        _ENGINE_WAREHOUSES[key] = session
    tx = _ENGINE_WAREHOUSES[key].transaction()
    t = tx.bucket("b").schema("s").table("orders")
    return t.select_df(
        columns=["o_custkey", "o_totalprice"], predicate=(D.o_custkey < 500)
    )


def q_e6_engine_snapshot(spark, sf):
    """Snapshot time travel under the gate: snapshot the imported state,
    then delete everything from the live table — the snapshot still reads
    the pristine rows the oracle sees.

    NOTE — the id-collecting delete here is gate-sized reference parity
    (client-supplied rowids, vastdb/table.py:779-843); the scale path for
    "delete everything matching P" is ``delete_where`` (distributed, no
    driver collect) — see e8_engine_predicate_dml."""
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_snap_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "nation", [f"{sf}/nation.parquet"])
    with session.transaction() as tx:
        tx.bucket("b").create_snapshot("v1")
    with session.transaction() as tx:
        t = tx.bucket("b").schema("s").table("nation")
        ids = (
            t.select_df(internal_row_id=True)
            .select("$row_id")
            .toArrow()
            .column("$row_id")
        )
        t.delete(pa.table({"$row_id": ids.cast(pa.uint64())}))
    tx = session.transaction()
    assert tx.bucket("b").schema("s").table("nation").count_rows() == 0
    snap = tx.bucket("b").snapshot("v1")
    return snap.schema("s").table("nation").select_df()


def q_e7_engine_partitioned(spark, sf):
    """Hive-partitioned engine table: events ingested partitioned by
    event_type; a single-partition query prunes the other partitions from
    the manifest before Spark plans."""
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D

    key = (sf, "__part_events")
    if key not in _ENGINE_WAREHOUSES:
        session = vastdb.connect(tempfile.mkdtemp(prefix="entry_part_"), spark=spark)
        session.create_bucket("b")
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.int64()),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        with session.transaction() as tx:
            t = tx.bucket("b").create_schema("s").create_table(
                "events", schema, partition_by=["event_type"]
            )
            t.insert_df(_t(spark, sf, "events"))
        _ENGINE_WAREHOUSES[key] = session
    tx = _ENGINE_WAREHOUSES[key].transaction()
    t = tx.bucket("b").schema("s").table("events")
    return t.select_df(
        columns=["event_id", "user_id", "value"],
        predicate=(D.event_type == "purchase") & (D.value > 10.0),
    )


def q_ann_rhp_topk(spark, sf):
    """Approximate NN via random-hyperplane LSH (deterministic seed): the
    scale path for similarity search. THE ORACLE IS THE PLANTED ID LIST
    (round-9 conversion from the recall-boolean gate; see
    _planted_ann_corpus): planted cosine >= 0.9971 vs organic max 0.899,
    so the true top-10 is -1..-10 in rank order. The planted vectors sit
    within 0.1 of the query on one coordinate, so they share its bucket
    up to a couple of knife-edge plane flips — well inside the
    multiprobe_hamming=2 probe set; a recall regression in the bucket
    probe loses a planted row and fails the hash."""
    from vastdb_sdk_spark.operators.similarity import build_rhp_index, rhp_topk

    corpus, vec = _planted_ann_corpus(spark, sf)
    indexed, planes = build_rhp_index(corpus, num_planes=6, seed=42, dim=64)
    approx = rhp_topk(
        indexed, planes, vec, k=10, metric="cosine", multiprobe_hamming=2,
        id_col="vec_id",
    )
    return _ranked_planted_ids(approx, "distance")


def q_ann_ivf_topk(spark, sf):
    """Approximate NN via IVF (k-means coarse quantizer, seeded): probe the
    3 nearest centroids only. THE ORACLE IS THE PLANTED ID LIST (round-9
    conversion; see _planted_ann_corpus): planted l2sq <= 0.01 vs organic
    minimum 0.25, the planted rows sit essentially AT the query so they
    assign to its nearest centroid — always probed at any nprobe >= 1 —
    and the true top-10 is -1..-10 in rank order."""
    from vastdb_sdk_spark.operators.similarity import build_ivf_index, ivf_topk

    key = (sf, "__ivf_index_planted")
    if key not in _ENGINE_WAREHOUSES:
        corpus, vec = _planted_ann_corpus(spark, sf)
        indexed, centroids = build_ivf_index(corpus, num_centroids=16, seed=42)
        _ENGINE_WAREHOUSES[key] = (indexed.persist(), centroids, vec)
    indexed, centroids, vec = _ENGINE_WAREHOUSES[key]
    approx = ivf_topk(indexed, centroids, vec, k=10, nprobe=3, id_col="vec_id")
    return _ranked_planted_ids(approx, "distance")


def q_ann_ivf_knn_join(spark, sf):
    """Corpus x corpus approximate k-NN join (operators/similarity.
    ivf_knn_join): both sides large, so no broadcast of vectors — each left
    row probes its nprobe nearest centroids and the join is an equi-join on
    centroid_id, O(rows * nprobe) shuffle. THE ORACLE IS THE PLANTED
    NEIGHBOR LIST (round-9 planted conversion; the earlier SELECT TRUE
    booleans were self-certifying): each left row a < 10 gets FOUR
    bit-identical duplicate rows at ids -(4a+j+1) planted into the
    indexed corpus. A duplicate's cosine is exactly the self-pair's
    (same float bits, same arithmetic) ~1.0, measured organic maximum
    0.49 at sf0.01 / 0.45 at sf0.1 — so the true top-5 per left row is
    precisely {4 duplicates, self}, the probe MUST find them (identical
    vectors assign to the identical centroid, and nprobe=4 always
    includes the left vector's own argmin centroid), and the
    cos-desc/id-asc tie-break pins the exact output rows."""
    from vastdb_sdk_spark.operators.similarity import (
        build_ivf_index,
        ivf_knn_join,
    )

    key = (sf, "__ivf_index_dup")
    if key not in _ENGINE_WAREHOUSES:
        emb0 = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        dup = (
            emb0.filter(F.col("vec_id") < 10)
            .crossJoin(spark.range(4).select(F.col("id").alias("__j")))
            .select(
                (-(F.col("vec_id") * 4 + F.col("__j") + 1)).alias("vec_id"),
                "embedding",
            )
        )
        corpus = emb0.unionByName(dup)
        indexed, centroids = build_ivf_index(corpus, num_centroids=16, seed=42)
        _ENGINE_WAREHOUSES[key] = (indexed.persist(), centroids)
    indexed, centroids = _ENGINE_WAREHOUSES[key]
    left = (
        _t(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    )
    right = indexed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"),
        "centroid_id",
    )
    return ivf_knn_join(left, right, centroids, k=5, nprobe=4).select(
        "id_a", "id_b"
    )


def q_e8_engine_predicate_dml(spark, sf):
    """Predicate DML (the distributed, no-id-collection path): DELETE WHERE
    + UPDATE WHERE, then scan. Same end state as e4's row-id DML — both are
    checked against the same SQL reconstruction."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_pdml_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
        t.delete_where(D.o_orderstatus == "F")
        t.update_where(D.o_orderpriority == "1-URGENT", {"o_totalprice": -1.0})
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("orders")
    return t.select_df(columns=["o_orderkey", "o_totalprice", "o_orderstatus"])


def q_e9_engine_merge(spark, sf):
    """MERGE upsert (engine extension on the deletion-vector machinery):
    matched customers with negative balance get c_mktsegment='ADJUSTED'
    (DV-mask + replacement rows, no file rewrite); 100 synthetic customers
    insert via the not-matched branch. Oracle reconstructs with CASE +
    UNION ALL."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_merge_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = create_table_from_files(sc, "customer", [f"{sf}/customer.parquet"])
        upd_src = (
            t.select_df(columns=["c_custkey", "c_acctbal"])
            .filter(F.col("c_acctbal") < 0)
            .select("c_custkey", F.lit("ADJUSTED").alias("c_mktsegment"))
        )
        new_src = spark.range(100).select(
            (F.lit(9_000_000) + F.col("id")).cast("long").alias("c_custkey"),
            F.lit("SYNTH").alias("c_mktsegment"),
        )
        t.merge(upd_src.unionByName(new_src), on=["c_custkey"])
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("customer")
    return t.select_df(columns=["c_custkey", "c_mktsegment", "c_acctbal"])


def q_e10_sql_frontend(spark, sf):
    """Pure-SQL front-end (sqlfront.py): DDL + predicate DML + MERGE-free
    aggregate SELECT, all issued as SQL text. The reference reaches SQL via
    DuckDB/ADBC (vastdb/transaction.py:139-144); here the statement tier is
    native and rides the same DV machinery as e8, so the oracle is a CASE
    reconstruction over the original table."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_sql_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
        tx.execute_sql(
            "DELETE FROM b.s.orders WHERE o_orderstatus = 'P';"
            "UPDATE b.s.orders SET o_totalprice = o_totalprice * 2"
            " WHERE o_orderpriority = '1-URGENT'"
        )
    return session.execute_sql(
        "SELECT o_orderstatus, count(*) AS n_rows,"
        " round(sum(o_totalprice), 2) AS total"
        " FROM b.s.orders GROUP BY o_orderstatus"
    )


def q_e11_merge_conditional(spark, sf):
    """Column-level conditional MERGE through the SQL front-end: guarded
    UPDATE SET col = expr (alias-qualified refs to both join sides) and
    guarded INSERT (cols) VALUES (exprs). Arithmetic is exact-double
    (* 2, pass-throughs) so the oracle CASE reconstruction hash-matches
    without rounding."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_mergec_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "customer", [f"{sf}/customer.parquet"])
        tx.execute_sql(
            "MERGE INTO b.s.customer USING ("
            "  SELECT c_custkey, -c_acctbal AS boost"
            "  FROM b.s.customer WHERE c_acctbal < 0"
            "  UNION ALL"
            "  SELECT 9000000 + c_custkey AS c_custkey, 60.0 AS boost"
            "  FROM b.s.customer WHERE c_custkey <= 100"
            ") AS s ON customer.c_custkey = s.c_custkey"
            " WHEN MATCHED AND s.boost > 50"
            "  THEN UPDATE SET c_acctbal = customer.c_acctbal * 2"
            " WHEN NOT MATCHED AND s.c_custkey % 2 = 0"
            "  THEN INSERT (c_custkey, c_name, c_acctbal)"
            "  VALUES (s.c_custkey, concat('SYN#', CAST(s.c_custkey AS STRING)),"
            "          s.boost)"
        )
    return session.execute_sql(
        "SELECT c_custkey, c_acctbal, c_name FROM b.s.customer"
    )


def q_e3_engine_sorted_scan(spark, sf):
    """Range scan on the sorted (Elysium) engine table: the manifest prunes
    non-overlapping files by l_shipdate min/max, then parquet row-group
    stats prune inside the survivors."""
    t = _engine_sorted_table(spark, sf)
    return t.select_df(
        columns=["l_orderkey", "l_shipdate", "l_quantity"],
        predicate=(t["l_shipdate"] >= "1997-01-01") & (t["l_shipdate"] < "1997-03-01"),
    )


def q_e1_engine_scan(spark, sf):
    """Engine select(): projection + predicate-DSL pushdown over an imported
    table (reference select() semantics, Catalyst execution)."""
    t = _engine_table(spark, sf, "lineitem")
    return t.select_df(
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
        predicate=(t["l_quantity"] > 45) & (t["l_returnflag"] == "A"),
    )


def q_e2_engine_sql(spark, sf):
    """Engine SQL tier: tx.sql over a transaction-bound view."""
    t = _engine_table(spark, sf, "orders")
    return t.tx.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM ords
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """,
        ords=t,
    )


def q_tx_repetition(spark, sf):
    """Gopher-family intra-document repetition stats (functions/text.
    dup_ngram_fraction; Rae et al. 2021 §A1.1 "duplicate n-gram fraction"
    quality filters): per doc, the fraction of 2-gram and 3-gram
    occurrences that repeat an earlier occurrence. Pure array HOFs over a
    staged token column — zero shuffle, zero Python, one codegen'd map.
    Fractions ROUND(4) like tx_quality; exact gram counts ride along as
    ints so the hash pins the arithmetic, not just the rounding."""
    from vastdb_sdk_spark.functions.text import dup_ngram_fraction, shingles_from_tokens

    d = _t(spark, sf, "documents")
    staged = d.select("doc_id", _tokens(F.col("text")).alias("tk"))
    g2 = shingles_from_tokens(F.col("tk"), 2)
    return staged.select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        F.size(g2).alias("n_2grams"),
        F.size(F.array_distinct(g2)).alias("n_2grams_distinct"),
        F.round(dup_ngram_fraction(F.col("tk"), 2), 4).alias("dup_2gram_frac"),
        F.round(dup_ngram_fraction(F.col("tk"), 3), 4).alias("dup_3gram_frac"),
    )


def q_tx_chunk_windows(spark, sf):
    """Fixed-token-window chunking with overlap (operators/sampling.
    chunk_fixed_tokens — the context-window assembly step of a training/
    RAG pipeline): size=64, overlap=8 over every 5th doc. Chunk ids come
    from sequence+explode, the text from one array slice — per-row
    arithmetic only, zero shuffle; output volume is O(n_tokens/stride).
    The oracle rebuilds the identical chunks with DuckDB list slicing
    (both engines: 1-based, end-clamped)."""
    from vastdb_sdk_spark.operators.sampling import chunk_fixed_tokens

    d = _t(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    return chunk_fixed_tokens(d, text_col="text", size=64, overlap=8)


def q_dd_dup_clusters(spark, sf):
    """Connected components over an exact-duplicate pair list
    (operators/dedup.dup_clusters): twin CHAINS are planted (every 10th
    doc copied at +1M and +2M), md5-equality self-join yields the pair
    set, and the operator's iterative min-label propagation must label
    each 3-node component with its minimum doc_id. The oracle computes
    ground-truth components with a recursive CTE over the identical pair
    set — a propagation bug (missed round, wrong join side, bad
    convergence test) splits or mislabels a component and fails the hash.
    At scale the pair generation would be exact_duplicate_groups (one
    groupBy, no self-join); the self-join here keeps the oracle pair set
    bit-identical."""
    from vastdb_sdk_spark.operators.dedup import dup_clusters

    d = _t(spark, sf, "documents").select("doc_id", "text")
    tw = d.filter(F.col("doc_id") % 10 == 0)
    aug = (
        d.unionByName(
            tw.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
        )
        .unionByName(
            tw.select((F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"), "text")
        )
    )
    h = aug.select("doc_id", F.md5("text").alias("h"))
    pairs = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    return dup_clusters(pairs)


def q_ds_quality_filter(spark, sf):
    """Per-source percentile quality gate (operators/sampling.
    quality_percentile_filter): keep the top half of docs by quality score
    WITHIN each source — relative per-domain cutoffs, the pretraining
    filter shape that doesn't wipe out low-scoring domains wholesale.
    Ordering uses ROUND(quality, 4) + doc_id tiebreak so the boundary is
    engine-deterministic (raw doubles can differ at 1e-16 across engines;
    rounding makes near-ties explicit ties resolved by id). One window
    shuffle partitioned by source."""
    from vastdb_sdk_spark.operators.sampling import quality_percentile_filter

    d = q_tx_quality(spark, sf).join(
        _t(spark, sf, "documents").select("doc_id", "source"), "doc_id"
    )
    return quality_percentile_filter(
        d, F.col("quality"), keep_fraction=0.5, stratum_col="source"
    ).select("doc_id", "source", "quality")


def q_ann_quantize_int8(spark, sf):
    """Per-dimension symmetric int8 embedding quantization
    (operators/similarity.quantize_embeddings_int8): scale_d = corpus
    max(|x_d|), q = floor(127*x/scale + 0.5). The 4x-fewer-bytes storage/
    shuffle path for ANN at scale. Plan: one tiny aggregate broadcast back
    + a per-row zip_with — no collect, no second corpus scan. floor(x+.5)
    instead of round() because floor is bit-identical across engines; max
    is exact (no accumulation), so the scale array hashes identically.
    The quantized vector is emitted as a comma-joined string: the driver's
    canonicalizer sorts output frames in pandas, which cannot sort raw
    array columns — gate outputs must be scalar (pinned by
    tests/test_gate_registry.py::test_gate_outputs_are_scalar)."""
    from vastdb_sdk_spark.operators.similarity import quantize_embeddings_int8

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    return quantize_embeddings_int8(emb, dim=64).select(
        "vec_id",
        F.array_join(F.col("embedding_q8").cast("array<string>"), ",").alias(
            "q8_csv"
        ),
    )


def q_ann_pq_topk(spark, sf):
    """Product-quantization ANN with exact re-rank (operators/similarity.
    build_pq_index + pq_topk): 16 subspaces x <=256 codes cut vector bytes
    ~16x; search is ADC (per-subspace LUT rides a broadcast variable,
    distances are m lookups per row in Arrow-batched mapInPandas, plan
    size O(1) in codes/dim), shortlist of 50 re-ranked by exact L2 on the
    un-quantized column. THE ORACLE IS THE PLANTED ID LIST (round-9
    conversion; see _planted_ann_corpus): planted l2sq <= 0.01 vs
    organic minimum 0.25, so with the exact re-rank of the 50-row ADC
    shortlist the result must be -1..-10 in rank order — a shortlist
    miss or re-rank regression loses a planted row and fails the
    hash."""
    from vastdb_sdk_spark.operators.similarity import build_pq_index, pq_topk

    key = (sf, "__pq_index_planted")
    if key not in _ENGINE_WAREHOUSES:
        corpus, vec = _planted_ann_corpus(spark, sf)
        enc, books = build_pq_index(corpus, num_subspaces=16, num_codes=256, seed=42)
        _ENGINE_WAREHOUSES[key] = (enc.persist(), books, vec)
    enc, books, vec = _ENGINE_WAREHOUSES[key]
    approx = pq_topk(enc, books, vec, k=10, id_col="vec_id", rerank=50)
    return _ranked_planted_ids(approx, "adc_dist")


def q_ann_ivfpq_topk(spark, sf):
    """IVF-PQ search (operators/similarity.build_ivfpq_index + ivfpq_topk
    — the FAISS-IndexIVFPQ / IVFADC layout): coarse k-means routes
    vectors to clusters, PQ encodes the residuals (~24x less state than
    raw float32), search prunes to nprobe clusters and ADCs with
    per-cluster LUTs on one broadcast, then exact-reranks a 50-row
    shortlist. THE ORACLE IS THE PLANTED ID LIST (round-9 conversion;
    see _planted_ann_corpus): the planted rows sit essentially AT the
    query, so they assign to its nearest coarse centroid (probed at any
    nprobe >= 1), survive the ADC shortlist by a 25x distance margin,
    and the exact re-rank must emit -1..-10 in rank order."""
    from vastdb_sdk_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    key = (sf, "__ivfpq_index_planted")
    if key not in _ENGINE_WAREHOUSES:
        corpus, vec = _planted_ann_corpus(spark, sf)
        enc, C, B = build_ivfpq_index(
            corpus, num_centroids=16, num_subspaces=16, seed=42
        )
        _ENGINE_WAREHOUSES[key] = (enc.persist(), C, B, vec)
    enc, C, B, vec = _ENGINE_WAREHOUSES[key]
    approx = ivfpq_topk(
        enc, C, B, vec, k=10, nprobe=8, id_col="vec_id", rerank=50
    )
    return _ranked_planted_ids(approx, "adc_dist")


def q_ann_ivfpq_persisted(spark, sf):
    """Persisted IVF-PQ as an ENGINE index variant (table.
    build_vector_index(kind='ivfpq') + vector_search routed through ADC;
    reference precedent: vector-index metadata rides table stats,
    vastdb/_internal.py:809-826): coarse centroids live inline in the
    manifest, PQ codebooks in a JSON sidecar next to the per-centroid
    cluster files. THE ORACLE IS THE PLANTED ID LIST (round-9 planted
    conversion; the earlier SELECT TRUE booleans were self-certifying):
    the query vector is vec 0 shifted +0.5 on coordinate 0, and ten
    rows with NEGATIVE ids -(i+1) are inserted at distance
    (0.01*(i+1))^2 from it — max planted l2sq 0.01 vs measured organic
    minimum 0.25 at sf0.01 AND sf0.1 (25x margin), so the true top-10
    is exactly -1..-10 in rank order and the approximate search
    (nprobe=8 probes the planted cluster; rerank=50 exact-rescores the
    ADC shortlist) must reproduce it. The warehouse is then REOPENED
    with a fresh session object (new manifest read, sidecar reload);
    a builder-vs-reopened (id, dist) mismatch appends a sentinel row
    that fails the row-count gate — the cross-session persistence
    check, now falsifiable instead of a constant."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb

    base = _query_vec(spark, sf, 0)
    vec = list(base)
    vec[0] += 0.5

    def _search(ses):
        with ses.transaction() as tx:
            got = tx.bucket("b").schema("s").table("emb").vector_search(
                vec,
                columns=["vec_id"],
                limit=10,
                approximate=True,
                nprobe=8,
                rerank=50,
            )
        return list(
            zip(got.column("vec_id").to_pylist(), got.column(1).to_pylist())
        )

    key = (sf, "__ivfpq_persist")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_ivfpqp_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        src = f"{sf}/embeddings.parquet"
        schema = _pq.ParquetFile(src).schema_arrow
        planted = _pa.table(
            {
                "vec_id": _pa.array(
                    [-(i + 1) for i in range(10)], _pa.int64()
                ),
                "embedding": _pa.array(
                    [
                        [vec[0] + 0.01 * (i + 1)] + vec[1:]
                        for i in range(10)
                    ],
                    _pa.list_(_pa.float32()),
                ),
                "label": _pa.array([0] * 10, _pa.int32()),
            }
        )
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table(
                "emb",
                schema,
                vector_index={"column": "embedding", "metric": "l2sq"},
            )
            t.import_files([src])
            t.insert(planted.cast(schema))
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("emb").build_vector_index(
                kind="ivfpq", num_centroids=16, num_subspaces=16, seed=42
            )
        _ENGINE_WAREHOUSES[key] = (wh, _search(session))
    wh, ref = _ENGINE_WAREHOUSES[key]

    # fresh session object on the same warehouse: manifest + sidecar reload
    pairs = _search(vastdb.connect(wh, spark=spark))
    rows = [(i + 1, int(vid)) for i, (vid, _dist) in enumerate(pairs)]
    if pairs != ref:  # cross-session bit-mismatch -> fail the gate
        rows.append((-999, -999))
    return _local_df(spark, rows, "rank INT, vec_id LONG")


def q_dd_phash_neardup(spark, sf):
    """Perceptual-hash near-duplicate IMAGE pairs (operators/multimodal.
    phash_images -> dedup.simhash_near_pairs pigeonhole hamming join) —
    the ORACLE IS THE PLANTED PAIR LIST. Each doc_id < 25 gets a
    "re-encoded" copy with a NEGATIVE id: same decoded pixel field up to
    a small affine brightness/contrast shift plus a faint gradient — the
    invariance class pHash exists for. pHash bits threshold DCT coeffs
    against their median with the DC term excluded, so the affine part
    flips NOTHING and the gradient flips a couple of low-frequency bits:
    measured planted hamming <= 4 and organic minimum >= 10 at sf0.01
    AND sf0.1, so radius 6 must recover EXACTLY the planted pairs —
    full recall, zero false positives. The decoder is the pixels= seam
    (payload-seeded RNG field; a re-encode marker triggers the
    perturbation), the same plug real codecs use."""
    from vastdb_sdk_spark.operators.dedup import simhash_near_pairs
    from vastdb_sdk_spark.operators.multimodal import phash_images

    d = _t(spark, sf, "documents").select("doc_id", "text")
    base = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    planted = d.filter(F.col("doc_id") < 25).select(
        (-(F.col("doc_id") + 1)).alias("media_id"),
        F.encode(
            F.concat(F.col("text"), F.lit("\x00REENC")), "utf-8"
        ).alias("payload"),
    )
    corpus = base.unionByName(planted)

    def pixels(payload):
        import hashlib

        import numpy as np

        if payload is None:
            return None
        marker = b"\x00REENC"
        reenc = payload.endswith(marker)
        if reenc:
            payload = payload[: -len(marker)]
        h = hashlib.md5(payload).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        px = rng.random((32, 32))
        if reenc:
            i = np.arange(32) / 32.0
            px = px * 0.97 + 0.015 + 0.02 * (i[None, :] + i[:, None]) / 2
        return px

    fps = phash_images(corpus, pixels=pixels).withColumnRenamed(
        "phash", "simhash"
    )
    pairs = simhash_near_pairs(fps, "media_id", max_hamming=6)
    # copies carry negative ids, so id_a (the smaller) is always the copy
    return pairs.select(
        F.col("id_a").alias("copy_id"), F.col("id_b").alias("orig_id")
    )


def q_e14_engine_dedup(spark, sf):
    """Engine-tier exact dedup under the gate (table.dedup_rows): orders
    imported twice (a byte-identical copy, so every row is duplicated),
    then dedup_rows() DV-masks/folds the copies in place — keeper = lowest
    $row_id, no driver-side id collection (one window + the distributed DV
    writer). The scan must return exactly the pristine table the oracle
    reads."""
    import os
    import shutil
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_dedup_"), spark=spark)
    session.create_bucket("b")
    fd, dup_copy = tempfile.mkstemp(suffix=".parquet", prefix="orders_copy_")
    os.close(fd)
    shutil.copyfile(f"{sf}/orders.parquet", dup_copy)
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = create_table_from_files(
            sc, "orders", [f"{sf}/orders.parquet", dup_copy]
        )
        t.dedup_rows()
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("orders")
    return t.select_df(columns=["o_orderkey", "o_orderstatus", "o_totalprice"])


def q_tx_normalize(spark, sf):
    """Text normalization (functions/text.normalize_text): strip control
    chars, collapse whitespace runs, trim — chained regexp_replace in
    whole-stage codegen, zero shuffle. The corpus is already clean, so
    dirt is injected deterministically in-plan (control bytes + tab runs
    around every text); the oracle injects the identical dirt with chr()
    and runs the identical Java/RE2-common patterns, so the normalized
    strings hash-match byte-for-byte."""
    from vastdb_sdk_spark.functions.text import normalize_text

    d = _t(spark, sf, "documents")
    dirty = F.concat(F.lit("\x01  "), F.col("text"), F.lit(" \t\t zz \x07"))
    clean = normalize_text(dirty)
    return d.select(
        "doc_id",
        clean.alias("clean"),
        F.length(clean).alias("n_clean_chars"),
    )


def q_tx_bpe_tokens(spark, sf):
    """BPE-ish pretokenization (functions/text.bpe_pretokens — the GPT-2
    pretokenizer shape in the Java/RE2-common regex subset): the
    tokenizer-aware length estimate next to whitespace words. Dirt with
    contractions/digits/punctuation is injected in-plan (the corpus is
    alnum soup) and the EXACT token stream is pinned via md5 over a
    0x1f-joined concatenation, so any alternation-order or class
    divergence between engines fails the hash, not just the count."""
    from vastdb_sdk_spark.functions.text import bpe_pretokens, tokens

    d = _t(spark, sf, "documents")
    dirty = F.concat(
        F.col("text"), F.lit(" Don't stop; it's 2024... #tag9 'll end.")
    )
    toks = bpe_pretokens(dirty)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        F.md5(F.array_join(toks, "\x1f")).alias("token_stream_md5"),
    )


def q_tx_bm25_topk(spark, sf):
    """Okapi BM25 keyword retrieval (operators/lm.bm25_scores — the
    lexical complement to the ANN tier and the "find docs about X"
    curation signal): top-20 documents for a 3-term query. No explode,
    no per-token shuffle — per-row array HOF term frequencies + ONE
    corpus-stats aggregate row broadcast back. The oracle computes the
    identical formula with the terms summed in the same order; score
    rounded to 6 (doc-length sums are exact integers in both engines, so
    avgdl and every idf are bit-identical doubles)."""
    from vastdb_sdk_spark.operators.lm import bm25_scores

    d = _t(spark, sf, "documents")
    out = bm25_scores(d, ["hash", "join", "filter"], "text", "doc_id")
    return (
        out.select("doc_id", F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def q_dd_semantic_dedup(spark, sf):
    """SemDeDup semantic deduplication (operators/similarity.
    semantic_dup_pairs + semantic_dedup; Abbas et al. 2023): k-means over
    the L2-NORMALIZED embedding space, high-cosine pairs within clusters
    only, connected components, keep one per component. Planted: each
    vec_id < 25 gets a POSITIVELY-SCALED copy (x2.0) with a negative id —
    2x and 2||v|| are exact binary scalings, so after normalization the
    copy is BIT-IDENTICAL to its original: same cluster by construction,
    cosine exactly 1.0. Max organic cosine measured 0.513 (sf0.01) /
    0.601 (sf0.1), so threshold 0.95 must drop EXACTLY the planted
    copies; keep='max' keeps the positive originals. The oracle is the
    planted drop list — full recall, zero false positives."""
    from vastdb_sdk_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 25).select(
        (-(F.col("vec_id") + 1)).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * F.lit(2.0)
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted.select("vec_id", "embedding"))
    marks = semantic_dedup(
        corpus, "vec_id", "embedding",
        threshold=0.95, num_centroids=16, seed=42, keep="max",
    )
    return marks.filter(~F.col("keep")).select(
        F.col("vec_id").alias("dropped_id")
    )


def q_e17_semantic_dedup_inplace(spark, sf):
    """IN-PLACE SemDeDup on a managed table (table.dedup_near_rows(
    method='semantic') — the engine/batch twin of streaming/dedup's
    semantic stream dedup, completing the e14 pattern at the semantic
    granularity): embeddings imported as a table, then x2.0-SCALED
    copies of every vec_id < 25 inserted at negative ids. 2x is an
    exact binary scaling, so after L2 normalization each copy is
    BIT-IDENTICAL to its original (same k-means cluster by
    construction, cosine exactly 1.0; organic max cosine measured
    ~0.51/0.60); the cleanup DV-masks the cluster non-keepers, keeper =
    lowest $row_id = the imported original. Runs the UNTOUCHED
    num_centroids default (round 9: auto-sizing targets a fixed cluster
    size — linear total pair work). The surviving table must be exactly
    the pristine import: the oracle is the original id list."""
    import shutil
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    # import + planted insert are fixture; the gated operator is the
    # in-place semantic fold. The committed pre-fold state is a template
    # warehouse cached per (sf, process); each call CLONES it (manifests
    # only — the import is zero-copy) and folds the clone, so the warm
    # number measures the dedup users actually pay (the e25 pattern)
    key = (sf, "__semdd_template")
    if key not in _ENGINE_WAREHOUSES:
        template = tempfile.mkdtemp(prefix="entry_semdd_tmpl_")
        session = vastdb.connect(template, spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = create_table_from_files(sc, "emb", [f"{sf}/embeddings.parquet"])
            planted = (
                _t(spark, sf, "embeddings")
                .filter(F.col("vec_id") < 25)
                .select(
                    (-(F.col("vec_id") + 1)).alias("vec_id"),
                    F.transform(
                        F.col("embedding"), lambda x: x * F.lit(2.0).cast("float")
                    ).alias("embedding"),
                    "label",
                )
            )
            t.insert_df(planted)
        _ENGINE_WAREHOUSES[key] = template
    wh = tempfile.mkdtemp(prefix="entry_semdd_")
    shutil.rmtree(wh)
    shutil.copytree(_ENGINE_WAREHOUSES[key], wh)
    session = vastdb.connect(wh, spark=spark)
    with session.transaction() as tx:
        t = tx.bucket("b").schema("s").table("emb")
        t.dedup_near_rows("embedding", method="semantic", threshold=0.95)
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("emb")
    return t.select_df(columns=["vec_id", "label"])


def q_e18_refresh_incremental(spark, sf):
    """Feed-driven INCREMENTAL vector-index refresh under the gate
    (table.refresh_vector_index — previously engine-tested only;
    reference precedent for persisted vector-index metadata:
    vastdb/_internal.py:809-826, maintenance here is the engine
    extension): the
    planted-ANN corpus is imported and IVF-PQ-indexed on a clean
    committed state; a later transaction then deletes the five NEAREST
    planted rows (-1..-5) and inserts five NEARER ones (-11..-15 at
    l2sq (0.001*j)^2, three orders of magnitude under the survivors'
    (0.01*(i+1))^2 >= 0.0036). refresh_vector_index must take the
    incremental path (a 'full' or 'noop' return appends a sentinel row
    that breaks the gate), rewrite only the removal-touched clusters,
    encode the additions with the FROZEN centroids/codebooks, and the
    approximate search must then return -11..-15 then -6..-10 in that
    exact rank order: a refresh that misses removals resurfaces a
    deleted id; one that misses additions loses the new top-5; either
    fails the hash."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D

    base = _query_vec(spark, sf, 0)
    vec = list(base)
    vec[0] += 0.5

    def _planted_tbl(ids, eps):
        return _pa.table(
            {
                "vec_id": _pa.array(ids, _pa.int64()),
                "embedding": _pa.array(
                    [
                        [vec[0] + eps * (j + 1)] + vec[1:]
                        for j in range(len(ids))
                    ],
                    _pa.list_(_pa.float32()),
                ),
                "label": _pa.array([0] * len(ids), _pa.int32()),
            }
        )

    key = (sf, "__refresh_incr")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_refr_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        src = f"{sf}/embeddings.parquet"
        schema = _pq.ParquetFile(src).schema_arrow
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table(
                "emb",
                schema,
                vector_index={"column": "embedding", "metric": "l2sq"},
            )
            t.import_files([src])
            t.insert(_planted_tbl([-(i + 1) for i in range(10)], 0.01).cast(schema))
        with session.transaction() as tx:  # clean committed build
            tx.bucket("b").schema("s").table("emb").build_vector_index(
                kind="ivfpq", num_centroids=16, num_subspaces=16, seed=42
            )
        with session.transaction() as tx:  # committed churn
            t = tx.bucket("b").schema("s").table("emb")
            t.delete_where(D.vec_id.isin([-1, -2, -3, -4, -5]))
            t.insert(
                _planted_tbl([-(j + 11) for j in range(5)], 0.001).cast(schema)
            )
        with session.transaction() as tx:
            res = tx.bucket("b").schema("s").table("emb").refresh_vector_index(
                mode="auto"
            )
        _ENGINE_WAREHOUSES[key] = (wh, res)
    wh, res = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        got = tx.bucket("b").schema("s").table("emb").vector_search(
            vec, columns=["vec_id"], limit=10,
            approximate=True, nprobe=8, rerank=50,
        )
    rows = [(i + 1, int(v)) for i, v in enumerate(got.column("vec_id").to_pylist())]
    if res.get("mode") != "incremental":  # refresh fell back -> fail gate
        rows.append((-999, -999))
    return _local_df(spark, rows, "rank INT, vec_id LONG")


def q_tx_clf_quality(spark, sf):
    """Trained linear quality-classifier APPLICATION (operators/lm.
    linear_classifier_scores — the GPT-3/LLaMA-style curation step:
    train offline, score the corpus in-engine): logistic score over
    token counts with a 6-term weight vector. The engine side joins the
    exploded token stream to a BROADCAST weight vocabulary (the
    100k-term-classifier scale shape); the oracle uses per-term HOF
    counts. Weights are DYADIC rationals (0.75, -0.625, ...), so every
    product and partial sum is exact in binary floating point — any
    summation order in either engine yields the bit-identical double,
    and the sigmoid of identical inputs matches to the last ulp."""
    from vastdb_sdk_spark.operators.lm import linear_classifier_scores

    W = {
        "hash": 0.75,
        "join": 0.5,
        "sort": -0.625,
        "group": -1.25,
        "fast": 0.25,
        "value": 0.125,
    }
    out = linear_classifier_scores(
        _t(spark, sf, "documents"), W, bias=-0.25
    )
    return out.select(
        "doc_id",
        F.round("clf_score", 6).alias("clf_score"),
        F.round("clf_prob", 6).alias("clf_prob"),
    )


def q_tx_bpe_learned(spark, sf):
    """BPE tokenizer TRAINING + application (operators/bpe.
    learn_bpe_merges + bpe_segment; Sennrich 2016): distributed word
    counts -> incremental driver merge loop (vocabulary-sized, never
    corpus) -> broadcast-ranks greedy encode, zero shuffle. FULL DuckDB
    oracle (round 10): the training loop is sequential but its output —
    the ordered merge table — is vocabulary-sized and deterministic, so
    the oracle re-learns it with an INDEPENDENT naive trainer (DuckDB
    word counts + from-scratch pair recount each step; see
    _naive_bpe_merges), inlines it as a rank list literal, and replays
    greedy segmentation over the DISTINCT pre-token words with a
    recursive CTE — so both the trainer (incremental vs naive) and the
    encoder (mapInPandas vs CTE) are cross-checked by the value hash.
    The query also SELF-VALIDATES in-plan: recon_ok asserts the subword
    stream reconstructs each document's pre-token characters exactly."""
    from vastdb_sdk_spark.functions.text import tokens as _tok2
    from vastdb_sdk_spark.operators.bpe import (
        END_OF_WORD,
        bpe_segment,
        learn_bpe_merges,
    )

    d = _t(spark, sf, "documents")
    key = (sf, "__bpe_merges")
    if key not in _ENGINE_WAREHOUSES:
        _ENGINE_WAREHOUSES[key] = learn_bpe_merges(d, num_merges=30)
    merges = _ENGINE_WAREHOUSES[key]
    seg = bpe_segment(d, merges, "text", "doc_id")
    flat = F.array_join(
        F.transform(F.col("bpe_tokens"), lambda p: F.replace(p, F.lit(END_OF_WORD), F.lit(""))),
        "",
    )
    src = d.select("doc_id", F.array_join(_tok2(F.col("text")), "").alias("__chars"))
    return (
        seg.join(src, "doc_id")
        .select(
            "doc_id",
            "n_bpe_tokens",
            (flat == F.col("__chars")).alias("recon_ok"),
        )
    )


def q_tx_hybrid_topk(spark, sf):
    """Hybrid retrieval as an operator (operators/lm.hybrid_topk): Okapi
    BM25 3-term shortlist of 100 over documents, exact embedding-cosine
    re-rank against vec_id=7's vector, k=10 — the standard lexical +
    semantic two-stage ranker, promoted from a test recipe to a contract.
    Plan: zero-shuffle BM25 scan -> TakeOrdered(100) -> the tiny
    shortlist BROADCASTS into the embeddings scan -> TakeOrdered(10)
    (asserted in tests/test_pipeline_ops.py). The oracle replicates both
    stages in SQL: the identical BM25 formula (term order preserved,
    avgdl/idf bit-identical doubles), the same top-100 cut with doc_id
    tie-break, then list_cosine_similarity re-rank."""
    from vastdb_sdk_spark.operators.lm import hybrid_topk

    d = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    vec = _query_vec(spark, sf, 7)
    out = hybrid_topk(
        d, emb, ["hash", "join", "filter"], vec, k=10, shortlist=100
    )
    return out.select(
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        F.round("cosine", 4).alias("cosine"),
    )


def q_e16_change_feed(spark, sf):
    """Row-level change feed (table.read_changes — the Delta-CDF shape an
    incremental pipeline consumes): orders imported (v1), then DELETE
    WHERE status='F', UPDATE WHERE priority='1-URGENT' SET totalprice=-1,
    and the feed v1->current must be exactly the delete preimages, the
    update pre/post pairs (update wins only on rows the delete left), and
    nothing else — rewrite carry-overs hash-equal and vanish. The oracle
    reconstructs the feed from the pristine table with CASE/UNION ALL.
    Unchanged-file pruning means only mutated files were scanned."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    # import + churn are fixture; the gated operator is the FEED, and
    # read_changes is read-only — so the churned warehouse is cached per
    # (sf, process) and every call measures the feed read users actually
    # pay (the e25/ann_ivfpq_persisted harness/operator cost split)
    key = (sf, "__cdf_feed")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_cdf_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "orders", [f"{sf}/orders.parquet"])
        with session.transaction() as tx:
            b = tx.bucket("b")
            v1 = b.manifest.version
            t = b.schema("s").table("orders")
            t.delete_where(D.o_orderstatus == "F")
            t.update_where(D.o_orderpriority == "1-URGENT", {"o_totalprice": -1.0})
        _ENGINE_WAREHOUSES[key] = (wh, v1)
    wh, v1 = _ENGINE_WAREHOUSES[key]
    tx = vastdb.connect(wh, spark=spark).transaction()
    t = tx.bucket("b").schema("s").table("orders")
    return t.read_changes(v1).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        "_change_type",
    )


def q_e15_jsonl_ingest(spark, sf):
    """JSONL ingestion (sources/ingest.ingest_table_from_files — engine
    extension; the reference imports parquet only, vastdb/util.py:18-43,
    but training corpora arrive as JSONL dumps): the documents table is
    dumped to line-delimited JSON in-plan, ingested with distributed
    schema inference (spark.read.json -> insert_df, per-file manifest
    stats registered like native inserts), and scanned back. The scan
    must reproduce the pristine parquet table byte-for-byte."""
    import glob
    import os
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import ingest_table_from_files

    base = tempfile.mkdtemp(prefix="entry_jsonl_")
    dump = os.path.join(base, "dump")
    _t(spark, sf, "documents").write.mode("overwrite").json(dump)
    files = sorted(glob.glob(os.path.join(dump, "*.json")))
    session = vastdb.connect(os.path.join(base, "wh"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        ingest_table_from_files(sc, "documents", files, format="json")
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("documents")
    return t.select_df(columns=["doc_id", "text", "lang", "source", "n_chars"])


def q_dd_passage_dups(spark, sf):
    """Cross-document exact-substring duplication (operators/dedup.
    passage_dup_stats, Lee et al. 2022): per-doc count/fraction of
    distinct 8-token passages occurring in >=2 documents. The synthetic
    corpus has no organic passage overlap, so 25 near-copies (original
    text + a distinct tail) are planted in-plan — their shared passages
    must be flagged on BOTH the copy and its source, everything else at
    zero. Word-count-shaped: explode distinct md5'd shingles, doc-freq
    groupBy, join back — no pairwise comparison anywhere."""
    from vastdb_sdk_spark.operators.dedup import passage_dup_stats

    d = _t(spark, sf, "documents").select("doc_id", "text")
    # planted copies get NEGATIVE ids (-(doc_id+1)): real doc_ids are
    # non-negative at every sf, so no offset constant can ever collide
    # with an organic row (an offset like +100000 would silently break
    # the gate the day a scale factor's ids reach it)
    planted = d.filter(F.col("doc_id") < 25).select(
        (-(F.col("doc_id") + 1)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz copy tail marker")).alias("text"),
    )
    corpus = d.unionByName(planted)
    return passage_dup_stats(corpus, "text", "doc_id", k=8).select(
        "doc_id",
        "n_passages",
        "n_dup_passages",
        F.round("dup_passage_fraction", 6).alias("dup_frac"),
    )


def q_tx_unigram_logprob(spark, sf):
    """Corpus-fit unigram-LM document scoring (operators/lm.
    unigram_logprob_scores — the perplexity-filter quality signal without
    an external KenLM artifact): mean ln p(token) per doc under the
    corpus's own add-0.5-smoothed unigram distribution. Fit = one
    explode + groupBy(token) (map-side partial agg); scoring joins the
    token stream to the counts (broadcast vocab with top_n — the 100 TB
    skew-free path; exact shuffle join here). Rounded to 6 so the avg's
    partition-order FP noise (~1e-13) can't flip the hash."""
    from vastdb_sdk_spark.operators.lm import unigram_logprob_scores

    d = _t(spark, sf, "documents")
    out = unigram_logprob_scores(d, "text", "doc_id", smoothing=0.5)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("unigram_logprob"), 6).alias("unigram_lp"),
    )


def q_tx_bigram_logprob(spark, sf):
    """Corpus-fit BIGRAM-LM document scoring (operators/lm.
    bigram_logprob_scores — the next-order perplexity-filter signal
    after tx_unigram_logprob; CCNet/KenLM-style quality filtering
    without the external artifact): mean ln p(w|v) per doc under the
    corpus's own add-0.5-smoothed conditional bigram model. Fit = one
    positional explode + groupBy(v, w) (map-side combined); scoring
    joins the per-doc bigram stream to the counts (broadcast with top_n
    — the 100 TB skew-free path; exact shuffle join here). Rounded to 6
    so the avg's partition-order FP noise can't flip the hash."""
    from vastdb_sdk_spark.operators.lm import bigram_logprob_scores

    d = _t(spark, sf, "documents")
    out = bigram_logprob_scores(d, "text", "doc_id", smoothing=0.5)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("bigram_logprob"), 6).alias("bigram_lp"),
    )


def q_ann_knn_join_blocked(spark, sf):
    """EXACT corpus x corpus k-NN join via the distributed block-GEMM grid
    (operators/similarity.knn_join_cosine_blocked): 100 probe rows against
    the full embeddings corpus in a 4x4 block grid, k=3. Unlike the gated
    ANN variants (recall-checked), this one is exact, so the oracle is the
    full SQL cross-join + rank — every pair and every rounded cosine must
    match. Shuffle ships each vector once per block replica; the quadratic
    comparison volume exists only inside per-cell numpy GEMMs."""
    from vastdb_sdk_spark.operators.similarity import knn_join_cosine_blocked

    emb = _t(spark, sf, "embeddings")
    left = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    right = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b")
    )
    return knn_join_cosine_blocked(
        left, right, k=3, num_left_blocks=4, num_right_blocks=4
    )


def q_tx_gopher_flags(spark, sf):
    """Gopher-family document-quality rule flags (functions/text.
    gopher_quality_flags; Rae et al. 2021 §A1.1): word-count bounds, mean
    word length, alphabetic-word fraction, distinct-stop-word presence,
    and the conjunction — all pure map-side Column expressions, zero
    shuffle. Stop-word set overridden to corpus-frequent markers so the
    rule exercises both outcomes on the synthetic vocabulary."""
    from vastdb_sdk_spark.functions.text import gopher_quality_flags

    d = _t(spark, sf, "documents")
    flags = gopher_quality_flags(
        F.col("text"), stop_words=["spark", "sort", "group", "value", "fast"]
    )
    return d.select(
        "doc_id",
        flags["n_words"].alias("n_words"),
        flags["mean_word_len"].alias("mean_word_len"),
        flags["alpha_word_frac"].alias("alpha_word_frac"),
        flags["n_stop_words"].alias("n_stop_words"),
        flags["gopher_ok"].alias("gopher_ok"),
    )


def q_tx_c4_filter(spark, sf):
    """C4 line/document filter (functions/text.c4_kept_lines + c4_doc_ok;
    Raffel et al. 2020 §2.2): keep lines ending in terminal punctuation
    with >= 5 words and no 'javascript'; drop docs with braces, 'lorem
    ipsum', or < 3 surviving lines. The corpus is single-line token soup,
    so a 6-line document is assembled deterministically in-plan (same
    construction in the oracle), with doc_id-dependent lines exercising
    every rule both ways. Zero shuffle — the whole gate is one map."""
    from vastdb_sdk_spark.functions.text import c4_doc_ok, c4_kept_lines

    d = _t(spark, sf, "documents")
    nl = F.lit("\n")
    doc = F.concat(
        F.substring(F.col("text"), 1, 40), F.lit(" ok line end."), nl,
        F.lit("too short."), nl,
        F.lit("no terminal punctuation here at all"), nl,
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("Enable javascript to view this page."))
         .otherwise(F.lit("a perfectly fine sentence with enough words.")), nl,
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("lorem ipsum dolor sit amet."))
         .otherwise(F.lit("closing thoughts wrap up the document nicely.")), nl,
        F.when(F.col("doc_id") % 11 == 0,
               F.lit("function f() { return 1; }"))
         .otherwise(F.lit("the last line ends with a question?")),
    )
    staged = d.select("doc_id", doc.alias("__doc"))
    kept = c4_kept_lines(F.col("__doc"))
    return staged.select(
        "doc_id",
        F.size(kept).alias("n_kept_lines"),
        c4_doc_ok(F.col("__doc"), kept=kept).alias("c4_ok"),
        F.length(F.array_join(kept, "\n")).alias("clean_len"),
    )


def q_tx_tfidf_topterms(spark, sf):
    """Per-document top-3 TF-IDF terms (operators/lm.tfidf_top_terms —
    the lexical topic-signature used for corpus exploration and cluster
    labeling): tf is the word-count shape, the vocabulary-sized df table
    BROADCASTS into the scoring join (no Zipf-head shuffle), the per-doc
    top-k is a row_number window on doc_id. Corpus statistics (N, df)
    come from the FULL table; the doc_id < 200 output filter pushes
    below the window (same partition key). tf/df/N are exact integers,
    so every w = tf * (ln((1+N)/(1+df)) + 1) is the same IEEE double in
    both engines; ties (equal tf and df) break on ascending term."""
    from vastdb_sdk_spark.operators.lm import tfidf_top_terms

    d = _t(spark, sf, "documents")
    return (
        tfidf_top_terms(d, k=3)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rk")
    )


def q_ds_domain_caps(spark, sf):
    """Per-domain document cap (operators/sampling.cap_per_group — the
    RefinedWeb/C4 "no single site dominates" quota): keep at most 10
    docs per source, chosen by md5(doc_id) so the kept subset is a
    deterministic pseudo-random sample, stable under unrelated inserts.
    The rank-filter window compiles to WindowGroupLimit (pytest-pinned):
    map tasks trim each group to the cap BEFORE the shuffle, so a hot
    domain ships ~cap rows per task, never the whole group. The oracle
    is the identical md5-ordered row_number in DuckDB."""
    from vastdb_sdk_spark.operators.sampling import cap_per_group

    d = _t(spark, sf, "documents")
    return cap_per_group(d, "source", 10).select("source", "doc_id")


def q_ds_cluster_assign(spark, sf):
    """Nearest-centroid topic-bucket assignment (operators/similarity.
    assign_probe_centroids with nprobe=1 — the routing step of IVF and
    the cluster-sampling step of embedding curation) over DETERMINISTIC
    centroids (the vec_id < 8 embedding vectors, a bounded 8-row
    collect): centroids ride a broadcast variable into a mapInPandas
    GEMM — O(1) plan size, zero shuffle. The emitted distance is an
    expression-side sequential zip_with/aggregate fold in double:
    measured BIT-IDENTICAL to DuckDB's list_distance (same left-to-right
    summation), so ROUND(.,6) cross-checks exactly and the oracle's
    argmin (row_number over dist, centroid id) must agree."""
    import numpy as np

    from vastdb_sdk_spark.operators.similarity import assign_probe_centroids

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    crows = sorted(
        emb.filter(F.col("vec_id") < 8).collect(), key=lambda r: r.vec_id
    )
    C = np.asarray([r.embedding for r in crows], dtype=np.float64)
    cdf = _local_df(
        spark,
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in crows],
        "centroid_id int, __cvec array<double>",
    )
    assigned = assign_probe_centroids(emb, C, "embedding", nprobe=1)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "embedding",
                "__cvec",
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        assigned.join(F.broadcast(cdf), "centroid_id")
        .select("vec_id", "centroid_id", F.round(dist, 6).alias("dist"))
    )


def q_e19_engine_domain_cap(spark, sf):
    """Engine-tier per-domain quota under the gate (table.
    cap_rows_per_group — in-place twin of operators/sampling.
    cap_per_group): documents imported as a managed table, then capped
    to 10 rows per source; losers are DV-masked by the distributed
    writer, no file rewrite. The zero-copy import assigns ``$row_id``
    0..N-1 in file order and documents.parquet carries doc_id 0..N-1 in
    that same order, so md5($row_id) IS md5(doc_id) and the surviving
    (source, doc_id) set is fully SQL-expressible — the oracle is the
    identical md5-ordered row_number quota."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_cap_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        t = create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
        t.cap_rows_per_group(["source"], 10)
    tx = session.transaction()
    t = tx.bucket("b").schema("s").table("docs")
    return t.select_df(columns=["source", "doc_id"])


def q_tx_pmi_topk(spark, sf):
    """Top-15 adjacent-token collocations by pointwise mutual
    information (operators/lm.pmi_top_pairs — the multi-word-expression
    miner for tokenizer-vocabulary curation): all marginals come from
    the bigram table itself, so every ln() input is an exact integer
    and the score is the same IEEE double in both engines. After the
    one bigram-count shuffle the two marginal aggregates and the 1-row
    total ride broadcasts and the top-k is a TakeOrdered — nothing
    corpus-sized moves. min_count=5 drops the unstable singleton tail;
    ties break on (v, w)."""
    from vastdb_sdk_spark.operators.lm import pmi_top_pairs

    d = _t(spark, sf, "documents")
    out = pmi_top_pairs(d, k=15, min_count=5)
    return out.select("v", "w", "n", F.round("pmi", 6).alias("pmi"))


def q_dd_tfidf_pairs(spark, sf):
    """Lexical near-dup pairs by TF-IDF cosine over an inverted index
    (operators/dedup.tfidf_cosine_pairs — the sparse-vector similarity
    join catching reworded same-vocabulary docs that shingle MinHash
    misses), in the PRODUCTION configuration: an ABSOLUTE df cap
    (sum(df²) candidate work bounded by vocab·cap² at any corpus size —
    a fractional cut lets per-term df, hence df², grow with N; the
    round-9 decade measured that as 207× for 10× data) plus
    AllPairs/PPJoin prefix filtering (Bayardo et al. 2007): only each
    doc's rarest-first prefix carrying >= threshold² of norm mass is
    indexed, the candidate join runs prefix-vs-prefix, and the full
    dot product is recomputed for candidates only. The pruning is
    LOSSLESS — the oracle is the NAIVE quadratic join in SQL, so any
    over-pruning (a missed result pair) fails the hash, not just the
    row count."""
    from vastdb_sdk_spark.operators.dedup import tfidf_cosine_pairs

    d = _t(spark, sf, "documents")
    out = tfidf_cosine_pairs(d, threshold=0.8, max_df=1200)
    return out.select("a", "b", F.round("cosine", 4).alias("cosine"))


def q_a12_pivot(spark, sf):
    """PIVOT aggregation (§2.4 breadth): language-by-source document
    counts as a wide crosstab — `groupBy(source).pivot(lang, [...])`
    with the value list given EXPLICITLY, which matters twice: Spark
    skips the extra collect-distinct job it otherwise runs to discover
    pivot columns (a full corpus pass + a driver round-trip), and the
    output schema is deterministic regardless of which languages a
    partition happens to contain. The plan is a single
    partial-aggregated groupBy(source) with one pivot-count per listed
    language — one shuffle, same as a conditional aggregate, which is
    exactly what the oracle spells out."""
    d = _t(spark, sf, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    out = d.groupBy("source").pivot("lang", langs).count()
    return out.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).alias(f"n_{lg}") for lg in langs],
    )


def q_tx_token_entropy(spark, sf):
    """Per-document token Shannon entropy (operators/lm.token_entropy —
    the repetitiveness/gibberish quality signal next to Gopher's
    repetition ratios): H = ln(n) - (1/n)·Σ c·ln(c), the algebraic form
    in which EVERY ln() input is an exact integer count, so both
    engines produce the same IEEE doubles before the final round. Two
    word-count-shaped shuffles, zero-token docs kept with NULL
    entropy."""
    from vastdb_sdk_spark.operators.lm import token_entropy

    d = _t(spark, sf, "documents")
    out = token_entropy(d)
    return out.select(
        "doc_id", "n_tokens", F.round("entropy", 6).alias("entropy")
    )


def q_ds_source_overlap(spark, sf):
    """Pairwise source-vocabulary Jaccard (operators/lm.
    source_vocab_overlap — the mixture-diversity diagnostic: which
    domains contribute unique vocabulary vs redundant coverage). The
    per-source vocabulary is one distinct; the intersection is a
    term-keyed self-join bounded by sources² per term, never
    corpus-sized; zero-overlap pairs survive via the broadcast all-pairs
    frame. Jaccard is one IEEE division of exact integers — correctly
    rounded, no cross-engine drift."""
    from vastdb_sdk_spark.operators.lm import source_vocab_overlap

    d = _t(spark, sf, "documents")
    return source_vocab_overlap(d)


def q_dd_keep_best(spark, sf):
    """Quality-aware keep-one dedup (operators/dedup.
    keep_best_in_cluster — RefinedWeb-style argmax-quality cluster
    representative instead of dedup_keep_representative's min-id): the
    dd_dup_clusters twin planting (every 10th doc copied at +1M/+2M)
    gives 3-member exact-dup cliques whose members carry DIFFERENT
    deterministic qualities ((doc_id·37) mod 101 — pure integer
    arithmetic, identical in SQL), so min-id and argmax-quality pick
    DIFFERENT survivors and a fallback-to-min-id regression fails the
    hash. Components via the same min-label propagation, winner via one
    per-cluster row_number, survivors via one left_anti — the corpus is
    scanned once."""
    from vastdb_sdk_spark.operators.dedup import dup_clusters, keep_best_in_cluster

    d = _t(spark, sf, "documents").select("doc_id", "text")
    tw = d.filter(F.col("doc_id") % 10 == 0)
    aug = d.unionByName(
        tw.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
    ).unionByName(
        tw.select((F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"), "text")
    )
    aug = aug.withColumn("quality", (F.col("doc_id") * 37 % 101).cast("long"))
    h = aug.select("doc_id", F.md5("text").alias("h"))
    pairs = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    clusters = dup_clusters(pairs)
    out = keep_best_in_cluster(aug, clusters, "quality")
    return out.select("doc_id", "quality")


def q_w10_funnel(spark, sf):
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing event time) — the product-analytics staple: per user,
    the first view, the first click AFTER that view, and the first
    purchase AFTER that click, as three nullable timestamps (NULL =
    stage never reached; downstream stage counts are just COUNT(t)),
    in raw epoch-micros int64 (the events.ts engine convention — the
    oracle compares epoch_us()).
    Sequential-dependency aggregation WITHOUT per-user sorted windows:
    each stage is a filtered min-aggregate joined to the previous
    stage's result — three shuffles on the same user_id key (co-
    partitioned by AQE), each stage's frame only users-sized. A
    sessionized window version would sort every user's full history;
    this shape touches each event row once per stage filter."""
    ev = _t(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
    )


def q_w11_retention_cohorts(spark, sf):
    """Weekly retention cohorts — the other product-analytics staple:
    users grouped by the Monday-aligned week of their FIRST event,
    distinct-user activity counted per (cohort week, whole-week
    offset). First-seen is one min-aggregate; activity weeks are one
    distinct over (user, week) — both shuffles on user-ish keys, the
    output bounded by weeks², never event-sized. The week index is
    PURE INTEGER arithmetic on the epoch-micros ts ((days + 3) div 7
    — epoch day 0 is a Thursday, +3 aligns to Monday), so there is no
    timezone or calendar library for the engines to disagree on."""
    ev = _t(spark, sf, "events")
    day_us = 86_400_000_000
    week_of = f"((ts div {day_us}) + 3) div 7"
    first = ev.groupBy("user_id").agg(
        F.expr(f"min({week_of})").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.expr(week_of).alias("__w")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("__w") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q_e21_pipeline_recipe(spark, sf):
    """END-TO-END curation recipe as ONE declarative plan — the
    composition a reference user actually runs, stitched from the
    library's own stages with zero materialization between them:
    Gopher-style quality gate (functions/text.gopher_quality_flags,
    corpus-tuned stop set, relaxed 30-word floor) → exact dedup keeping
    the min-id copy (the dd_exact rule as a groupBy+semi-join, no
    window) → deterministic hash split (operators/sampling.
    train_test_split — the engine-independent Knuth-fold bucket) →
    per-(split, lang) corpus accounting. Catalyst fuses the whole
    pipeline into one scan + two shuffles (dedup groupBy, final agg);
    the filter and the md5 run map-side at the scan. The oracle re-runs
    all four stages in SQL."""
    from vastdb_sdk_spark.functions.text import gopher_quality_flags
    from vastdb_sdk_spark.operators.sampling import train_test_split

    d = _t(spark, sf, "documents")
    flags = gopher_quality_flags(
        F.col("text"), stop_words=["spark", "sort", "group", "value", "fast"]
    )
    quality = d.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        flags["n_words"].alias("__nw"),
        (flags["mean_len_ok"] & flags["alpha_ok"] & flags["stop_ok"]).alias(
            "__ok"
        ),
    ).filter((F.col("__nw") >= 30) & F.col("__ok"))
    hashed = quality.withColumn("__h", F.md5("text"))
    winners = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    survivors = hashed.join(winners, ["__h", "doc_id"], "left_semi")
    split = train_test_split(survivors, "doc_id", test_fraction=0.1)
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_e22_matview_incremental(spark, sf):
    """Materialized aggregate view with FEED-DRIVEN incremental
    maintenance under the gate (table.create_materialized_view /
    MaterializedView.refresh, matview.py; lifecycle parity model: the
    reference's stale-on-DML projection objects, vastdb/table.py:
    1040-1138): a (lang, source)-grouped count/sum/avg view is built on
    a committed corpus, a later transaction deletes every 7th doc,
    rewrites every remaining 5th doc's n_chars to 1, and inserts two
    'zz' docs (one NULL n_chars — the non-null-count state must track
    it). The refresh must take the incremental path WITHOUT reading the
    base table (additive-only view: signed feed deltas null-safe-merged
    into the bucketed state) — a 'full' fallback or a base scan appends
    a sentinel row that breaks the hash. The oracle recomputes the
    final state's aggregation directly in SQL, so a delta merge that
    miscounts any group (or fails to drop an emptied one) mismatches."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    key = (sf, "__matview_incr")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_mv_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        schema = _pq.ParquetFile(f"{sf}/documents.parquet").schema_arrow
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
        with session.transaction() as tx:  # clean committed build
            tx.bucket("b").schema("s").table("docs").create_materialized_view(
                "by_src",
                ["lang", "source"],
                {
                    "n": "count",
                    "chars": ("sum", "n_chars"),
                    "avg_chars": ("avg", "n_chars"),
                },
                num_buckets=8,
            )
        with session.transaction() as tx:  # committed churn
            t = tx.bucket("b").schema("s").table("docs")
            t.delete_where(D.doc_id % 7 == 0)
            t.update_where(D.doc_id % 5 == 0, {"n_chars": 1})
            t.insert(
                _pa.table(
                    {
                        "doc_id": _pa.array([900001, 900002], _pa.int64()),
                        "text": _pa.array(["mv a", "mv b"]),
                        "lang": _pa.array(["zz", "zz"]),
                        "source": _pa.array(["mv_new", "mv_new"]),
                        "n_chars": _pa.array([10, None], _pa.int64()),
                    }
                ).cast(schema)
            )
        with session.transaction() as tx:
            res = tx.bucket("b").schema("s").table("docs").materialized_view(
                "by_src"
            ).refresh(mode="auto")
        _ENGINE_WAREHOUSES[key] = (wh, res)
    wh, res = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        mv = tx.bucket("b").schema("s").table("docs").materialized_view("by_src")
        out = mv.df().select(
            "lang",
            "source",
            "n",
            "chars",
            F.round("avg_chars", 4).alias("avg_chars"),
        )
    if res.get("mode") != "incremental" or res.get("base_scanned"):
        out = out.unionByName(
            out.sparkSession.createDataFrame(
                [("__refresh_fell_back__", "x", -1, -1, -1.0)],
                out.schema,
            )
        )
    return out


def q_tx_sentences(spark, sf):
    """Sentence segmentation statistics (functions/text.sentences —
    RE2-common boundary shared verbatim with the oracle, the scrub.py
    single-source discipline): per doc, sentence count, mean tokens per
    sentence, and the md5 of the first sentence (pins the exact split
    AND the boundary-terminator stripping). Pure codegen'd Column
    expressions — zero shuffles, zero Python."""
    from vastdb_sdk_spark.functions.text import sentences

    d = _t(spark, sf, "documents")
    # stage the sentence array ONCE: inlined, the split+regexp_replace
    # pipeline was re-evaluated five times per row (n_sentences, the
    # mean's guard/numerator/denominator, first_sent_md5) — a multiply-
    # referenced non-cheap alias stays staged (CollapseProject keeps it)
    staged = d.select("doc_id", sentences(F.col("text")).alias("__s"))
    ntoks = F.transform(F.col("__s"), lambda s: F.size(_tokens(s)))
    return staged.select(
        "doc_id",
        F.size("__s").alias("n_sentences"),
        F.round(
            F.when(
                F.size("__s") > 0,
                F.aggregate(ntoks, F.lit(0), lambda a, x: a + x).cast("double")
                / F.size("__s"),
            ),
            4,
        ).alias("mean_sent_tokens"),
        F.md5(F.element_at(F.col("__s"), 1)).alias("first_sent_md5"),
    )


def q_tx_chunk_sentences(spark, sf):
    """Sentence-boundary-aligned context-window chunking (operators/
    sampling.chunk_by_sentences — the RAG/pretraining chunker that never
    cuts mid-sentence): positional sentence explode + per-document
    greedy budget packing (pack_greedy strata'd by doc: ONE window per
    doc ordered by sentence position), chunks reassembled with ordered
    aggregation. The oracle replays the identical split, prefix-sum bin
    assignment, and ordered string_agg in SQL — every chunk boundary
    and byte of chunk text must match."""
    from vastdb_sdk_spark.operators.sampling import chunk_by_sentences

    d = _t(spark, sf, "documents")
    out = chunk_by_sentences(d, budget=64)
    return out.select(
        "doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"),
        "n_sentences", "n_tokens",
    )


def q_e24_matview_timebucket(spark, sf):
    """Time-bucketed CONTINUOUS AGGREGATE under the gate (matview
    key_specs + aggregate_df routing — the Timescale/Druid rollup
    shape): a (day, event_type) view over the events stream with
    count/sum state, a later transaction deletes every 5th event, the
    view refreshes INCREMENTALLY (bucket keys re-derive from the feed's
    ts column), and the day-grouped query must be SERVED by folding the
    view's state (count-of-counts, sum-of-sums) — base-routed serving
    or a non-incremental refresh appends a sentinel. The oracle
    aggregates the reproduced final state on the identical
    floor(epoch_us/day)*day lattice."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    DAY = 86_400_000_000
    key = (sf, "__mv_timebucket")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_mvt_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "events", [f"{sf}/events.parquet"])
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("events").create_materialized_view(
                "daily",
                [("day", "ts", DAY), "event_type"],
                {"n": "count", "total": ("sum", "value")},
                num_buckets=8,
            )
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("events").delete_where(
                D.event_id % 5 == 0
            )
        with session.transaction() as tx:
            res = tx.bucket("b").schema("s").table("events").materialized_view(
                "daily"
            ).refresh(mode="auto")
        _ENGINE_WAREHOUSES[key] = (wh, res)
    wh, res = _ENGINE_WAREHOUSES[key]

    spec = {"n": "count", "total": ("sum", "value")}
    with vastdb.connect(wh, spark=spark).transaction() as tx:
        t = tx.bucket("b").schema("s").table("events")
        route = t.explain_aggregate([("day", "ts", DAY)], spec)
        out = t.aggregate_df([("day", "ts", DAY)], spec).select(
            "day", "n", F.round("total", 6).alias("total")
        )
    if route != {"served_by": "matview:daily"} or res.get("mode") != "incremental":
        out = out.unionByName(
            out.sparkSession.createDataFrame([(-1, -1, -1.0)], out.schema)
        )
    return out


def q_ts_anomaly(spark, sf):
    """Rolling z-score anomaly detection on the daily grid (operators/
    timeseries.rolling_anomaly_flags): per (user, day), the day's mean
    value scored against the TRAILING 7 days' frame statistics
    (current bucket excluded so an anomaly can't suppress itself);
    std = sqrt(max(E[x^2] - E[x]^2, 0)) from frame sums. < 3 observed
    history days, zero variance, or an empty bucket -> NULL score. The
    flag derives from the ROUNDED score on BOTH engines, so float noise
    cannot flip it. One bucket groupBy + two window passes per user."""
    from vastdb_sdk_spark.operators.timeseries import rolling_anomaly_flags

    ev = _t(spark, sf, "events")
    return rolling_anomaly_flags(
        ev, "ts", ["user_id"], 86_400_000_000, "value",
        window=7, min_periods=3, z_threshold=2.0,
    ).select(
        "user_id", "bucket_ts",
        F.round("observed", 6).alias("observed"),
        "zscore", "is_anomaly",
    )


def q_ds_dsir_weights(spark, sf):
    """DSIR importance weights (operators/sampling.dsir_logratio_weights
    — Data Selection via Importance Resampling, Xie et al. 2023: score
    every raw document by how target-like its hashed-n-gram profile is;
    here target = the English subcorpus): w(d) = Σ_f ln p_tgt(b(f)) -
    ln p_raw(b(f)) over md5-hashed unigram+bigram buckets (B=10000)
    with add-one smoothing. Both distributions are B-sized aggregates;
    the log-ratio table broadcasts into the feature stream, so the only
    corpus-sized shuffle is the per-doc sum. The oracle re-derives the
    bucketing, both distributions, and the sum in SQL; rounded to 6 so
    partition-order FP noise can't flip the hash."""
    from vastdb_sdk_spark.operators.sampling import dsir_logratio_weights

    d = _t(spark, sf, "documents")
    out = dsir_logratio_weights(
        d, d.filter(F.col("lang") == "en"), "text", "doc_id",
        num_buckets=10_000, seed=42,
    )
    return out.select(
        "doc_id", F.round("dsir_weight", 6).alias("dsir_weight")
    )


def q_el6_bloom_point(spark, sf):
    """Per-file Bloom column-index file skipping under the gate
    (table.build_column_index / plans/bloom.py — the planning-time
    point-lookup path for UNSORTED high-cardinality columns, the case
    Elysium sort order (el1-el5) and min/max stats leave open): orders
    lands as 8 separate files (chunked inserts), a Bloom index on
    o_orderkey is built, and an isin over the 3 smallest keys must
    prune the scan to fewer candidate files than the manifest total —
    a prune_preview that fails to skip appends a sentinel row that
    breaks the hash. Correctness is unconditional (no false negatives,
    path-keyed sidecar), so the result rows must equal the oracle's
    plain IN-subquery scan exactly."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D

    key = (sf, "__bloom_orders")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_bloom_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        tbl = _pq.read_table(f"{sf}/orders.parquet")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table("orders", tbl.schema)
            n = tbl.num_rows
            step = (n + 7) // 8
            for i in range(0, n, step):
                t.insert(tbl.slice(i, step))
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("orders").build_column_index(
                "o_orderkey"
            )
        _ENGINE_WAREHOUSES[key] = wh
    wh = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        t = tx.bucket("b").schema("s").table("orders")
        lowest = sorted(
            r[0]
            for r in t.select_df(columns=["o_orderkey"])
            .orderBy("o_orderkey")
            .limit(3)
            .collect()
        )
        pred = D.o_orderkey.isin(lowest)
        pv = t.prune_preview(pred)
        out = t.select_df(
            columns=["o_orderkey", "o_custkey", "o_totalprice"], predicate=pred
        )
    if pv["candidate_files"] >= pv["total_files"]:
        out = out.unionByName(
            out.sparkSession.createDataFrame(
                [(-999, -999, -999.0)], out.schema
            )
        )
    return out


def q_e23_matview_rollup(spark, sf):
    """Rollup SERVING from materialized-view state under the gate
    (table.aggregate_df / matview.rollup_from_state — the OLAP payoff
    of the MV tier: a GROUP BY lang query answered by folding the
    (lang, source) view's state — counts and sums add, HLL sketches
    union — reading kilobytes of state instead of scanning the base):
    the corpus is imported, a (lang, source) view with count/sum/
    approx_distinct state is built, a later transaction deletes every
    3rd doc, the view refreshes INCREMENTALLY, and the rollup must be
    routed to the view (a base-scan routing or a non-incremental
    refresh appends a sentinel row). The oracle aggregates the
    reproduced final state directly — including COUNT(DISTINCT
    source), which the HLL sketch must match exactly at this
    cardinality (sparse mode; far below promotion)."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    key = (sf, "__mv_rollup")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_mvr_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("docs").create_materialized_view(
                "by_ls",
                ["lang", "source"],
                {
                    "n": "count",
                    "chars": ("sum", "n_chars"),
                    "u": ("approx_distinct", "source"),
                },
                num_buckets=8,
            )
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("docs").delete_where(
                D.doc_id % 3 == 0
            )
        with session.transaction() as tx:
            res = tx.bucket("b").schema("s").table("docs").materialized_view(
                "by_ls"
            ).refresh(mode="auto")
        _ENGINE_WAREHOUSES[key] = (wh, res)
    wh, res = _ENGINE_WAREHOUSES[key]

    spec = {
        "n": "count",
        "chars": ("sum", "n_chars"),
        "avg_chars": ("avg", "n_chars"),
        "u_src": ("approx_distinct", "source"),
    }
    with vastdb.connect(wh, spark=spark).transaction() as tx:
        t = tx.bucket("b").schema("s").table("docs")
        route = t.explain_aggregate(["lang"], spec)
        out = t.aggregate_df(["lang"], spec).select(
            "lang",
            "n",
            "chars",
            F.round("avg_chars", 4).alias("avg_chars"),
            "u_src",
        )
    if route != {"served_by": "matview:by_ls"} or res.get("mode") != "incremental":
        out = out.unionByName(
            out.sparkSession.createDataFrame(
                [("__not_served_by_view__", -1, -1, -1.0, -1)], out.schema
            )
        )
    return out


def q_ds_weighted_sample(spark, sf):
    """Weighted sampling WITHOUT replacement (operators/sampling.
    weighted_sample — the importance-weighted corpus subsample step:
    pick k docs per language with probability proportional to length):
    Efraimidis-Spirakis A-ES keys ln(u)/w over a DETERMINISTIC
    md5-derived uniform, top-25 per lang. The rank-filter window
    compiles to WindowGroupLimit (map-side pre-trim: a hot group ships
    ~k rows per task, never the corpus). The oracle re-derives the
    exact 48-bit hash, the uniform, the key and the ranking in SQL —
    the winner SET must match id-for-id, so any drift in the hash
    arithmetic or tie-break is a hash mismatch, not a statistical
    wobble."""
    from vastdb_sdk_spark.operators.sampling import weighted_sample

    d = _t(spark, sf, "documents")
    out = weighted_sample(
        d, "n_chars", k=25, id_col="doc_id", group_cols=["lang"], seed=42
    )
    return out.select("doc_id", "lang", "n_chars")


def q_ts_gapfill(spark, sf):
    """Time-series regularization with linear gap interpolation
    (operators/timeseries.resample — dense per-user daily series from
    the irregular events stream, the feature-window prerequisite for
    sequence models): observations collapse to one MAX per (user, day)
    bucket (order-free, so no intra-bucket row-order hazard), the grid
    is a per-group sequence explode bounded by each user's own span,
    and empty buckets lerp between the nearest non-empty neighbors —
    ``prev + (next - prev) * k / n`` in exact integer k, n, the same
    left-associated expression the oracle evaluates. No UDFs, no
    collects; the only shuffles are the bucket groupBy and the
    per-user fill windows."""
    from vastdb_sdk_spark.operators.timeseries import resample

    ev = _t(spark, sf, "events")
    out = resample(
        ev,
        "ts",
        ["user_id"],
        86_400_000_000,
        "value",
        how="interp",
        bucket_agg="max",
    )
    return out.select(
        "user_id",
        "bucket_ts",
        "observed",
        F.round("filled", 6).alias("filled"),
    )


def q_tx_nb_train(spark, sf):
    """Multinomial Naive Bayes TRAINING in-engine (operators/lm.
    naive_bayes_train — the labeled-classifier complement of
    tx_clf_quality's apply-only step: fit the domain/language/quality
    classifier on the corpus itself): per-(label, token) add-one-
    smoothed log-likelihoods with documents.lang as the label. Fit is
    ONE explode + groupBy(label, token) word count; class totals and
    the vocabulary size ride broadcast/1-row joins — nothing
    corpus-sized moves after the count shuffle. The oracle recomputes
    the identical counts and ln() formula in SQL; emitted weights are
    capped to count >= 5 (classifier-sized output) and rounded to 6 so
    libm noise can't flip the hash."""
    from vastdb_sdk_spark.operators.lm import naive_bayes_train

    d = _t(spark, sf, "documents")
    weights, _priors = naive_bayes_train(d, "lang", "text", min_count=5)
    return weights.select(
        F.col("label").alias("lang"),
        "tok",
        F.round("__ll", 6).alias("ll"),
        F.col("__count").alias("n"),
    )


def q_tx_nb_classify(spark, sf):
    """Naive Bayes CLASSIFICATION with the in-engine-trained model
    (operators/lm.naive_bayes_classify): self-train on documents.lang,
    then predict each document's label — prior + Σ ln p(token|class)
    with smoothed unseen-token mass, argmax over classes (ties to the
    smaller label). Plan (r12): weights pivot to one row per token with
    an ll column per class; the token stream left-joins that BROADCAST
    vocabulary ONCE (no x#classes row fan-out) and a single
    groupBy(doc_id) computes all class sums as parallel aggregates;
    argmax + margin are a pure expression over the score columns. Only
    predictions with best-vs-runner-up margin >= 0.001 are emitted, so
    partition-order FP noise (~1e-13) cannot flip a near-tie into a
    hash mismatch on either engine."""
    from vastdb_sdk_spark.operators.lm import (
        naive_bayes_classify,
        naive_bayes_train,
    )

    d = _t(spark, sf, "documents")
    # the trained model is classifier-sized (vocab x classes); persist it
    # per (sf, session) so repeated actions measure CLASSIFICATION, not a
    # re-run of the training aggregation under every classify plan (the
    # round-10 warm spread was plan-reuse luck on exactly that)
    key = (sf, "__nb_model", spark)
    if key not in _ENGINE_WAREHOUSES:
        weights, priors = naive_bayes_train(d, "lang", "text")
        weights = weights.persist()
        priors = priors.persist()
        weights.count(), priors.count()
        _ENGINE_WAREHOUSES[key] = (weights, priors)
    weights, priors = _ENGINE_WAREHOUSES[key]
    out = naive_bayes_classify(
        d, weights, priors, "text", "doc_id", min_margin=0.001
    )
    return out.select("doc_id", "predicted")


def q_tx_zipf_slope(spark, sf):
    """Zipf rank-frequency diagnostic (operators/lm.zipf_slope): OLS
    slope of ln(count) vs ln(rank) over the top-100 vocabulary head —
    the one-number corpus-health check (natural text ≈ -1; templated or
    over-deduplicated corpora drift flat). Every ln() input is an exact
    integer, the OLS sums cover only 100 rows, and nothing corpus-sized
    moves after the word-count shuffle."""
    from vastdb_sdk_spark.operators.lm import zipf_slope

    d = _t(spark, sf, "documents")
    out = zipf_slope(d, top_n=100)
    return out.select(
        "n_terms",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    )


def q_ds_borda_quality(spark, sf):
    """Multi-signal Borda rank fusion (operators/sampling.borda_topk):
    blend n_chars and token count into one quality ordering without
    inventing a weighting — rank per signal (competition ranking),
    average, keep the best 100. The Spark side derives each rank from
    the per-VALUE count table (cumulative window over distinct values +
    broadcast join back — no corpus-sized single-partition window); the
    oracle is the plain corpus-wide RANK() window, so the gate proves
    the decomposition identical to the textbook definition."""
    from vastdb_sdk_spark.operators.sampling import borda_topk

    d = _t(spark, sf, "documents")
    sig = d.select(
        "doc_id",
        "n_chars",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )
    return borda_topk(sig, ["n_chars", "n_tokens"], k=100)


def q_dd_winnow(spark, sf):
    """MOSS winnowing fingerprints (operators/dedup.winnow_fingerprints
    — Schleimer et al. 2003): every k=5-token gram is hashed, a w=4-gram
    sliding window selects the rightmost-minimal hash, and only those
    ~2/(w+1) selections are kept — the guaranteed-recall sub-sample
    (any shared run of >= w+k-1 tokens shares a fingerprint) that makes
    exact-substring dedup indexes affordable at corpus scale. The
    rightmost-min selection is ONE string window-MIN per document over
    ``md5 || '#' || zeropad(1e9 - pos)`` — no UDF, and DuckDB evaluates
    the identical expression, so the oracle reproduces every selected
    (doc, pos, hash) triple exactly."""
    from vastdb_sdk_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf, "documents")
    return winnow_fingerprints(d, k=5, w=4)


def q_w9_hopping_window(spark, sf):
    """Hopping (sliding) event-time window aggregation — 1 h windows
    every 15 min, the batch twin of streaming `F.window(size, slide)`:
    each event belongs to exactly size/hop = 4 windows, made explicit as
    an explode over the 4 hop offsets with window starts in EXACT
    integer micros (ts is read as epoch-micros int64; no timezone, no
    float). The explode is a 4x map-side fan-out feeding one
    partial-aggregated groupBy — the same shape Spark's own sliding
    window generates, with the window-start arithmetic shared verbatim
    with the oracle."""
    ev = _t(spark, sf, "events")
    hop = 900_000_000  # 15 min in us; size = 4 hops = 1 h
    return (
        ev.withColumn("__k", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .groupBy(
            F.expr(f"((ts div {hop}) - __k) * {hop}").alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_a11_grouping_sets(spark, sf):
    """GROUPING SETS aggregation (§2.4 breadth beyond a4's ROLLUP): a
    non-hierarchical set list — (flag, status), (status), () — that
    ROLLUP/CUBE cannot express. Spark expands it to a single Expand +
    partial-aggregated groupBy: one shuffle for all three grouping
    levels, not one job per set."""
    li = _t(spark, sf, "lineitem")
    li.createOrReplaceTempView("__a11_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM __a11_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus), ())
        """
    )


def q_tx_length_percentiles(spark, sf):
    """Exact per-language length distribution (operators/sampling.
    exact_group_percentiles — nearest-rank/type-1 percentiles where
    percentile_approx's error bars are unacceptable): the p-th
    percentile is the value at sorted rank ceil(p*n) computed with
    INTEGER arithmetic ((num*n + den-1) div den), so there is no
    floating-point ceil boundary for the engines to disagree on (0.9*30
    = 27.000000000000004 in a double). One window sort per language
    partition + a conditional aggregate — a single shuffle."""
    from vastdb_sdk_spark.operators.sampling import exact_group_percentiles

    d = _t(spark, sf, "documents")
    return exact_group_percentiles(
        d, "n_chars", "lang", percentiles=(0.5, 0.9, 0.99), id_col="doc_id"
    )


def q_dd_line_dedup(spark, sf):
    """Line-level corpus dedup (operators/dedup.remove_duplicate_lines —
    the RefinedWeb/C4 boilerplate-removal stage: navbars, cookie banners
    and license footers survive DOCUMENT-level dedup because each host
    document is unique, so they are dropped line-by-line when a line
    appears verbatim in >= min_docs distinct documents). Docs get
    DETERMINISTIC multi-line structure: a corpus-wide notice line, a
    blank line (blank lines are structure — always kept), a unique
    per-doc header, the body, and a footer shared by the even half. The
    cleaned text must match the oracle byte-for-byte (md5 + length +
    kept/dropped counts). Plan: explode -> md5-keyed dup table
    (distinct-lines-sized) -> left_anti -> one per-doc reassembly; two
    uniform-hash shuffles, no collect, no Python."""
    from vastdb_sdk_spark.operators.dedup import remove_duplicate_lines

    d = _t(spark, sf, "documents")
    i = F.col("doc_id").cast("string")
    aug = F.concat(
        F.lit("NOTICE: provided as-is with no warranty\n\ndoc "),
        i,
        F.lit(" begins\n"),
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0, F.lit("\nSHARED FOOTER ALPHA")
        ).otherwise(F.concat(F.lit("\ntail "), i)),
    )
    out = remove_duplicate_lines(
        d.select("doc_id", aug.alias("text")), min_docs=2
    )
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        F.length("text_clean").alias("n_chars"),
        "n_lines_kept",
        "n_lines_dropped",
    )


def q_dd_minhash_join(spark, sf):
    """Two-table MinHash fuzzy join (operators/dedup.minhash_join —
    record linkage / cross-corpus contamination: link an incoming batch
    to the corpus by shingle-set similarity without |L|x|R| work). The
    right side is every 11th document with a short deterministic suffix
    (shingle-set Jaccard ~0.9 to its origin, length-dependent); both
    sides run the SAME md5 MinHash permutations and band split, and the
    oracle replays the ENTIRE algorithm in SQL — signatures, band keys,
    the cross-table candidate join, and the exact-Jaccard verify — so
    precision AND recall (including any banding miss) must reproduce
    id-for-id. Plan: per-band hash-key equi-join across the tables,
    |bucket_L| x |bucket_R| per bucket, exact verify on candidates only."""
    from vastdb_sdk_spark.operators.dedup import minhash_join

    d = _t(spark, sf, "documents")
    right = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("rid"),
        F.concat(F.col("text"), F.lit(" linkage probe variant")).alias("body"),
    )
    return minhash_join(
        d,
        right,
        left_text="text",
        right_text="body",
        left_id="doc_id",
        right_id="rid",
        threshold=0.8,
        num_hashes=16,
        num_bands=4,
        shingle_k=3,
        hash_fn="md5",
    )


def q_tx_rrf_fusion(spark, sf):
    """Reciprocal Rank Fusion (operators/lm.rrf_fuse — Cormack et al.
    2009, the training-free hybrid-search fusion): BM25 top-50 for
    ["hash","join","filter"] fused with the exact-cosine top-50 against
    vec 7 at k=60, final cut 20. Only RANKS enter the fused score —
    each term is 1/(60+r) with integer r summed left-to-right, so the
    doubles are bit-identical cross-engine (the cosine RANKING itself
    is safe because the sequential zip_with fold is bit-identical to
    DuckDB's list_cosine_similarity, measured at ds_cluster_assign).
    Plan: two zero-shuffle scans + two TakeOrdered(50) shortlists, one
    tiny full-outer join — shortlist-sized regardless of corpus."""
    from vastdb_sdk_spark.functions.vector import cosine_similarity
    from vastdb_sdk_spark.operators.lm import bm25_scores, rrf_fuse

    d = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    vec = _query_vec(spark, sf, 7)
    lex = (
        bm25_scores(d, ["hash", "join", "filter"])
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", F.col("bm25").alias("score"))
    )
    qlit = F.array(*[F.lit(float(x)) for x in vec])
    sem = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), qlit).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )
    out = rrf_fuse([lex, sem], k=60, top_k=20)
    return out.select(
        "doc_id", "rank_1", "rank_2", F.round("rrf", 9).alias("rrf")
    )


def q_ann_pca_project(spark, sf):
    """PCA embedding projection (operators/similarity.pca_fit +
    pca_project — linear dimension reduction for the embedding tier;
    distributed moment accumulation, d^2+d-double collect, driver eigh,
    broadcast GEMM projection). The corpus is DETERMINISTIC exact-rank-3
    data in coordinates 2/5/9 of the 64-dim space — a=(id*7)%13,
    b=(id*11)%17, c=(id*3)%19 — plus a CONSTANT 4.0 on coordinate 0
    that centering must annihilate. Because the centered data lies
    exactly in the recovered top-3 subspace, the projected squared
    distance of every row to row 0 is EXACTLY a^2+b^2+c^2 — an integer
    the oracle computes with pure modular arithmetic (float noise ~1e-9
    vs a 0.5 rounding margin: no knife edge). A broken mean removal,
    basis recovery, or projection GEMM all shift the integers."""
    from vastdb_sdk_spark.operators.similarity import pca_fit, pca_project

    emb = _t(spark, sf, "embeddings")
    a = (F.col("vec_id") * 7 % 13).cast("double")
    b = (F.col("vec_id") * 11 % 17).cast("double")
    c = (F.col("vec_id") * 3 % 19).cast("double")
    coords = {0: F.lit(4.0), 2: a, 5: b, 9: c}
    vec = F.array(*[coords.get(i, F.lit(0.0)) for i in range(64)])
    df = emb.select("vec_id", vec.alias("embedding"))
    model = pca_fit(df, k=3)
    proj = pca_project(df, model)
    p0 = proj.filter(F.col("vec_id") == 0).select(
        F.col("pca").alias("__p0")
    )
    d2 = F.aggregate(
        F.zip_with("pca", "__p0", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return proj.crossJoin(F.broadcast(p0)).select(
        "vec_id", F.round(d2, 0).cast("long").alias("d2")
    )


def q_ds_token_budget(spark, sf):
    """Token-budget mix construction (operators/sampling.
    sample_to_token_budget — the "take N tokens of web, M of code" step
    every pretraining recipe ends with): six sources get budgets
    spanning the regimes (tiny=1 token keeps exactly one doc, 0 drops
    the source, huge keeps everything, mid-range cuts at the crossing
    doc); unbudgeted sources are dropped. Selection is the md5(id)-order
    prefix with cumulative-before < budget (the crosser is kept), so
    the survivor set is a pure integer/hash computation the oracle
    replays with the identical window. One cumsum window per source —
    a single shuffle keyed by source."""
    from vastdb_sdk_spark.operators.sampling import sample_to_token_budget

    d = _t(spark, sf, "documents")
    d = d.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).alias("n_tokens")
    )
    budgets = {
        "src0": 800,
        "src3": 400,
        "src5": 1,
        "src7": 10_000_000,
        "src12": 0,
        "src19": 500,
    }
    return sample_to_token_budget(d, budgets).select(
        "doc_id", "source", "n_tokens"
    )


def q_tx_kl_drift(spark, sf):
    """Corpus-drift diagnostic (operators/lm.kl_drift_terms): even-id
    docs (with a deterministic ' driftmarker xq' suffix) vs odd-id docs;
    the top-40 terms by KL contribution p_A ln(p_A/p_B) over the
    add-one-smoothed union vocabulary. Every ln() input is a ratio of
    exact integers (the nb_train discipline) so per-term doubles are
    bit-identical cross-engine; the planted driftmarker/xq terms must
    surface at the top. One word-count shuffle per side + a
    vocabulary-sized full-outer join + TakeOrdered(40)."""
    from vastdb_sdk_spark.operators.lm import kl_drift_terms

    d = _t(spark, sf, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.col("text"), F.lit(" driftmarker xq")).alias("text")
    )
    b = d.filter(F.col("doc_id") % 2 == 1).select("text")
    out = kl_drift_terms(a, b, top_k=40)
    return out.select(
        "term",
        "count_a",
        "count_b",
        F.round("contribution", 12).alias("contribution"),
    )


def q_ds_shard_assign(spark, sf):
    """Deterministic training-export sharding (operators/sampling.
    assign_shards): shard = Knuth-fold bucket of the id (sources
    interleave), pos = md5-rank within the shard — the reproducible
    well-mixed order every pretraining export needs (resume from step k,
    bisect a data bug). Both columns are pure functions of the id, so
    the oracle replays them with the identical integer arithmetic and
    window. One uniform-key shuffle."""
    from vastdb_sdk_spark.operators.sampling import assign_shards

    d = _t(spark, sf, "documents")
    return assign_shards(d.select("doc_id"), 8)


def _sig_template_clone(spark, sf):
    """Clone of the (sf, process)-cached signature-index template
    warehouse: documents imported + the banded MinHash signature table
    FULLY built (sync_minhash_signatures, md5 path). The template is
    immutable after build; callers churn the clone, so a warm bench run
    measures the maintenance path users actually pay. Shared by
    e25_sig_sync and the r15-pending tx_minhash_cdf_incremental."""
    import shutil
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    key = (sf, "__sig_template")
    if key not in _ENGINE_WAREHOUSES:
        template = tempfile.mkdtemp(prefix="entry_sig_tmpl_")
        session = vastdb.connect(template, spark=spark)
        session.create_bucket("b")
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
            sc.create_table(
                "sig",
                pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("band_id", pa.int32()),
                        ("band_key", pa.string()),
                    ]
                ),
            )
        with session.transaction() as tx:
            docs = tx.bucket("b").schema("s").table("docs")
            sig = tx.bucket("b").schema("s").table("sig")
            sync_minhash_signatures(docs, sig, hash_fn="md5")
        _ENGINE_WAREHOUSES[key] = template
    wh = tempfile.mkdtemp(prefix="entry_sig_")
    shutil.rmtree(wh)
    shutil.copytree(_ENGINE_WAREHOUSES[key], wh)
    return wh


def q_e25_sig_sync(spark, sf):
    """Batch dedup-index lifecycle (sources/replicate.
    sync_minhash_signatures over sync_derived_rows): documents imported,
    the banded MinHash signature table fully built, then churn —
    DELETE WHERE doc_id%7=0, UPDATE doc 3's text, INSERT doc 9001 —
    folded by a second sync with mode='incremental' EXPLICITLY: this
    gate oracle-checks the churn-bounded fold itself (one matched-delete
    MERGE on affected keys + re-derive of final images; any fallback
    appends a gate-breaking sentinel). The default mode='auto' would
    legitimately route this small corpus to a full rebuild — the
    cost-based router (sync_derived_rows: manifest-stats size floor +
    changed-row fraction, zero data I/O) exists precisely because the
    fold's fixed intercept loses below ~1e5 rows; forcing incremental
    here keeps the HARD path under the oracle at every sf.
    The md5 hash path makes the whole index SQL-reproducible: the
    oracle rebuilds the post-churn corpus and replays signatures and
    band keys via the shared _mh_lsh_chain_sql — a maintained index
    that drifted from the from-scratch derivation fails id-for-id."""
    import shutil
    import tempfile

    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    def _tables(tx):
        return tx.bucket("b").schema("s").table("docs"), tx.bucket(
            "b"
        ).schema("s").table("sig")

    # The expensive, churn-INDEPENDENT setup (import + full initial
    # signature build) is a template warehouse cached per (sf, process) —
    # the same harness/operator cost split ann_ivfpq_persisted got in
    # round 10. Each call clones the template (manifest JSONs + the
    # signature parquet; the docs import is zero-copy so nothing big
    # copies) and runs churn + the incremental fold on the CLONE, so a
    # warm bench run measures the maintenance path users actually pay,
    # while the correctness surface (churn-fold vs from-scratch oracle)
    # is identical every call. Cloned manifests still reference the
    # template's initial-sync data files by absolute path; the template
    # is immutable after build, and all churn postimages land in the
    # clone's own data dir.
    wh = _sig_template_clone(spark, sf)
    session = vastdb.connect(wh, spark=spark)
    with session.transaction() as tx:
        docs, _ = _tables(tx)
        docs.delete_where(D.doc_id % 7 == 0)
        docs.update_where(
            D.doc_id == 3, {"text": "entirely new rewritten body"}
        )
        docs.insert(
            pa.table(
                {
                    "doc_id": pa.array([9001], pa.int64()),
                    "text": pa.array(["fresh document appended after sync"]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["srcX"]),
                    "n_chars": pa.array([34], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        docs, sig = _tables(tx)
        r = sync_minhash_signatures(docs, sig, hash_fn="md5", mode="incremental")
    tx = session.transaction()
    _, sig = _tables(tx)
    out = sig.select_df(columns=["doc_id", "band_id", "band_key"])
    if r["mode"] != "incremental":
        out = out.unionByName(
            spark.createDataFrame(
                [(-999999, -1, "SENTINEL: sync was not incremental")],
                "doc_id long, band_id int, band_key string",
            )
        )
    return out


def q_e26_sql_views(spark, sf):
    """Logical SQL views (schema.create_view + sqlfront CREATE/DROP VIEW,
    SHOW VIEWS — catalog objects stored in the schema's manifest entry,
    transactional, bound FRESH at every read against the reading
    transaction's snapshot; views nest, and cycles are a clean bind-time
    error). Documents imported, a per-(lang, source) aggregate view
    created, then a view-on-view filtering it; the final SELECT runs
    through BOTH layers plus a join back to the base table. The oracle
    is the composed query written directly against documents."""
    import tempfile

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark.sources import create_table_from_files

    session = vastdb.connect(tempfile.mkdtemp(prefix="entry_vw_"), spark=spark)
    session.create_bucket("b")
    with session.transaction() as tx:
        sc = tx.bucket("b").create_schema("s")
        create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
    session.execute_sql(
        "CREATE VIEW b.s.lang_stats AS"
        " SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars) AS chars"
        " FROM b.s.docs GROUP BY lang, source"
    )
    session.execute_sql(
        "CREATE VIEW b.s.big_sources AS"
        " SELECT lang, source, n_docs, chars FROM b.s.lang_stats"
        " WHERE n_docs >= 5"
    )
    return session.execute_sql(
        "SELECT v.lang, v.source, v.n_docs, v.chars,"
        " COUNT(*) AS n_join_rows"
        " FROM b.s.big_sources v JOIN b.s.docs d"
        " ON v.lang = d.lang AND v.source = d.source"
        " GROUP BY v.lang, v.source, v.n_docs, v.chars"
    )


def q_tx_kn_logprob(spark, sf):
    """Interpolated Kneser-Ney bigram scoring (operators/lm.
    kn_bigram_logprob_scores — the KenLM-style smoothing: absolute
    discounting redistributes d*N1+(v,.) of each prefix's mass to the
    continuation model N1+(.,w)/D, so words frequent only in one
    context stop inflating stitched boilerplate). Fit on the corpus
    itself; every arithmetic input is an exact integer and d=0.75 is
    dyadic, so per-bigram doubles are bit-identical cross-engine; the
    per-doc mean is rounded to 6 (the tx_bigram_logprob discipline).
    Model tables are vocabulary-sized broadcasts — the exploded stream
    never shuffles."""
    from vastdb_sdk_spark.operators.lm import kn_bigram_logprob_scores

    d = _t(spark, sf, "documents")
    out = kn_bigram_logprob_scores(d, "text", "doc_id", discount=0.75)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("kn_logprob"), 6).alias("kn_lp"),
    )


def q_tx_span_corrupt(spark, sf):
    """T5 span corruption (operators/augment.span_corrupt — Raffel et al.
    2020 §3.1.4, the denoising-objective data pipeline as a corpus
    operator): mask ~15% of tokens in mean-3 spans, one sentinel per
    merged span in the input, sentinel-prefixed span contents plus a
    closing sentinel in the target. Masking is a pure function of
    (doc_id, position) via md5 bits, so the ENTIRE transform — start
    decisions, span lengths, coverage merging, sentinel numbering, both
    reassembled strings — replays in SQL (the nibble polynomial +
    identical windows). Two doc-keyed shuffles, no Python, no RNG."""
    from vastdb_sdk_spark.operators.augment import span_corrupt

    d = _t(spark, sf, "documents")
    return span_corrupt(d, corruption_rate=0.15, mean_span=3)


def q_tx_prefix_lm(spark, sf):
    """Prefix-LM pairs (operators/augment.prefix_lm_split — the UL2
    S-denoiser: deterministic split point drawn from md5 bits of the doc
    id, uniform over [25%, 75%] of each doc's length; prefix conditions,
    suffix is the target; n>=2 always leaves both non-empty). Pure
    Column expressions — zero shuffle, zero Python, the scan stays in
    whole-stage codegen. The oracle replays the hash arithmetic and the
    slice boundaries exactly."""
    from vastdb_sdk_spark.operators.augment import prefix_lm_split

    d = _t(spark, sf, "documents")
    return prefix_lm_split(d)


def q_tx_mlm_mask(spark, sf):
    """BERT MLM pairs (operators/augment.mlm_mask — Devlin et al. 2019
    80/10/10): selection, branch, and the doc-local replacement token
    are all md5 bits of (doc_id, position), so the full transform —
    masked input string AND the pos:original label list — replays in
    SQL. One doc-keyed shuffle, no Python, no RNG."""
    from vastdb_sdk_spark.operators.augment import mlm_mask

    d = _t(spark, sf, "documents")
    return mlm_mask(d, mask_rate=0.15)


def q_tx_contrastive(spark, sf):
    """Contrastive triples (operators/augment.contrastive_pairs — the
    SimCSE/DPR in-corpus recipe): anchor/positive are a doc's first two
    16-token chunks, the negative is the next doc's positive on the md5
    ring WITHIN an 8-way hash bucket (windows bucket-sized, never
    corpus-sized; singleton buckets yield nothing). Deterministic ring
    arithmetic replayed exactly in SQL."""
    from vastdb_sdk_spark.operators.augment import contrastive_pairs

    d = _t(spark, sf, "documents")
    return contrastive_pairs(d, chunk_tokens=16, num_buckets=8)


def q_tx_collapse_repeats(spark, sf):
    """Consecutive-repeat line collapse (functions/text.
    collapse_repeated_lines — chat echo / boilerplate stutter cleanup,
    the row-local counterpart to corpus-level line dedup): docs get a
    DETERMINISTIC stuttered structure — a doubled header, the body, a
    tripled per-doc tail — and the collapsed text must match the oracle
    byte-for-byte. Pure codegen'd Column, zero shuffle."""
    from vastdb_sdk_spark.functions.text import collapse_repeated_lines

    d = _t(spark, sf, "documents")
    i = F.col("doc_id").cast("string")
    aug = F.concat(
        F.lit("HEADER LINE\nHEADER LINE\n"),
        F.col("text"),
        F.lit("\ntail "), i, F.lit("\ntail "), i, F.lit("\ntail "), i,
    )
    clean = collapse_repeated_lines(aug)
    return d.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).alias("n_chars"),
        F.size(F.split(clean, "\n", -1)).alias("n_lines"),
    )


def q_ds_score_normalize(spark, sf):
    """Per-source score calibration (operators/sampling.
    normalize_scores_per_group — a classifier score of 0.7 means
    different things on web text and on code, so the within-group
    z-score and percent rank are the standard step between scoring and
    a mix-wide threshold). Scored on n_chars grouped by lang; z rounded
    to 6 (stddev's partition-order FP noise), pct exact rational."""
    from vastdb_sdk_spark.operators.sampling import normalize_scores_per_group

    d = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("score")
    )
    out = normalize_scores_per_group(d, "score", "lang")
    return out.select(
        "doc_id",
        "lang",
        F.round("z", 6).alias("z"),
        F.round("pct", 6).alias("pct"),
    )


def q_tx_chat_render(spark, sf):
    """SFT chat rendering with loss-mask spans (operators/augment.
    render_chat): documents become DETERMINISTIC 4-turn transcripts
    (user/assistant alternating, contents sliced from the token stream),
    rendered ChatML-style; the gate hashes the rendered text AND the
    flattened (start:length) span list pointing at the assistant
    contents — pure integer offset arithmetic the oracle reproduces in
    closed form. Two transcript-keyed shuffles, no Python."""
    from vastdb_sdk_spark.operators.augment import render_chat

    d = _t(spark, sf, "documents")
    tk = _tokens(F.col("text"))
    msg = lambda role, content: F.struct(  # noqa: E731
        F.lit(role).alias("role"), content.alias("content")
    )
    msgs = F.array(
        msg("user", F.array_join(F.slice(tk, 1, 5), " ")),
        msg("assistant", F.array_join(F.slice(tk, 6, 5), " ")),
        msg("user", F.concat(F.lit("continue "), F.col("doc_id").cast("string"))),
        msg(
            "assistant",
            F.array_join(
                F.slice(
                    tk,
                    11,
                    F.greatest(F.size(tk) - 10, F.lit(0)),
                ),
                " ",
            ),
        ),
    )
    out = render_chat(d.select("doc_id", msgs.alias("messages")))
    span_str = F.concat_ws(
        " ",
        F.transform(
            F.col("spans"),
            lambda sp: F.concat(
                sp["start"].cast("string"), F.lit(":"), sp["length"].cast("string")
            ),
        ),
    )
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").alias("n_chars"),
        span_str.alias("spans"),
        "n_turns",
        "n_masked_turns",
    )


# ---------------------------------------------------------------------------
# registry


# ---------------------------------------------------------------------------
# r15-PENDING gate queries (VERDICT r13 #4): builders + oracle SQL land a
# round EARLY, pytest-exercised at sf0.001, but stay OUT of queries() /
# oracle_sql() until the registry unfreezes in r15 (SCALING.md plan) —
# one new oracle device at a time, and every new entry gates the round
# it lands with a first-HEADLINE bench row in the same commit.


def q_mm_decode_bmp(spark, sf):
    """Codec-backed multimodal decode (operators/imagecodec.decode_rgb +
    operators/multimodal.image_stats — makes the r13 decode seam
    load-bearing under the gate; reference treats media as opaque blobs,
    so this is beyond-parity per BASELINE.json). The id-arithmetic
    fixture device (SCALING.md r15 plan #1): each document gets a 6x4
    24bpp BMP whose row-major RGB flattening is pixel[i] =
    (doc_id*31 + i) % 251, so the integer-exact stats — px_sum and the
    POSITION-weighted px_wsum — are closed forms DuckDB computes from
    the id alone. The oracle never decodes, yet any decode bug (4-byte
    row padding, BGR order, bottom-up origin) shifts px_wsum and breaks
    the match. Spark side: one mapInPandas to build payloads, one
    Arrow-batched mapInPandas to decode — embarrassingly parallel, no
    shuffle anywhere."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.imagecodec import encode_bmp
    from vastdb_sdk_spark.operators.multimodal import image_stats

    H, W = 4, 6
    nb = H * W * 3

    def build(it):
        for pdf in it:
            idx = np.arange(nb, dtype=np.int64)
            payloads = [
                encode_bmp(((int(d) * 31 + idx) % 251).astype(np.uint8).reshape(H, W, 3))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    # no repartition pin here (measured at sf0.1: the 72-byte encode+
    # decode chain is ~10us/row, so a shuffle costs more than the single
    # task it breaks up — 0.50s single-task vs 0.93s pinned); production
    # media tables get multi-task scans from their file splits natively
    media = _t(spark, sf, "documents").select("doc_id").mapInPandas(
        build, "media_id long, payload binary"
    )
    return image_stats(media)


def q_mm_decode_wav(spark, sf):
    """Codec-backed AUDIO decode (operators/audiocodec.decode_wav +
    multimodal.audio_stats — the audio twin of mm_decode_bmp, making the
    second media modality load-bearing under the gate; reference treats
    media as opaque blobs, so beyond-parity per BASELINE.json). The
    id-arithmetic fixture device: each document gets a 200-frame 16-bit
    mono 16 kHz WAV whose interleaved sample stream is sample[i] =
    (doc_id*31 + i) % 251, so s_sum and the POSITION-weighted s_wsum are
    closed forms DuckDB computes from the id alone — the oracle never
    parses RIFF, yet chunk-walk/alignment/endianness bugs shift s_wsum
    and break the match. One mapInPandas to build payloads, one
    Arrow-batched mapInPandas to decode — no shuffle anywhere (per-row
    work is ~microseconds, so no repartition pin: the mm_decode_bmp
    measurement)."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.audiocodec import encode_wav
    from vastdb_sdk_spark.operators.multimodal import audio_stats

    N, RATE = 200, 16000

    def build(it):
        idx = np.arange(N, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_wav(
                    ((int(d) * 31 + idx) % 251).astype(np.int16)[:, None], RATE
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = _t(spark, sf, "documents").select("doc_id").mapInPandas(
        build, "media_id long, payload binary"
    )
    return audio_stats(media)


def q_mm_decode_jpeg(spark, sf):
    """Codec-backed LOSSY-format decode (operators/jpegcodec.decode_jpeg
    via the imagecodec.decode_rgb dispatch + multimodal.image_stats).
    JPEG is the format a real multimodal corpus contains more of than
    everything else combined; the id-arithmetic device survives the
    lossy codec via quantization-exact fixtures: each document gets a
    16x16 grayscale JPEG of four FLAT 8x8 blocks with value
    v(b) = 2*((doc_id*31 + b*17) % 128) — a flat block is DC-only and
    an even value at quality 50 (q0=16) quantizes error-free, so the
    decode is EXACT and px_sum / the position-weighted px_wsum over the
    gray->RGB expansion (pixel p contributes v at indices 3p..3p+2) are
    closed forms DuckDB computes from the id alone. The oracle never
    touches a Huffman table, yet marker-walk / dequantize / IDCT /
    predictor bugs all shift px_wsum and break the match. One
    mapInPandas to build payloads, one Arrow-batched mapInPandas to
    decode."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.jpegcodec import encode_jpeg
    from vastdb_sdk_spark.operators.multimodal import image_stats

    def build(it):
        yy, xx = np.mgrid[0:16, 0:16]
        block = (yy // 8) * 2 + (xx // 8)
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                v = 2 * ((int(d) * 31 + np.arange(4) * 17) % 128)
                payloads.append(
                    encode_jpeg(v[block].astype(np.uint8), quality=50)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    # parallelism pin (the mm_phash_neardup_real lesson, re-measured for
    # this entry): per-row Huffman encode+decode is ~0.4 ms, heavy enough
    # that the one-file -> one-task serialization dominates (probe at
    # sf0.1: 1.87 normalized unpinned -> 0.56 pinned, drift-quoted);
    # production media tables get this parallelism from file splits
    media = _t(spark, sf, "documents").select("doc_id").repartition(32).mapInPandas(
        build, "media_id long, payload binary"
    )
    return image_stats(media)


def q_mm_decode_tiff(spark, sf):
    """Codec-backed LOSSLESS-COMPRESSION decode (operators/tiffcodec +
    imagecodec.decode_rgb dispatch + multimodal.image_stats): each
    document gets a 16x16 grayscale TIFF with pixel[p] = (doc_id*31 + p)
    % 251, encoded with the MAXIMAL machinery the format allows in one
    payload — big-endian byte order, LZW (TIFF variant: MSB-first,
    EarlyChange width rule), predictor 2 horizontal differencing, and
    UNEVEN strips (rows_per_strip=5 over 16 rows: 5+5+5+1). Lossless
    means decode is byte-exact, so px_sum / the position-weighted
    px_wsum over the gray->RGB expansion stay closed forms of the id —
    the oracle never touches an IFD, yet byte-order / strip-boundary /
    LZW-width / predictor bugs all shift px_wsum and break the match.
    Same parallelism pin as mm_decode_jpeg (per-row LZW work is heavy
    enough to lose to one-file one-task serialization)."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.multimodal import image_stats
    from vastdb_sdk_spark.operators.tiffcodec import encode_tiff

    def build(it):
        p = np.arange(256, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_tiff(
                    (((int(d) * 31 + p) % 251).astype(np.uint8)).reshape(16, 16),
                    compression="lzw",
                    predictor=True,
                    big_endian=True,
                    rows_per_strip=5,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = _t(spark, sf, "documents").select("doc_id").repartition(32).mapInPandas(
        build, "media_id long, payload binary"
    )
    return image_stats(media)


def q_mm_decode_y4m(spark, sf):
    """Codec-backed VIDEO decode (operators/videocodec.decode_y4m +
    multimodal.video_stats — the third media modality made load-bearing
    under the gate, after mm_decode_bmp and mm_decode_wav; reference
    treats media as opaque blobs, so beyond-parity per BASELINE.json).
    The id-arithmetic fixture device EXTENDED TO THE TIME AXIS: each
    document gets a 10-frame 4x4 YUV4MPEG2 clip whose luma plane of
    frame f is luma[j] = (doc_id*31 + f*97 + j) % 251, so v_sum and the
    FRAME-MAJOR position-weighted v_wsum (i = f*16 + j) are closed forms
    DuckDB computes from the id alone — the oracle never parses a FRAME
    marker, yet header-walk / chroma-plane-arithmetic / frame-order bugs
    all shift v_wsum and break the match. One mapInPandas to build
    payloads, one Arrow-batched mapInPandas to decode — no shuffle
    anywhere (per-row work is ~microseconds: the mm_decode_bmp
    no-repartition measurement)."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.multimodal import video_stats
    from vastdb_sdk_spark.operators.videocodec import encode_y4m

    N_FRAMES, HW = 10, 4

    def build(it):
        j = np.arange(HW * HW, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_y4m(
                    np.stack(
                        [
                            ((int(d) * 31 + f * 97 + j) % 251)
                            .astype(np.uint8)
                            .reshape(HW, HW)
                            for f in range(N_FRAMES)
                        ]
                    ),
                    fps=(10, 1),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = _t(spark, sf, "documents").select("doc_id").mapInPandas(
        build, "media_id long, payload binary"
    )
    return video_stats(media)


def q_e29_webdataset_roundtrip(spark, sf):
    """WebDataset shard lifecycle under the gate (sources/shards.py):
    documents packed into 8 tar shards of keyed samples (txt = the text
    bytes, cls = n_chars ascii; null n_chars -> member omitted), then
    read back via read_webdataset (binaryFile one-task-per-shard) +
    group_samples and served as (doc_id, text_md5, n_chars). The oracle
    reads documents directly — any member-boundary, key-parse, pivot,
    or byte-corruption bug breaks md5/row parity. Shard build is a
    per-(sf, process) cached fixture (the e25/e16 template pattern), so
    warm measures the READ path users pay."""
    import os
    import tempfile

    from vastdb_sdk_spark.sources.shards import (
        group_samples,
        read_webdataset,
        write_webdataset_shards,
    )

    key = (sf, "__webdataset")
    if key not in _ENGINE_WAREHOUSES:
        out = tempfile.mkdtemp(prefix="entry_e29_")
        docs = _t(spark, sf, "documents").select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
            F.encode("text", "UTF-8").alias("txt"),
            F.when(
                F.col("n_chars").isNotNull(),
                F.encode(F.col("n_chars").cast("string"), "UTF-8"),
            ).alias("cls"),
        )
        write_webdataset_shards(docs, out, n_shards=8)
        _ENGINE_WAREHOUSES[key] = out
    out = _ENGINE_WAREHOUSES[key]
    members = read_webdataset(spark, out)
    samples = group_samples(members, ["txt", "cls"])
    return samples.select(
        F.col("key").cast("long").alias("doc_id"),
        F.md5("txt").alias("text_md5"),
        F.decode("cls", "UTF-8").cast("long").alias("n_chars"),
    )


def q_e27_cdf_matview_e2e(spark, sf):
    """CDF-consumer composition in ONE gated contract (SCALING.md r15
    plan #3): DML churn on an engine table -> read_changes feed ->
    feed-driven incremental matview fold -> serve, over TWO epochs. The
    output carries both the served view AND per-epoch feed counts by
    change type, so the oracle (full recompute + closed-form churn
    counts) gates the feed itself, not just the final aggregate. Update
    values are negative (impossible in organic n_chars data), so no
    update can be hash-equal and silently vanish from the feed. Either
    refresh falling back to a full rebuild (or scanning the base table)
    appends a sentinel row that breaks the hash — the incremental path
    is the gated contract, cost tracking churn, not table size."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files

    key = (sf, "__cdf_mv_e2e")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_e27_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        schema = _pq.ParquetFile(f"{sf}/documents.parquet").schema_arrow
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
        with session.transaction() as tx:  # committed clean build
            tx.bucket("b").schema("s").table("docs").create_materialized_view(
                "by_lang",
                ["lang"],
                {"n": "count", "chars": ("sum", "n_chars")},
                num_buckets=8,
            )
        with session.transaction() as tx:  # epoch-1 churn
            v0 = tx.bucket("b").manifest.version
            t = tx.bucket("b").schema("s").table("docs")
            t.delete_where(D.doc_id % 11 == 3)
            t.update_where(D.doc_id % 13 == 0, {"n_chars": -2})
        with session.transaction() as tx:  # epoch-1 feed + fold
            b = tx.bucket("b")
            v1 = b.manifest.version
            t = b.schema("s").table("docs")
            feed1 = {
                r["_change_type"]: r["count"]
                for r in t.read_changes(v0, v1).groupBy("_change_type").count().collect()
            }
            res1 = t.materialized_view("by_lang").refresh(mode="auto")
        with session.transaction() as tx:  # epoch-2 churn
            t = tx.bucket("b").schema("s").table("docs")
            t.insert(
                _pa.table(
                    {
                        "doc_id": _pa.array([900011, 900012, 900013], _pa.int64()),
                        "text": _pa.array(["e27 a", "e27 b", "e27 c"]),
                        "lang": _pa.array(["zz", "zz", "zz"]),
                        "source": _pa.array(["e27_new", "e27_new", "e27_new"]),
                        "n_chars": _pa.array([10, None, 7], _pa.int64()),
                    }
                ).cast(schema)
            )
            t.update_where(D.doc_id % 17 == 0, {"n_chars": -5})
        with session.transaction() as tx:  # epoch-2 feed + fold
            b = tx.bucket("b")
            v2 = b.manifest.version
            t = b.schema("s").table("docs")
            feed2 = {
                r["_change_type"]: r["count"]
                for r in t.read_changes(v1, v2).groupBy("_change_type").count().collect()
            }
            res2 = t.materialized_view("by_lang").refresh(mode="auto")
        _ENGINE_WAREHOUSES[key] = (wh, feed1, res1, feed2, res2)
    wh, feed1, res1, feed2, res2 = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        mv = tx.bucket("b").schema("s").table("docs").materialized_view("by_lang")
        out = mv.df().select(F.col("lang").alias("k"), "n", "chars")
    feed_rows = [
        (f"__feed{e}:{ct}", int(counts.get(ct, 0)), None)
        for e, counts in ((1, feed1), (2, feed2))
        for ct in ("insert", "delete", "update_preimage", "update_postimage")
        if counts.get(ct)
    ]
    for i, res in enumerate((res1, res2), start=1):
        if res.get("mode") != "incremental" or res.get("base_scanned"):
            feed_rows.append((f"__refresh{i}_fell_back__", -1, -1))
    return out.unionByName(
        _local_df(out.sparkSession, feed_rows, out.schema)
    )


def q_mm_phash_neardup_real(spark, sf):
    """pHash near-duplicate pairs over REALLY-decoded images (SCALING.md
    r15 plan #2 — composes the imagecodec seam with multimodal.py's
    Arrow-batched DCT): each document gets a REAL 24bpp BMP of a
    32x32 id-seeded noise field; each doc_id < 25 also gets a planted
    "re-encode" at -(doc_id+1) — the SAME pixel field through an affine
    brightness/contrast shift plus a faint gradient, the invariance
    class pHash exists for, then genuinely re-encoded as a second BMP.
    pixels= is imagecodec.decode_pixels (real BMP parse -> BT.601 luma),
    so padding/BGR/origin bugs change every hash. Measured margins
    (operator-exact probe, 200 ids): planted hamming <= 4, organic
    minimum 18 — radius 6 must recover EXACTLY the planted pairs.
    One scan, zero shuffle before the pigeonhole block join."""
    import numpy as np
    import pandas as pd

    from vastdb_sdk_spark.operators.dedup import simhash_near_pairs
    from vastdb_sdk_spark.operators.imagecodec import decode_pixels, encode_bmp
    from vastdb_sdk_spark.operators.multimodal import phash_images

    def build(it):
        i32 = np.arange(32) / 32.0
        grad = (i32[None, :] + i32[:, None]) / 2
        for pdf in it:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.default_rng(d + 1_000_003)
                base = rng.integers(0, 256, (32, 32), dtype=np.uint8)
                ids.append(d)
                payloads.append(encode_bmp(base))
                if d < 25:
                    pert = np.clip(
                        np.rint(base.astype(np.float64) * 0.97 + 4 + 5 * grad),
                        0,
                        255,
                    ).astype(np.uint8)
                    ids.append(-(d + 1))
                    payloads.append(encode_bmp(pert))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    # gate-side parallelism pin (the dd_ngram_overlap lesson): sf0.1
    # documents is ONE parquet file -> one partition, and the per-image
    # RNG-field + encode + decode + stacked-DCT chain is heavy enough
    # that one task serializes it (measured 2.92s -> 1.96s with the pin);
    # production media tables get this parallelism from file splits
    corpus = _t(spark, sf, "documents").select("doc_id").repartition(32).mapInPandas(
        build, "media_id long, payload binary"
    )
    fps = phash_images(corpus, pixels=decode_pixels).withColumnRenamed(
        "phash", "simhash"
    )
    pairs = simhash_near_pairs(fps, "media_id", max_hamming=6)
    # copies carry negative ids, so id_a (the smaller) is always the copy
    return pairs.select(
        F.col("id_a").alias("copy_id"), F.col("id_b").alias("orig_id")
    )


def q_e28_cdc_replica_sync(spark, sf):
    """CDC replication under the gate (SCALING.md r15 plan #4 —
    sources/replicate.sync_table): docs imported, replica initial-synced
    (cursor 0: full seed), then one churn epoch (delete / update /
    insert) folded by a cursor-driven incremental sync. The served
    replica must equal the source's final state EXACTLY — including
    orphan deletes (the r12 not-matched-by-source fix, now oracle-gated)
    — pinned per-row via md5(text); the sync stats ride along as
    sentinel-keyed rows, so a fold that over- or under-applies feed rows
    breaks the hash even where the end state accidentally matches."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources import create_table_from_files
    from vastdb_sdk_spark.sources.replicate import sync_table

    key = (sf, "__cdc_replica")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_e28_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        schema = _pq.ParquetFile(f"{sf}/documents.parquet").schema_arrow
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            create_table_from_files(sc, "docs", [f"{sf}/documents.parquet"])
            sc.create_table("replica", schema)
        with session.transaction() as tx:
            s1 = sync_table(
                tx.bucket("b").schema("s").table("docs"),
                tx.bucket("b").schema("s").table("replica"),
                key_cols=["doc_id"],
            )
        with session.transaction() as tx:  # churn epoch
            t = tx.bucket("b").schema("s").table("docs")
            t.delete_where(D.doc_id % 7 == 2)
            t.update_where(D.doc_id % 9 == 0, {"n_chars": -3})
            t.insert(
                _pa.table(
                    {
                        "doc_id": _pa.array([910001, 910002], _pa.int64()),
                        "text": _pa.array(["e28 doc one", "e28 doc two"]),
                        "lang": _pa.array(["zz", "zz"]),
                        "source": _pa.array(["e28_new", "e28_new"]),
                        "n_chars": _pa.array([11, None], _pa.int64()),
                    }
                ).cast(schema)
            )
        with session.transaction() as tx:
            s2 = sync_table(
                tx.bucket("b").schema("s").table("docs"),
                tx.bucket("b").schema("s").table("replica"),
                key_cols=["doc_id"],
            )
        _ENGINE_WAREHOUSES[key] = (wh, s1, s2)
    wh, s1, s2 = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        rep = tx.bucket("b").schema("s").table("replica").select_df()
    out = rep.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.col("text")).alias("text_md5"),
    )
    stats = [
        (-1, "__sync1_upserts", "stats", int(s1["upserts"]), None),
        (-2, "__sync2_upserts", "stats", int(s2["upserts"]), None),
        (-3, "__sync2_deletes", "stats", int(s2["deletes"]), None),
    ]
    return out.unionByName(_local_df(out.sparkSession, stats, out.schema))


def q_ann_filtered_ivf(spark, sf):
    """Predicate-filtered approximate vector search in ONE plan
    (SCALING.md r15 plan #5 — the production retrieval shape: metadata
    filter + IVF probe; Catalyst pushes the predicate into the probed
    cluster files' scan, table.py vector_search). THE ORACLE IS THE
    PLANTED LABELED ID LIST: ten rows at ids -(i+1) sit essentially AT
    the query (the _planted_ann_corpus margins: planted l2sq <= 0.01 vs
    organic minimum 0.25) with labels alternating i % 2, so under
    predicate label=1 the true top-5 is exactly -2,-4,-6,-8,-10 in rank
    order — organic label-1 rows are 25x farther, and the planted rows
    assign to the query's nearest centroid, probed at any nprobe >= 1."""
    import tempfile

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D

    base = _query_vec(spark, sf, 0)
    vec = list(base)
    vec[0] += 0.5

    key = (sf, "__ivf_filtered")
    if key not in _ENGINE_WAREHOUSES:
        wh = tempfile.mkdtemp(prefix="entry_annf_")
        session = vastdb.connect(wh, spark=spark)
        session.create_bucket("b")
        src = f"{sf}/embeddings.parquet"
        schema = _pq.ParquetFile(src).schema_arrow
        planted = _pa.table(
            {
                "vec_id": _pa.array([-(i + 1) for i in range(10)], _pa.int64()),
                "embedding": _pa.array(
                    [[vec[0] + 0.01 * (i + 1)] + vec[1:] for i in range(10)],
                    _pa.list_(_pa.float32()),
                ),
                "label": _pa.array([i % 2 for i in range(10)], _pa.int32()),
            }
        )
        with session.transaction() as tx:
            sc = tx.bucket("b").create_schema("s")
            t = sc.create_table(
                "emb",
                schema,
                vector_index={"column": "embedding", "metric": "l2sq"},
            )
            t.import_files([src])
            t.insert(planted.cast(schema))
        with session.transaction() as tx:
            tx.bucket("b").schema("s").table("emb").build_vector_index(
                kind="ivf", num_centroids=16, seed=42
            )
        _ENGINE_WAREHOUSES[key] = wh
    wh = _ENGINE_WAREHOUSES[key]

    with vastdb.connect(wh, spark=spark).transaction() as tx:
        got = tx.bucket("b").schema("s").table("emb").vector_search(
            vec,
            columns=["vec_id"],
            limit=5,
            predicate=(D.label == 1),
            approximate=True,
            nprobe=4,
        )
    rows = [(i + 1, int(v)) for i, v in enumerate(got.column("vec_id").to_pylist())]
    return _local_df(spark, rows, "rank INT, vec_id LONG")


def q_tx_minhash_cdf_incremental(spark, sf):
    """Near-dup candidate pairs served FROM a feed-maintained signature
    index (SCALING.md r15 plan #6 — e25's churn-bounded incremental fold
    composed with the LSH banding it exists for): the cached signature
    template is cloned, churned (delete every 5th-mod-4 doc, rewrite doc
    8, insert doc 9002 as an EXACT copy of doc 1's text — identical
    shingle set, identical signature, collides in all 4 bands), folded
    with mode='incremental' (fallback appends a gate-breaking sentinel),
    and the output is the distinct band-collision pair set read straight
    off the MAINTAINED index. The oracle replays signatures and band
    keys from the post-churn corpus via the shared _mh_lsh_chain_sql and
    joins bands the same way — a maintained index that drifted from the
    from-scratch derivation changes the pair set. The planted copy
    guarantees pair (1, 9002) is present, so the gate never passes
    vacuously."""
    import pyarrow as pa

    import vastdb_sdk_spark as vastdb
    from vastdb_sdk_spark import _ as D
    from vastdb_sdk_spark.sources.replicate import sync_minhash_signatures

    wh = _sig_template_clone(spark, sf)
    session = vastdb.connect(wh, spark=spark)
    copy_text = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") == 1)
        .select("text")
        .first()
        .text
    )
    with session.transaction() as tx:
        docs = tx.bucket("b").schema("s").table("docs")
        docs.delete_where(D.doc_id % 5 == 4)
        docs.update_where(
            D.doc_id == 8, {"text": "completely different replacement body"}
        )
        docs.insert(
            pa.table(
                {
                    "doc_id": pa.array([9002], pa.int64()),
                    "text": pa.array([copy_text]),
                    "lang": pa.array(["en"]),
                    "source": pa.array(["srcY"]),
                    "n_chars": pa.array([len(copy_text)], pa.int64()),
                }
            )
        )
    with session.transaction() as tx:
        docs = tx.bucket("b").schema("s").table("docs")
        sig = tx.bucket("b").schema("s").table("sig")
        r = sync_minhash_signatures(docs, sig, hash_fn="md5", mode="incremental")
    tx = session.transaction()
    sig_df = tx.bucket("b").schema("s").table("sig").select_df(
        columns=["doc_id", "band_id", "band_key"]
    )
    a = sig_df.select(
        F.col("doc_id").alias("id_a"), "band_id", "band_key"
    )
    b = sig_df.select(
        F.col("doc_id").alias("id_b"), "band_id", "band_key"
    )
    pairs = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if r["mode"] != "incremental":
        pairs = pairs.unionByName(
            spark.createDataFrame(
                [(-999999, -999999)], "id_a long, id_b long"
            )
        )
    return pairs


_R15_PENDING_ORACLES = {
    "mm_decode_bmp": """
        SELECT d.doc_id AS media_id,
               6 AS width,
               4 AS height,
               CAST(SUM((d.doc_id * 31 + s.i) % 251) AS BIGINT) AS px_sum,
               CAST(SUM(s.i * ((d.doc_id * 31 + s.i) % 251)) AS BIGINT)
                   AS px_wsum
        FROM documents d CROSS JOIN range(72) s(i)
        GROUP BY d.doc_id
    """,
    "mm_phash_neardup_real": """
        -- ground truth: exactly the planted (copy, original) pairs —
        -- real decode margins: planted hamming <= 4, organic min 18
        SELECT -(doc_id + 1) AS copy_id, doc_id AS orig_id
        FROM documents WHERE doc_id < 25
    """,
    "mm_decode_wav": """
        SELECT d.doc_id AS media_id,
               16000 AS sample_rate,
               CAST(200 * 1000 / 16000 AS BIGINT) AS duration_ms,
               1 AS n_channels,
               CAST(200 AS BIGINT) AS n_frames,
               CAST(SUM((d.doc_id * 31 + s.i) % 251) AS BIGINT) AS s_sum,
               CAST(SUM(s.i * ((d.doc_id * 31 + s.i) % 251)) AS BIGINT)
                   AS s_wsum
        FROM documents d CROSS JOIN range(200) s(i)
        GROUP BY d.doc_id
    """,
    "mm_decode_jpeg": """
        SELECT d.doc_id AS media_id,
               16 AS width,
               16 AS height,
               CAST(SUM(3 * 2 * ((d.doc_id * 31
                     + ((s.p // 16 // 8) * 2 + (s.p % 16) // 8) * 17) % 128))
                    AS BIGINT) AS px_sum,
               CAST(SUM((9 * s.p + 3) * 2 * ((d.doc_id * 31
                     + ((s.p // 16 // 8) * 2 + (s.p % 16) // 8) * 17) % 128))
                    AS BIGINT) AS px_wsum
        FROM documents d CROSS JOIN range(256) s(p)
        GROUP BY d.doc_id
    """,
    "mm_decode_tiff": """
        SELECT d.doc_id AS media_id,
               16 AS width,
               16 AS height,
               CAST(SUM(3 * ((d.doc_id * 31 + s.p) % 251)) AS BIGINT)
                   AS px_sum,
               CAST(SUM((9 * s.p + 3) * ((d.doc_id * 31 + s.p) % 251))
                   AS BIGINT) AS px_wsum
        FROM documents d CROSS JOIN range(256) s(p)
        GROUP BY d.doc_id
    """,
    "mm_decode_y4m": """
        SELECT d.doc_id AS media_id,
               4 AS width,
               4 AS height,
               10 AS n_frames,
               CAST(1000 AS BIGINT) AS duration_ms,
               CAST(SUM((d.doc_id * 31 + (s.i // 16) * 97 + (s.i % 16)) % 251)
                    AS BIGINT) AS v_sum,
               CAST(SUM(s.i *
                        ((d.doc_id * 31 + (s.i // 16) * 97 + (s.i % 16)) % 251))
                    AS BIGINT) AS v_wsum
        FROM documents d CROSS JOIN range(160) s(i)
        GROUP BY d.doc_id
    """,
    "e29_webdataset_roundtrip": """
        SELECT doc_id,
               md5(text) AS text_md5,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
    """,
    "e28_cdc_replica_sync": """
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 9 = 0 THEN -3 ELSE n_chars END AS n_chars,
               md5(text) AS text_md5
        FROM documents WHERE doc_id % 7 <> 2
        UNION ALL
        SELECT * FROM (VALUES
            (910001, 'zz', 'e28_new', 11, md5('e28 doc one')),
            (910002, 'zz', 'e28_new', NULL, md5('e28 doc two'))
        ) AS ins(doc_id, lang, source, n_chars, text_md5)
        UNION ALL
        SELECT -1, '__sync1_upserts', 'stats',
               (SELECT COUNT(*) FROM documents), NULL
        UNION ALL
        SELECT -2, '__sync2_upserts', 'stats',
               (SELECT COUNT(*) + 2 FROM documents
                WHERE doc_id % 9 = 0 AND doc_id % 7 <> 2), NULL
        UNION ALL
        SELECT -3, '__sync2_deletes', 'stats',
               (SELECT COUNT(*) FROM documents WHERE doc_id % 7 = 2), NULL
    """,
    "ann_filtered_ivf": """
        -- ground truth: planted label-1 rows in rank order; organic
        -- label-1 rows are 25x farther and cannot enter the top-5
        SELECT CAST(r + 1 AS INTEGER) AS rank,
               -CAST(2 * (r + 1) AS BIGINT) AS vec_id
        FROM range(5) t(r)
    """,
    "e27_cdf_matview_e2e": """
        WITH final AS (
            SELECT lang,
                   CASE WHEN doc_id % 17 = 0 THEN -5
                        WHEN doc_id % 13 = 0 THEN -2
                        ELSE n_chars END AS n_chars
            FROM documents WHERE doc_id % 11 <> 3
            UNION ALL
            SELECT lang, n_chars FROM (VALUES
                ('zz', 10), ('zz', NULL), ('zz', 7)
            ) AS ins(lang, n_chars)
        )
        SELECT lang AS k, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM final GROUP BY lang
        UNION ALL
        SELECT '__feed1:delete', COUNT(*), NULL
        FROM documents WHERE doc_id % 11 = 3
        UNION ALL
        SELECT '__feed1:update_preimage', COUNT(*), NULL
        FROM documents WHERE doc_id % 13 = 0 AND doc_id % 11 <> 3
        UNION ALL
        SELECT '__feed1:update_postimage', COUNT(*), NULL
        FROM documents WHERE doc_id % 13 = 0 AND doc_id % 11 <> 3
        UNION ALL
        SELECT '__feed2:insert', 3, NULL
        UNION ALL
        SELECT '__feed2:update_preimage', COUNT(*), NULL
        FROM documents WHERE doc_id % 17 = 0 AND doc_id % 11 <> 3
        UNION ALL
        SELECT '__feed2:update_postimage', COUNT(*), NULL
        FROM documents WHERE doc_id % 17 = 0 AND doc_id % 11 <> 3
    """,
}


def r15_pending() -> dict[str, tuple]:
    """(builder, oracle_sql) for the 11 entries that joined the registry
    when it unfroze in r15. Stays the single source for their oracle SQL
    (oracle_sql() merges it) and for tests/test_r15_pending.py's
    sf0.001 driver-style gate. INVARIANT (pytest-enforced): a SUBSET of
    queries()/oracle_sql() since r15 (disjoint through r14)."""
    sqls = dict(_R15_PENDING_ORACLES)
    # replayed-signature oracle shares _mh_lsh_chain_sql with e25 so the
    # hash arithmetic stays single-sourced
    sqls["tx_minhash_cdf_incremental"] = f"""
        WITH corpus AS (
            SELECT doc_id,
                   CASE WHEN doc_id = 8
                        THEN 'completely different replacement body'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 5 <> 4
            UNION ALL
            SELECT 9002 AS doc_id,
                   (SELECT text FROM documents WHERE doc_id = 1) AS text
        ), {_mh_lsh_chain_sql('x', 'corpus', 'doc_id', 'text')}
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_x a JOIN bands_x b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.id < b.id
    """
    builders = {
        "mm_decode_bmp": q_mm_decode_bmp,
        "mm_decode_wav": q_mm_decode_wav,
        "mm_decode_jpeg": q_mm_decode_jpeg,
        "mm_decode_tiff": q_mm_decode_tiff,
        "mm_decode_y4m": q_mm_decode_y4m,
        "mm_phash_neardup_real": q_mm_phash_neardup_real,
        "e27_cdf_matview_e2e": q_e27_cdf_matview_e2e,
        "e28_cdc_replica_sync": q_e28_cdc_replica_sync,
        "e29_webdataset_roundtrip": q_e29_webdataset_roundtrip,
        "ann_filtered_ivf": q_ann_filtered_ivf,
        "tx_minhash_cdf_incremental": q_tx_minhash_cdf_incremental,
    }
    return {name: (fn, sqls[name]) for name, fn in builders.items()}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver's correctness gate reads a 50-query
    # window from the front of this dict.
    #
    # ROTATION MATH (the standing policy): 203 registered queries, 50
    # gated per round. The registry UNFREEZES this round (15) per the
    # extension plan in SCALING.md: the 11 r15-pending entries (built,
    # pytest-gated at sf0.001 and pre-audited at sf0.1 in r13/r14) join
    # the registry and gate IMMEDIATELY — new entries carry no green, so
    # they lead the window — alongside the 39 oldest greens (the
    # round-11-green cohort front). ceil(203/50) = 5, so the steady-state
    # staleness bound relaxes from 4 to 5 rounds (the documented
    # tradeoff for three media modalities + the shard tier). After this
    # round the rotation is steady-state oldest-first: each round gates
    # the current front 50 and rotates them to the tail. The round-14
    # window (re-greened last round) rotates to the tail as the
    # freshest cohort.
    return {
        # -- r15 registry additions (never gated -> lead the window) ------
        "mm_decode_bmp": q_mm_decode_bmp,
        "mm_decode_wav": q_mm_decode_wav,
        "mm_decode_jpeg": q_mm_decode_jpeg,
        "mm_decode_tiff": q_mm_decode_tiff,
        "mm_decode_y4m": q_mm_decode_y4m,
        "mm_phash_neardup_real": q_mm_phash_neardup_real,
        "e27_cdf_matview_e2e": q_e27_cdf_matview_e2e,
        "e28_cdc_replica_sync": q_e28_cdc_replica_sync,
        "e29_webdataset_roundtrip": q_e29_webdataset_roundtrip,
        "ann_filtered_ivf": q_ann_filtered_ivf,
        "tx_minhash_cdf_incremental": q_tx_minhash_cdf_incremental,
        # -- round-11-green cohort (oldest greens; first 39 fill the
        #    window's remaining slots) -------------------------------------
        "e15_jsonl_ingest": q_e15_jsonl_ingest,
        "ann_quantize_int8": q_ann_quantize_int8,
        "ds_quality_filter": q_ds_quality_filter,
        "dd_dup_clusters": q_dd_dup_clusters,
        "tx_bigram_topk": q_tx_bigram_topk,
        "a7_approx_distinct": q_a7_approx_distinct,
        "dd_lsh_pairs_fast": q_dd_lsh_pairs_fast,
        "j2_semi_join": q_j2_semi_join,
        "j3_anti_join": q_j3_anti_join,
        "j4_outer_join_counts": q_j4_outer_join_counts,
        "a2_count_distinct": q_a2_count_distinct,
        "a3_having": q_a3_having,
        "a4_rollup": q_a4_rollup,
        "a5_conditional_agg": q_a5_conditional_agg,
        "o1_limit_topk": q_o1_limit_topk,
        "e3_engine_sorted_scan": q_e3_engine_sorted_scan,
        "e5_engine_projection": q_e5_engine_projection,
        "e6_engine_snapshot": q_e6_engine_snapshot,
        "e7_engine_partitioned": q_e7_engine_partitioned,
        "e8_engine_predicate_dml": q_e8_engine_predicate_dml,
        "e11_merge_conditional": q_e11_merge_conditional,
        "e12_engine_restore": q_e12_engine_restore,
        "el2_sorted_ts_between": q_el2_sorted_ts_between,
        "el3_sorted_conjunction": q_el3_sorted_conjunction,
        "el4_sorted_or_ranges": q_el4_sorted_or_ranges,
        "el5_sorted_isin": q_el5_sorted_isin,
        "p8_struct_field": q_p8_struct_field,
        "p10_literals": q_p10_literals,
        "p2_comparisons": q_p2_comparisons,
        "p3_between": q_p3_between,
        "p4_isin": q_p4_isin,
        "p5_isnull": q_p5_isnull,
        "p6_startswith": q_p6_startswith,
        "p7_contains": q_p7_contains,
        "p11_false_predicate": q_p11_false_predicate,
        "tpch_q12": q_tpch_q12,
        "tx_pack_greedy": q_tx_pack_greedy,
        "dd_simhash_fast": q_dd_simhash_fast,
        "dd_embed_neardup": q_dd_embed_neardup,
        # ---- window boundary (driver gates the 50 entries above) --------
        "ann_rhp_topk": q_ann_rhp_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        # -- round-14 window rotated to the tail below; r12/r13 cohorts
        #    keep their relative order ------------------------------------
        # -- round-12-green cohort ----------------------------------------
        "dd_phash_neardup": q_dd_phash_neardup,
        "tx_clf_quality": q_tx_clf_quality,
        "dd_passage_dups": q_dd_passage_dups,
        "e16_change_feed": q_e16_change_feed,
        "tx_bm25_topk": q_tx_bm25_topk,
        "ann_knn_join_blocked": q_ann_knn_join_blocked,
        "ds_resample_mix": q_ds_resample_mix,
        "dd_contamination": q_dd_contamination,
        "skew_salted_agg": q_skew_salted_agg,
        "skew_salted_join": q_skew_salted_join,
        "mm_frame_sample": q_mm_frame_sample,
        "dd_simhash_pairs": q_dd_simhash_pairs,
        "range_join_purchases": q_range_join_purchases,
        "sessionize_batch": q_sessionize_batch,
        "a10_approx_percentile": q_a10_approx_percentile,
        "w1_topk_per_group": q_w1_topk_per_group,
        "w2_running_sum": q_w2_running_sum,
        "w3_lag_delta": q_w3_lag_delta,
        "w4_dense_rank": q_w4_dense_rank,
        "w5_first_last": q_w5_first_last,
        "w6_ntile": q_w6_ntile,
        "w7_event_time_window": q_w7_event_time_window,
        "w8_attribution_join": q_w8_attribution_join,
        "set1_union": q_set1_union,
        "set2_intersect": q_set2_intersect,
        "set3_except": q_set3_except,
        "f1_json_expansion": q_f1_json_expansion,
        "f2_string_funcs": q_f2_string_funcs,
        "f3_date_funcs": q_f3_date_funcs,
        "f4_conditional": q_f4_conditional,
        "f5_array_agg": q_f5_array_agg,
        "f6_levenshtein": q_f6_levenshtein,
        "a6_cube": q_a6_cube,
        "a8_grouping_sets": q_a8_grouping_sets,
        "a9_percentiles": q_a9_percentiles,
        "o5_vector_topk_l2": q_o5_vector_topk_l2,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dd_exact": q_dd_exact,
        "dd_fingerprint": q_dd_fingerprint,
        "dd_minhash_sig": q_dd_minhash_sig,
        "dd_ngram_overlap": q_dd_ngram_overlap,
        "tx_pii_scrub": q_tx_pii_scrub,
        "asof_last_purchase": q_asof_last_purchase,
        "e17_semantic_dedup_inplace": q_e17_semantic_dedup_inplace,
        "tx_bigram_logprob": q_tx_bigram_logprob,
        "ann_ivfpq_persisted": q_ann_ivfpq_persisted,
        "ann_ivf_knn_join": q_ann_ivf_knn_join,
        "dd_semantic_dedup": q_dd_semantic_dedup,
        "tx_hybrid_topk": q_tx_hybrid_topk,
        "tx_repetition": q_tx_repetition,
        # -- round-13 window (freshest; re-greened last round) ------------
        "tx_chunk_windows": q_tx_chunk_windows,
        "tx_normalize": q_tx_normalize,
        "e14_engine_dedup": q_e14_engine_dedup,
        "dd_simhash": q_dd_simhash,
        "dd_lsh_pairs": q_dd_lsh_pairs,
        "tx_token_stats": q_tx_token_stats,
        "tx_quality": q_tx_quality,
        "tx_langid": q_tx_langid,
        "mm_decode_stub": q_mm_decode_stub,
        "mm_blob_meta": q_mm_blob_meta,
        "e1_engine_scan": q_e1_engine_scan,
        "e2_engine_sql": q_e2_engine_sql,
        "e4_engine_dml": q_e4_engine_dml,
        "e9_engine_merge": q_e9_engine_merge,
        "e10_sql_frontend": q_e10_sql_frontend,
        "e13_engine_zorder": q_e13_engine_zorder,
        "el1_sorted_point": q_el1_sorted_point,
        "a1_tpch_q1": q_a1_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q6": q_tpch_q6,
        "j1_star_join_revenue": q_j1_star_join_revenue,
        "s1_scan_project": q_s1_scan_project,
        "tpch_q2": q_tpch_q2,
        "tpch_q4": q_tpch_q4,
        "tpch_q5": q_tpch_q5,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "tpch_q11": q_tpch_q11,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q22": q_tpch_q22,
        "ds_stratified_sample": q_ds_stratified_sample,
        "e18_refresh_incremental": q_e18_refresh_incremental,
        # -- round-10-cohort front (re-greened in round 13) ---------------
        "tx_bpe_learned": q_tx_bpe_learned,
        "e19_engine_domain_cap": q_e19_engine_domain_cap,
        "e21_pipeline_recipe": q_e21_pipeline_recipe,
        "e22_matview_incremental": q_e22_matview_incremental,
        "e23_matview_rollup": q_e23_matview_rollup,
        "e24_matview_timebucket": q_e24_matview_timebucket,
        "e25_sig_sync": q_e25_sig_sync,
        "e26_sql_views": q_e26_sql_views,
        # -- round-14 window (freshest; re-greened last round) ------------
        "el6_bloom_point": q_el6_bloom_point,
        "ts_gapfill": q_ts_gapfill,
        "ts_anomaly": q_ts_anomaly,
        "a11_grouping_sets": q_a11_grouping_sets,
        "a12_pivot": q_a12_pivot,
        "w9_hopping_window": q_w9_hopping_window,
        "w10_funnel": q_w10_funnel,
        "w11_retention_cohorts": q_w11_retention_cohorts,
        "dd_keep_best": q_dd_keep_best,
        "dd_line_dedup": q_dd_line_dedup,
        "dd_minhash_join": q_dd_minhash_join,
        "dd_tfidf_pairs": q_dd_tfidf_pairs,
        "dd_winnow": q_dd_winnow,
        "ds_borda_quality": q_ds_borda_quality,
        "ds_cluster_assign": q_ds_cluster_assign,
        "ds_domain_caps": q_ds_domain_caps,
        "ds_dsir_weights": q_ds_dsir_weights,
        "ds_score_normalize": q_ds_score_normalize,
        "ds_shard_assign": q_ds_shard_assign,
        "ds_source_overlap": q_ds_source_overlap,
        "ds_token_budget": q_ds_token_budget,
        "ds_weighted_sample": q_ds_weighted_sample,
        "ann_matryoshka_topk": q_ann_matryoshka_topk,
        "ann_pca_project": q_ann_pca_project,
        "tx_chat_render": q_tx_chat_render,
        "tx_collapse_repeats": q_tx_collapse_repeats,
        "tx_contrastive": q_tx_contrastive,
        "tx_html_strip": q_tx_html_strip,
        "tx_kl_drift": q_tx_kl_drift,
        "tx_kn_logprob": q_tx_kn_logprob,
        "tx_length_percentiles": q_tx_length_percentiles,
        "tx_nb_classify": q_tx_nb_classify,
        "tx_nb_train": q_tx_nb_train,
        "tx_pmi_topk": q_tx_pmi_topk,
        "tx_prefix_lm": q_tx_prefix_lm,
        "tx_rrf_fusion": q_tx_rrf_fusion,
        "tx_sentences": q_tx_sentences,
        "tx_chunk_sentences": q_tx_chunk_sentences,
        "tx_tfidf_topterms": q_tx_tfidf_topterms,
        "tx_token_entropy": q_tx_token_entropy,
        "tx_url_canon": q_tx_url_canon,
        "tx_zipf_slope": q_tx_zipf_slope,
        "tx_span_corrupt": q_tx_span_corrupt,
        "tx_mlm_mask": q_tx_mlm_mask,
        "ds_train_test_split": q_ds_train_test_split,
        "ann_ivf_topk": q_ann_ivf_topk,
        "tx_gopher_flags": q_tx_gopher_flags,
        "tx_c4_filter": q_tx_c4_filter,
        "tx_bpe_tokens": q_tx_bpe_tokens,
        "tx_unigram_logprob": q_tx_unigram_logprob,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_j1_star_join_revenue(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# DuckDB oracles


def _md5_int_sql(expr: str, lo: int, n: int = 12) -> str:
    """DuckDB twin of F.conv(F.substring(F.md5(expr), lo, n), 16, 10):
    integer value of an md5 hex substring (nibble polynomial, the
    _mh_base_sql device with a parameterized offset)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {lo + k}, 1)) - 1)"
        f" * {16 ** (n - 1 - k)}"
        for k in range(n)
    )
    return f"({terms})"


def _mh_lsh_chain_sql(tag: str, src: str, id_expr: str, text_expr: str) -> str:
    """CTE chain replaying operators.dedup's md5 MinHash machinery for one
    table: tokens -> 3-shingles -> base hashes -> 16-hash signature ->
    4 band keys (+ the distinct shingle sets for exact verify). Shared by
    the single-table (dd_lsh_pairs) and cross-table (dd_minhash_join)
    oracles so the arithmetic is single-sourced."""
    tok = _SQL_TOKENS.format(c=text_expr)
    return f"""
            t_{tag} AS (
                SELECT {id_expr} AS id, {tok} AS toks FROM {src}
            ), sh_{tag} AS (
                SELECT id,
                       CASE WHEN len(toks) < 3
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       END AS sh
                FROM t_{tag}
            ), hb_{tag} AS (
                SELECT id, sh, list_transform(sh, s -> {_mh_base_sql('s')}) AS hb
                FROM sh_{tag}
            ), sigs_{tag} AS (
                SELECT id,
                       list_transform(range(0, 16),
                           s -> list_min(list_transform(hb,
                                b -> ((2*s+3) * b + (7919*s+1)) % 2147483647))) AS sig
                FROM hb_{tag}
            ), bands_{tag} AS (
                SELECT id, b AS band_id,
                       md5(b || '|' || array_to_string(
                           list_transform(sig[4*b+1:4*b+4], v -> CAST(v AS VARCHAR)), '|'))
                           AS band_key
                FROM sigs_{tag}, (SELECT unnest(range(0, 4)) AS b)
            ), shs_{tag} AS (
                SELECT id, list_distinct(sh) AS shd FROM sh_{tag}
            )"""


def _mh_base_sql(var: str) -> str:
    """DuckDB twin of operators.dedup.minhash_base: first 12 hex chars of
    md5 parsed as an int (nibble polynomial), reduced mod P."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({var}), {k}, 1)) - 1) * {16 ** (12 - k)}"
        for k in range(1, 13)
    )
    return f"(({terms}) % 2147483647)"


def _simhash_oracle_sql(source: str = "documents") -> str:
    """Generated 64-bit-vote SimHash SQL (same hex-nibble arithmetic as the
    Spark side). ``source`` is the table/CTE carrying (doc_id, text)."""
    tok = _SQL_TOKENS.format(c="text")
    votes = ",\n".join(
        f"SUM(((( strpos('0123456789abcdef', substr(h, {1 + j // 4}, 1)) - 1) >> {3 - j % 4}) & 1) * 2 - 1) AS v{j}"
        for j in range(64)
    )
    bits = " || ".join(
        f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(64)
    )
    return f"""
        WITH ex AS (
            SELECT doc_id, md5(t) AS h
            FROM (SELECT doc_id, unnest({tok}) AS t FROM {source})
        ), agg AS (
            SELECT doc_id, {votes}
            FROM ex GROUP BY doc_id
        )
        SELECT doc_id, {bits} AS simhash_bits FROM agg
    """


def _simhash_pairs_oracle_sql() -> str:
    """DuckDB twin of q_dd_simhash_pairs: same twin augmentation, exact
    ALL-PAIRS hamming over the oracle-reproduced md5 fingerprints (the
    pigeonhole path's ground truth: every pair with hamming <= 3, none
    invented)."""
    inner = _simhash_oracle_sql("corpus")
    # splice the corpus CTE into the generated WITH
    inner = inner.replace(
        "WITH ex AS (",
        """WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text
            FROM documents WHERE doc_id % 50 = 0
        ), ex AS (""",
        1,
    )
    return f"""
        WITH fps AS ({inner})
        SELECT id_a, id_b, hamming FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_filter(range(1, 65),
                        i -> substr(a.simhash_bits, CAST(i AS INT), 1)
                          <> substr(b.simhash_bits, CAST(i AS INT), 1)))
                        AS BIGINT) AS hamming
            FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        ) WHERE hamming <= 3
    """


def _pii_scrub_oracle_sql() -> str:
    """DuckDB twin of q_tx_pii_scrub: identical deterministic PII
    augmentation, then scrub/count SQL GENERATED from the same
    PII_PATTERNS table the Spark expressions use (functions/scrub.py), so
    the two dialects cannot drift apart."""
    from vastdb_sdk_spark.functions.scrub import (
        PII_PATTERNS,
        count_sql,
        scrub_sql,
    )

    aug = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via'"
        " || ' https://data.example.org/doc/' || CAST(doc_id AS VARCHAR)"
        " || ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.' || CAST(doc_id % 254 + 1 AS VARCHAR) || ' .'"
        " || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@corp.io' ELSE '' END"
    )
    counts = ", ".join(
        f"CAST({count_sql('__aug', k)} AS BIGINT) AS n_{k}" for k in PII_PATTERNS
    )
    return f"""
        WITH staged AS (SELECT doc_id, {aug} AS __aug FROM documents)
        SELECT doc_id, {scrub_sql('__aug')} AS scrubbed, {counts}
        FROM staged
    """


def _tx_normalize_oracle_sql() -> str:
    """DuckDB twin of q_tx_normalize, generated from the SAME pattern
    constants as the Spark side (functions/text.CONTROL_CHARS_RE /
    WS_RUN_RE) so they cannot drift — the scrub.py single-source
    discipline."""
    from vastdb_sdk_spark.functions.text import CONTROL_CHARS_RE, WS_RUN_RE

    dirty = "chr(1) || '  ' || text || ' ' || chr(9) || chr(9) || ' zz ' || chr(7)"
    clean = (
        f"trim(regexp_replace(regexp_replace({dirty}, "
        f"'{CONTROL_CHARS_RE}', '', 'g'), '{WS_RUN_RE}', ' ', 'g'))"
    )
    return f"""
        SELECT doc_id, {clean} AS clean, length({clean}) AS n_clean_chars
        FROM documents
    """


def _sql_sentences(var: str) -> str:
    """DuckDB twin of functions/text.sentences, generated from the SAME
    SENTENCE_SPLIT_RE constant the Spark expression uses (the scrub.py
    single-source discipline)."""
    from vastdb_sdk_spark.functions.text import SENTENCE_SPLIT_RE

    return (
        f"list_filter(list_transform(string_split_regex({var}, "
        f"'{SENTENCE_SPLIT_RE}'), x -> regexp_replace(trim(x), "
        f"'[.!?]+$', '')), x -> x <> '')"
    )


def _sentence_oracle_sql() -> str:
    tok = _SQL_TOKENS.format(c="s")
    return f"""
        WITH t AS (
            SELECT doc_id, {_sql_sentences('text')} AS sents FROM documents
        )
        SELECT doc_id, len(sents) AS n_sentences,
               ROUND(CASE WHEN len(sents) > 0 THEN
                   CAST(list_sum(list_transform(sents,
                        s -> len({tok}))) AS DOUBLE) / len(sents)
               END, 4) AS mean_sent_tokens,
               md5(sents[1]) AS first_sent_md5
        FROM t
    """


def _chunk_sentences_oracle_sql(budget: int = 64) -> str:
    tok = _SQL_TOKENS.format(c="sent")
    return f"""
        WITH t AS (
            SELECT doc_id, {_sql_sentences('text')} AS sents FROM documents
        ), s AS (
            SELECT doc_id, unnest(sents) AS sent,
                   generate_subscripts(sents, 1) AS pos
            FROM t
        ), tk AS (
            SELECT doc_id, pos, sent, len({tok}) AS ntok FROM s
        ), p AS (
            SELECT doc_id, pos, sent, ntok,
                   SUM(ntok) OVER (PARTITION BY doc_id ORDER BY pos)
                   - ntok AS pre
            FROM tk
        )
        SELECT doc_id,
               CAST(pre // {budget} AS BIGINT) AS chunk_id,
               md5(string_agg(sent, '. ' ORDER BY pos)) AS chunk_md5,
               COUNT(*) AS n_sentences,
               CAST(SUM(ntok) AS BIGINT) AS n_tokens
        FROM p GROUP BY doc_id, pre // {budget}
    """


def _html_strip_oracle_sql() -> str:
    """DuckDB twin of q_tx_html_strip, generated from the SAME pattern
    constants as functions/text.strip_html."""
    from vastdb_sdk_spark.functions.text import (
        HTML_BLOCK_RE,
        HTML_COMMENT_RE,
        HTML_ENTITIES,
        HTML_TAG_RE,
        WS_RUN_RE,
    )

    i = "CAST(doc_id AS VARCHAR)"
    html = (
        "'<!-- header --><div class=\"a\"><h1>Doc &amp; ' || " + i +
        " || '</h1><script>var x = 1 < 2;</script><p>' || text"
        " || '</p><style>p { color: red }</style>&nbsp;tail&lt;' || " + i +
        " || '&gt;</div>'"
    )
    c = f"regexp_replace({html}, '{HTML_COMMENT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{HTML_BLOCK_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{HTML_TAG_RE}', ' ', 'g')"
    for ent, rep in HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep_sql}')"
    c = f"trim(regexp_replace({c}, '{WS_RUN_RE}', ' ', 'g'))"
    return f"""
        SELECT doc_id, {c} AS clean, length({c}) AS n_chars
        FROM documents
    """


def _url_canon_oracle_sql() -> str:
    """DuckDB twin of q_tx_url_canon, generated from the SAME pattern
    constants as functions/text.canonical_url."""
    from vastdb_sdk_spark.functions.text import (
        URL_DEFAULT_PORT_RE,
        URL_SPLIT_RE,
        URL_TRACKING_PARAM_RE,
        URL_WWW_RE,
    )

    i = "CAST(doc_id AS VARCHAR)"
    url = f"""CASE doc_id % 4
        WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Docs/' || {i}
                    || '/?utm_source=x&id=' || {i} || '&utm_campaign=y#frag'
        WHEN 1 THEN 'http://example.com/Docs/' || {i} || '?id=' || {i}
        WHEN 2 THEN 'https://Example.com:80/Docs/' || {i} || '/'
        ELSE 'not a url ' || {i} END"""
    host = f"regexp_extract(u, '{URL_SPLIT_RE}', 1)"
    path = f"regexp_extract(u, '{URL_SPLIT_RE}', 2)"
    query = f"regexp_extract(u, '{URL_SPLIT_RE}', 3)"
    host_c = (
        f"regexp_replace(regexp_replace(lower({host}), '{URL_WWW_RE}', ''),"
        f" '{URL_DEFAULT_PORT_RE}', '')"
    )
    path_c = f"regexp_replace({path}, '/+$', '')"
    query_c = (
        f"regexp_replace(regexp_replace({query},"
        f" '{URL_TRACKING_PARAM_RE}', '', 'g'), '^&', '')"
    )
    return f"""
        WITH staged AS (SELECT doc_id, {url} AS u FROM documents)
        SELECT doc_id,
               CASE WHEN {host} <> '' THEN
                   {host_c} || {path_c}
                   || CASE WHEN {query_c} <> ''
                           THEN '?' || {query_c} ELSE '' END
               END AS canonical
        FROM staged
    """


def oracle_sql() -> dict[str, str]:
    tok = _SQL_TOKENS.format(c="text")
    # 48-bit integer from the first 12 hex nibbles of an md5 — the
    # deterministic-uniform source weighted_sample uses (no modulus;
    # DuckDB twin of Spark's conv(substring(md5(x), 1, 12), 16, 10))
    h48 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({{v}}), {p}, 1)) - 1)"
        f" * {16 ** (12 - p)}"
        for p in range(1, 13)
    )
    # DuckDB twin of shingles_from_tokens(tk, n): when len < n the gram list
    # is the single space-joined token string; 1-based, range() end-exclusive
    def _grams(n: int) -> str:
        parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
        return (
            f"CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')] "
            f"ELSE list_transform(range(1, len(toks) - {n - 2}), i -> {parts}) END"
        )

    # tx_bpe_learned: the learned merge table is vocabulary-sized and
    # deterministic, so the oracle inlines it (learned INDEPENDENTLY by
    # the naive trainer above — never imported from operators/bpe) as a
    # rank-ordered list literal and replays greedy lowest-rank-first
    # segmentation over the DISTINCT pre-token words with a recursive
    # CTE: each step merges the LEFTMOST occurrence of the present pair
    # with the smallest rank (list_position returns the first index of
    # the minimum), exactly the engine's per-word encode loop. Pair keys
    # are 'left right' strings — tokens are [a-z0-9]+ so the space
    # separator cannot collide.
    import os as _os

    _bpe_sf = _os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    # The merge learning reads the corpus (once per process — the trainer
    # caches per sf_dir); on a machine without the driver's testdata this
    # entry degrades to rows-only instead of failing every oracle in the
    # dict. The degrade keys on corpus EXISTENCE, not a blanket except:
    # a trainer bug on a present corpus should fail loudly, and
    # test_gate_registry_integrity documents the absent-corpus case.
    # tools/check_correctness.py threads its sf_dir through the env var,
    # so local checks at other scale factors learn from the right corpus.
    if _os.path.exists(_os.path.join(_bpe_sf, "documents.parquet")):
        _bpe_merges = _naive_bpe_merges(_bpe_sf)
    else:
        _bpe_merges = None
    bpe_ranks = (
        "[" + ", ".join(f"'{a} {b}'" for a, b in (_bpe_merges or [])) + "]"
    )
    _bpe_rk = (
        "list_transform(range(1, len(syms)), i -> CASE WHEN"
        f" list_position({bpe_ranks}, syms[i] || ' ' || syms[i + 1]) = 0"
        " THEN 999999 ELSE"
        f" list_position({bpe_ranks}, syms[i] || ' ' || syms[i + 1]) END)"
    )

    sqls = {
        "tx_bpe_learned": f"""
            WITH RECURSIVE words AS (
                SELECT DISTINCT unnest({tok}) AS word FROM documents
            ),
            seg AS (
                SELECT word,
                       list_append(list_transform(range(1, length(word) + 1),
                                                  i -> word[i:i]),
                                   '</w>') AS syms,
                       0 AS step
                FROM words
              UNION ALL
                SELECT word,
                       syms[1:best_i - 1]
                         || [syms[best_i] || syms[best_i + 1]]
                         || syms[best_i + 2:len(syms)] AS syms,
                       step + 1
                FROM (
                    SELECT word, syms, step,
                           list_position(rks, list_aggregate(rks, 'min'))
                               AS best_i,
                           list_aggregate(rks, 'min') AS best_r
                    FROM (SELECT word, syms, step, {_bpe_rk} AS rks FROM seg)
                )
                WHERE best_r < 999999
            ),
            final AS (
                SELECT word,
                       len(syms) AS n_sub,
                       replace(array_to_string(syms, ''), '</w>', '') = word
                           AS recon
                FROM seg
                QUALIFY row_number() OVER (
                    PARTITION BY word ORDER BY step DESC) = 1
            ),
            stream AS (SELECT doc_id, unnest({tok}) AS word FROM documents),
            per_doc AS (
                SELECT s.doc_id,
                       CAST(sum(f.n_sub) AS BIGINT) AS n_bpe_tokens,
                       bool_and(f.recon) AS recon_ok
                FROM stream s JOIN final f USING (word)
                GROUP BY s.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
                   COALESCE(p.recon_ok, TRUE) AS recon_ok
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        "tx_repetition": f"""
            WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
            g AS (
                SELECT doc_id, len(toks) AS n_tokens,
                       {_grams(2)} AS g2, {_grams(3)} AS g3
                FROM t
            )
            SELECT doc_id, n_tokens,
                   len(g2) AS n_2grams,
                   len(list_distinct(g2)) AS n_2grams_distinct,
                   ROUND(1.0 - len(list_distinct(g2))
                             / greatest(len(g2), 1)::DOUBLE, 4) AS dup_2gram_frac,
                   ROUND(1.0 - len(list_distinct(g3))
                             / greatest(len(g3), 1)::DOUBLE, 4) AS dup_3gram_frac
            FROM g
        """,
        "tx_chunk_windows": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS toks FROM documents WHERE doc_id % 5 = 0
            ),
            c AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
            e AS (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(greatest(n - 8, 1) / 56.0) AS BIGINT)))
                           AS chunk_id
                FROM c
            )
            SELECT doc_id, chunk_id,
                   len(toks[chunk_id * 56 + 1 : chunk_id * 56 + 64])
                       AS n_chunk_tokens,
                   array_to_string(toks[chunk_id * 56 + 1 : chunk_id * 56 + 64], ' ')
                       AS chunk_text
            FROM e
        """,
        "ds_quality_filter": f"""
            WITH t AS (
                SELECT doc_id, text, {tok} AS toks FROM documents
            ), q AS (
                SELECT doc_id,
                       ROUND((
                           least(len(toks) / 64.0, 1.0)
                         + (1.0 - least(4.0 * length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                                        / greatest(length(text), 1), 1.0))
                         + least(5.0 * len(list_filter(toks,
                               x -> x IN ('the','and','of','to','in')))
                                        / greatest(len(toks), 1), 1.0)
                       ) / 3, 4) AS quality
                FROM t
            ), r AS (
                SELECT q.doc_id, d.source, q.quality,
                       PERCENT_RANK() OVER (
                           PARTITION BY d.source ORDER BY q.quality, q.doc_id
                       ) AS pr,
                       COUNT(*) OVER (PARTITION BY d.source) AS n
                FROM q JOIN documents d ON q.doc_id = d.doc_id
            )
            SELECT doc_id, source, quality FROM r WHERE pr >= 0.5 OR n = 1
        """,
        "tx_normalize": _tx_normalize_oracle_sql(),
        "tx_bpe_tokens": f"""
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(
                           text || ' Don''t stop; it''s 2024... #tag9 ''ll end.',
                           '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+'
                           || '| ?[^a-zA-Z0-9 '']+|'''
                       ) AS bt,
                       {tok} AS wt
                FROM documents
            )
            SELECT doc_id,
                   len(bt) AS n_bpe_tokens,
                   len(wt) AS n_ws_tokens,
                   md5(array_to_string(bt, chr(31))) AS token_stream_md5
            FROM t
        """,
        "e15_jsonl_ingest": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
        """,
        "tx_bm25_topk": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), d AS (
                SELECT doc_id, len(tk) AS dl,
                       len(list_filter(tk, x -> x = 'hash'))   AS tf0,
                       len(list_filter(tk, x -> x = 'join'))   AS tf1,
                       len(list_filter(tk, x -> x = 'filter')) AS tf2
                FROM t
            ), s AS (
                SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
                       SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                       SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                       SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
                FROM d
            )
            SELECT doc_id, ROUND(
                0.0
                + ln(1.0 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))
                  * tf0 * (1.2 + 1.0)
                  / (tf0 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                + ln(1.0 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
                  * tf1 * (1.2 + 1.0)
                  / (tf1 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                + ln(1.0 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5))
                  * tf2 * (1.2 + 1.0)
                  / (tf2 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
            , 6) AS bm25
            FROM d CROSS JOIN s
            ORDER BY bm25 DESC, doc_id ASC
            LIMIT 20
        """,
        "e16_change_feed": """
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   ROUND(o_totalprice, 2) AS price,
                   'delete' AS _change_type
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   ROUND(o_totalprice, 2) AS price,
                   'update_preimage' AS _change_type
            FROM orders
            WHERE o_orderstatus <> 'F' AND o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   -1.0 AS price,
                   'update_postimage' AS _change_type
            FROM orders
            WHERE o_orderstatus <> 'F' AND o_orderpriority = '1-URGENT'
        """,
        "dd_passage_dups": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT -(doc_id + 1) AS doc_id,
                       text || ' zz copy tail marker' AS text
                FROM documents WHERE doc_id < 25
            ), t AS (
                SELECT doc_id, {tok} AS toks FROM corpus
            ), g AS (
                SELECT doc_id,
                       list_distinct(list_transform({_grams(8)},
                                                    x -> md5(x))) AS grams
                FROM t WHERE len(toks) > 0
            ), e AS (
                SELECT doc_id, unnest(grams) AS gh FROM g
            ), dfq AS (
                SELECT gh, COUNT(*) AS dfc FROM e GROUP BY gh
            ), p AS (
                SELECT e.doc_id,
                       COUNT(*) AS n_passages,
                       CAST(SUM(CASE WHEN dfq.dfc >= 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dup_passages,
                       ROUND(SUM(CASE WHEN dfq.dfc >= 2 THEN 1 ELSE 0 END)
                             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
                FROM e JOIN dfq USING (gh)
                GROUP BY e.doc_id
            )
            -- empty-token docs: no passages, nothing duplicated
            SELECT t.doc_id,
                   COALESCE(p.n_passages, 0) AS n_passages,
                   COALESCE(p.n_dup_passages, 0) AS n_dup_passages,
                   COALESCE(p.dup_frac, 0.0) AS dup_frac
            FROM t LEFT JOIN p USING (doc_id)
        """,
        "tx_unigram_logprob": f"""
            WITH toks AS (
                SELECT doc_id, unnest({tok}) AS tok FROM documents
            ), cnt AS (
                SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
            ), tot AS (
                SELECT SUM(c) AS total, COUNT(*) AS v FROM cnt
            ), scored AS (
                SELECT toks.doc_id,
                       COUNT(*) AS n_tokens,
                       ROUND(AVG(ln(
                           (cnt.c + 0.5)
                           / (tot.total + 0.5 * (tot.v + 1))
                       )), 6) AS unigram_lp
                FROM toks JOIN cnt USING (tok) CROSS JOIN tot
                GROUP BY toks.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(s.n_tokens, 0) AS n_tokens,
                   s.unigram_lp
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        """,
        "tx_bigram_logprob": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), idx AS (
                SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2
            ), pos AS (
                SELECT doc_id, tk[i] AS v, tk[i + 1] AS w FROM idx
            ), cnt AS (
                SELECT v, w, COUNT(*) AS c FROM pos GROUP BY v, w
            ), pfx AS (
                SELECT v, SUM(c) AS cv FROM cnt GROUP BY v
            ), vv AS (
                SELECT COUNT(DISTINCT w) AS vcount FROM cnt
            ), scored AS (
                SELECT pos.doc_id,
                       COUNT(*) AS n_bigrams,
                       ROUND(AVG(ln(
                           (cnt.c + 0.5)
                           / (pfx.cv + 0.5 * (vv.vcount + 1))
                       )), 6) AS bigram_lp
                FROM pos JOIN cnt USING (v, w) JOIN pfx USING (v)
                CROSS JOIN vv
                GROUP BY pos.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(s.n_bigrams, 0) AS n_bigrams,
                   s.bigram_lp
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        """,
        "tx_sentences": _sentence_oracle_sql(),
        "tx_chunk_sentences": _chunk_sentences_oracle_sql(),
        "e23_matview_rollup": """
            SELECT lang,
                   COUNT(*) AS n,
                   CAST(SUM(n_chars) AS BIGINT) AS chars,
                   ROUND(CAST(SUM(n_chars) AS DOUBLE)
                         / COUNT(n_chars), 4) AS avg_chars,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS u_src
            FROM documents WHERE doc_id % 3 <> 0
            GROUP BY lang
        """,
        "ds_dsir_weights": f"""
            WITH tk AS (
                SELECT doc_id, lang, {tok} AS toks FROM documents
            ), uni AS (
                SELECT doc_id, lang, unnest(toks) AS f FROM tk
            ), bidx AS (
                SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
                FROM tk WHERE len(toks) >= 2
            ), bi AS (
                SELECT doc_id, lang, toks[i] || ' ' || toks[i + 1] AS f
                FROM bidx
            ), feats AS (
                SELECT doc_id, lang,
                       ({h48.format(v="'42:' || f")}) % 10000 AS fb
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
            ), rawc AS (
                SELECT fb, COUNT(*) AS c FROM feats GROUP BY fb
            ), rawt AS (SELECT SUM(c) AS t FROM rawc),
            tgtc AS (
                SELECT fb, COUNT(*) AS c FROM feats
                WHERE lang = 'en' GROUP BY fb
            ), tgtt AS (SELECT SUM(c) AS t FROM tgtc),
            lr AS (
                SELECT COALESCE(rawc.fb, tgtc.fb) AS fb,
                       COALESCE(ln((tgtc.c + 1) / CAST(tgtt.t + 10000
                                                       AS DOUBLE)),
                                ln(1.0 / CAST(tgtt.t + 10000 AS DOUBLE)))
                       - COALESCE(ln((rawc.c + 1) / CAST(rawt.t + 10000
                                                         AS DOUBLE)),
                                  ln(1.0 / CAST(rawt.t + 10000 AS DOUBLE)))
                           AS lrv
                FROM rawc FULL OUTER JOIN tgtc ON rawc.fb = tgtc.fb
                CROSS JOIN rawt CROSS JOIN tgtt
            ), sums AS (
                SELECT feats.doc_id, SUM(lr.lrv) AS w
                FROM feats JOIN lr ON feats.fb = lr.fb
                GROUP BY feats.doc_id
            )
            SELECT d.doc_id,
                   ROUND(COALESCE(s.w, 0.0), 6) AS dsir_weight
            FROM documents d LEFT JOIN sums s ON d.doc_id = s.doc_id
        """,
        "el6_bloom_point": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_orderkey IN (
                SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3
            )
        """,
        "ds_weighted_sample": f"""
            WITH keyed AS (
                SELECT doc_id, lang, n_chars,
                       ln(({h48.format(v="'42:' || CAST(doc_id AS VARCHAR)")}
                           + 1) / 281474976710656.0)
                       / CAST(n_chars AS DOUBLE) AS k
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0
            ), ranked AS (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang ORDER BY k DESC, doc_id ASC
                       ) AS rk
                FROM keyed
            )
            SELECT doc_id, lang, n_chars FROM ranked WHERE rk <= 25
        """,
        "e24_matview_timebucket": """
            SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 6) AS total
            FROM events WHERE event_id % 5 <> 0
            GROUP BY 1
        """,
        "ts_anomaly": """
            WITH obs AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS b,
                       AVG(value) AS observed
                FROM events GROUP BY 1, 2
            ), span AS (
                SELECT user_id, MIN(b) AS b0, MAX(b) AS b1
                FROM obs GROUP BY 1
            ), grid AS (
                SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM span
            ), dense AS (
                SELECT g.user_id, g.b, o.observed
                FROM grid g LEFT JOIN obs o USING (user_id, b)
            ), stat AS (
                SELECT user_id, b, observed,
                    COUNT(observed) OVER w AS n,
                    SUM(observed) OVER w AS s,
                    SUM(observed * observed) OVER w AS sq
                FROM dense
                WINDOW w AS (PARTITION BY user_id ORDER BY b
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            ), z AS (
                SELECT user_id, b, observed,
                    ROUND(CASE WHEN observed IS NOT NULL AND n >= 3
                               AND sqrt(greatest(sq / n - (s / n) * (s / n),
                                                 0.0)) > 0
                          THEN (observed - s / n)
                               / sqrt(greatest(sq / n - (s / n) * (s / n),
                                               0.0))
                          END, 4) AS zscore
                FROM stat
            )
            SELECT user_id, b * 86400000000 AS bucket_ts,
                   ROUND(observed, 6) AS observed, zscore,
                   abs(zscore) >= 2.0 AS is_anomaly
            FROM z
        """,
        "ts_gapfill": """
            WITH obs AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS b,
                       MAX(value) AS observed
                FROM events GROUP BY 1, 2
            ), span AS (
                SELECT user_id, MIN(b) AS b0, MAX(b) AS b1
                FROM obs GROUP BY 1
            ), grid AS (
                SELECT user_id, unnest(range(b0, b1 + 1)) AS b FROM span
            ), dense AS (
                SELECT g.user_id, g.b, o.observed
                FROM grid g LEFT JOIN obs o USING (user_id, b)
            ), fl AS (
                SELECT user_id, b, observed,
                    last_value(CASE WHEN observed IS NOT NULL
                               THEN struct_pack(b := b, v := observed)
                               END IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY b
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS prev,
                    first_value(CASE WHEN observed IS NOT NULL
                                THEN struct_pack(b := b, v := observed)
                                END IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY b
                              ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS nxt
                FROM dense
            )
            SELECT user_id, b * 86400000000 AS bucket_ts, observed,
                   ROUND(CASE WHEN observed IS NOT NULL THEN observed
                         WHEN prev IS NOT NULL AND nxt IS NOT NULL
                         THEN prev.v + (nxt.v - prev.v) * (b - prev.b)
                              / CAST(nxt.b - prev.b AS DOUBLE)
                         END, 6) AS filled
            FROM fl
        """,
        "tx_nb_train": f"""
            WITH toks AS (
                SELECT lang, unnest({tok}) AS tok FROM documents
            ), pair AS (
                SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY lang, tok
            ), ctok AS (
                SELECT lang, SUM(n) AS ctok FROM pair GROUP BY lang
            ), vv AS (
                SELECT COUNT(DISTINCT tok) AS v FROM pair
            )
            SELECT pair.lang, pair.tok,
                   ROUND(ln((pair.n + 1)
                            / CAST(ctok.ctok + vv.v AS DOUBLE)), 6) AS ll,
                   CAST(pair.n AS BIGINT) AS n
            FROM pair JOIN ctok USING (lang) CROSS JOIN vv
            WHERE pair.n >= 5
        """,
        "tx_nb_classify": f"""
            WITH toks AS (
                SELECT doc_id, lang, unnest({tok}) AS tok FROM documents
            ), pair AS (
                SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY lang, tok
            ), ctok AS (
                SELECT lang, SUM(n) AS ctok FROM pair GROUP BY lang
            ), vv AS (
                SELECT COUNT(DISTINCT tok) AS v FROM pair
            ), classes AS (
                SELECT d.lang,
                       ln(COUNT(*) / CAST(t.n_total AS DOUBLE)) AS prior,
                       ln(1.0 / (ANY_VALUE(ctok.ctok) + ANY_VALUE(vv.v)))
                           AS unseen_ll
                FROM documents d
                CROSS JOIN (SELECT COUNT(*) AS n_total FROM documents) t
                JOIN ctok ON ctok.lang = d.lang CROSS JOIN vv
                GROUP BY d.lang, t.n_total
            ), w AS (
                SELECT pair.lang, pair.tok,
                       ln((pair.n + 1)
                          / CAST(ctok.ctok + vv.v AS DOUBLE)) AS ll
                FROM pair JOIN ctok USING (lang) CROSS JOIN vv
            ), scored AS (
                SELECT toks.doc_id, classes.lang,
                       ANY_VALUE(classes.prior)
                       + SUM(COALESCE(w.ll, classes.unseen_ll)) AS score
                FROM (SELECT doc_id, tok FROM toks) toks
                CROSS JOIN classes
                LEFT JOIN w ON w.lang = classes.lang AND w.tok = toks.tok
                GROUP BY toks.doc_id, classes.lang
            ), ranked AS (
                SELECT doc_id, lang, score,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, lang ASC
                       ) AS rk
                FROM scored
            )
            SELECT doc_id,
                   MAX(CASE WHEN rk = 1 THEN lang END) AS predicted
            FROM ranked WHERE rk <= 2
            GROUP BY doc_id
            HAVING MAX(CASE WHEN rk = 1 THEN score END)
                   - MAX(CASE WHEN rk = 2 THEN score END) >= 0.001
        """,
        "ann_knn_join_blocked": """
            WITH l AS (
                SELECT vec_id AS id_a, embedding::DOUBLE[] AS va
                FROM embeddings WHERE vec_id < 100
            ), r AS (
                SELECT vec_id AS id_b, embedding::DOUBLE[] AS vb
                FROM embeddings
            ), p AS (
                SELECT id_a, id_b,
                       list_cosine_similarity(va, vb) AS cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY id_a
                           ORDER BY list_cosine_similarity(va, vb) DESC, id_b
                       ) AS rn
                FROM l, r
            )
            SELECT id_a, id_b, ROUND(cos, 6) AS cos_sim FROM p WHERE rn <= 3
        """,
        "tx_gopher_flags": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS toks FROM documents
            ), m AS (
                SELECT doc_id, toks, len(toks) AS n,
                       list_sum(list_transform(toks, x -> length(x)))
                           / greatest(len(toks), 1) AS mean_len,
                       len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                           / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha_frac,
                       len(list_distinct(list_filter(toks, x ->
                           x IN ('spark','sort','group','value','fast'))))
                           AS n_stop
                FROM t
            )
            SELECT doc_id,
                   n AS n_words,
                   ROUND(CAST(mean_len AS DOUBLE), 4) AS mean_word_len,
                   ROUND(alpha_frac, 4) AS alpha_word_frac,
                   n_stop AS n_stop_words,
                   (n >= 50 AND n <= 100000
                    AND mean_len >= 3.0 AND mean_len <= 10.0
                    AND alpha_frac >= 0.80 AND n_stop >= 2) AS gopher_ok
            FROM m
        """,
        "tx_c4_filter": f"""
            WITH d AS (
                SELECT doc_id,
                       substring(text, 1, 40) || ' ok line end.' || chr(10)
                       || 'too short.' || chr(10)
                       || 'no terminal punctuation here at all' || chr(10)
                       || CASE WHEN doc_id % 3 = 0
                            THEN 'Enable javascript to view this page.'
                            ELSE 'a perfectly fine sentence with enough words.'
                          END || chr(10)
                       || CASE WHEN doc_id % 7 = 0
                            THEN 'lorem ipsum dolor sit amet.'
                            ELSE 'closing thoughts wrap up the document nicely.'
                          END || chr(10)
                       || CASE WHEN doc_id % 11 = 0
                            THEN 'function f() {{ return 1; }}'
                            ELSE 'the last line ends with a question?'
                          END AS doc
                FROM documents
            ), k AS (
                SELECT doc_id, doc,
                       list_filter(
                           list_transform(string_split(doc, chr(10)),
                                          x -> trim(x)),
                           ln -> right(ln, 1) IN ('.', '!', '?', '"')
                                 AND len(string_split_regex(ln, ' +')) >= 5
                                 AND NOT contains(lower(ln), 'javascript')
                       ) AS kept
                FROM d
            )
            SELECT doc_id,
                   len(kept) AS n_kept_lines,
                   (NOT contains(doc, '{{')
                    AND NOT contains(lower(doc), 'lorem ipsum')
                    AND len(kept) >= 3) AS c4_ok,
                   length(array_to_string(kept, chr(10))) AS clean_len
            FROM k
        """,
        "e14_engine_dedup": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        """,
        "ann_quantize_int8": """
            WITH s AS (
                SELECT list(mx ORDER BY i) AS scale FROM (
                    SELECT i,
                           greatest(max(abs(CAST(embedding[i] AS DOUBLE))), 1e-30)
                               AS mx
                    FROM embeddings, range(1, 65) t(i)
                    GROUP BY i
                )
            )
            SELECT vec_id,
                   array_to_string(
                       list_transform(range(1, 65), i ->
                           CAST(floor(127.0 * CAST(embedding[i] AS DOUBLE)
                                      / scale[i] + 0.5) AS INT)),
                       ',') AS q8_csv
            FROM embeddings, s
        """,
        "dd_dup_clusters": """
            WITH RECURSIVE aug AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
            ), p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM aug a JOIN aug b
                  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
            ), edges AS (
                SELECT id_a AS s, id_b AS d FROM p
                UNION
                SELECT id_b, id_a FROM p
            ), reach(node, lab) AS (
                SELECT s, s FROM edges
                UNION
                SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
            )
            SELECT node AS doc_id, MIN(lab) AS cluster_id
            FROM reach GROUP BY node
        """,
        "e1_engine_scan": """
            SELECT l_orderkey, l_quantity, l_extendedprice
            FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'A'
        """,
        "e2_engine_sql": """
            SELECT o_orderpriority, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY o_orderpriority
        """,
        "e3_engine_sorted_scan": """
            SELECT l_orderkey, l_shipdate, l_quantity
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-03-01'
        """,
        "e7_engine_partitioned": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'purchase' AND value > 10.0
        """,
        "e9_engine_merge": """
            SELECT c_custkey,
                   CASE WHEN c_acctbal < 0 THEN 'ADJUSTED'
                        ELSE c_mktsegment END AS c_mktsegment,
                   c_acctbal
            FROM customer
            UNION ALL
            SELECT 9000000 + r AS c_custkey, 'SYNTH' AS c_mktsegment,
                   NULL AS c_acctbal
            FROM range(100) t(r)
        """,
        "e10_sql_frontend": """
            SELECT o_orderstatus, count(*) AS n_rows,
                   round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                                  THEN o_totalprice * 2
                                  ELSE o_totalprice END), 2) AS total
            FROM orders WHERE o_orderstatus <> 'P'
            GROUP BY o_orderstatus
        """,
        "e11_merge_conditional": """
            SELECT c_custkey,
                   CASE WHEN c_acctbal < -50 THEN c_acctbal * 2
                        ELSE c_acctbal END AS c_acctbal,
                   c_name
            FROM customer
            UNION ALL
            SELECT 9000000 + c_custkey AS c_custkey,
                   60.0 AS c_acctbal,
                   'SYN#' || CAST(9000000 + c_custkey AS VARCHAR) AS c_name
            FROM customer
            WHERE c_custkey <= 100 AND (9000000 + c_custkey) % 2 = 0
        """,
        "a8_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_rows,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "a9_percentiles": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                   ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
                   ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "f6_levenshtein": """
            SELECT c_custkey,
                   levenshtein(c_name, 'Customer#000000042') AS dist
            FROM customer WHERE c_custkey <= 500
        """,
        "w8_attribution_join": """
            SELECT a.user_id, a.event_id AS first_event_id,
                   b.event_id AS then_event_id
            FROM events a
            JOIN events b ON a.user_id = b.user_id
            WHERE a.event_type = 'view' AND b.event_type = 'purchase'
              AND b.ts >= a.ts
              AND b.ts <= a.ts + INTERVAL 30 MINUTE
        """,
        "e12_engine_restore": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        """,
        "e13_engine_zorder": """
            SELECT event_id, user_id, value
            FROM events
            WHERE user_id BETWEEN 3 AND 5
              AND value BETWEEN 100.0 AND 140.0
        """,
        "el1_sorted_point": """
            SELECT event_id, user_id, value
            FROM events WHERE user_id = 7
        """,
        "el2_sorted_ts_between": """
            SELECT event_id, user_id, value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
        """,
        "el3_sorted_conjunction": """
            SELECT event_id, user_id, value
            FROM events WHERE user_id = 11 AND value > 1.0
        """,
        "el4_sorted_or_ranges": """
            SELECT event_id, user_id, value
            FROM events
            WHERE value BETWEEN 437.4 AND 437.5 OR value BETWEEN 38.0 AND 38.1
        """,
        "el5_sorted_isin": """
            SELECT event_id, user_id, value, event_type
            FROM events WHERE event_type IN ('click', 'error')
        """,
        "e8_engine_predicate_dml": """
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN -1.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderstatus <> 'F'
        """,
        "e4_engine_dml": """
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN -1.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderstatus <> 'F'
        """,
        "e5_engine_projection": """
            SELECT o_custkey, o_totalprice FROM orders WHERE o_custkey < 500
        """,
        "e6_engine_snapshot": """
            SELECT * FROM nation
        """,
        "s1_scan_project": """
            SELECT l_orderkey, l_partkey, l_extendedprice
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
        """,
        "p2_comparisons": """
            SELECT p_partkey, p_size, p_retailprice
            FROM part WHERE p_size >= 30 AND p_retailprice < 1200.0
        """,
        "p3_between": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
        """,
        "p4_isin": """
            SELECT c_custkey, c_mktsegment
            FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        """,
        "p5_isnull": """
            SELECT o_orderkey FROM orders
            WHERE NULLIF(o_orderpriority, '1-URGENT') IS NULL
        """,
        "p6_startswith": """
            SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'red %'
        """,
        "p7_contains": """
            SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%widget%'
        """,
        "p8_struct_field": """
            SELECT event_id, user_id FROM events WHERE event_type = 'click'
        """,
        "p10_literals": """
            SELECT event_id, event_type, value FROM events
            WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
              AND ts < TIMESTAMP '2024-01-05 00:00:00'
              AND value > 50.0 AND event_type <> 'error'
        """,
        "p11_false_predicate": """
            SELECT l_orderkey, l_quantity FROM lineitem WHERE false
        """,
        "o1_limit_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "a1_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "a2_count_distinct": """
            SELECT o_orderpriority,
                   COUNT(*) AS n_orders,
                   COUNT(DISTINCT o_custkey) AS n_customers
            FROM orders GROUP BY o_orderpriority
        """,
        "a3_having": """
            SELECT o_custkey, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_spent
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
        """,
        "a4_rollup": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "a5_conditional_agg": """
            SELECT l_returnflag,
                   ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END), 2) AS qty_f,
                   ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 2) AS qty_o
            FROM lineitem GROUP BY l_returnflag
        """,
        "j1_star_join_revenue": """
            SELECT n_name, r_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY n_name, r_name
        """,
        "tpch_q3": """
            SELECT l_orderkey, o_orderdate,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q5": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "tpch_q6": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "tpch_q7": """
            SELECT supp_nation, cust_nation, l_year,
                   ROUND(SUM(volume), 2) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                       l_extendedprice * (1 - l_discount) AS volume
                FROM supplier, lineitem, orders, customer,
                     nation n1, nation n2
                WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                  AND c_custkey = o_custkey
                  AND s_nationkey = n1.n_nationkey
                  AND c_nationkey = n2.n_nationkey
                  AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
                    OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
                  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                     AND TIMESTAMP '1997-12-31'
            ) shipping
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "tpch_q13": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer
                LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey
                 AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey
            ) c_orders
            GROUP BY c_count
        """,
        "tpch_q14": """
            SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP '1996-09-01'
              AND l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "tpch_q15": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier, revenue
            WHERE s_suppkey = supplier_no
              AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """,
        "tpch_q17": """
            SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
              AND l_quantity < (
                  SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = p_partkey)
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-10-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "tpch_q18": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   o_totalprice, sum_qty
            FROM (
                SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(l_quantity) > 320
            )
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "j2_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
            )
        """,
        "j3_anti_join": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 150000.0
            )
        """,
        "j4_outer_join_counts": """
            SELECT n_name, COUNT(c_custkey) AS n_customers
            FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
            GROUP BY n_name
        """,
        "w1_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "w2_running_sum": """
            SELECT user_id, event_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 3)
                       AS running_value
            FROM events
        """,
        "w3_lag_delta": """
            SELECT user_id, event_id,
                   ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id
                                                     ORDER BY ts ASC, event_id ASC), 3) AS delta
            FROM events
        """,
        "w4_dense_rank": """
            SELECT p_partkey, p_brand,
                   DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
                       AS price_rank
            FROM part
        """,
        "set1_union": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        """,
        "set2_intersect": """
            SELECT o_custkey FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
            INTERSECT
            SELECT o_custkey FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
        """,
        "set3_except": """
            SELECT o_custkey FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
            EXCEPT
            SELECT o_custkey FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
        """,
        "f1_json_expansion": """
            SELECT event_type, COUNT(*) AS n_events,
                   ROUND(AVG(k), 4) AS avg_k
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS INT) AS k
                FROM events
            ) WHERE k > 50
            GROUP BY event_type
        """,
        "o5_vector_topk_l2": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, label,
                   ROUND(list_distance(embedding::DOUBLE[], qv::DOUBLE[]) ^ 2, 4) AS dist_sq_r
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY list_distance(embedding::DOUBLE[], qv::DOUBLE[]) ASC, vec_id ASC
            LIMIT 10
        """,
        "tx_url_canon": _url_canon_oracle_sql(),
        "tx_html_strip": _html_strip_oracle_sql(),
        "dd_line_dedup": """
            WITH aug AS (
                SELECT doc_id,
                       'NOTICE: provided as-is with no warranty' || chr(10)
                       || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR)
                       || ' begins' || chr(10) || text
                       || CASE WHEN doc_id % 2 = 0
                               THEN chr(10) || 'SHARED FOOTER ALPHA'
                               ELSE chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
                          END AS text
                FROM documents
            ), lines AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
                FROM aug
            ), dup AS (
                SELECT md5(line) AS k
                FROM lines
                WHERE trim(line) <> ''
                GROUP BY 1
                HAVING COUNT(DISTINCT doc_id) >= 2
            ), kept AS (
                SELECT doc_id, line, pos
                FROM lines
                WHERE md5(line) NOT IN (SELECT k FROM dup)
            ), re AS (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS clean,
                       COUNT(*) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT a.doc_id,
                   md5(COALESCE(re.clean, '')) AS clean_md5,
                   length(COALESCE(re.clean, '')) AS n_chars,
                   COALESCE(re.n_kept, 0) AS n_lines_kept,
                   len(string_split(a.text, chr(10))) - COALESCE(re.n_kept, 0)
                       AS n_lines_dropped
            FROM aug a LEFT JOIN re ON a.doc_id = re.doc_id
        """,
        "dd_minhash_join": f"""
            WITH right_src AS (
                SELECT doc_id + 1000000 AS rid,
                       text || ' linkage probe variant' AS body
                FROM documents WHERE doc_id % 11 = 0
            ), {_mh_lsh_chain_sql('l', 'documents', 'doc_id', 'text')},
            {_mh_lsh_chain_sql('r', 'right_src', 'rid', 'body')},
            cand AS (
                SELECT DISTINCT l.id AS left_id, r.id AS right_id
                FROM bands_l l JOIN bands_r r
                  ON l.band_id = r.band_id AND l.band_key = r.band_key
            )
            SELECT left_id, right_id,
                   ROUND(len(list_intersect(sa.shd, sb.shd))
                         / greatest(len(sa.shd) + len(sb.shd)
                                    - len(list_intersect(sa.shd, sb.shd)), 1), 6)
                       AS jaccard
            FROM cand
            JOIN shs_l sa ON cand.left_id = sa.id
            JOIN shs_r sb ON cand.right_id = sb.id
            WHERE len(list_intersect(sa.shd, sb.shd))
                  / greatest(len(sa.shd) + len(sb.shd)
                             - len(list_intersect(sa.shd, sb.shd)), 1) >= 0.8
        """,
        "ann_pca_project": """
            -- exact planted ground truth: the centered corpus is rank 3,
            -- so projected squared distance to row 0 is the integer
            -- a^2+b^2+c^2 of the modular construction
            SELECT vec_id,
                   ((vec_id*7)%13)*((vec_id*7)%13)
                   + ((vec_id*11)%17)*((vec_id*11)%17)
                   + ((vec_id*3)%19)*((vec_id*3)%19) AS d2
            FROM embeddings
        """,
        "ds_token_budget": f"""
            WITH d AS (
                SELECT doc_id, source,
                       len({_SQL_TOKENS.format(c="text")}) AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, source, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS before
                FROM d
            )
            SELECT doc_id, source, n_tokens
            FROM c
            WHERE CASE source
                    WHEN 'src0'  THEN before < 800
                    WHEN 'src3'  THEN before < 400
                    WHEN 'src5'  THEN before < 1
                    WHEN 'src7'  THEN before < 10000000
                    WHEN 'src12' THEN before < 0
                    WHEN 'src19' THEN before < 500
                    ELSE FALSE
                  END
        """,
        "tx_kl_drift": f"""
            WITH a_terms AS (
                SELECT unnest({_SQL_TOKENS.format(c="text || ' driftmarker xq'")}) AS term
                FROM documents WHERE doc_id % 2 = 0
            ), b_terms AS (
                SELECT unnest({_SQL_TOKENS.format(c="text")}) AS term
                FROM documents WHERE doc_id % 2 = 1
            ), ca AS (
                SELECT term, COUNT(*) AS count_a FROM a_terms GROUP BY term
            ), cb AS (
                SELECT term, COUNT(*) AS count_b FROM b_terms GROUP BY term
            ), vocab AS (
                SELECT COALESCE(ca.term, cb.term) AS term,
                       COALESCE(count_a, 0) AS count_a,
                       COALESCE(count_b, 0) AS count_b
                FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
            ), s AS (
                SELECT SUM(count_a) AS na, SUM(count_b) AS nb, COUNT(*) AS v
                FROM vocab
            )
            SELECT term, count_a, count_b,
                   ROUND(((count_a + 1) / (s.na + s.v))
                         * ln(((count_a + 1) / (s.na + s.v))
                              / ((count_b + 1) / (s.nb + s.v))), 12)
                       AS contribution
            FROM vocab CROSS JOIN s
            ORDER BY ((count_a + 1) / (s.na + s.v))
                     * ln(((count_a + 1) / (s.na + s.v))
                          / ((count_b + 1) / (s.nb + s.v))) DESC,
                     term ASC
            LIMIT 40
        """,
        "ds_shard_assign": """
            SELECT doc_id,
                   CAST(((doc_id % 3037000493) * 2654435761) % 8 AS INTEGER)
                       AS shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY ((doc_id % 3037000493) * 2654435761) % 8
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) - 1 AS BIGINT) AS pos
            FROM documents
        """,
        "e25_sig_sync": f"""
            WITH corpus AS (
                SELECT doc_id,
                       CASE WHEN doc_id = 3
                            THEN 'entirely new rewritten body'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT 9001 AS doc_id,
                       'fresh document appended after sync' AS text
            ), {_mh_lsh_chain_sql('x', 'corpus', 'doc_id', 'text')}
            SELECT id AS doc_id, band_id, band_key FROM bands_x
        """,
        "e26_sql_views": """
            WITH lang_stats AS (
                SELECT lang, source, COUNT(*) AS n_docs,
                       CAST(SUM(n_chars) AS BIGINT) AS chars
                FROM documents GROUP BY lang, source
            ), big AS (
                SELECT * FROM lang_stats WHERE n_docs >= 5
            )
            SELECT v.lang, v.source, v.n_docs, v.chars,
                   COUNT(*) AS n_join_rows
            FROM big v JOIN documents d
              ON v.lang = d.lang AND v.source = d.source
            GROUP BY v.lang, v.source, v.n_docs, v.chars
        """,
        "tx_kn_logprob": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), idx AS (
                SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2
            ), pos AS (
                SELECT doc_id, tk[i] AS v, tk[i + 1] AS w FROM idx
            ), cnt AS (
                SELECT v, w, COUNT(*) AS c FROM pos GROUP BY v, w
            ), pfx AS (
                SELECT v, SUM(c) AS cv, COUNT(*) AS n1f FROM cnt GROUP BY v
            ), wst AS (
                SELECT w, COUNT(*) AS n1b FROM cnt GROUP BY w
            ), tot AS (
                SELECT COUNT(*) AS dt, COUNT(DISTINCT w) AS vvt FROM cnt
            ), scored AS (
                SELECT pos.doc_id,
                       COUNT(*) AS n_bigrams,
                       ROUND(AVG(ln(
                           (GREATEST(CAST(cnt.c AS DOUBLE) - 0.75, 0.0)
                            + (0.75 * pfx.n1f)
                              * ((COALESCE(wst.n1b, 0) + 1)
                                 / (tot.dt + tot.vvt + 1)))
                           / CAST(pfx.cv AS DOUBLE)
                       )), 6) AS kn_lp
                FROM pos
                JOIN cnt USING (v, w)
                JOIN pfx USING (v)
                JOIN wst USING (w)
                CROSS JOIN tot
                GROUP BY pos.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(s.n_bigrams, 0) AS n_bigrams,
                   s.kn_lp
            FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
        """,
        "tx_span_corrupt": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), pos AS (
                SELECT doc_id,
                       unnest(tk) AS tok,
                       unnest(range(0, len(tk))) AS p
                FROM toks
            ), h AS (
                SELECT doc_id, tok, p,
                       {_md5_int_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)", 1)} AS h1,
                       {_md5_int_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)", 13)} AS h2
                FROM pos
            ), st AS (
                SELECT *, CASE WHEN h1 % 20 = 0
                               THEN p + 1 + (h2 % 5) ELSE -1 END AS reach
                FROM h
            ), cov AS (
                SELECT *, MAX(reach) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) > p AS masked
                FROM st
            ), nw AS (
                SELECT *, masked AND NOT COALESCE(LAG(masked) OVER (
                    PARTITION BY doc_id ORDER BY p), FALSE) AS isnew
                FROM cov
            ), num AS (
                SELECT *, SUM(CASE WHEN isnew THEN 1 ELSE 0 END) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) - 1 AS span
                FROM nw
            ), pieces AS (
                SELECT doc_id, p,
                       CASE WHEN NOT masked THEN tok
                            WHEN isnew THEN '<extra_id_' || span || '>'
                       END AS inp,
                       CASE WHEN isnew THEN '<extra_id_' || span || '>'
                                            || ' ' || tok
                            WHEN masked THEN tok
                       END AS tgt,
                       CASE WHEN masked THEN 1 ELSE 0 END AS m,
                       CASE WHEN isnew THEN 1 ELSE 0 END AS n
                FROM num
            ), agg AS (
                SELECT doc_id,
                       string_agg(inp, ' ' ORDER BY p)
                           FILTER (WHERE inp IS NOT NULL) AS input,
                       string_agg(tgt, ' ' ORDER BY p)
                           FILTER (WHERE tgt IS NOT NULL) AS tgt_body,
                       COUNT(*) AS n_tokens,
                       SUM(m) AS n_masked,
                       SUM(n) AS n_spans
                FROM pieces GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.input, '') AS input,
                   CASE WHEN COALESCE(a.n_spans, 0) > 0
                        THEN a.tgt_body || ' <extra_id_' || a.n_spans || '>'
                        ELSE '<extra_id_0>' END AS target,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   CAST(COALESCE(a.n_masked, 0) AS BIGINT) AS n_masked,
                   CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "tx_prefix_lm": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), st AS (
                SELECT doc_id, tk, len(tk) AS n,
                       {_md5_int_sql("CAST(doc_id AS VARCHAR)", 1)} AS h,
                       CAST(ceil(0.25 * len(tk)) AS BIGINT) AS lo,
                       CAST(floor(0.75 * len(tk)) AS BIGINT) AS hi
                FROM toks
            ), sp AS (
                SELECT doc_id, tk, n,
                       CASE WHEN n >= 2
                            THEN LEAST(GREATEST(lo + h % GREATEST(hi - lo + 1, 1), 1),
                                       GREATEST(n - 1, 1))
                            ELSE n END AS split
                FROM st
            )
            SELECT doc_id,
                   array_to_string(tk[1:split], ' ') AS input,
                   array_to_string(tk[split+1:n], ' ') AS target,
                   n AS n_tokens,
                   split AS split_at
            FROM sp
        """,
        "tx_mlm_mask": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), pos AS (
                SELECT doc_id, tk,
                       unnest(tk) AS tok,
                       unnest(range(0, len(tk))) AS p
                FROM toks
            ), h AS (
                SELECT doc_id, tk, tok, p,
                       {_md5_int_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)", 1)} AS h1,
                       {_md5_int_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)", 13)} AS h2
                FROM pos
            ), branched AS (
                SELECT doc_id, p, tok,
                       (h1 % 7 = 0) AS sel,
                       CASE WHEN h1 % 7 <> 0 THEN tok
                            WHEN h2 % 10 <= 7 THEN '[MASK]'
                            WHEN h2 % 10 = 8 THEN tk[(h2 % len(tk)) + 1]
                            ELSE tok END AS outt
                FROM h
            ), agg AS (
                SELECT doc_id,
                       string_agg(outt, ' ' ORDER BY p) AS input,
                       string_agg(CAST(p AS VARCHAR) || ':' || tok, ' '
                                  ORDER BY p) FILTER (WHERE sel) AS labels,
                       COUNT(*) AS n_tokens,
                       SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS n_selected
                FROM branched GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.input, '') AS input,
                   COALESCE(a.labels, '') AS labels,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   CAST(COALESCE(a.n_selected, 0) AS BIGINT) AS n_selected
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "tx_contrastive": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), el AS (
                SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h, tk
                FROM toks WHERE len(tk) > 16
            ), st AS (
                SELECT doc_id, h,
                       ({_md5_int_sql("CAST(doc_id AS VARCHAR)", 1)} % 8) AS b,
                       array_to_string(tk[1:16], ' ') AS anchor,
                       array_to_string(tk[17:32], ' ') AS positive
                FROM el
            ), rg AS (
                SELECT doc_id, anchor, positive,
                       COALESCE(LEAD(doc_id) OVER w,
                                FIRST_VALUE(doc_id) OVER wf) AS neg_id,
                       COALESCE(LEAD(positive) OVER w,
                                FIRST_VALUE(positive) OVER wf) AS negative
                FROM st
                WINDOW w AS (PARTITION BY b ORDER BY h, doc_id),
                       wf AS (PARTITION BY b ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
            )
            SELECT doc_id, anchor, positive, neg_id, negative
            FROM rg WHERE neg_id <> doc_id
        """,
        "tx_collapse_repeats": """
            WITH aug AS (
                SELECT doc_id,
                       'HEADER LINE' || chr(10) || 'HEADER LINE' || chr(10)
                       || text
                       || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
                       || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
                       || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
                           AS text
                FROM documents
            ), sp AS (
                SELECT doc_id, string_split(text, chr(10)) AS l FROM aug
            ), kept AS (
                SELECT doc_id,
                       array_to_string(
                           list_filter(l, (x, i) -> i = 1 OR x <> l[i - 1]),
                           chr(10)) AS clean
                FROM sp
            )
            SELECT doc_id,
                   md5(clean) AS clean_md5,
                   length(clean) AS n_chars,
                   len(string_split(clean, chr(10))) AS n_lines
            FROM kept
        """,
        "ds_score_normalize": """
            WITH d AS (
                SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS score
                FROM documents
            ), s AS (
                SELECT lang, AVG(score) AS mu, STDDEV_POP(score) AS sd
                FROM d GROUP BY lang
            )
            SELECT d.doc_id, d.lang,
                   ROUND(CASE WHEN s.sd > 0
                              THEN (d.score - s.mu) / s.sd END, 6) AS z,
                   ROUND(PERCENT_RANK() OVER (
                       PARTITION BY d.lang ORDER BY d.score ASC), 6) AS pct
            FROM d JOIN s USING (lang)
        """,
        "tx_chat_render": f"""
            WITH toks AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), c AS (
                SELECT doc_id,
                       array_to_string(tk[1:5], ' ') AS c1,
                       array_to_string(tk[6:10], ' ') AS c2,
                       'continue ' || CAST(doc_id AS VARCHAR) AS c3,
                       CASE WHEN len(tk) > 10
                            THEN array_to_string(tk[11:len(tk)], ' ')
                            ELSE '' END AS c4
                FROM toks
            ), b AS (
                SELECT doc_id, c2, c4,
                       '<|im_start|>user' || chr(10) || c1
                           || '<|im_end|>' || chr(10) AS b1,
                       '<|im_start|>assistant' || chr(10) || c2
                           || '<|im_end|>' || chr(10) AS b2,
                       '<|im_start|>user' || chr(10) || c3
                           || '<|im_end|>' || chr(10) AS b3,
                       '<|im_start|>assistant' || chr(10) || c4
                           || '<|im_end|>' || chr(10) AS b4
                FROM c
            )
            SELECT doc_id,
                   md5(b1 || b2 || b3 || b4) AS text_md5,
                   length(b1 || b2 || b3 || b4) AS n_chars,
                   CAST(length(b1) + 22 AS VARCHAR) || ':'
                       || CAST(length(c2) AS VARCHAR) || ' '
                       || CAST(length(b1) + length(b2) + length(b3) + 22
                               AS VARCHAR) || ':'
                       || CAST(length(c4) AS VARCHAR) AS spans,
                   4 AS n_turns,
                   CAST(2 AS BIGINT) AS n_masked_turns
            FROM b
        """,
        "tx_rrf_fusion": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), d AS (
                SELECT doc_id, len(tk) AS dl,
                       len(list_filter(tk, x -> x = 'hash'))   AS tf0,
                       len(list_filter(tk, x -> x = 'join'))   AS tf1,
                       len(list_filter(tk, x -> x = 'filter')) AS tf2
                FROM t
            ), s AS (
                SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
                       SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                       SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                       SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
                FROM d
            ), lex_cut AS (
                SELECT doc_id,
                    0.0
                    + ln(1.0 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))
                      * tf0 * (1.2 + 1.0)
                      / (tf0 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    + ln(1.0 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
                      * tf1 * (1.2 + 1.0)
                      / (tf1 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    + ln(1.0 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5))
                      * tf2 * (1.2 + 1.0)
                      / (tf2 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    AS bm25_raw
                FROM d CROSS JOIN s
                ORDER BY bm25_raw DESC, doc_id ASC
                LIMIT 50
            ), lex AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY bm25_raw DESC, doc_id ASC)
                           AS rank_1
                FROM lex_cut
            ), q AS (
                SELECT embedding AS qv FROM embeddings WHERE vec_id = 7
            ), sem_cut AS (
                SELECT vec_id AS doc_id,
                       list_cosine_similarity(embedding::DOUBLE[],
                                              q.qv::DOUBLE[]) AS c
                FROM embeddings CROSS JOIN q
                ORDER BY c DESC, vec_id ASC
                LIMIT 50
            ), sem AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY c DESC, doc_id ASC) AS rank_2
                FROM sem_cut
            )
            SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
                   rank_1, rank_2,
                   ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + rank_1), 0)
                         + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_2), 0), 9)
                       AS rrf
            FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
            ORDER BY COALESCE(CAST(1 AS DOUBLE) / (60 + rank_1), 0)
                     + COALESCE(CAST(1 AS DOUBLE) / (60 + rank_2), 0) DESC,
                     COALESCE(lex.doc_id, sem.doc_id) ASC
            LIMIT 20
        """,
        "ann_matryoshka_topk": """
            WITH q AS (
                SELECT embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id = 3
            ), s1 AS (
                SELECT vec_id, embedding,
                       list_cosine_similarity(
                           embedding[1:16]::DOUBLE[], qv[1:16]) AS ct
                FROM embeddings, q WHERE vec_id <> 3
                ORDER BY ct DESC, vec_id ASC
                LIMIT 100
            )
            SELECT vec_id, ROUND(ct, 4) AS cos_trunc,
                   ROUND(list_cosine_similarity(
                       s1.embedding::DOUBLE[], q.qv), 4) AS cos_full
            FROM s1, q
            ORDER BY list_cosine_similarity(s1.embedding::DOUBLE[], q.qv)
                     DESC, vec_id ASC
            LIMIT 10
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, label,
                   ROUND(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS cos_sim_r
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) DESC, vec_id ASC
            LIMIT 10
        """,
        "dd_exact": """
            SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
                   MIN(doc_id) AS keep_doc_id
            FROM documents GROUP BY md5(text)
        """,
        "dd_fingerprint": f"""
            SELECT doc_id,
                   substr(md5(array_to_string({tok}, ' ')), 1, 16) AS fingerprint
            FROM documents
        """,
        "dd_minhash_sig": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS toks FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(toks) < 3
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       END AS sh
                FROM t
            ), hb AS (
                SELECT doc_id, list_transform(sh, s -> {_mh_base_sql('s')}) AS hb FROM sh
            ), sigs AS (
                SELECT doc_id,
                       list_min(list_transform(hb, b -> (3 * b + 1) % 2147483647)) AS mh0,
                       list_min(list_transform(hb, b -> (5 * b + 7920) % 2147483647)) AS mh1,
                       list_min(list_transform(hb, b -> (7 * b + 15839) % 2147483647)) AS mh2,
                       list_min(list_transform(hb, b -> (9 * b + 23758) % 2147483647)) AS mh3
                FROM hb
            )
            SELECT doc_id, mh0, mh1, mh2, mh3,
                   substr(md5(CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR)
                           || '|' || CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR)),
                          1, 16) AS lsh_band
            FROM sigs
        """,
        "dd_ngram_overlap": """
            WITH g AS (
                SELECT doc_id, source, gram FROM (
                    SELECT doc_id, source,
                           unnest(list_distinct(list_transform(
                               range(1, greatest(length(lower(text)) - 7, 1) + 1),
                               i -> substr(lower(text), i, 8)))) AS gram
                    FROM documents
                )
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_grams
            FROM g a JOIN g b
              ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING COUNT(*) >= 40
        """,
        "f2_string_funcs": """
            SELECT p_partkey,
                   UPPER(p_name) AS name_upper,
                   LENGTH(p_name) AS name_len,
                   REPLACE(p_name, ' ', '_') AS name_snake,
                   SUBSTR(p_name, 1, 3) AS name_pfx,
                   levenshtein(p_type, 'ECONOMY') AS type_edit_dist,
                   p_brand || '/' || p_type AS brand_type
            FROM part
        """,
        "f3_date_funcs": """
            SELECT o_orderkey,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
                   CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
                   CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS order_day,
                   CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS order_quarter,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                       AS days_since_epoch_start
            FROM orders
        """,
        "f4_conditional": """
            SELECT c_custkey,
                   COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'RESIDENTIAL')
                       AS segment_or_residential,
                   CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                        WHEN c_acctbal < 5000 THEN 'standard'
                        ELSE 'premium' END AS tier,
                   GREATEST(c_acctbal, 0.0) AS bal_floor,
                   ROUND(ABS(c_acctbal), 2) AS bal_abs
            FROM customer
        """,
        "f5_array_agg": """
            SELECT o_custkey,
                   array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',')
                       AS order_keys,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        """,
        "a6_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "w5_first_last": """
            SELECT o_custkey, o_orderkey,
                   FIRST_VALUE(o_totalprice) OVER w AS first_price,
                   LAST_VALUE(o_totalprice) OVER w AS last_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "w6_ntile": """
            SELECT o_orderkey, o_orderpriority,
                   NTILE(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC, o_orderkey ASC)
                       AS price_quartile
            FROM orders
        """,
        "w7_event_time_window": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "asof_last_purchase": """
            SELECT v.event_id, v.user_id,
                   ROUND(p.value, 6) AS last_purchase_value
            FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'view') v
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
              ON v.user_id = p.user_id AND v.ts >= p.ts
        """,
        "dd_simhash": _simhash_oracle_sql(),
        "mm_decode_stub": """
            WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
            b AS (
                SELECT doc_id,
                       16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
                          + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS byte0,
                       16 * (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
                          + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) AS byte1,
                       """ + " + ".join(
                        f"""(16 * (strpos('0123456789abcdef', substr(h, {5 + 2 * i}, 1)) - 1)
                          + (strpos('0123456789abcdef', substr(h, {6 + 2 * i}, 1)) - 1))"""
                        for i in range(8)
                    ) + """ AS luma_sum
                FROM h
            )
            SELECT doc_id,
                   CAST(64 + byte0 % 192 AS INT) AS fake_width,
                   CAST(64 + byte1 % 192 AS INT) AS fake_height,
                   CAST(luma_sum AS INT) AS luma_sum
            FROM b
        """,
        "dd_lsh_pairs": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS toks FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(toks) < 3
                            THEN [array_to_string(toks, ' ')]
                            ELSE list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       END AS sh
                FROM t
            ), hb AS (
                SELECT doc_id, sh, list_transform(sh, s -> {_mh_base_sql('s')}) AS hb
                FROM sh
            ), sigs AS (
                SELECT doc_id, sh,
                       list_transform(range(0, 16),
                           s -> list_min(list_transform(hb,
                                b -> ((2*s+3) * b + (7919*s+1)) % 2147483647))) AS sig
                FROM hb
            ), bands AS (
                SELECT doc_id,
                       b AS band_id,
                       md5(b || '|' || array_to_string(
                           list_transform(sig[4*b+1:4*b+4], v -> CAST(v AS VARCHAR)), '|'))
                           AS band_key
                FROM sigs, (SELECT unnest(range(0, 4)) AS b)
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band_id = b.band_id AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
            ), shs AS (
                SELECT doc_id, list_distinct(sh) AS shd FROM sh
            )
            SELECT id_a, id_b,
                   ROUND(len(list_intersect(sa.shd, sb.shd))
                         / greatest(len(sa.shd) + len(sb.shd)
                                    - len(list_intersect(sa.shd, sb.shd)), 1), 6) AS jaccard
            FROM cand
            JOIN shs sa ON cand.id_a = sa.doc_id
            JOIN shs sb ON cand.id_b = sb.doc_id
            WHERE len(list_intersect(sa.shd, sb.shd))
                  / greatest(len(sa.shd) + len(sb.shd)
                             - len(list_intersect(sa.shd, sb.shd)), 1) >= 0.9
        """,
        "dd_embed_neardup": """
            WITH base AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), aug AS (
                SELECT vec_id, e FROM base
                UNION ALL
                SELECT vec_id + 10000000 AS vec_id,
                       [e[1] + 0.000001] || e[2:] AS e
                FROM base
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.95
        """,
        "a7_approx_distinct": """
            SELECT o_orderstatus,
                   COUNT(DISTINCT o_custkey) AS exact_customers,
                   TRUE AS within_tol
            FROM orders GROUP BY o_orderstatus
        """,
        "dd_simhash_fast": """
            SELECT doc_id, TRUE AS fp_consistent, TRUE AS fp_diverse
            FROM documents
        """,
        "ann_rhp_topk": """
            -- ground truth: the planted rows (cosine >= 0.9971 to the
            -- query vs organic max 0.899) ARE the top-10 in rank order
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   -CAST(r + 1 AS BIGINT) AS vec_id
            FROM range(10) t(r)
        """,
        "ann_pq_topk": """
            -- ground truth: planted l2sq <= 0.01 vs organic min 0.25;
            -- exact re-rank of the ADC shortlist must emit -1..-10
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   -CAST(r + 1 AS BIGINT) AS vec_id
            FROM range(10) t(r)
        """,
        "ann_ivfpq_topk": """
            -- ground truth: planted rows assign to the query's coarse
            -- centroid, survive ADC by a 25x margin, re-rank exactly
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   -CAST(r + 1 AS BIGINT) AS vec_id
            FROM range(10) t(r)
        """,
        "ann_ivfpq_persisted": """
            -- ground truth: the ten planted vectors at l2sq distance
            -- (0.01*(i+1))^2 from the query ARE the true top-10 in rank
            -- order (organic minimum 0.25, a 25x margin) — the engine's
            -- approximate search must return exactly them, exactly there
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   -CAST(r + 1 AS BIGINT) AS vec_id
            FROM range(10) t(r)
        """,
        "dd_phash_neardup": """
            -- ground truth: exactly the planted (copy, original) pairs —
            -- the engine must find all of them and nothing else
            SELECT -(doc_id + 1) AS copy_id, doc_id AS orig_id
            FROM documents WHERE doc_id < 25
        """,
        "dd_semantic_dedup": """
            -- ground truth: exactly the planted scaled copies are dropped
            -- (keep='max' retains the positive originals; organic max
            -- cosine is ~0.6, far under the 0.95 threshold)
            SELECT -(vec_id + 1) AS dropped_id
            FROM embeddings WHERE vec_id < 25
        """,
        "e17_semantic_dedup_inplace": """
            -- ground truth: the in-place SemDeDup cleanup drops exactly
            -- the planted x2-scaled copies (keeper = lowest $row_id =
            -- the imported original), leaving the pristine import
            SELECT vec_id, label FROM embeddings
        """,
        "e18_refresh_incremental": """
            -- ground truth after the churn fold: the five inserted rows
            -- at l2sq (0.001*j)^2 rank first, then the five surviving
            -- originals at (0.01*(i+1))^2, i=5..9 — deleted ids -1..-5
            -- must be gone, inserted ids -11..-15 must be found
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   CASE WHEN r < 5 THEN -(r + 11) ELSE -(r + 1) END AS vec_id
            FROM range(10) t(r)
        """,
        "tx_clf_quality": f"""
            -- dyadic weights: every product/partial sum is exact binary
            -- FP, so per-term counts here == the engine's broadcast-join
            -- occurrence sum bit-for-bit
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), d AS (
                SELECT doc_id,
                       -0.25::DOUBLE
                       + 0.75::DOUBLE  * len(list_filter(tk, x -> x = 'hash'))
                       + 0.5::DOUBLE   * len(list_filter(tk, x -> x = 'join'))
                       - 0.625::DOUBLE * len(list_filter(tk, x -> x = 'sort'))
                       - 1.25::DOUBLE  * len(list_filter(tk, x -> x = 'group'))
                       + 0.25::DOUBLE  * len(list_filter(tk, x -> x = 'fast'))
                       + 0.125::DOUBLE * len(list_filter(tk, x -> x = 'value'))
                       AS s
                FROM t
            )
            SELECT doc_id, ROUND(s, 6) AS clf_score,
                   ROUND(1.0 / (1.0 + exp(-s)), 6) AS clf_prob
            FROM d
        """,
        "tx_hybrid_topk": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), d AS (
                SELECT doc_id, len(tk) AS dl,
                       len(list_filter(tk, x -> x = 'hash'))   AS tf0,
                       len(list_filter(tk, x -> x = 'join'))   AS tf1,
                       len(list_filter(tk, x -> x = 'filter')) AS tf2
                FROM t
            ), s AS (
                SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
                       SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                       SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                       SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
                FROM d
            ), sl AS (
                SELECT doc_id,
                    0.0
                    + ln(1.0 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5))
                      * tf0 * (1.2 + 1.0)
                      / (tf0 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    + ln(1.0 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
                      * tf1 * (1.2 + 1.0)
                      / (tf1 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    + ln(1.0 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5))
                      * tf2 * (1.2 + 1.0)
                      / (tf2 + 1.2 * (0.25 + 0.75 * dl / s.avgdl))
                    AS bm25_raw
                FROM d CROSS JOIN s
                ORDER BY bm25_raw DESC, doc_id ASC
                LIMIT 100
            ), q AS (
                SELECT embedding AS qv FROM embeddings WHERE vec_id = 7
            )
            SELECT sl.doc_id, ROUND(sl.bm25_raw, 6) AS bm25,
                   ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                                q.qv::DOUBLE[]), 4) AS cosine
            FROM sl JOIN embeddings e ON e.vec_id = sl.doc_id CROSS JOIN q
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.qv::DOUBLE[]) DESC,
                     sl.doc_id ASC
            LIMIT 10
        """,
        "ann_ivf_knn_join": """
            -- ground truth: each left row's true top-5 is its four
            -- planted bit-identical duplicates plus itself (cosine
            -- exactly the self-pair value vs organic max ~0.49)
            SELECT e.vec_id AS id_a, -(4 * e.vec_id + t.j + 1) AS id_b
            FROM embeddings e, range(4) t(j)
            WHERE e.vec_id < 10
            UNION ALL
            SELECT vec_id AS id_a, vec_id AS id_b
            FROM embeddings
            WHERE vec_id < 10
        """,
        "mm_frame_sample": """
            SELECT doc_id AS media_id,
                   unnest(range(0, n_chars * 10, 1000)) AS frame_ts_ms
            FROM documents
            WHERE doc_id % 7 <> 0 AND n_chars * 10 > 0
        """,
        "dd_simhash_pairs": _simhash_pairs_oracle_sql(),
        "a10_approx_percentile": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
                   TRUE AS within_tol
            FROM lineitem GROUP BY l_returnflag
        """,
        "sessionize_batch": """
            WITH m AS (
                SELECT user_id, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                              OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM m
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "range_join_purchases": """
            WITH v AS (
                SELECT event_id AS view_id, user_id,
                       epoch_us(ts) AS start_ts
                FROM events WHERE event_type = 'view'
            ), p AS (
                SELECT user_id, epoch_us(ts) AS p_ts, value
                FROM events WHERE event_type = 'purchase'
            )
            SELECT view_id, COUNT(*) AS n_purchases,
                   ROUND(SUM(value), 2) AS sum_value
            FROM v JOIN p
              ON p.user_id = v.user_id
             AND p.p_ts >= v.start_ts
             AND p.p_ts <= v.start_ts + 3600000000
            GROUP BY view_id
        """,
        "ann_ivf_topk": """
            -- ground truth: planted rows sit AT the query, land in its
            -- nearest centroid (always probed), true top-10 = -1..-10
            SELECT CAST(r + 1 AS INTEGER) AS rank,
                   -CAST(r + 1 AS BIGINT) AS vec_id
            FROM range(10) t(r)
        """,
        "tx_token_stats": f"""
            SELECT doc_id,
                   len({tok}) AS n_tokens,
                   len(list_distinct({tok})) AS n_unique_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "tx_quality": f"""
            WITH t AS (
                SELECT doc_id, text, {tok} AS toks FROM documents
            )
            SELECT doc_id,
                   ROUND((
                       least(len(toks) / 64.0, 1.0)
                     + (1.0 - least(4.0 * length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                                    / greatest(length(text), 1), 1.0))
                     + least(5.0 * len(list_filter(toks,
                           x -> x IN ('the','and','of','to','in')))
                                    / greatest(len(toks), 1), 1.0)
                   ) / 3, 4) AS quality
            FROM t
        """,
        "tx_langid": f"""
            WITH t AS (
                SELECT doc_id, lang, {tok} AS toks FROM documents
            )
            SELECT doc_id, lang,
                   CASE WHEN en_hits = 0 AND de_hits = 0 THEN 'und'
                        WHEN de_hits > en_hits THEN 'de'
                        ELSE 'en' END AS lang_pred
            FROM (
                SELECT doc_id, lang,
                       len(list_filter(toks, x -> x IN ('the','and','of','to','in'))) AS en_hits,
                       len(list_filter(toks, x -> x IN ('der','die','und','ist','nicht'))) AS de_hits
                FROM t
            )
        """,
        "mm_blob_meta": """
            SELECT doc_id,
                   strlen(text) AS n_bytes,
                   CAST(64 + n_chars % 64 AS INT) AS fake_width,
                   CAST(64 + (n_chars * 7) % 64 AS INT) AS fake_height
            FROM documents
        """,
        "tpch_q2": """
            WITH pairs AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ), s_eur AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier, nation, region
                WHERE s_nationkey = n_nationkey
                  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
            ), j AS (
                SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
                FROM pairs
                JOIN part ON l_partkey = p_partkey
                JOIN s_eur ON l_suppkey = s_suppkey
                WHERE p_size = 15 AND p_type = 'STANDARD'
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
            FROM j
            WHERE s_acctbal = (SELECT MIN(j2.s_acctbal) FROM j j2
                               WHERE j2.p_partkey = j.p_partkey)
            ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
            LIMIT 100
        """,
        "tpch_q4": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
              )
            GROUP BY o_orderpriority
        """,
        "tpch_q8": """
            SELECT o_year,
                   ROUND(SUM(CASE WHEN supp_nation = 'NATION_5'
                                  THEN volume ELSE 0 END) / SUM(volume), 4)
                       AS mkt_share
            FROM (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n2.n_name AS supp_nation
                FROM part, lineitem, orders, customer, supplier,
                     nation n1, nation n2, region
                WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
                  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
                  AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
                  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
                  AND p_type = 'PROMO'
                  AND o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'
            ) all_nations
            GROUP BY o_year
        """,
        "tpch_q9": """
            SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
            FROM (
                SELECT n_name AS nation,
                       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                       l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity AS amount
                FROM part, supplier, lineitem, orders, nation
                WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
                  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                  AND p_name LIKE '%gear%'
            ) profit
            GROUP BY nation, o_year
        """,
        "tpch_q11": """
            WITH val AS (
                SELECT l_partkey,
                       SUM(l_extendedprice * l_quantity) AS value_raw
                FROM lineitem, supplier, nation
                WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                  AND n_name = 'NATION_3'
                GROUP BY l_partkey
            )
            SELECT l_partkey AS ps_partkey, ROUND(value_raw, 2) AS value
            FROM val
            WHERE value_raw > 0.0001 * (SELECT SUM(value_raw) FROM val)
        """,
        "tpch_q12": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem, orders
            WHERE l_orderkey = o_orderkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY
            GROUP BY l_linestatus
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
        """,
        "tpch_q19": """
            SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND l_quantity <= 30
              AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                    AND l_quantity BETWEEN 1 AND 11)
                OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                    AND l_quantity BETWEEN 10 AND 20)
                OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                    AND l_quantity BETWEEN 20 AND 30))
        """,
        "tpch_q20": """
            WITH per_supp AS (
                SELECT l_suppkey, SUM(l_quantity) AS red_qty
                FROM lineitem
                WHERE l_partkey IN (
                          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
                      )
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, ROUND(red_qty, 2) AS red_qty_r
            FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
            WHERE red_qty > 1.3 * (SELECT AVG(red_qty) FROM per_supp)
        """,
        "tpch_q21": """
            WITH lf AS (
                SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), late AS (
                SELECT l_orderkey, l_suppkey FROM lf
                WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
            )
            SELECT s_name, COUNT(*) AS numwait
            FROM late l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
              AND EXISTS (
                  SELECT 1 FROM lf l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                  SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
              )
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 20
        """,
        "tpch_q22": """
            SELECT c_nationkey AS cntrycode,
                   COUNT(*) AS numcust,
                   ROUND(SUM(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
              AND c_acctbal > (
                  SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
              )
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0
              )
            GROUP BY c_nationkey
        """,
        "ds_stratified_sample": """
            SELECT doc_id, lang, source
            FROM documents
            WHERE ((doc_id % 3037000493) * 2654435761) % 10000 <
                  CASE WHEN lang = 'en' THEN 3000 ELSE 6000 END
        """,
        "tx_tfidf_topterms": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), e AS (
                SELECT doc_id, unnest(tk) AS term FROM t
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM e GROUP BY 1, 2
            ), dfc AS (
                SELECT term, COUNT(*) AS dfr FROM tf GROUP BY 1
            ), n AS (
                SELECT COUNT(*) AS n FROM documents
            ), s AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * (ln((1.0 + n.n) / (1.0 + dfc.dfr)) + 1.0) AS w
                FROM tf JOIN dfc USING (term) CROSS JOIN n
            ), r AS (
                SELECT doc_id, term, w,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY w DESC, term) AS rk
                FROM s
            )
            SELECT doc_id, term, ROUND(w, 6) AS tfidf, rk
            FROM r WHERE rk <= 3 AND doc_id < 200
        """,
        "tx_length_percentiles": """
            WITH s AS (
                SELECT lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n_chars, doc_id) AS rk,
                       COUNT(*) OVER (PARTITION BY lang) AS n
                FROM documents
            )
            SELECT lang, MAX(n) AS n,
                   MAX(CASE WHEN rk = (n * 1 + 1) // 2
                            THEN n_chars END) AS p50,
                   MAX(CASE WHEN rk = (n * 9 + 9) // 10
                            THEN n_chars END) AS p90,
                   MAX(CASE WHEN rk = (n * 99 + 99) // 100
                            THEN n_chars END) AS p99
            FROM s GROUP BY lang
        """,
        "ds_domain_caps": """
            WITH r AS (
                SELECT source, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents
            )
            SELECT source, doc_id FROM r WHERE rk <= 10
        """,
        "tx_pmi_topk": f"""
            WITH t AS (
                SELECT {tok} AS tk FROM documents
            ), t2 AS (
                SELECT tk FROM t WHERE len(tk) >= 2
            ), pos AS (
                SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS p
                FROM t2
            ), bc AS (
                SELECT tk[p] AS v, tk[p+1] AS w, COUNT(*) AS c
                FROM pos GROUP BY 1, 2
            ), l AS (
                SELECT v, SUM(c) AS cl FROM bc GROUP BY 1
            ), r AS (
                SELECT w, SUM(c) AS cr FROM bc GROUP BY 1
            ), tt AS (
                SELECT SUM(c) AS t FROM bc
            )
            SELECT bc.v, bc.w, bc.c AS n,
                   ROUND(ln(bc.c * tt.t / (l.cl * r.cr)), 6) AS pmi
            FROM bc JOIN l USING (v) JOIN r USING (w) CROSS JOIN tt
            WHERE bc.c >= 5
            ORDER BY ln(bc.c * tt.t / (l.cl * r.cr)) DESC, bc.v, bc.w
            LIMIT 15
        """,
        "dd_tfidf_pairs": f"""
            WITH t AS (
                SELECT doc_id AS id, {tok} AS tk FROM documents
            ), e AS (
                SELECT id, unnest(tk) AS term FROM t
            ), tf AS (
                SELECT id, term, COUNT(*) AS tf FROM e GROUP BY 1, 2
            ), dfc AS (
                SELECT term, COUNT(*) AS dfr FROM tf GROUP BY 1
            ), n AS (
                SELECT COUNT(*) AS n FROM documents
            ), wt AS (
                SELECT tf.id, tf.term,
                       tf.tf * (ln((1.0 + n.n) / (1.0 + dfc.dfr)) + 1.0) AS w
                FROM tf JOIN dfc USING (term) CROSS JOIN n
                WHERE dfc.dfr <= 1200
            ), nr AS (
                SELECT id, sqrt(SUM(w * w)) AS nrm FROM wt GROUP BY 1
            ), u AS (
                SELECT wt.id, wt.term, wt.w / nr.nrm AS u
                FROM wt JOIN nr USING (id)
            ), p AS (
                SELECT l.id AS a, r.id AS b, SUM(l.u * r.u) AS cos
                FROM u l JOIN u r ON l.term = r.term AND l.id < r.id
                GROUP BY 1, 2
            )
            SELECT a, b, ROUND(cos, 4) AS cosine FROM p WHERE cos >= 0.8
        """,
        "a12_pivot": """
            SELECT source,
                   COUNT(*) FILTER (WHERE lang = 'de') AS n_de,
                   COUNT(*) FILTER (WHERE lang = 'en') AS n_en,
                   COUNT(*) FILTER (WHERE lang = 'es') AS n_es,
                   COUNT(*) FILTER (WHERE lang = 'fr') AS n_fr,
                   COUNT(*) FILTER (WHERE lang = 'zh') AS n_zh
            FROM documents GROUP BY source
        """,
        "tx_token_entropy": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), e AS (
                SELECT doc_id, unnest(tk) AS term FROM t
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS c FROM e GROUP BY 1, 2
            ), a AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                       SUM(c * ln(c)) AS s
                FROM tf GROUP BY 1
            )
            SELECT d.doc_id, COALESCE(a.n, 0) AS n_tokens,
                   ROUND(ln(a.n) - a.s / a.n, 6) AS entropy
            FROM documents d LEFT JOIN a USING (doc_id)
        """,
        "ds_source_overlap": f"""
            WITH t AS (
                SELECT source AS g, {tok} AS tk FROM documents
            ), ex AS (
                SELECT g, unnest(tk) AS term FROM t
            ), v AS (
                SELECT DISTINCT g, term FROM ex
            ), s AS (
                SELECT g, COUNT(*) AS n FROM v GROUP BY 1
            ), i AS (
                SELECT va.g AS a, vb.g AS b, COUNT(*) AS c
                FROM v va JOIN v vb ON va.term = vb.term AND va.g < vb.g
                GROUP BY 1, 2
            ), p AS (
                SELECT sa.g AS a, sb.g AS b, sa.n AS n_a, sb.n AS n_b
                FROM s sa JOIN s sb ON sa.g < sb.g
            )
            SELECT p.a, p.b, p.n_a, p.n_b,
                   COALESCE(i.c, 0) AS n_common,
                   CAST(COALESCE(i.c, 0) AS DOUBLE)
                       / (p.n_a + p.n_b - COALESCE(i.c, 0)) AS jaccard
            FROM p LEFT JOIN i ON p.a = i.a AND p.b = i.b
        """,
        "dd_keep_best": """
            WITH RECURSIVE aug AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
            ), p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM aug a JOIN aug b
                  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
            ), edges AS (
                SELECT id_a AS s, id_b AS d FROM p
                UNION
                SELECT id_b, id_a FROM p
            ), reach(node, lab) AS (
                SELECT s, s FROM edges
                UNION
                SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
            ), m AS (
                SELECT node AS doc_id, MIN(lab) AS cluster_id
                FROM reach GROUP BY node
            ), q AS (
                SELECT doc_id, doc_id * 37 % 101 AS quality FROM aug
            ), r AS (
                SELECT m.doc_id,
                       ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                                          ORDER BY q.quality DESC, m.doc_id)
                           AS rk
                FROM m JOIN q USING (doc_id)
            )
            SELECT q.doc_id, q.quality FROM q
            WHERE q.doc_id NOT IN (SELECT doc_id FROM r WHERE rk > 1)
        """,
        "dd_winnow": f"""
            WITH t AS (
                SELECT doc_id, {tok} AS tk FROM documents
            ), ne AS (
                SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0
            ), pos AS (
                SELECT doc_id, tk, n,
                       unnest(generate_series(0, greatest(n - 5, 0))) AS p
                FROM ne
            ), keyed AS (
                SELECT doc_id, p, greatest(n - 5, 0) AS npos,
                       md5(CASE WHEN n < 5 THEN array_to_string(tk, ' ')
                                ELSE array_to_string(tk[p+1:p+5], ' ')
                           END)
                       || '#'
                       || lpad(CAST(1000000000 - p AS VARCHAR), 10, '0')
                           AS key
                FROM pos
            ), sel AS (
                SELECT doc_id, p, npos,
                       MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                                      ROWS BETWEEN CURRENT ROW
                                      AND 3 FOLLOWING) AS mk
                FROM keyed
            )
            SELECT DISTINCT doc_id,
                   1000000000 - CAST(split_part(mk, '#', 2) AS BIGINT) AS pos,
                   split_part(mk, '#', 1) AS fp
            FROM sel WHERE p <= greatest(npos - 3, 0)
        """,
        "tx_zipf_slope": f"""
            WITH t AS (
                SELECT {tok} AS tk FROM documents
            ), e AS (
                SELECT unnest(tk) AS term FROM t
            ), c AS (
                SELECT term, COUNT(*) AS c FROM e
                GROUP BY 1 ORDER BY c DESC, term LIMIT 100
            ), r AS (
                SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term)
                               AS DOUBLE)) AS x,
                       ln(CAST(c AS DOUBLE)) AS y
                FROM c
            ), a AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(x) AS sx, SUM(y) AS sy,
                       SUM(x * y) AS sxy, SUM(x * x) AS sxx
                FROM r
            )
            SELECT n AS n_terms,
                   ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                       AS slope,
                   ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * sx) / n, 6) AS intercept
            FROM a
        """,
        "ds_borda_quality": f"""
            WITH t AS (
                SELECT doc_id, n_chars, len({tok}) AS n_tokens FROM documents
            ), r AS (
                SELECT doc_id, n_chars, n_tokens,
                       RANK() OVER (ORDER BY n_chars DESC) AS rank_n_chars,
                       RANK() OVER (ORDER BY n_tokens DESC) AS rank_n_tokens
                FROM t
            )
            SELECT doc_id, rank_n_chars, rank_n_tokens,
                   (rank_n_chars + rank_n_tokens) / 2.0 AS borda
            FROM r
            ORDER BY borda, doc_id LIMIT 100
        """,
        "e21_pipeline_recipe": f"""
            WITH t AS (
                SELECT doc_id, text, lang, n_chars, {tok} AS toks
                FROM documents
            ), m AS (
                SELECT doc_id, text, lang, n_chars, len(toks) AS n,
                       list_sum(list_transform(toks, x -> length(x)))
                           / greatest(len(toks), 1) AS mean_len,
                       len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                           / CAST(greatest(len(toks), 1) AS DOUBLE)
                           AS alpha_frac,
                       len(list_distinct(list_filter(toks, x ->
                           x IN ('spark','sort','group','value','fast'))))
                           AS n_stop
                FROM t
            ), q AS (
                SELECT doc_id, text, lang, n_chars FROM m
                WHERE n >= 30
                  AND mean_len >= 3.0 AND mean_len <= 10.0
                  AND alpha_frac >= 0.80 AND n_stop >= 2
            ), k AS (
                SELECT doc_id, lang, n_chars, md5(text) AS h FROM q
            ), wn AS (
                SELECT h, MIN(doc_id) AS doc_id FROM k GROUP BY h
            ), s AS (
                SELECT k.doc_id, k.lang, k.n_chars
                FROM k JOIN wn ON k.h = wn.h AND k.doc_id = wn.doc_id
            )
            SELECT CASE WHEN ((doc_id % 3037000493) * 2654435761) % 10000
                            < 1000
                        THEN 'test' ELSE 'train' END AS split,
                   lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY 1, 2
        """,
        "e22_matview_incremental": """
            WITH final AS (
                SELECT lang, source,
                       CASE WHEN doc_id % 5 = 0 THEN 1 ELSE n_chars END
                           AS n_chars
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT lang, source, n_chars FROM (VALUES
                    ('zz', 'mv_new', 10),
                    ('zz', 'mv_new', NULL)
                ) AS ins(lang, source, n_chars)
            )
            SELECT lang, source,
                   COUNT(*) AS n,
                   CAST(SUM(n_chars) AS BIGINT) AS chars,
                   ROUND(CAST(SUM(n_chars) AS DOUBLE)
                         / COUNT(n_chars), 4) AS avg_chars
            FROM final GROUP BY lang, source
        """,
        "w10_funnel": """
            WITH v AS (
                SELECT user_id, MIN(epoch_us(ts)) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
                GROUP BY e.user_id
            )
            SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
            FROM v LEFT JOIN c ON v.user_id = c.user_id
                   LEFT JOIN p ON v.user_id = p.user_id
        """,
        "w11_retention_cohorts": """
            WITH w AS (
                SELECT user_id,
                       ((epoch_us(ts) // 86400000000) + 3) // 7 AS wk
                FROM events
            ), f AS (
                SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY user_id
            ), a AS (
                SELECT DISTINCT user_id, wk FROM w
            )
            SELECT f.cohort_week,
                   a.wk - f.cohort_week AS week_offset,
                   COUNT(DISTINCT a.user_id) AS n_users
            FROM a JOIN f ON a.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "w9_hopping_window": """
            SELECT ((epoch_us(ts) // 900000000) - u.k) * 900000000
                       AS window_start_us,
                   event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) u
            GROUP BY 1, 2
        """,
        "a11_grouping_sets": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_linestatus), ())
        """,
        "e19_engine_domain_cap": """
            WITH r AS (
                SELECT source, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents
            )
            SELECT source, doc_id FROM r WHERE rk <= 10
        """,
        "ds_cluster_assign": """
            WITH c AS (
                SELECT vec_id AS centroid_id,
                       CAST(embedding AS DOUBLE[]) AS cvec
                FROM embeddings WHERE vec_id < 8
            ), d AS (
                SELECT e.vec_id, c.centroid_id,
                       list_distance(CAST(e.embedding AS DOUBLE[]),
                                     c.cvec) AS dist
                FROM embeddings e CROSS JOIN c
            ), r AS (
                SELECT vec_id, centroid_id, dist,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, centroid_id) AS rk
                FROM d
            )
            SELECT vec_id, centroid_id, ROUND(dist, 6) AS dist
            FROM r WHERE rk = 1
        """,
        "ds_train_test_split": """
            SELECT CASE WHEN ((doc_id % 3037000493) * 2654435761) % 10000 < 1000
                        THEN 'test' ELSE 'train' END AS split,
                   lang,
                   COUNT(*) AS n_docs,
                   ROUND(AVG(n_chars), 4) AS avg_chars
            FROM documents
            GROUP BY 1, 2
        """,
        "skew_salted_agg": """
            SELECT lang,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                   COUNT(*) AS n_rows
            FROM documents GROUP BY lang
        """,
        "skew_salted_join": """
            SELECT event_type,
                   CAST(LENGTH(event_type) AS BIGINT) AS type_len,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "ds_resample_mix": """
            WITH c AS (
                SELECT lang, COUNT(*) AS n,
                       CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)
                                 WHEN 'de' THEN CAST(0.2 AS DOUBLE)
                                 WHEN 'zh' THEN CAST(0.2 AS DOUBLE)
                                 WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
                       END AS w
                FROM documents GROUP BY lang
            ), cw AS (
                SELECT * FROM c WHERE w IS NOT NULL
            ), s AS (
                SELECT MIN(n / w) AS scale FROM cw
            ), th AS (
                SELECT lang, FLOOR(scale * w / n * 10000) AS thr
                FROM cw, s
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN th ON d.lang = th.lang
            WHERE ((d.doc_id % 3037000493) * 2654435761) % 10000 < th.thr
        """,
        "tx_pii_scrub": _pii_scrub_oracle_sql(),
        "dd_contamination": f"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id % 97 <> 0
                UNION ALL
                SELECT doc_id + 5000000 AS doc_id,
                       'copied fragment ' || text AS text
                FROM documents WHERE doc_id % 97 = 0
                UNION ALL
                SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
            ), toks AS (
                SELECT doc_id, {tok} AS tk FROM corpus
            ), g AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           CASE WHEN len(tk) < 8
                                THEN [array_to_string(tk, ' ')]
                                ELSE list_transform(
                                    range(1, len(tk) - 8 + 2),
                                    i -> array_to_string(
                                        list_slice(tk, i, i + 7), ' '))
                           END)) AS gram
                FROM toks
            ),
            t AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 97 <> 0),
            e AS (SELECT doc_id AS eval_id,  gram FROM g WHERE doc_id % 97 = 0)
            SELECT train_id, eval_id, COUNT(*) AS n_shared
            FROM t JOIN e USING (gram)
            GROUP BY train_id, eval_id
        """,
        "tx_pack_greedy": f"""
            WITH sized AS (
                SELECT doc_id, lang, len({tok}) AS n_tokens FROM documents
            ), packed AS (
                SELECT lang, n_tokens,
                       CAST(FLOOR((SUM(n_tokens) OVER (
                                PARTITION BY lang ORDER BY doc_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW
                            ) - n_tokens) / 512.0) AS BIGINT) AS pack_bin
                FROM sized
            )
            SELECT lang, pack_bin, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
            FROM packed GROUP BY lang, pack_bin
        """,
        "tx_bigram_topk": f"""
            WITH t AS (
                SELECT {tok} AS toks FROM documents
            ), bg AS (
                SELECT unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM t
            )
            SELECT bigram, COUNT(*) AS cnt
            FROM bg GROUP BY bigram
            ORDER BY cnt DESC, bigram ASC
            LIMIT 50
        """,
    }
    # the fast (xxhash64) LSH path is verified against the md5 twin's
    # ground truth: both emit the exact-Jaccard-verified pair set, which is
    # identical on this corpus (see q_dd_lsh_pairs_fast docstring).
    sqls["dd_lsh_pairs_fast"] = sqls["dd_lsh_pairs"]
    if _bpe_merges is None:
        # corpus unavailable at oracle-build time: degrade the one
        # corpus-trained oracle to rows-only rather than shipping a merge
        # table learned on the wrong (or no) data
        del sqls["tx_bpe_learned"]
    # r15 registry additions: their oracles live in r15_pending() (the
    # single source the pre-landing pytest gate consumed since r13)
    sqls.update({name: sql for name, (_fn, sql) in r15_pending().items()})
    return sqls

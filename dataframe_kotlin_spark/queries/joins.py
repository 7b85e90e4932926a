"""Join + set-operation queries (SURVEY §2.3, §2.4).

Scale notes: only FIXED-size dimension tables (region = 5 rows,
nation = 25 rows) carry explicit broadcast hints. SF-scaled sides
(customer/supplier/part — 150k/10k/200k rows PER scale factor) are left
unhinted: an explicit hint overrides Spark's size threshold and would
OOM executors at the 100 TB target, whereas AQE converts those joins to
broadcast at runtime whenever the post-filter side actually fits. Fact
tables shuffle only for fact-fact joins (orders ⋈ lineitem on
orderkey). Join key equality is plain `=` to match
SQL semantics; the engine's null-safe mode exists for reference parity
(api/join.kt:149-152) and is exercised in unit tests.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.queries import query


def _t(spark, sf_dir: str, name: str) -> KDataFrame:
    return KDataFrame(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: filtered customer ⋈ orders ⋈ lineitem, aggregate,
    top-10. Reference join machinery: api/join.kt:144-162.

    No forced broadcast: customer is SF-scaled (150k·SF rows), so a hint
    would bypass the size threshold and OOM executors at the 100 TB
    target. AQE converts the join to broadcast at runtime whenever the
    post-filter side is actually under the threshold (it is, at bench
    scale), so small-SF plans are unchanged."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    # orders ⋈ customer on o_custkey = c_custkey (explicit cross-named keys,
    # reference `left.match(right.col)` api/join.kt:13-25)
    oc = orders.df.join(
        cust.df.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "inner"
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    out = (
        li.df.join(oc.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"), "l_orderkey", "inner")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").alias("order_date"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return out


@query(
    "q5_local_supplier",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; fixed-size dims (nation 25 rows,
    region 5 rows) broadcast by hint, SF-scaled sides (customer,
    supplier) left to AQE — a forced hint on those would OOM at the
    100 TB target. Facts shuffle once on orderkey. Multi-frame join
    fold: api/join.kt:96-100."""
    cust = _t(spark, sf_dir, "customer").df
    orders = _t(spark, sf_dir, "orders").df.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").df
    supp = _t(spark, sf_dir, "supplier").df
    nation = _t(spark, sf_dir, "nation").df
    region = _t(spark, sf_dir, "region").df.filter(F.col("r_name") == "ASIA")

    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    return out


@query(
    "join_left_nulls",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_nulls(spark, sf_dir):
    """leftJoin with null-padded right side (api/join.kt:45-54,71-84):
    customers with zero orders still appear, count 0."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").rename({"o_custkey": "c_custkey"})
    return (
        cust.left_join(orders, on=["c_custkey"])
        .group_by("c_custkey", "c_mktsegment")
        .aggregate(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .df
    )


@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def semi_join_customers(spark, sf_dir):
    """filterJoin = left-semi (api/join.kt:86-89): right columns dropped."""
    cust = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .rename({"o_custkey": "c_custkey"})
    )
    return cust.filter_join(big, on=["c_custkey"]).select("c_custkey", "c_name").df


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def anti_join_customers(spark, sf_dir):
    """excludeJoin = left-anti (api/join.kt:91-94)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").rename({"o_custkey": "c_custkey"})
    return cust.exclude_join(orders, on=["c_custkey"]).select("c_custkey", "c_mktsegment").df


@query(
    "outer_join_nations",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           COALESCE(c.cnt, 0) AS n_customers,
           COALESCE(s.cnt, 0) AS n_suppliers
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
           ON n.n_nationkey = c.c_nationkey
    LEFT JOIN (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY s_nationkey) s
           ON n.n_nationkey = s.s_nationkey
    """,
)
def outer_join_nations(spark, sf_dir):
    """Aggregate-then-join (pre-aggregation shrinks the shuffle: the join
    inputs are group counts, not raw rows — the scalable formulation)."""
    nation = _t(spark, sf_dir, "nation")
    cust_cnt = (
        _t(spark, sf_dir, "customer")
        .group_by("c_nationkey")
        .count(name="cnt_c")
        .rename({"c_nationkey": "n_nationkey"})
    )
    supp_cnt = (
        _t(spark, sf_dir, "supplier")
        .group_by("s_nationkey")
        .count(name="cnt_s")
        .rename({"s_nationkey": "n_nationkey"})
    )
    return (
        nation.left_join(cust_cnt, on=["n_nationkey"])
        .left_join(supp_cnt, on=["n_nationkey"])
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("cnt_c"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("cnt_s"), F.lit(0)).alias("n_suppliers"),
        )
        .df
    )


@query(
    "union_widen",
    oracle="""
    SELECT k AS key, kind, ROUND(amount, 2) AS amount FROM (
      SELECT o_orderkey AS k, 'order' AS kind, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT l_orderkey AS k, 'line' AS kind, l_extendedprice AS amount FROM lineitem
    )
    """,
)
def union_widen(spark, sf_dir):
    """union by name (bag semantics, api/union.kt:12-87)."""
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit("order").alias("kind"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("key"),
            F.lit("line").alias("kind"),
            F.col("l_extendedprice").alias("amount"),
        )
    )
    return o.union(l).add("amount", F.round(F.col("amount"), 2)).df


@query(
    "union_missing_cols",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, NULL AS nationkey FROM customer
      UNION ALL
      SELECT s_suppkey AS id, s_name AS name, NULL AS acctbal, CAST(s_nationkey AS INT) AS nationkey FROM supplier
    )
    """,
)
def union_missing_cols(spark, sf_dir):
    """union with disjoint column sets -> null-filled (api/union.kt:24-36)
    + Long/Int key widening via the engine's common-type ladder."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"), F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).df


@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_keys(spark, sf_dir):
    """Set-intersect of rows (absent in reference — SURVEY §2.4 notes native
    Spark intersect exposed as an extension)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect_rows(b).df


@query(
    "except_keys",
    oracle="""
    SELECT DISTINCT c_custkey FROM customer
    EXCEPT
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    """,
)
def except_keys(spark, sf_dir):
    """Set-except of rows (extension; dedup via distinct to match EXCEPT)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey").distinct()
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")).distinct()
    return c.except_rows(o).df


@query(
    "join_part_supplier_stats",
    oracle="""
    SELECT p_brand, s_nationkey,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size >= 25
    GROUP BY p_brand, s_nationkey
    """,
)
def join_part_supplier_stats(spark, sf_dir):
    """Fact ⋈ two dims + grouped agg; the p_size filter prunes the dim
    side before the join (predicate pushdown through join). part and
    supplier are SF-scaled, so no forced broadcast — AQE picks broadcast
    when the filtered side fits the threshold."""
    li = _t(spark, sf_dir, "lineitem").df
    part = _t(spark, sf_dir, "part").df.filter(F.col("p_size") >= 25)
    supp = _t(spark, sf_dir, "supplier").df
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "distinct_suppliers_brand",
    oracle="""
    SELECT p_brand,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def distinct_suppliers_brand(spark, sf_dir):
    """count_distinct per group over a broadcast join (TPC-H Q16 shape
    without partsupp). Spark plans distinct-agg as a two-phase expand —
    partials still combine before the shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .group_by("p_brand")
        .aggregate(
            F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .df
    )


@query(
    "salted_join_agg",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_join_agg(spark, sf_dir):
    """The explicit skew path (operators/skew.salted_join) must preserve
    plain equi-join semantics bit for bit: the big side is salted across
    8 buckets, the dim replicated once per salt, and the result
    aggregates to exactly what the oracle's unsalted JOIN produces.
    (AQE handles unknown skew at runtime; this is the fixed-plan variant
    for known-hot keys — SCALE.md joins rules.)"""
    from dataframe_kotlin_spark.operators.skew import salted_join

    c = _t(spark, sf_dir, "customer").df
    n = _t(spark, sf_dir, "nation").df.select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    j = salted_join(c, n, on=["c_nationkey"], buckets=8)
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
    )


@query(
    "bloom_prefilter_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem JOIN (SELECT o_orderkey, o_orderpriority
                        FROM orders WHERE o_totalprice > 400000) big_orders
      ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bloom_prefilter_join(spark, sf_dir):
    """Bloom semi-join reduction in the correctness gate: lineitem is
    prefiltered map-side by a bitmap of the selective orders subset's
    keys (skew.bloom_prefilter), then joined exactly — the result must
    hash-match the oracle's plain JOIN because the filter only ever
    passes a superset of matching rows."""
    from dataframe_kotlin_spark.operators.skew import bloom_prefilter

    li = _t(spark, sf_dir, "lineitem").df.select("l_orderkey", "l_quantity")
    big_orders = (
        _t(spark, sf_dir, "orders")
        .df.filter(F.col("o_totalprice") > 400_000)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    filtered = bloom_prefilter(li, big_orders.select("l_orderkey"), "l_orderkey")
    return (
        filtered.join(big_orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )

"""TPC-H-shaped composite queries (adapted to the driver's star schema:
no partsupp/commitdate/shipmode columns), built on the KDataFrame API.

These exercise operator COMPOSITION — semi-joins with non-equi
conditions, having-style agg-then-join, OR-of-ANDs pushdown, conditional
aggregation — the way a reference user would chain the §2 operators.

Money sums follow the q1 decimal policy (queries/__init__.py): DECIMAL in
the aggregate so Spark and duckdb agree bit-for-bit, cast to double at
the end, ROUND(+1e-9) on averages/ratios.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.queries import query


def _t(spark, sf_dir: str, name: str) -> KDataFrame:
    return KDataFrame(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def _dec(c):
    return F.col(c).cast("decimal(12,2)")


@query(
    "q6_revenue_band",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_band(spark, sf_dir):
    """TPC-H Q6 shape: all predicates push to the scan, agg is a single
    partial+final pass with no grouping — the cheapest possible plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .df.agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS = left-semi join with a non-equi residual
    condition (filter_join). The semi join shuffles on l_orderkey and
    never widens the row — no dedup needed afterwards."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.filter_join(
            li,
            on=[
                F.col("o_orderkey") == F.col("l_orderkey"),
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
            ],
        )
        .group_by("o_orderpriority")
        .count(name="n_orders")
        .df
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    lineitem streams past broadcast orders-subset/customer/nation;
    TakeOrderedAndProject caps the output."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        c.inner_join(o, on=[F.col("c_custkey") == F.col("o_custkey")])
        .inner_join(li, on=[F.col("o_orderkey") == F.col("l_orderkey")])
        .inner_join(
            _t(spark, sf_dir, "nation"), on=[F.col("c_nationkey") == F.col("n_nationkey")]
        )
        .group_by("c_custkey", "c_name", "n_name")
        .aggregate(F.sum(revenue).cast("double").alias("revenue"))
        .take_ordered(20, [F.col("revenue").desc(), F.col("c_custkey")])
        .df
    )


@query(
    "q14_type_share",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l_discount AS DECIMAL(12,2)))
                 ELSE 0 END) AS DOUBLE) /
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) + 1e-9,
               4) AS economy_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def q14_type_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a broadcast join
    (part is the dim). One shuffle-free join + one scalar agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    econ = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .df.agg(
            F.round(
                F.lit(100.0) * F.sum(econ).cast("double") / F.sum(rev).cast("double") + 1e-9,
                4,
            ).alias("economy_share")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: having-filtered aggregate drives a semi join back
    onto the fact tables. The qty pre-aggregate and the final aggregate
    share the l_orderkey partitioning (one logical shuffle key)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.group_by("l_orderkey")
        .aggregate(F.sum(_dec("l_quantity")).alias("__qty__"))
        .filter(F.col("__qty__") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.filter_join(big, on=[F.col("o_orderkey") == F.col("l_orderkey")])
        .inner_join(c, on=[F.col("o_custkey") == F.col("c_custkey")])
        .inner_join(li, on=[F.col("o_orderkey") == F.col("l_orderkey")])
        .group_by("c_custkey", "o_orderkey", "o_orderdate")
        .aggregate(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .df
    )


@query(
    "q19_brand_bands",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_brand_bands(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    derives the single-side implications (brand/size to the part scan,
    quantity bounds to the lineitem scan) so both scans still prune."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .filter(band)
        .df.agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume by year. The same dim table
    (nation) joins twice under different roles — exercises the join
    collision renaming; the pair filter applies post-join on the
    broadcast side, so the fact scan is shared."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .inner_join(c, on=[F.col("o_custkey") == F.col("c_custkey")])
        .inner_join(sn, on=[F.col("s_nationkey") == F.col("sn_key")], broadcast_right=True)
        .inner_join(cn, on=[F.col("c_nationkey") == F.col("cn_key")], broadcast_right=True)
        .filter(pair)
        .group_by("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .aggregate(F.sum(rev).cast("double").alias("revenue"))
        .df
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
           ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END) AS DOUBLE) /
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) + 1e-9,
                 4) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY order_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue
    by year — conditional numerator over the same aggregate scan, nation
    joined twice (customer role filters, supplier role classifies)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.inner_join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .inner_join(c, on=[F.col("o_custkey") == F.col("c_custkey")])
        .inner_join(cn, on=[F.col("c_nationkey") == F.col("cn_key")], broadcast_right=True)
        .inner_join(r, on=[F.col("cn_region") == F.col("r_regionkey")], broadcast_right=True)
        .inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(sn, on=[F.col("s_nationkey") == F.col("sn_key")], broadcast_right=True)
        .group_by(F.year("o_orderdate").alias("order_year"))
        .aggregate(
            F.round(
                F.sum(nat_rev).cast("double") / F.sum(rev).cast("double") + 1e-9, 4
            ).alias("mkt_share")
        )
        .df
    )


@query(
    "q12_late_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12_late_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipmode -> returnflag, commit/receipt lag ->
    ship lag): two conditional counts over one joined pass. The priority
    CASE stays inside the partial agg, so the shuffle carries 2 longs per
    group, not rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.inner_join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .group_by("l_returnflag")
        .aggregate(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .df
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) per_cust
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customers-per-order-count histogram. The LEFT
    join keeps order-less customers (c_count = 0); COUNT(col) skips the
    null probe rows. Two shuffles (custkey, then tiny c_count)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.left_join(o, on=[F.col("c_custkey") == F.col("o_custkey")])
        .group_by("c_custkey")
        .aggregate(F.count("o_orderkey").alias("c_count"))
        .group_by("c_count")
        .count(name="custdist")
        .df
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: argmax over an aggregate (top revenue supplier,
    ties kept). The scalar MAX is a 1-row broadcast joined back onto the
    aggregate — no window over a single partition, no collect. Revenue
    stays DECIMAL until output so the equality is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.group_by("l_suppkey").aggregate(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("total_rev")
    )
    mx = KDataFrame(rev.df.agg(F.max("total_rev").alias("__mx__")))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.inner_join(mx, on=[F.col("total_rev") == F.col("__mx__")], broadcast_right=True)
        .inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .df
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 + 1e-9,
                 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS a_partkey, 0.2 * AVG(l_quantity) AS qty_thr
          FROM lineitem GROUP BY l_partkey) a
      ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_thr
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: rows below 20% of their part's average quantity —
    the correlated AVG subquery decorrelated into a groupBy + equi-join.
    The per-part aggregate has one row per partkey, which is SF-scaled
    (200k·SF) — no forced broadcast; AQE converts when it fits."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    thr = li.group_by(F.col("l_partkey").alias("a_partkey")).aggregate(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .inner_join(thr, on=[F.col("l_partkey") == F.col("a_partkey")])
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .df.agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0) + 1e-9, 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (lateness = shipped >90d after order): the sole
    late supplier on a multi-supplier order. The EXISTS / NOT EXISTS
    pair is decorrelated into per-order window sets (distinct
    suppliers / distinct late suppliers over the orderkey partition)
    instead of two lineitem self-joins — ONE shuffle on orderkey
    replaces Q21's classic triple scan, and the filter (n_supp > 1,
    n_late = 1, row is late) is algebraically the original
    correlation. A key's rows all sit in one window frame; orders have
    few lines each, so the collect_set state is bounded."""
    from pyspark.sql import Window

    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    w = Window.partitionBy("l_orderkey")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.inner_join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .add("__n_supp__", F.size(F.collect_set("l_suppkey").over(w)))
        .add("__n_late__", F.size(F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)))
        .filter(late & (F.col("__n_supp__") > 1) & (F.col("__n_late__") == 1))
        .inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .group_by("s_name")
        .count(name="numwait")
        .take_ordered(25, [F.col("numwait").desc(), F.col("s_name")])
        .df
    )


@query(
    "q22_idle_balance",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22_idle_balance(spark, sf_dir):
    """TPC-H Q22 shape (phone-prefix -> mktsegment, never-ordered ->
    no-urgent-order): above-average balances among customers with no
    urgent orders. The scalar AVG is a 1-row cross-join broadcast; the
    NOT EXISTS is an anti join on a pre-filtered, projected orders side.
    The threshold divides an exact DECIMAL sum so both engines compare
    the same double."""
    cust = _t(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0.0).df.agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__thr__")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        KDataFrame(cust.df.crossJoin(F.broadcast(thr)))
        .filter(F.col("c_acctbal") > F.col("__thr__"))
        .exclude_join(urgent, on=[F.col("c_custkey") == F.col("o_custkey")])
        .group_by("c_mktsegment")
        .aggregate(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .df
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH pc AS (SELECT l_partkey, l_suppkey,
                       MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
                FROM lineitem GROUP BY l_partkey, l_suppkey),
    pm AS (SELECT l_partkey AS m_partkey, MIN(cost) AS min_cost
           FROM pc GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(cost AS DOUBLE) AS supply_cost
    FROM pc
    JOIN pm ON l_partkey = m_partkey AND cost = min_cost
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE p_size < 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (supply cost = cheapest observed shipment price,
    since the star schema has no partsupp): for each European STANDARD
    small part, the supplier(s) matching the per-part minimum cost.

    The correlated `cost = (SELECT MIN ...)` is decorrelated into two
    stacked aggregates: the pair-level agg shuffles lineitem ONCE on
    (partkey, suppkey); the per-part MIN is a re-agg of that already
    tiny result, reused — not a second lineitem scan. The min is kept
    DECIMAL so the re-join equality is exact on both engines, and all
    dimension joins broadcast. reference: api/join.kt:66-69 composed
    with api/groupBy.kt:19-56 (nested aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    pc = li.group_by("l_partkey", "l_suppkey").aggregate(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    pm = pc.group_by(F.col("l_partkey").alias("m_partkey")).aggregate(
        F.min("cost").alias("min_cost")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") < 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        pc.inner_join(
            pm,
            on=[F.col("l_partkey") == F.col("m_partkey"), F.col("cost") == F.col("min_cost")],
        )
        .inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(n, on=[F.col("s_nationkey") == F.col("n_nationkey")], broadcast_right=True)
        .inner_join(r, on=[F.col("n_regionkey") == F.col("r_regionkey")], broadcast_right=True)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .take_ordered(100, [F.col("s_acctbal").desc(), F.col("s_name"), F.col("p_partkey")])
        .df
    )


@query(
    "q9_profit_nation_year",
    oracle="""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2))) -
                    CAST(p_retailprice AS DECIMAL(12,2)) *
                    CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(3,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def q9_profit_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (supply cost proxied as 60% of p_retailprice —
    no partsupp): profit on 'bolt' parts by supplier nation and order
    year. The 5-table join keeps lineitem as the probe side throughout:
    part (name-filtered), supplier, and nation all broadcast; only the
    orders join shuffles on orderkey, and the final agg is tiny
    (nation x year). Profit arithmetic stays DECIMAL end-to-end so the
    engines sum identical exact values in any order."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit(0.6).cast("decimal(3,2)")
    return (
        li.inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(n, on=[F.col("s_nationkey") == F.col("n_nationkey")], broadcast_right=True)
        .inner_join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .group_by(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .aggregate(F.sum(profit).cast("double").alias("sum_profit"))
        .df
    )


@query(
    "q11_important_value",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l_discount AS DECIMAL(12,2)))) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM val)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_value(spark, sf_dir):
    """TPC-H Q11 shape (stock value = discounted revenue shipped by
    Asian suppliers): parts worth more than 0.1% of the total. The
    HAVING-against-global-total is a 1-row broadcast cross join onto
    the per-part aggregate — the lineitem scan and its shuffle on
    partkey happen ONCE, with the scalar total re-aggregated from the
    per-part result. Both sides of the > compare doubles derived from
    the same exact DECIMAL sums, so the cut is identical on both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        li.inner_join(s, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(n, on=[F.col("s_nationkey") == F.col("n_nationkey")], broadcast_right=True)
        .inner_join(r, on=[F.col("n_regionkey") == F.col("r_regionkey")], broadcast_right=True)
        .group_by("l_partkey")
        .aggregate(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("value")
        )
    )
    total = val.df.agg((F.sum("value").cast("double") * F.lit(0.001)).alias("__thr__"))
    return (
        KDataFrame(val.df.crossJoin(F.broadcast(total)))
        .filter(F.col("value").cast("double") > F.col("__thr__"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
        .sort_by(F.col("part_value").desc(), F.col("p_partkey"))
        .df
    )


@query(
    "q16_supplier_relation",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#17'
      AND p_type <> 'MEDIUM'
      AND p_size IN (2, 5, 11, 28, 29, 37, 42, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_relation(spark, sf_dir):
    """TPC-H Q16 shape (part-supplier pairs derived from shipments;
    negative account balance stands in for the complaints filter):
    supplier counts per (brand, type, size) bucket, excluding
    blacklisted suppliers. The DISTINCT pair projection is the shuffle
    on (partkey, suppkey); the NOT IN becomes an anti join against the
    tiny filtered supplier list (broadcastable — keys are never null,
    so anti join = NOT IN here); part filters broadcast. The
    count_distinct then reshuffles only the deduped pairs."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#17")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(2, 5, 11, 28, 29, 37, 42, 50)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.exclude_join(bad, on=[F.col("l_suppkey") == F.col("s_suppkey")])
        .inner_join(p, on=[F.col("l_partkey") == F.col("p_partkey")])
        .group_by("p_brand", "p_type", "p_size")
        .aggregate(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .sort_by(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"), F.col("p_size")
        )
        .df
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped
                        JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'red%' AND qty > 30)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON r_regionkey = n_regionkey
                          WHERE r_name = 'ASIA')
    ORDER BY s_name
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (availqty threshold becomes 'shipped more than
    30 units of a red part in 1996'): Asian suppliers with heavy
    shipments of promoted parts. Both IN subqueries become left-semi
    joins — the per-(supplier, part) agg shuffles the date-filtered
    lineitem once, the part name filter broadcasts into it, and the
    nation-region semi join is a two-row broadcast. Quantity sums in
    DECIMAL so the > 30 cut is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    shipped = li.group_by("l_suppkey", "l_partkey").aggregate(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    heavy = (
        shipped.filter(F.col("qty") > 30)
        .inner_join(red, on=[F.col("l_partkey") == F.col("p_partkey")])
        .select("l_suppkey")
    )
    asian = (
        _t(spark, sf_dir, "nation")
        .inner_join(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            on=[F.col("n_regionkey") == F.col("r_regionkey")],
            broadcast_right=True,
        )
        .select("n_nationkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .filter_join(heavy, on=[F.col("s_suppkey") == F.col("l_suppkey")])
        .filter_join(asian, on=[F.col("s_nationkey") == F.col("n_nationkey")])
        .select("s_name", "s_acctbal")
        .sort_by("s_name")
        .df
    )

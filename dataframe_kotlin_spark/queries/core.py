"""Core scan/filter/project/aggregate queries (SURVEY §2.2, §2.5, §2.8).

All plans are built through the KDataFrame engine API. At scale these are
single-shuffle aggregations: filter + projection push into the parquet
scan, partial aggregation runs before the exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataframe_kotlin_spark.core.frame import KDataFrame
from dataframe_kotlin_spark.queries import query


def _t(spark, sf_dir: str, name: str) -> KDataFrame:
    return KDataFrame(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shape pricing summary (SURVEY §7 P1).
# scan -> pushed filter -> project -> partial agg -> single shuffle -> sort
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2))) *
                    (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE)      AS sum_charge,
           ROUND(AVG(l_quantity) + 1e-9, 4)                             AS avg_qty,
           ROUND(AVG(l_extendedprice) + 1e-9, 4)                        AS avg_price,
           ROUND(AVG(l_discount) + 1e-9, 4)                             AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """filter -> groupBy -> multi-agg. Reference hot path: api/filter.kt:8-12,
    api/groupBy.kt:19-56, api/aggregate.kt:14-43.

    Money sums run in DECIMAL so Spark and the oracle agree bit-for-bit
    (fp summation order differs between engines); final cast back to
    double for a canonical comparable type. The +1e-9 before ROUND nudges
    values off exact .xxxx5 boundaries, where Spark (rounds the shortest
    decimal repr) and DuckDB (rounds the binary value) disagree."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(12,2)")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .group_by("l_returnflag", "l_linestatus")
        .aggregate(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .df
    )


@query(
    "select_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           l_quantity
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def select_project(spark, sf_dir):
    """Projection + computed column + pushed filter (api/select.kt, api/add.kt).
    The scan must read only 5 of 11 lineitem columns (column pruning)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 45)
        .add("net_price", F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .select("l_orderkey", "l_linenumber", "net_price", "l_quantity")
        .df
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
      AND l_returnflag <> 'A'
      AND (l_linestatus = 'F' OR l_tax < 0.03)
    """,
)
def filter_predicates(spark, sf_dir):
    """Compound predicates + between (api/filter.kt, api/between.kt,
    Math.kt:10-12). All of it pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") != "A")
            & ((F.col("l_linestatus") == "F") | (F.col("l_tax") < 0.03))
        )
        .select("l_orderkey", "l_partkey", "l_quantity", "l_discount")
        .df
    )


@query(
    "drop_rows_inverse",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
)
def drop_rows_inverse(spark, sf_dir):
    """drop{pred} = keep rows NOT matching (api/drop.kt:5)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.drop_rows((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .df
    )


@query(
    "distinct_pair",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pair(spark, sf_dir):
    """Project-then-dedup (api/distinct.kt:7-15)."""
    return _t(spark, sf_dir, "lineitem").distinct(["l_returnflag", "l_linestatus"]).df


@query(
    "distinct_by_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def distinct_by_first(spark, sf_dir):
    """distinctBy keep-first under explicit order (api/distinctBy.kt:14-18;
    order must be explicit on an unordered engine — SURVEY §4.2-2)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .distinct_by(["o_custkey"], order_by=["o_orderdate", "o_orderkey"])
        .df
    )


@query(
    "move_restructure",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_name AS profile_c_name,
           c_acctbal AS balance
    FROM customer
    """,
)
def move_restructure(spark, sf_dir):
    """Full move surface in one pipeline (api/move.kt:13-139): nest two
    columns under a new group, pull one back to top with a rename,
    reposition another — then flatten for value-level comparison. All
    pure projection (zero exchanges, asserted in tests/test_move.py)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    return (
        c.move("c_name", "c_acctbal").under("profile")
        .move("profile.c_acctbal").to_top(lambda p: "balance")
        .move("c_mktsegment").to(1)
        .flatten()
        .df
    )


@query(
    "distinct_by_expr",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey % 97
                                    ORDER BY o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def distinct_by_expr(spark, sf_dir):
    """distinctByExpr: dedup by a COMPUTED key expression, keep-first
    under explicit order (api/distinctBy.kt:20-26). The key expression
    partitions the window directly — no pre-aliased column needed."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .distinct_by([F.col("o_custkey") % 97], order_by=["o_orderkey"])
        .df
    )


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_k_orders(spark, sf_dir):
    """sortBy + take -> TakeOrderedAndProject, no global sort materialized
    (SURVEY §2.7 top-k)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .take_ordered(10, [F.col("o_totalprice").desc(), F.col("o_orderkey")])
        .df
    )


@query(
    "agg_minmax_count",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_minmax_count(spark, sf_dir):
    """min/max/count per group (GroupByAggregations.kt:39-79). min/max are
    exact over doubles/timestamps -> no rounding needed."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.group_by("o_orderstatus")
        .aggregate(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .df
    )


@query(
    "count_conditional",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN l_discount > CAST(0.05 AS DOUBLE) THEN 1 END) AS n_discounted,
           COUNT(CASE WHEN l_quantity >= CAST(25 AS DOUBLE) THEN 1 END) AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_conditional(spark, sf_dir):
    """count(predicate) with default 0 (GroupByAggregations.kt:30-31).

    Both sides use plain COUNT over a conditional expression: COUNT always
    returns BIGINT in DuckDB (SUM would return HUGEINT/DECIMAL, which
    round-trips through pandas differently across versions), and the
    literals are cast to DOUBLE explicitly so neither engine compares the
    DOUBLE column against a DECIMAL literal."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_returnflag")
        .aggregate(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            F.count(F.when(F.col("l_quantity") >= 25.0, 1)).alias("n_bulk"),
        )
        .df
    )


@query(
    "argmax_row",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem)
    WHERE rn = 1
    """,
)
def argmax_row(spark, sf_dir):
    """maxBy: whole argmax row per group (GroupByAggregations.kt:53-77).
    Implemented as max_by(struct(*), key) — a single partial-aggregatable
    pass, cheaper at scale than the oracle's window formulation."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.struct(
        F.col("l_extendedprice").alias("p"),
        (-F.col("l_orderkey")).alias("k"),
        (-F.col("l_linenumber")).alias("l"),
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .group_by("l_returnflag")
        .aggregate(
            F.max_by(
                F.struct("l_orderkey", "l_linenumber", "l_extendedprice"), key
            ).alias("r")
        )
        .df.select("l_returnflag", "r.l_orderkey", "r.l_linenumber", "r.l_extendedprice")
    )


@query(
    "median_quantity",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           ROUND(MEDIAN(l_extendedprice), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_quantity(spark, sf_dir):
    """Exact median, even count -> mean of middles (api/median.kt:20-30)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_returnflag")
        .aggregate(
            F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("med_qty"),
            F.round(F.percentile(F.col("l_extendedprice"), F.lit(0.5)), 4).alias("med_price"),
        )
        .df
    )


@query(
    "stddev_variance",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
           ROUND(VAR_SAMP(l_quantity), 4)         AS var_qty,
           ROUND(STDDEV_POP(l_discount), 6)       AS sdp_disc
    FROM lineitem GROUP BY l_linestatus
    """,
)
def stddev_variance(spark, sf_dir):
    """std (standard stddev_samp; the reference's unnormalized sqrt-SS is a
    documented bug we do NOT reproduce — SURVEY §2.5 flag, api/std.kt:58-99)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_linestatus")
        .aggregate(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        )
        .df
    )


@query(
    "corr_pair",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def corr_pair(spark, sf_dir):
    """Pearson correlation (api/corr.kt:6-30)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_returnflag")
        .aggregate(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"))
        .df
    )


@query(
    "stats_summary",
    oracle="""
    SELECT COUNT(*) AS n,
           COUNT(c_acctbal) AS nn_acctbal,
           COUNT(DISTINCT c_nationkey) AS nd_nation,
           COUNT(DISTINCT c_mktsegment) AS nd_segment,
           ROUND(AVG(c_acctbal), 4) AS mean_acctbal,
           MIN(c_acctbal) AS min_acctbal,
           MAX(c_acctbal) AS max_acctbal
    FROM customer
    """,
)
def stats_summary(spark, sf_dir):
    """describe()-style one-pass whole-frame profile (api/describe.kt:13-64)."""
    c = _t(spark, sf_dir, "customer")
    return c.df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("c_acctbal").alias("nn_acctbal"),
        F.count_distinct(F.col("c_nationkey")).alias("nd_nation"),
        F.count_distinct(F.col("c_mktsegment")).alias("nd_segment"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


@query(
    "update_convert",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS status,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NONE') AS priority
    FROM orders
    """,
)
def update_convert(spark, sf_dir):
    """update().where().with() + convert cast matrix + fillNulls
    (api/update.kt:13-123, api/convert.kt:32-203, api/fillNulls.kt:8-12)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.add("status", F.col("o_orderstatus"))
        .update("status", where=F.col("status") == "P", with_expr=F.lit("PENDING"))
        .add("price_int", F.col("o_totalprice").cast("bigint"))
        .add("order_date", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .add("priority", F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")))
        .fill_nulls("priority", F.lit("NONE"))
        .select("o_orderkey", "status", "price_int", "order_date", "priority")
        .df
    )


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)  AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    """,
)
def string_funcs(spark, sf_dir):
    """String helpers len/lowercase/uppercase + concat (Columns.kt:219-221,
    api/arithmetics.kt string concat)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.add("name_upper", F.upper("c_name"))
        .add("seg_lower", F.lower("c_mktsegment"))
        .add("name_len", F.length("c_name").cast("bigint"))
        .add("name_prefix", F.substring("c_name", 1, 8))
        .add("seg_nation", F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")))
        .select("c_custkey", "name_upper", "seg_lower", "name_len", "name_prefix", "seg_nation")
        .df
    )


@query(
    "digitize_bins",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 25000 THEN 0
                WHEN o_totalprice < 50000 THEN 1
                WHEN o_totalprice < 100000 THEN 2
                WHEN o_totalprice < 200000 THEN 3
                ELSE 4 END AS price_bin
    FROM orders
    """,
)
def digitize_bins(spark, sf_dir):
    """digitize(bins) value->bin index (api/digitize.kt:17-28) as a chained
    when expression — stays in whole-stage codegen."""
    from dataframe_kotlin_spark.functions.math import digitize

    o = _t(spark, sf_dir, "orders")
    return (
        o.add("price_bin", digitize(F.col("o_totalprice"), [25000, 50000, 100000, 200000]))
        .select("o_orderkey", "price_bin")
        .df
    )


@query(
    "arithmetic_round",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 1.1, 3)  AS up10,
           ROUND(l_extendedprice / 2.0, 3)  AS half,
           ROUND(l_extendedprice - l_quantity * 100.0, 2) AS spread,
           ROUND(l_extendedprice + l_tax * l_extendedprice, 4) AS taxed
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def arithmetic_round(spark, sf_dir):
    """Vectorized scalar arithmetic + round HALF_UP (api/arithmetics.kt:7-94,
    Math.kt:5-8; Spark F.round is HALF_UP, matching DuckDB half-away for
    positives). Rounding scale >= the conceptual decimal count of each
    expression (x*1.1 and x/2 have 3 decimals, x*(1+tax) has 4) so ROUND
    is an identity on the conceptual value — rounding shallower hits the
    shortest-repr-vs-binary boundary divergence between engines."""
    li = _t(spark, sf_dir, "lineitem")
    p, q, t = F.col("l_extendedprice"), F.col("l_quantity"), F.col("l_tax")
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .add("up10", F.round(p * 1.1, 3))
        .add("half", F.round(p / 2.0, 3))
        .add("spread", F.round(p - q * 100.0, 2))
        .add("taxed", F.round(p + t * p, 4))
        .select("l_orderkey", "l_linenumber", "up10", "half", "spread", "taxed")
        .df
    )


@query(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_was_zero,
           COALESCE(NULLIF(l_tax, 0.0), 0.0) AS tax_zeroed
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def null_handling(spark, sf_dir):
    """dropNulls/fillNulls/nullToZero machinery over synthesized nulls
    (api/dropNulls.kt, api/nullToZero.kt:11-29). The testdata has no real
    nulls, so nullif() synthesizes them."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .add("disc_null", F.nullif(F.col("l_discount"), F.lit(0.0)))
        .add("tax_null", F.nullif(F.col("l_tax"), F.lit(0.0)))
        .fill_nulls("disc_null", F.lit(-1.0))
        .add("tax_was_zero", F.when(F.col("tax_null").isNull(), 1).otherwise(0))
        .null_to_zero("tax_null")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("disc_null").alias("disc_or_flag"),
            "tax_was_zero",
            F.col("tax_null").alias("tax_zeroed"),
        )
        .df
    )


# --------------------------------------------------------------------------
# Grouping-set / introspection extensions (SURVEY §2.5 last row, §2.6
# transpose, §2.7 ranking) — ops the reference lacks but Spark gives free.
# --------------------------------------------------------------------------
@query(
    "rollup_region_nation",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           CASE WHEN r_name IS NULL THEN 'ALL' ELSE COALESCE(n_name, 'ALL') END AS nation_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark, sf_dir):
    """Hierarchical totals via rollup (KGroupedFrame.rollup): per-nation,
    per-region subtotal, grand total in ONE pass (Spark Expand node — no
    re-aggregation of the base table per level)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.inner_join(n, on=[F.col("c_nationkey") == F.col("n_nationkey")]).inner_join(
        r, on=[F.col("n_regionkey") == F.col("r_regionkey")]
    )
    out = joined.group_by("r_name", "n_name").rollup(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )
    return out.df.select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
        F.when(F.col("r_name").isNull(), "ALL")
        .otherwise(F.coalesce(F.col("n_name"), F.lit("ALL")))
        .alias("nation_name"),
        "n_customers",
        "sum_acctbal",
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark, sf_dir):
    """All grouping-set combinations via cube (KGroupedFrame.cube)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.group_by("l_returnflag", "l_linestatus").cube(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )
    return out.df.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
        "n_items",
        "sum_qty",
    )


@query(
    "ntile_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
)
def ntile_quartiles(spark, sf_dir):
    """ntile ranking (SURVEY §2.7 'absent in reference' row): quartile of
    account balance within market segment. Shuffles once on the partition
    key; unique c_custkey tiebreak keeps it deterministic."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.df.select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "count_by_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def count_by_priority(spark, sf_dir):
    """countBy: per-value frequency (docs/reference.md:505)."""
    return _t(spark, sf_dir, "orders").group_by("o_orderpriority").count(name="n").df


@query(
    "transpose_stats",
    oracle="""
    WITH s AS (
      SELECT ROUND(AVG(l_quantity), 4) AS mean_qty,
             ROUND(AVG(l_extendedprice), 4) AS mean_price,
             ROUND(AVG(l_discount), 4) AS mean_disc,
             CAST(COUNT(*) AS DOUBLE) AS n_rows
      FROM lineitem
    )
    SELECT 'mean_qty' AS stat, mean_qty AS value FROM s
    UNION ALL SELECT 'mean_price', mean_price FROM s
    UNION ALL SELECT 'mean_disc', mean_disc FROM s
    UNION ALL SELECT 'n_rows', n_rows FROM s
    """,
)
def transpose_stats(spark, sf_dir):
    """transpose() of an aggregate row -> (name, value) long form
    (api/transpose.kt:3) via stack — no driver-side collect."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.df.agg(
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.avg("l_discount"), 4).alias("mean_disc"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'mean_qty', mean_qty, 'mean_price', mean_price,"
            " 'mean_disc', mean_disc, 'n_rows', n_rows) AS (stat, value)"
        )
    )


@query(
    "describe_numeric",
    oracle="""
    WITH a AS (
      SELECT COUNT(*) AS n,
             COUNT(l_quantity) AS nn_q, COUNT(DISTINCT l_quantity) AS nd_q,
             CAST(MIN(l_quantity) AS DOUBLE) AS min_q, CAST(MAX(l_quantity) AS DOUBLE) AS max_q,
             ROUND(AVG(l_quantity), 4) AS mean_q,
             COUNT(l_discount) AS nn_d, COUNT(DISTINCT l_discount) AS nd_d,
             CAST(MIN(l_discount) AS DOUBLE) AS min_d, CAST(MAX(l_discount) AS DOUBLE) AS max_d,
             ROUND(AVG(l_discount), 4) AS mean_d
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_name, n, nn_q AS n_notnull, nd_q AS n_distinct,
           min_q AS min_val, max_q AS max_val, mean_q AS mean_val FROM a
    UNION ALL
    SELECT 'l_discount', n, nn_d, nd_d, min_d, max_d, mean_d FROM a
    """,
)
def describe_numeric(spark, sf_dir):
    """describe() long form for numeric columns (api/describe.kt:13-64):
    one aggregation pass, transposed with stack — stays distributed."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_quantity").alias("nn_q"),
        F.count_distinct("l_quantity").alias("nd_q"),
        F.min("l_quantity").cast("double").alias("min_q"),
        F.max("l_quantity").cast("double").alias("max_q"),
        F.round(F.avg("l_quantity"), 4).alias("mean_q"),
        F.count("l_discount").alias("nn_d"),
        F.count_distinct("l_discount").alias("nd_d"),
        F.min("l_discount").cast("double").alias("min_d"),
        F.max("l_discount").cast("double").alias("max_d"),
        F.round(F.avg("l_discount"), 4).alias("mean_d"),
    )
    return agg.select(
        F.expr(
            "stack(2,"
            " 'l_quantity', n, nn_q, nd_q, min_q, max_q, mean_q,"
            " 'l_discount', n, nn_d, nd_d, min_d, max_d, mean_d"
            ") AS (col_name, n, n_notnull, n_distinct, min_val, max_val, mean_val)"
        )
    )


@query(
    "quantiles_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5) + 1e-9, 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9) + 1e-9, 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99) + 1e-9, 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantiles_price(spark, sf_dir):
    """Exact interpolated quantiles per group (median generalization,
    api/median.kt:20-30): Spark `percentile` and duckdb `quantile_cont`
    share the linear-interpolation definition. At 100 TB switch to
    `percentile_approx` (t-digest, mergeable partial sketches)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.group_by("l_returnflag")
        .aggregate(
            F.round(F.expr("percentile(l_extendedprice, 0.5)") + 1e-9, 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)") + 1e-9, 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)") + 1e-9, 4).alias("p99"),
        )
        .df
    )


@query(
    "mode_per_segment",
    oracle="""
    SELECT c_mktsegment, n AS top_freq, nk AS top_value
    FROM (SELECT c_mktsegment, c_nationkey AS nk, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY COUNT(*) DESC, c_nationkey) AS rn
          FROM customer GROUP BY c_mktsegment, c_nationkey)
    WHERE rn = 1
    """,
)
def mode_per_segment(spark, sf_dir):
    """describe()'s top/freq (api/describe.kt:40-45): most frequent value
    per group with a DETERMINISTIC tie-break (smallest value wins) —
    engine `mode()` tie behavior differs across engines, so the portable
    formulation is count + argmax. Two aggregations, one shuffle each,
    both keyed on the group."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    counts = c.group_by("c_mktsegment", "c_nationkey").count(name="n")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("n").desc(), F.col("c_nationkey"))
    return (
        counts.df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("n").alias("top_freq"),
            F.col("c_nationkey").alias("top_value"),
        )
    )


@query(
    "merge_upsert_customers",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
    FROM (
      SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal
      FROM customer WHERE c_custkey % 100 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal
      FROM customer b
      WHERE NOT EXISTS (SELECT 1 FROM customer u
                        WHERE u.c_custkey % 100 = 0 AND u.c_custkey = b.c_custkey)
    )
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """MERGE INTO-style table upsert (KDataFrame.merge_upsert): update
    rows win wholesale, unmatched base rows survive, via anti-join +
    union — one shuffle on the key, no outer join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = c.filter(F.col("c_custkey") % 100 == 0).replace_col(
        "c_acctbal", F.col("c_acctbal") * 2
    )
    return (
        c.merge_upsert(updates, keys=["c_custkey"])
        .replace_col("c_acctbal", F.round(F.col("c_acctbal"), 2))
        .df
    )


@query(
    "decimal_exact_ledger",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,18)))
                AS VARCHAR)                                          AS sum_qty_exact,
           CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0)) *
                    CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                         AS DECIMAL(18,0)))
                AS VARCHAR)                                          AS qty_cents_exact
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def decimal_exact_ledger(spark, sf_dir):
    """BigDecimal convert parity (api/convert.kt:120-160 toBigDecimal,
    Parsers BigDecimal stage convert.kt:272): exact DECIMAL(38,18)
    aggregation over lineitem — sums and products carry every digit, then
    render to string so the cross-engine hash checks exactness rather
    than a rounded double. Map-side partial decimal sums before the one
    exchange; decimal math is JVM-side codegen, no UDFs."""
    li = _t(spark, sf_dir, "lineitem")
    qty18 = F.col("l_quantity").cast("bigint").cast("decimal(18,0)")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").cast("decimal(18,0)")
    return (
        li.df.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint").cast("decimal(38,18)"))
            .cast("string")
            .alias("sum_qty_exact"),
            F.sum(qty18 * cents).cast("string").alias("qty_cents_exact"),
        )
    )

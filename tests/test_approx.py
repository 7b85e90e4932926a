"""Approximate-cardinality operators: error bounds vs exact counts, and
sketch-merge consistency (the checks the DuckDB oracle can't do — see
queries/approx.py)."""

import os

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import sketches

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(os.path.join(SF, "lineitem.parquet"))


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet"))


def test_approx_distinct_error_bound(spark, lineitem):
    exact = {
        r["l_returnflag"]: r["nd"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("nd"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_nd"]
        for r in sketches.approx_distinct(
            lineitem, ["l_returnflag"], "l_partkey", rsd=0.02
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_hll_merge_matches_direct_sketch(spark, orders):
    """Merging per-priority sketches to the custkey universe must agree
    with sketching the universe directly (union promotes HLL_4 -> HLL_8,
    so the estimates may differ by a hair but not by data loss — this is
    what makes persisted rollups reusable)."""
    per_leaf = sketches.hll_sketch(orders, ["o_orderpriority"], "o_custkey")
    merged = sketches.hll_merge(
        per_leaf.withColumn("g", F.lit(1)), ["g"]
    ).collect()[0]["approx_nd"]
    direct = (
        sketches.hll_sketch(orders.withColumn("g", F.lit(1)), ["g"], "o_custkey")
        .select(F.hll_sketch_estimate("sketch").alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged - direct) / direct < 0.01
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_hll_estimate_error_bound(spark, orders):
    est = sketches.hll_merge(
        sketches.hll_sketch(orders, ["o_orderpriority"], "o_orderkey"),
        ["o_orderpriority"],
    ).collect()
    exact = {
        r["o_orderpriority"]: r["nd"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_orderkey").alias("nd"))
        .collect()
    }
    for r in est:
        e, x = r["approx_nd"], exact[r["o_orderpriority"]]
        assert abs(e - x) / x < 0.05, (r["o_orderpriority"], e, x)


def test_heavy_hitters_guarantees(spark):
    """Misra-Gries: every item above the n/capacity error bound is
    reported, and reported counts are lower bounds within the bound."""
    from dataframe_kotlin_spark.operators import sketches

    # zipf-ish: item i appears ~ N/i times
    rows = [(f"w{i}",) for i in range(1, 200) for _ in range(2000 // i)]
    df = spark.createDataFrame(rows, ["w"]).repartition(8)
    n = len(rows)
    cap = 50
    exact = {r["w"]: r["c"] for r in df.groupBy("w").agg(F.count("*").alias("c")).collect()}

    got = {r["item"]: r["count_lower"] for r in sketches.heavy_hitters(df, "w", capacity=cap).collect()}
    bound = n / cap
    for item, true_c in exact.items():
        if true_c > bound:
            assert item in got, f"{item} (count {true_c}) missing, bound {bound}"
    for item, lo in got.items():
        assert lo <= exact[item]
        assert exact[item] - lo <= bound

    # deterministic mode: same result set across repeated runs
    a = sketches.heavy_hitters(df, "w", capacity=cap, deterministic=True).collect()
    b = sketches.heavy_hitters(df, "w", capacity=cap, deterministic=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_heavy_hitters_min_share(spark):
    from dataframe_kotlin_spark.operators import sketches

    df = spark.createDataFrame([("a",)] * 500 + [("b",)] * 10, ["w"])
    out = sketches.heavy_hitters(df, "w", capacity=100, min_share=0.5)
    items = [r["item"] for r in out.collect()]
    assert items == ["a"]


def test_hll_deterministic_error_and_stability(spark):
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.operators import sketches

    # 2000 distinct keys in one group: p=6 gives ~13% std error; 3 sigma
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id"))
    est = sketches.hll_deterministic(df, ["g"], "id", p=6).first()["hll_nd"]
    assert abs(est - 2000) / 2000 < 0.4
    # deterministic: re-running and re-partitioning yield the identical double
    est2 = sketches.hll_deterministic(df.repartition(7), ["g"], "id", p=6).first()["hll_nd"]
    assert est == est2


def test_count_min_upper_bound_and_merge(spark, orders):
    """CM estimates never under-count; cells from two shards sum to the
    whole-data sketch (mergeability — the rollup-reuse contract)."""
    items = orders.select(F.col("o_orderpriority").alias("item"))
    exact = {
        r["item"]: r["n"]
        for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sk = sketches.count_min_sketch(items, "item", depth=4, width=64)
    distinct_items = items.distinct()
    est = {
        r["item"]: r["cm_est"]
        for r in sketches.count_min_estimate(
            sk, distinct_items, "item", depth=4, width=64
        ).collect()
    }
    assert set(est) == set(exact)
    for item, n in exact.items():
        assert est[item] >= n, (item, est[item], n)

    # merge: shard by half the keyspace, sum cells, estimates identical
    a = sketches.count_min_sketch(
        items.filter(F.crc32(F.col("item")) % 2 == 0), "item", depth=4, width=64
    )
    b = sketches.count_min_sketch(
        items.filter(F.crc32(F.col("item")) % 2 == 1), "item", depth=4, width=64
    )
    merged = (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    est_m = {
        r["item"]: r["cm_est"]
        for r in sketches.count_min_estimate(
            merged, distinct_items, "item", depth=4, width=64
        ).collect()
    }
    assert est_m == est

"""Sampling/splitting operators: determinism, disjointness, proportions
(operators/sampling.py). The cross-engine determinism of hash_split is
proven by the duckdb oracle on query hash_split_counts; these tests pin
the distributional properties."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import sampling

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet"))


def test_hash_split_proportions_and_exhaustive(orders):
    split = sampling.hash_split(orders, "o_orderkey", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = orders.count()
    assert sum(counts.values()) == n  # exhaustive, no dropped rows
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_hash_split_stable_per_key(orders):
    """Same key -> same split, across independent invocations and
    repartitionings (the no-leakage property)."""
    a = sampling.hash_split(orders, "o_orderkey", {"train": 0.9, "test": 0.1})
    b = sampling.hash_split(
        orders.repartition(7, "o_orderpriority"), "o_orderkey", {"train": 0.9, "test": 0.1}
    )
    joined = a.select("o_orderkey", "split").join(
        b.select(F.col("o_orderkey").alias("k"), F.col("split").alias("split_b")),
        F.col("o_orderkey") == F.col("k"),
    )
    assert joined.filter("split <> split_b").count() == 0


def test_hash_split_salt_decorrelates(orders):
    a = sampling.hash_split(orders, "o_orderkey", {"train": 0.5, "test": 0.5})
    b = sampling.hash_split(orders, "o_orderkey", {"train": 0.5, "test": 0.5}, salt=7)
    both = a.select("o_orderkey", "split").join(
        b.select(F.col("o_orderkey").alias("k"), F.col("split").alias("split_b")),
        F.col("o_orderkey") == F.col("k"),
    )
    same = both.filter("split = split_b").count() / both.count()
    assert 0.4 < same < 0.6  # independent coin flips agree ~50%


def test_hash_split_bad_weights(orders):
    with pytest.raises(ValueError):
        sampling.hash_split(orders, "o_orderkey", {"train": 0.8, "test": 0.1})


def test_stratified_sample_fractions(orders):
    fr = {"1-URGENT": 0.5, "5-LOW": 0.1}
    got = sampling.stratified_sample(orders, "o_orderpriority", fr, seed=1)
    assert set(r["o_orderpriority"] for r in got.select("o_orderpriority").distinct().collect()) <= set(fr)
    per = {r["o_orderpriority"]: r["n"] for r in got.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    base = {r["o_orderpriority"]: r["n"] for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    assert abs(per["1-URGENT"] / base["1-URGENT"] - 0.5) < 0.1
    assert abs(per["5-LOW"] / base["5-LOW"] - 0.1) < 0.05


def test_mix_weighted_rates_and_tags(orders):
    urgent = orders.filter("o_orderpriority = '1-URGENT'")
    low = orders.filter("o_orderpriority = '5-LOW'")
    mixed = sampling.mix_weighted([(urgent, 1.0), (low, 0.25)], key="o_orderkey")
    per = {r["source_id"]: r["n"] for r in mixed.groupBy("source_id").agg(F.count("*").alias("n")).collect()}
    assert per[0] == urgent.count()  # rate 1.0 keeps everything
    assert abs(per[1] / low.count() - 0.25) < 0.05
    # deterministic: re-running yields the identical mixture
    again = sampling.mix_weighted([(urgent, 1.0), (low, 0.25)], key="o_orderkey")
    assert mixed.exceptAll(again).count() == 0 and again.exceptAll(mixed).count() == 0


def test_reservoir_per_group(orders):
    k = 3
    got = sampling.reservoir_per_group(orders, ["o_orderpriority"], k=k, order_salt="o_orderkey")
    per = got.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == k for r in per)
    # reproducible with the same seed
    again = sampling.reservoir_per_group(orders, ["o_orderpriority"], k=k, order_salt="o_orderkey")
    assert got.exceptAll(again).count() == 0
    # different seed -> (almost surely) different sample
    other = sampling.reservoir_per_group(
        orders, ["o_orderpriority"], k=k, seed=99, order_salt="o_orderkey"
    )
    assert got.exceptAll(other).count() > 0


def test_pack_sequences_layout(spark):
    # one shard so layout is easy to reason about
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([300, 300, 500, 900, 100, 2500])],
        ["doc_id", "n_tok"],
    )
    packed = sampling.pack_sequences(df, "doc_id", "n_tok", budget=1000, shards=1)
    rows = {r["doc_id"]: r for r in packed.collect()}
    # offsets are the running sum of predecessors (doc_id order)
    assert [rows[i]["offset_in_seq"] for i in range(3)] == [0, 300, 600]
    # doc 3 starts at offset 1100 -> second window of shard 0
    assert rows[3]["seq_id"] == rows[0]["seq_id"] + 1
    assert rows[3]["offset_in_seq"] == 100
    # a doc longer than the budget still gets exactly one assignment
    assert rows[5]["seq_id"] is not None
    # determinism
    again = sampling.pack_sequences(df, "doc_id", "n_tok", budget=1000, shards=1)
    assert packed.exceptAll(again).count() == 0


def test_pack_sequences_sharding(orders):
    o = orders.select("o_orderkey", "o_totalprice")
    packed = sampling.pack_sequences(
        o.withColumn("w", F.lit(10)), "o_orderkey", "w", budget=100, shards=16
    )
    # every row assigned, shards within range, seq ids globally disjoint
    assert packed.count() == o.count()
    assert packed.filter((F.col("__shard__") < 0) | (F.col("__shard__") >= 16)).count() == 0
    # 10 tokens * budget 100 -> exactly 10 docs per full sequence
    per_seq = packed.groupBy("seq_id").count()
    assert per_seq.filter(F.col("count") > 10).count() == 0


def test_weighted_sample_respects_weights(spark):
    """A-ES: an item with 50x the weight should win the k=1 draw in the
    overwhelming majority of 200 independent groups."""
    rows = []
    for g in range(200):
        rows.append((g, g * 2, 50.0))      # heavy item
        rows.append((g, g * 2 + 1, 1.0))   # light item
    df = spark.createDataFrame(rows, "grp int, id long, w double")
    out = sampling.weighted_sample_per_group(df, ["grp"], "id", "w", k=1, seed=3)
    got = out.collect()
    assert len(got) == 200
    heavy_wins = sum(1 for r in got if r["id"] % 2 == 0)
    # P(heavy) = 50/51 per group; 200 trials — even 10 losses is p<1e-3
    assert heavy_wins > 180, heavy_wins

    # deterministic: the same seed reproduces the identical sample
    again = sampling.weighted_sample_per_group(df, ["grp"], "id", "w", k=1, seed=3)
    assert sorted(r["id"] for r in again.collect()) == sorted(r["id"] for r in got)
    # a different seed draws a different sample (some group flips)
    other = sampling.weighted_sample_per_group(df, ["grp"], "id", "w", k=1, seed=4)
    assert sorted(r["id"] for r in other.collect()) != sorted(r["id"] for r in got)


def test_weighted_sample_k_bounds(orders):
    """k >= group size returns the whole group; sample is a subset of it."""
    small = orders.limit(30)
    out = sampling.weighted_sample_per_group(
        small, ["o_orderstatus"], "o_orderkey", "o_totalprice", k=10**6
    )
    assert out.count() == small.count()


def test_dsir_weights_favor_target_like_docs(spark):
    from dataframe_kotlin_spark.operators.sampling import dsir_log_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_log_weights(docs, target, "text", "doc_id", buckets=128)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    # docs drawn from the target slice must score higher under the
    # target distribution than the rest — the DSIR selection signal
    assert means[True] > means[False]
    assert w.count() == docs.count()


def test_dsir_weights_deterministic(spark):
    from dataframe_kotlin_spark.operators.sampling import dsir_log_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    a = dsir_log_weights(docs, target, buckets=64).collect()
    b = dsir_log_weights(docs, target, buckets=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

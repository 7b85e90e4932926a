"""Learned-IVF ANN: k-means convergence, nprobe recall vs brute force,
deterministic training (operators/similarity.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import similarity as sim

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


@pytest.fixture(scope="module")
def queries(emb):
    return emb.orderBy("vec_id").limit(20)


@pytest.fixture(scope="module")
def centroids(emb):
    return sim.train_ivf_centroids(emb, k=8, iters=4)


def _inertia(emb, centroids):
    a = sim.assign_cells(emb, centroids, out="cell")
    cents = sim._centroid_array(centroids)
    return a.select(
        F.sum(sim._sq_dist(sim.as_double(F.col("embedding")), cents[F.col("cell")])).alias("i")
    ).collect()[0]["i"]


def test_kmeans_inertia_decreases(emb):
    i1 = _inertia(emb, sim.train_ivf_centroids(emb, k=8, iters=1))
    i4 = _inertia(emb, sim.train_ivf_centroids(emb, k=8, iters=4))
    assert i4 <= i1 * 1.0001  # Lloyd's never increases inertia


def test_kmeans_deterministic(emb, centroids):
    again = sim.train_ivf_centroids(emb, k=8, iters=4)
    flat = [x for c in centroids for x in c]
    flat2 = [x for c in again for x in c]
    assert all(abs(a - b) < 1e-9 for a, b in zip(flat, flat2))


def test_ivf_recall_vs_bruteforce(emb, queries, centroids):
    k = 5
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb, queries, k=k).collect()
    }
    got2 = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk_trained(emb, queries, centroids, k=k, nprobe=2).collect()
    }
    got_all = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk_trained(emb, queries, centroids, k=k, nprobe=8).collect()
    }
    assert len(got_all & exact) / len(exact) > 0.99  # nprobe=all cells == exact
    assert len(got2 & exact) / len(exact) > 0.5  # partial probing trades recall
    assert len(got2 & exact) <= len(got_all & exact)


def test_assign_cells_covers_all_cells(emb, centroids):
    cells = sim.assign_cells(emb, centroids, out="cell")
    per = cells.groupBy("cell").count().collect()
    assert sum(r["count"] for r in per) == emb.count()
    assert len(per) >= 6  # k=8 minus (rare) empty cells


def test_kmeanspp_init_deterministic_and_k(emb):
    pp = sim.kmeanspp_init_centroids(emb, k=8)
    pp2 = sim.kmeanspp_init_centroids(emb, k=8)
    assert len(pp) == 8
    assert pp == pp2  # hash-driven sampling: pure function of the data


def test_kmeanspp_init_beats_hash_init(emb):
    # deterministic on the fixed sf0.01 corpus, so the comparison is stable
    pp = sim.kmeanspp_init_centroids(emb, k=8)
    hash_init = sim.train_ivf_centroids(emb, k=8, iters=0)
    assert _inertia(emb, pp) < _inertia(emb, hash_init)


def test_train_with_kmeanspp_converges(emb):
    trained = sim.train_ivf_centroids(emb, k=8, iters=4, init="kmeans||")
    baseline = sim.train_ivf_centroids(emb, k=8, iters=4)
    assert len(trained) == 8
    # both inits settle to comparable quality on this corpus
    assert _inertia(emb, trained) <= _inertia(emb, baseline) * 1.1


def test_quantize_int8_error_bound_and_recall(spark, emb):
    """Reconstruction error <= scale/2 per dim; top-10 cosine neighbors
    on dequantized vectors overlap the float top-10 heavily."""
    from dataframe_kotlin_spark.operators.similarity import cosine_topk, quantize_int8

    q = quantize_int8(emb)
    row = q.select("vec_id", "embedding", "qscale", "qvec").first()
    s = row["qscale"]
    for x, qi in zip(row["embedding"], row["qvec"]):
        assert abs(x - qi * s) <= s / 2 + 1e-12
        assert -127 <= qi <= 127

    deq = q.select(
        "vec_id",
        F.transform(
            F.col("qvec"), lambda v: (v * F.col("qscale")).cast("float")
        ).alias("embedding"),
    )
    probe = emb.select("vec_id", "embedding").limit(1)
    top_f = {r["neighbor_id"] for r in cosine_topk(emb, probe, k=10).collect()}
    top_q = {r["neighbor_id"] for r in cosine_topk(deq, probe, k=10).collect()}
    assert len(top_f & top_q) >= 7, (top_f, top_q)


def test_kmeans_lloyd_det_inertia_and_determinism(spark, emb):
    from dataframe_kotlin_spark.operators.similarity import kmeans_lloyd_det

    a0 = kmeans_lloyd_det(emb, k=4, iters=0)  # init assignment only
    a1 = kmeans_lloyd_det(emb, k=4, iters=1)
    inertia0 = a0.agg(F.sum("dist2")).collect()[0][0]
    inertia1 = a1.agg(F.sum("dist2")).collect()[0][0]
    assert inertia1 <= inertia0  # a Lloyd round never increases inertia
    assert a1.select("cell").distinct().count() <= 4

    again = kmeans_lloyd_det(emb, k=4, iters=1)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, again.collect()))


def test_parse_byte_conf_suffixes():
    # advice r4: "1g" digit-stripped to 1 byte, exploding the bucket
    # estimate into probe-replication OOM territory
    from dataframe_kotlin_spark.operators.similarity import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 134217728
    assert _parse_byte_conf("128m") == 128 * 1024**2
    assert _parse_byte_conf("128mb") == 128 * 1024**2
    assert _parse_byte_conf("1g") == 1024**3
    assert _parse_byte_conf("1GB") == 1024**3
    assert _parse_byte_conf("512k") == 512 * 1024
    assert _parse_byte_conf("2t") == 2 * 1024**4
    assert _parse_byte_conf("garbage") == 128 * 1024**2
    assert _parse_byte_conf("") == 128 * 1024**2
    assert _parse_byte_conf("-5") == 128 * 1024**2
    assert _parse_byte_conf("0") == 128 * 1024**2


def test_ann_ivf_scaled_registry_contract(spark):
    """The scale-posture ANN registry query (VERDICT r6 item 2): its
    oracle promises per-probe (query_id, n_results=10, recall_ok=TRUE)
    — pin the structural pieces at sf0.001 with wide margin (observed
    per-query hits vs brute force: min 3; the query gates at >= 2)."""
    from dataframe_kotlin_spark.queries.pipeline import ann_ivf_scaled

    rows = ann_ivf_scaled(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5  # vec_id % 100 == 0 over 500 vectors
    assert all(r["n_results"] == 10 for r in rows)
    assert all(r["recall_ok"] for r in rows)
    # the k proportional-to-N rule bottoms out at 4 cells on tiny data
    again = ann_ivf_scaled(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_trained_numpy_zero_norm_ranks_last(spark):
    """ADVICE r7: on the numpy path a zero-norm vector produced NaN
    cosine (0/0 under errstate-ignore), and Spark orders NaN ABOVE
    every double — so NaN candidates filled the desc top-k, while the
    expr path's NULL (non-ANSI div-by-zero) sorts last. Both paths must
    rank zero-norm candidates last and agree on the result set."""
    from dataframe_kotlin_spark.operators import similarity as sim

    dim = 8
    rows = []
    for i in range(40):
        if i % 10 == 0:
            vec = [0.0] * dim  # zero-norm corpus vectors
        else:
            vec = [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter((F.col("vec_id") == 1) | (F.col("vec_id") == 2))
    # 40 distinct-ish vectors, k_cells high enough to force numpy (>=32)
    cents = [[float((c * 5 + j) % 7 - 3) for j in range(dim)] for c in range(32)]
    got_np = sim.ivf_topk_trained(df, q, cents, k=3, nprobe=32, method="numpy")
    got_ex = sim.ivf_topk_trained(df, q, cents, k=3, nprobe=32, method="expr")
    np_rows = {(r["query_id"], r["neighbor_id"]) for r in got_np.collect()}
    ex_rows = {(r["query_id"], r["neighbor_id"]) for r in got_ex.collect()}
    assert np_rows == ex_rows
    # zero-norm ids (0, 10, 20, 30) must not appear in any top-3
    zero_ids = {0, 10, 20, 30}
    assert not {n for _, n in np_rows} & zero_ids


def test_method_param_validated():
    """ADVICE r7: a typo like method='exrp' must raise, not silently
    take the numpy path ('expr' exists for SQL-replay audits)."""
    import pytest as _pytest

    from dataframe_kotlin_spark.operators import dedup, similarity as sim

    with _pytest.raises(ValueError, match="method"):
        sim.assign_cells(None, [[0.0]], method="exrp")
    with _pytest.raises(ValueError, match="method"):
        sim.ivf_topk_trained(None, None, [[0.0]], method="numpyy")
    with _pytest.raises(ValueError, match="method"):
        dedup.simhash(None, "text", method="exrp")


def test_cosine_neardup_pairs_three_paths_agree(spark):
    """cosine_neardup_pairs: the SQL-replayable expr fold, the Arrow
    pair-scored cosine, and the per-cell dgemm (r8 — ships each vector
    once per cell instead of ~1KB per candidate pair) must produce the
    same pair set with matching similarities, and all three must
    exclude zero-norm vectors (NULL cosine / masked)."""
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    asg = sim.kmeans_lloyd_det(emb, "vec_id", "embedding", k=4, iters=1)
    tagged = emb.join(
        asg.select("vec_id", F.col("cell").cast("bigint").alias("cell")), "vec_id"
    )

    def pairs(df, method):
        return {
            (r["id_a"], r["id_b"], round(r["cosine_sim"], 9))
            for r in sim.cosine_neardup_pairs(
                df, "cell", "embedding", "vec_id", 0.35, method=method
            ).collect()
        }

    e = pairs(tagged, "expr")
    assert len(e) > 0
    assert e == pairs(tagged, "numpy") == pairs(tagged, "dgemm")

    rows = [
        (i, [0.0] * 4 if i % 3 == 0 else [float(i), 1.0, 0.5, -1.0], 0)
        for i in range(12)
    ]
    z = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, cell bigint")
    zero_ids = {i for i in range(12) if i % 3 == 0}
    for m in ("expr", "numpy", "dgemm"):
        got = {
            (r["id_a"], r["id_b"])
            for r in sim.cosine_neardup_pairs(
                z, "cell", "embedding", "vec_id", -1.0, method=m
            ).collect()
        }
        assert got and all(a not in zero_ids and b not in zero_ids for a, b in got), m


def test_ivf_topk_trained_dgemm_matches(emb, queries, centroids):
    """ivf_topk_trained method='dgemm' (r8): per-cell cogroup X @ Q.T
    must reproduce the expr and pair-scored paths exactly — same
    candidate set (probe expansion + self-exclusion), same ranking.
    Neutral at this corpus's dim=64 (the join form never shuffles the
    corpus); the method exists for production dims where per-pair
    transfer grows ~12-64x."""
    from dataframe_kotlin_spark.operators import similarity as sim

    def res(method):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], round(r["cosine_sim"], 9))
            for r in sim.ivf_topk_trained(
                emb, queries, centroids, k=5, nprobe=3, method=method
            ).collect()
        )

    e = res("expr")
    assert len(e) > 0
    assert e == res("numpy") == res("dgemm")

"""Executor-resident centroids (VERDICT r8 item 2): the k-proportional-
to-N families' model must stop being a driver-side list past a byte
threshold. Pins path selection, rank-identity between the frame
(cogroup dgemm) and list (closure numpy) assignment paths — including
the multi-chunk reduce — and the frame trainer's parity with the list
trainer. Also pins the r8 ADVICE dgemm contract fixes (NULL cells,
duplicate ids)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import similarity as sim

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def _as_frame(spark, centroids):
    return spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )


def test_frame_assign_matches_list_single_chunk(spark, emb):
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    want = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells(emb, cents, out="cell", method="numpy").collect()
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells_frame(
            emb, _as_frame(spark, cents), "embedding", "vec_id", "cell"
        ).collect()
    }
    assert got == want


def test_frame_assign_matches_list_multi_chunk(spark, emb):
    """chunk_bytes small enough that the model splits into several hash
    chunks: exercises the min_by reduce and the cross-chunk tie order."""
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    # force ~8 chunks of 4 cells each
    chunk = sim.centroid_model_bytes(4, dim)
    want = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells(emb, cents, out="cell", method="numpy").collect()
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells_frame(
            emb,
            _as_frame(spark, cents),
            "embedding",
            "vec_id",
            "cell",
            chunk_bytes=chunk,
            salt_parts=4,
        ).collect()
    }
    assert got == want


def test_frame_assign_preserves_columns_and_rows(spark, emb):
    cents = sim.train_ivf_centroids(emb, k=8, iters=0, output="list")
    out = sim.assign_cells_frame(emb, _as_frame(spark, cents), "embedding", "vec_id")
    assert set(out.columns) == set(emb.columns) | {"cell"}
    assert out.count() == emb.count()


def test_assign_cells_dispatches_on_frame(spark, emb):
    cents = sim.train_ivf_centroids(emb, k=8, iters=0, output="list")
    f = _as_frame(spark, cents)
    via_dispatch = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells(emb, f, out="cell", id_col="vec_id").collect()
    }
    direct = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells_frame(emb, f, "embedding", "vec_id").collect()
    }
    assert via_dispatch == direct
    with pytest.raises(ValueError, match="id_col"):
        sim.assign_cells(emb, f, out="cell")


def test_train_frame_seed_matches_list_seed(spark, emb):
    lst = sim.train_ivf_centroids(emb, k=8, iters=0, output="list")
    frame = sim.train_ivf_centroids_frame(emb, k=8, iters=0)
    got = {r["cell"]: list(r["centroid"]) for r in frame.collect()}
    assert got == {i: list(map(float, c)) for i, c in enumerate(lst)}


def test_train_frame_matches_list_training(spark, emb):
    import numpy as np

    lst = sim.train_ivf_centroids(emb, k=8, iters=2, output="list")
    frame = sim.train_ivf_centroids_frame(emb, k=8, iters=2)
    got = {r["cell"]: list(r["centroid"]) for r in frame.collect()}
    assert set(got) == set(range(8))
    for i, c in enumerate(lst):
        assert np.allclose(got[i], c, rtol=1e-9, atol=1e-12), i


def test_auto_gate_selects_by_model_bytes(emb):
    from pyspark.sql import DataFrame

    small = sim.train_ivf_centroids(emb, k=8, iters=0, output="auto")
    assert isinstance(small, list)  # 8*64*8 bytes: far below the threshold
    big = sim.train_ivf_centroids(
        emb, k=8, iters=0, output="auto", frame_threshold_bytes=0
    )
    assert isinstance(big, DataFrame)  # any model exceeds a 0-byte budget


def test_train_param_validation(emb):
    with pytest.raises(ValueError, match="init"):
        sim.train_ivf_centroids(emb, k=4, iters=0, init="kmens||")
    with pytest.raises(ValueError, match="output"):
        sim.train_ivf_centroids(emb, k=4, iters=0, output="lsit")
    with pytest.raises(ValueError, match="init"):
        sim.train_ivf_centroids_frame(emb, k=4, iters=0, init="kmens||")


def test_ivf_topk_trained_rejects_frame(spark, emb):
    f = _as_frame(spark, sim.train_ivf_centroids(emb, k=4, iters=0, output="list"))
    with pytest.raises(TypeError, match="driver-side centroid list"):
        sim.ivf_topk_trained(emb, emb.limit(2), f)


# --- r8 ADVICE dgemm contract fixes -----------------------------------------


def test_dgemm_pairs_exclude_null_cells(spark):
    """A NULL cell never matches in the join paths' equi-join; the
    dgemm groupBy must not pair the NULL-cell group (ADVICE r8)."""
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [1.0, 0.0]),
            (3, None, [1.0, 0.0]),
            (4, None, [1.0, 0.0]),
        ],
        "vec_id int, cell string, embedding array<double>",
    )
    for method in ("expr", "dgemm"):
        pairs = sorted(
            (r["id_a"], r["id_b"])
            for r in sim.cosine_neardup_pairs(
                df, cell_col="cell", threshold=0.9, method=method
            ).collect()
        )
        assert pairs == [(1, 2)], method


def test_dgemm_pairs_exclude_duplicate_ids(spark):
    """Duplicate ids sharing a cell must not emit an id_a == id_b row —
    the join paths' strict id_a < id_b never does (ADVICE r8), and such
    a row would drop a document as its own duplicate in semdedup_prune."""
    df = spark.createDataFrame(
        [
            (7, "a", [1.0, 0.0]),
            (7, "a", [1.0, 0.0]),
            (9, "a", [1.0, 0.0]),
        ],
        "vec_id int, cell string, embedding array<double>",
    )
    for method in ("expr", "dgemm"):
        pairs = sorted(
            (r["id_a"], r["id_b"])
            for r in sim.cosine_neardup_pairs(
                df, cell_col="cell", threshold=0.9, method=method
            ).collect()
        )
        assert all(a < b for a, b in pairs), (method, pairs)
        assert set(pairs) == {(7, 9)}, (method, pairs)


def test_check_method_error_names_per_site_set():
    with pytest.raises(ValueError, match="dgemm"):
        sim.cosine_neardup_pairs(None, cell_col="c", method="dgem")
    # assign_cells does NOT accept dgemm: its error lists only its own set
    with pytest.raises(ValueError, match=r"must be one of 'auto', 'expr', 'numpy'; got"):
        sim.assign_cells(None, [[0.0]], method="dgemm")


# ---- r9: frame-native top-k search (ivf_topk_frame) ------------------------


def _topk_key(rows):
    return sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)


def test_ivf_topk_frame_matches_list_dgemm(spark, emb):
    """The executor-resident search must be rank-identical to
    ivf_topk_trained(method='dgemm') fed the SAME model as a list: both
    build the identical candidate relation (same assignment argmin, same
    probe top-nprobe with smallest-cell ties, shared cogroup scorer) and
    share the ranking window verbatim."""
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    want = _topk_key(
        sim.ivf_topk_trained(emb, queries, cents, k=5, nprobe=2, method="dgemm").collect()
    )
    got = _topk_key(
        sim.ivf_topk_frame(emb, queries, _as_frame(spark, cents), k=5, nprobe=2).collect()
    )
    assert got == want


def test_ivf_topk_frame_matches_list_multi_chunk(spark, emb):
    """Chunked model (several hash chunks): exercises the probe map's
    cross-chunk (d2, cell) ranking window and the assignment min_by."""
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    want = _topk_key(
        sim.ivf_topk_trained(emb, queries, cents, k=5, nprobe=3, method="dgemm").collect()
    )
    got = _topk_key(
        sim.ivf_topk_frame(
            emb,
            queries,
            _as_frame(spark, cents),
            k=5,
            nprobe=3,
            chunk_bytes=sim.centroid_model_bytes(4, dim),
            salt_parts=4,
        ).collect()
    )
    assert got == want


def test_ivf_topk_frame_nprobe_exceeds_cells(spark, emb):
    """nprobe > k cells probes every cell on both paths (the list path's
    slice() caps at the array length; the frame path's per-task top-n
    caps at the chunk width and the window keeps them all)."""
    cents = sim.train_ivf_centroids(emb, k=4, iters=1, output="list")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    want = _topk_key(
        sim.ivf_topk_trained(emb, queries, cents, k=3, nprobe=9, method="dgemm").collect()
    )
    got = _topk_key(
        sim.ivf_topk_frame(emb, queries, _as_frame(spark, cents), k=3, nprobe=9).collect()
    )
    assert got == want


def test_ivf_topk_frame_empty_model_raises(spark, emb):
    empty = spark.createDataFrame([], "cell int, centroid array<double>")
    with pytest.raises(ValueError, match="empty centroid frame"):
        sim.ivf_topk_frame(emb, emb.limit(1), empty).collect()


def test_frame_map_keeps_null_id_row(spark):
    """xxhash64(NULL) is NULL; an uncoalesced NULL salt key would have
    no centroid cogroup partner and the row would silently vanish from
    the assignment map (r9 review finding). The layout salts NULL ids
    to bucket 0, so the map still scores the row; the join-back contract
    (non-null unique ids) is documented at _assign_frame_map."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    cents = _as_frame(spark, [[1.0, 0.0], [0.0, 1.0]])
    rows = sim._assign_frame_map(df, cents, "embedding", "vec_id", "cell").collect()
    got = {r["vec_id"]: r["cell"] for r in rows}
    assert got == {1: 0, None: 1}


# ---- r10: two-level coarse-quantizer routing (VERDICT r9 item 1) ----------


def test_routed_assign_matches_replicate_multi_chunk(spark, emb):
    """The coarse-routed layout must agree with the r9 replicate layout
    (and therefore with the list path) on a forced multi-chunk model —
    routing is exact by the triangle-inequality bound, not an
    approximation."""
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    f = _as_frame(spark, cents)
    chunk = sim.centroid_model_bytes(4, dim)  # ~8 chunks of 4 cells
    kw = dict(chunk_bytes=chunk, salt_parts=4)
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            emb, f, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    routed = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            emb, f, "embedding", "vec_id", "cell", route="coarse", **kw
        ).collect()
    }
    assert routed == rep
    assert len(routed) == emb.count()


def test_routed_assign_exact_under_both_coarse_builds(spark, emb, monkeypatch):
    """r12 (VERDICT r11 item 3): the coarse layer now has a size-gated
    LOCAL numpy build next to the distributed one. Routing exactness is
    layout-independent (the triangle inequality holds for ANY coarse
    set), so routed must equal replicate under BOTH builds — this pins
    the distributed branch, which small-model tests no longer reach
    (they all fit under COARSE_LOCAL_MAX_BYTES and take the local
    path)."""
    from dataframe_kotlin_spark.operators.cachereg import LockedLRU

    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    f = _as_frame(spark, cents)
    kw = dict(chunk_bytes=sim.centroid_model_bytes(4, dim), salt_parts=4)
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            emb, f, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    for forced_max in (None, 0):  # None = local (default gate), 0 = distributed
        # fresh memo per arm: both arms share the model lineage, and a
        # cache hit would silently reuse the OTHER arm's layer
        monkeypatch.setattr(
            sim, "_COARSE_LAYER_CACHE",
            LockedLRU(cap=4, on_evict=sim._release_coarse_entry),
        )
        if forced_max is not None:
            monkeypatch.setattr(sim, "COARSE_LOCAL_MAX_BYTES", forced_max)
        routed = {
            r["vec_id"]: r["cell"]
            for r in sim._assign_frame_map(
                emb, f, "embedding", "vec_id", "cell", route="coarse", **kw
            ).collect()
        }
        assert routed == rep, f"forced_max={forced_max}"


def test_local_coarse_build_is_deterministic(spark, emb, monkeypatch):
    """The local build must be a pure function of the model: two fresh
    builds over the same centroids yield bit-identical coarse arrays
    and chunk maps (the memo normally hides this — force misses)."""
    import numpy as np

    from dataframe_kotlin_spark.operators.cachereg import LockedLRU

    cents = sim.train_ivf_centroids(emb, k=24, iters=1, output="list")
    f = _as_frame(spark, cents)
    layers = []
    for _ in range(2):
        monkeypatch.setattr(
            sim, "_COARSE_LAYER_CACHE",
            LockedLRU(cap=4, on_evict=sim._release_coarse_entry),
        )
        layer = sim._coarse_layer(f, "cell", "centroid", 4, 24)
        cmap = sorted(
            (r["__cell__"], r["__g__"])
            for r in sim._coarse_chunk_map(layer).collect()
        )
        layers.append((layer["bc"].value, cmap))
    (b1, m1), (b2, m2) = layers
    assert np.array_equal(b1["C"], b2["C"])
    assert np.array_equal(b1["r"], b2["r"])
    assert np.array_equal(b1["G1"], b2["G1"])
    assert m1 == m2


def test_routed_probe_matches_replicate_multi_chunk(spark, emb):
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    f = _as_frame(spark, cents)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    kw = dict(chunk_bytes=sim.centroid_model_bytes(4, dim), salt_parts=4)
    key = lambda rows: sorted((r["vec_id"], r["c"]) for r in rows)
    rep = key(
        sim._probe_frame_map(
            q, f, "embedding", "vec_id", 3, "c", route="replicate", **kw
        ).collect()
    )
    routed = key(
        sim._probe_frame_map(
            q, f, "embedding", "vec_id", 3, "c", route="coarse", **kw
        ).collect()
    )
    assert routed == rep


def test_routed_plan_has_no_gfold_explode(spark, emb):
    """The done-criterion plan shape (VERDICT r9 item 1): no
    explode(sequence(0, G-1)) on the DATA side — the only explode left
    is the model side's salt replication."""
    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    f = _as_frame(spark, cents)
    amap = sim._assign_frame_map(
        emb, f, "embedding", "vec_id", "cell",
        chunk_bytes=sim.centroid_model_bytes(4, dim), salt_parts=4,
        route="coarse",
    )
    plan = amap._jdf.queryExecution().toString()
    import re
    # the replicate layout's data-side G-fold prints
    # `Generate explode(sequence(0, G-1, ...)) ... [__g__#N]` — anchor
    # on the OUTPUT column: the model's persisted lineage carries salt
    # explodes `[__salt__#N]` whose sequence bound can collide with G
    # (the r10 local[8] false-fail); only the __g__ one is the G-fold
    assert not re.search(r"Generate explode\(sequence\(0, 7,[^\n]*\[__g__#", plan)
    assert re.search(r"sequence\(0, 3", plan)  # the salt explode stays
    # routing goes through mapInPandas (ArrowEvalPython/MapInPandas node)
    assert "MapInPandas" in plan or "mapInPandas" in plan


def test_frame_stats_memoized_zero_jobs(spark, emb):
    """VERDICT r9 item 5: repeated assign/probe builds over the SAME
    model frame launch zero stats jobs — asserted with job groups (the
    second build's group must record no job ids)."""
    sc = spark.sparkContext
    cents = sim.train_ivf_centroids_frame(emb, k=8, iters=0)
    sc.setJobGroup("stats-probe-1", "first build")
    k1 = sim._frame_model_stats(cents, "centroid", "t")
    sc.setJobGroup("stats-probe-2", "second build")
    k2 = sim._frame_model_stats(cents, "centroid", "t")
    ids = sc.statusTracker().getJobIdsForGroup("stats-probe-2")
    sc.setJobGroup(None, None)
    assert k1 == k2 == (8, 64)
    assert list(ids) == []


def test_frame_stats_no_false_share_between_local_models(spark):
    """Two in-memory models with the SAME schema but different contents
    must not share a memo entry (the analyzed-plan string hides
    LogicalRDD data; semanticHash discriminates)."""
    a = _as_frame(spark, [[1.0, 0.0], [0.0, 1.0]])
    b = _as_frame(spark, [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    assert sim._frame_model_stats(a, "centroid", "t")[0] == 2
    assert sim._frame_model_stats(b, "centroid", "t")[0] == 3


def test_routed_keeps_null_id_row(spark):
    """Routing must preserve the NULL-id row the salt coalesce protects
    (r9 finding) — the router replicates rows by chunk, never drops."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    cents = _as_frame(spark, [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [2.0, 2.0]])
    rows = sim._assign_frame_map(
        df, cents, "embedding", "vec_id", "cell",
        chunk_bytes=sim.centroid_model_bytes(1, 2),  # 4 chunks of 1 cell
        salt_parts=2,
        route="coarse",
    ).collect()
    got = {r["vec_id"]: r["cell"] for r in rows}
    assert got == {1: 0, None: 1}


# ---- r10: frame-resident k-means|| init (VERDICT r9 item 3) ----------------


def _inertia(emb, cents_frame):
    """Sum of squared distances to the nearest centroid (true d2:
    shifted map distance + ||x||^2 added back JVM-side)."""
    m = sim._assign_frame_map(
        emb, cents_frame, "embedding", "vec_id", "cell", keep_d2=True
    )
    vec = emb.select("vec_id", "embedding")
    x2 = sim.dot(
        sim.as_double(F.col("embedding")), sim.as_double(F.col("embedding"))
    )
    joined = vec.join(m, "vec_id").select(
        F.greatest(x2 + F.col("__d2p__"), F.lit(0.0)).alias("d2")
    )
    return joined.agg(F.sum("d2")).first()[0]


def test_kmeanspp_frame_inertia_beats_hash(spark, emb):
    """Done-criterion (VERDICT r9 item 3): kmeans|| init inertia <=
    hash init on the standard fixture, at equal Lloyd iterations."""
    pp = sim.train_ivf_centroids_frame(emb, k=16, iters=1, init="kmeans||")
    hashed = sim.train_ivf_centroids_frame(emb, k=16, iters=1, init="hash")
    assert _inertia(emb, pp) <= _inertia(emb, hashed)


def test_kmeanspp_frame_deterministic(spark, emb):
    """No RNG anywhere: two independent builds must be value-identical."""
    a = {r["cell"]: list(r["centroid"])
         for r in sim.kmeanspp_init_centroids_frame(emb, k=8).collect()}
    b = {r["cell"]: list(r["centroid"])
         for r in sim.kmeanspp_init_centroids_frame(emb, k=8).collect()}
    assert a == b
    assert set(a) == set(range(8))
    assert all(len(v) == 64 for v in a.values())


def test_auto_trainer_accepts_kmeanspp_at_any_k(emb):
    """The 'output=auto' gate must accept init='kmeans||' on BOTH sides
    of the byte threshold (the r9 wall: past the gate — exactly where
    quality matters most — the better initializer was unavailable)."""
    from pyspark.sql import DataFrame

    small = sim.train_ivf_centroids(emb, k=4, iters=0, init="kmeans||", output="auto")
    assert isinstance(small, list) and len(small) == 4
    big = sim.train_ivf_centroids(
        emb, k=4, iters=0, init="kmeans||", output="auto", frame_threshold_bytes=0
    )
    assert isinstance(big, DataFrame)
    assert big.count() == 4


def test_kmeanspp_frame_tops_up_degenerate_corpus(spark):
    """Fewer candidates than k (tiny corpus): hash-ordered top-up keeps
    the contract of exactly k cells, mirroring the list path."""
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(6)],
        "vec_id int, embedding array<double>",
    )
    cents = sim.kmeanspp_init_centroids_frame(df, k=5, rounds=1)
    rows = cents.collect()
    assert sorted(r["cell"] for r in rows) == list(range(5))


def test_auto_route_falls_back_on_concentrated_data(spark, emb):
    """route='auto' must NOT pay the routing pass when exact pruning
    cannot engage: the fixture embeddings are random unit vectors
    (near-equal pairwise distances), so the fan-out probe reads ~G
    chunks per row and auto picks the replicate layout (plan HAS the
    G-fold explode). The probe is memoized: the second build launches
    zero jobs."""
    import re

    cents = sim.train_ivf_centroids(emb, k=32, iters=1, output="list")
    dim = len(cents[0])
    f = _as_frame(spark, cents)
    kw = dict(chunk_bytes=sim.centroid_model_bytes(4, dim), salt_parts=4)
    amap = sim._assign_frame_map(emb, f, "embedding", "vec_id", "cell", **kw)
    plan = amap._jdf.queryExecution().toString()
    assert re.search(r"Generate explode\(sequence\(0, 7,[^\n]*\[__g__#", plan)  # replicate chosen
    sc = spark.sparkContext
    sc.setJobGroup("fanout-probe-2", "second build")
    sim._assign_frame_map(emb, f, "embedding", "vec_id", "cell", **kw)
    ids = sc.statusTracker().getJobIdsForGroup("fanout-probe-2")
    sc.setJobGroup(None, None)
    assert list(ids) == []


def test_auto_route_keeps_coarse_on_clustered_data(spark):
    """On a corpus with real cluster structure the fan-out probe reads
    ~1 chunk per row and auto keeps the routed layout — and the
    assignment still matches the replicate layout exactly."""
    import re

    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(16, 8) * 10.0
    rows = [
        (int(i), (centers[i % 16] + rng.randn(8) * 0.05).tolist())
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = sim.train_ivf_centroids(df, k=16, iters=2, output="list")
    f = _as_frame(spark, cents)
    kw = dict(chunk_bytes=sim.centroid_model_bytes(2, 8), salt_parts=4)  # 8 chunks
    amap = sim._assign_frame_map(df, f, "embedding", "vec_id", "cell", **kw)
    plan = amap._jdf.queryExecution().toString()
    assert not re.search(r"Generate explode\(sequence\(0, 7,[^\n]*\[__g__#", plan)  # coarse kept
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            df, f, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    got = {r["vec_id"]: r["cell"] for r in amap.collect()}
    assert got == rep


def test_oversize_coarse_cell_splits_across_chunks(spark):
    """A coarse cell that attracts most of the model must not land
    whole in one chunk (r10 review finding: the chunk_bytes task-memory
    contract is why chunks exist) — it splits into hash sub-slots
    spread across chunks, and routing fans to all of them so the
    assignment stays exact."""
    import numpy as np

    rng = np.random.RandomState(3)
    blob = [(rng.randn(8) * 1e-3).tolist() for _ in range(32)]  # one tight blob
    f = _as_frame(spark, blob)
    layer = sim._coarse_layer(f, "cell", "centroid", 8, 32)
    cmap = sim._coarse_chunk_map(layer)
    rows = cmap.collect()
    # every fine cell mapped exactly once
    assert sorted(r["__cell__"] for r in rows) == list(range(32))
    per_chunk: dict = {}
    for r in rows:
        per_chunk[r["__g__"]] = per_chunk.get(r["__g__"], 0) + 1
    cap = -(-32 // 8)
    # hash sub-slotting is approximate; 2x the target cap is the bound
    assert max(per_chunk.values()) <= 2 * cap, per_chunk
    assert len(per_chunk) >= 4  # the blob actually spread out
    # exactness: routed assignment == replicate on data near the blob
    df = spark.createDataFrame(
        [(i, (rng.randn(8) * 1e-3).tolist()) for i in range(64)],
        "vec_id int, embedding array<double>",
    )
    kw = dict(chunk_bytes=sim.centroid_model_bytes(4, 8), salt_parts=2)
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            df, f, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    routed = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            df, f, "embedding", "vec_id", "cell", route="coarse", **kw
        ).collect()
    }
    assert routed == rep


def test_coarse_layer_cache_evicts_and_releases(spark, emb, monkeypatch):
    """VERDICT r10 wrong-item 1 done-criterion: cycling more distinct
    chunked models than the memo cap must (a) evict oldest-first, one
    at a time (not a wholesale clear), (b) RELEASE each evicted entry's
    Spark resources — the chunk-map frame unpersists, the coarse
    broadcast unpersists (executor copies freed; the driver value
    survives so in-flight lazy plans re-ship instead of crashing),
    and (c) leave routing results unchanged — a post-eviction build of
    the evicted model recomputes and still agrees with replicate."""
    from pyspark import StorageLevel

    from dataframe_kotlin_spark.operators.cachereg import LockedLRU

    released = []

    def rel(entry):
        released.append(entry)
        sim._release_coarse_entry(entry)

    monkeypatch.setattr(sim, "_COARSE_LAYER_CACHE", LockedLRU(cap=2, on_evict=rel))
    frames = []
    for s in range(4):
        k = 8 + s
        cents = sim.train_ivf_centroids(emb, k=k, iters=0, output="list")
        f = _as_frame(spark, cents)
        layer = sim._coarse_layer(f, "cell", "centroid", 4, k)
        sim._coarse_chunk_map(layer)  # persist the map so release is observable
        frames.append((f, k))
    # 4 distinct models through cap 2: exactly the 2 oldest evicted
    assert len(released) == 2
    for entry in released:
        assert entry["map"] is not None
        assert entry["map"].storageLevel == StorageLevel.NONE  # unpersisted
    # the evicted (oldest) model still routes exactly: cache miss ->
    # rebuild, routed == replicate row for row
    f0, k0 = frames[0]
    dim = 64
    kw = dict(chunk_bytes=sim.centroid_model_bytes(2, dim), salt_parts=2)
    sub = emb.limit(100)
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            sub, f0, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    routed = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            sub, f0, "embedding", "vec_id", "cell", route="coarse", **kw
        ).collect()
    }
    assert routed == rep


def test_locked_lru_race_loser_is_released():
    """Two builders racing the same key: the first insert wins, the
    loser's duplicate value goes to on_evict so duplicate coarse layers
    can't strand broadcasts (ADVICE r10)."""
    from dataframe_kotlin_spark.operators.cachereg import LockedLRU

    dropped = []
    lru = LockedLRU(cap=4, on_evict=dropped.append)
    first = {"v": 1}
    second = {"v": 2}
    assert lru.put("k", first) is first
    assert lru.put("k", second) is first  # loser's value replaced by winner's
    assert dropped == [second]
    assert lru.get("k") is first
    # LRU eviction order: oldest-accessed goes first
    lru.put("a", 1), lru.put("b", 2), lru.put("c", 3)
    lru.get("k")  # refresh k
    lru.put("d", 4)  # cap 4: evicts "a" (k was refreshed)
    assert dropped == [second, 1]
    assert lru.get("a") is None and lru.get("k") is first


def test_kmeanspp_frame_quality_parity_with_list(spark, emb):
    """The frame-resident reduction (top-weight seeding + weighted Lloyd
    over the candidate frame) must not trade quality for its no-collect
    property: on the fixture it actually BEATS the list path's weighted
    farthest-point sweep (497.9 vs 739.1 at k=16 — both deterministic),
    so pin frame <= list with no slack."""
    k = 16
    lst = sim.kmeanspp_init_centroids(emb, k=k)
    frm = sim.kmeanspp_init_centroids_frame(emb, k=k)
    assert _inertia(emb, frm) <= _inertia(emb, _as_frame(spark, lst))


# ---- r10: hypothesis property — routing exactness under adversarial
# geometries (integer grids force exact distance ties; duplicate
# centroids, zero vectors, tiny chunk budgets all reachable) ----------------

from hypothesis import HealthCheck, given, settings, strategies as st


@given(
    data=st.data(),
    dim=st.integers(2, 3),
    k=st.integers(3, 8),
    n=st.integers(4, 16),
    n_sub=st.integers(2, 4),
    nprobe=st.integers(1, 3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_routed_matches_replicate_property(spark, data, dim, k, n, n_sub, nprobe):
    """For ANY small integer-grid model/corpus (ties abundant), the
    coarse-routed chunked layout must agree with replicate on BOTH the
    argmin map and the top-nprobe probe map — the triangle-inequality
    pruning is exact, including tie cases."""
    grid = st.integers(-2, 2)
    cents = [
        [float(data.draw(grid)) for _ in range(dim)] for _ in range(k)
    ]
    rows = [
        (i, [float(data.draw(grid)) for _ in range(dim)]) for i in range(n)
    ]
    f = _as_frame(spark, cents)
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    chunk = sim.centroid_model_bytes(max(1, k // n_sub), dim)
    kw = dict(chunk_bytes=chunk, salt_parts=2)
    rep = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            df, f, "embedding", "vec_id", "cell", route="replicate", **kw
        ).collect()
    }
    routed = {
        r["vec_id"]: r["cell"]
        for r in sim._assign_frame_map(
            df, f, "embedding", "vec_id", "cell", route="coarse", **kw
        ).collect()
    }
    assert routed == rep
    pkey = lambda rows: sorted((r["vec_id"], r["c"]) for r in rows)
    prep = pkey(
        sim._probe_frame_map(
            df, f, "embedding", "vec_id", nprobe, "c", route="replicate", **kw
        ).collect()
    )
    prouted = pkey(
        sim._probe_frame_map(
            df, f, "embedding", "vec_id", nprobe, "c", route="coarse", **kw
        ).collect()
    )
    assert prouted == prep


def test_trained_model_memoized_zero_jobs(spark, emb):
    """r11: the frame trainer is deterministic per (input lineage, k,
    iters, init, chunk_bytes), so a repeated training returns the SAME
    persisted model with zero jobs — the construction-time-probe
    discipline (stats/coarse/fan-out) applied to the model itself."""
    import time

    emb2 = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    m1 = sim.train_ivf_centroids_frame(emb, k=6, iters=1)
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    m2 = sim.train_ivf_centroids_frame(emb2, k=6, iters=1)  # fresh scan, same lineage
    time.sleep(0.3)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert m2 is m1
    assert after == before
    # different hyperparameters miss (k differs -> real retrain)
    m3 = sim.train_ivf_centroids_frame(emb, k=7, iters=1)
    assert m3 is not m1 and m3.count() == 7
